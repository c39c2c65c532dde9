"""Voxel pooling vs a naive numpy implementation of the reference
semantics (reference: src/dagr/model/layers/pooling.py:51-97)."""
import numpy as np
import pytest

from dagr_tpu.core.types import GRID_OFFSETS
from dagr_tpu.ops.pool import pool_graph


def naive_pool(feat, pos, mask, nbr, nbr_mask, ny, nx, W, H, aggr, temporal):
    B, N, C = feat.shape
    ncells = ny * nx
    pooled = np.zeros((B, ncells, C))
    pos_out = np.zeros((B, ncells, 3))
    cmask = np.zeros((B, ncells), bool)
    adj = np.zeros((B, ncells, 9), bool)
    tmax = np.full((B, ncells), -np.inf)
    for b in range(B):
        p = np.clip(pos[b], 0, 0.9999999)
        cx = np.clip((p[:, 0] * nx).astype(int), 0, nx - 1)
        cy = np.clip((p[:, 1] * ny).astype(int), 0, ny - 1)
        cell = cx + nx * cy
        for c in np.unique(cell[mask[b]]):
            sel = (cell == c) & mask[b]
            cmask[b, c] = True
            if aggr == "max":
                pooled[b, c] = feat[b, sel].max(0)
            else:
                pooled[b, c] = feat[b, sel].mean(0)
            pm = pos[b, sel].mean(0)
            pm[0] = np.floor((pm[0] + 1e-5) * W) / W
            pm[1] = np.floor((pm[1] + 1e-5) * H) / H
            pos_out[b, c] = pm
            tmax[b, c] = pos[b, sel][:, 2].max()
        # pool edges
        for n in range(N):
            if not mask[b, n]:
                continue
            for s in range(nbr.shape[-1]):
                if not nbr_mask[b, n, s]:
                    continue
                j = nbr[b, n, s]
                dx, dy = cx[j] - cx[n], cy[j] - cy[n]
                if abs(dx) > 1 or abs(dy) > 1:
                    continue
                if dx == 0 and dy == 0:
                    continue  # self loop removed (pooling.py:62)
                adj[b, cell[n], (dy + 1) * 3 + (dx + 1)] = True
        if temporal:
            for c in range(ncells):
                for o, (dy, dx) in enumerate(GRID_OFFSETS):
                    if not adj[b, c, o]:
                        continue
                    sx, sy = c % nx + dx, c // nx + dy
                    if not (tmax[b, c] > tmax[b, sy * nx + sx]):
                        adj[b, c, o] = False
    return pooled, pos_out, cmask, adj, tmax


@pytest.mark.parametrize("aggr", ["max", "mean"])
@pytest.mark.parametrize("temporal", [False, True])
def test_matches_naive(rng, aggr, temporal):
    B, N, C, K = 2, 120, 6, 5
    ny, nx, W, H = 5, 7, 64, 48
    feat = rng.standard_normal((B, N, C)).astype(np.float32)
    pos = rng.random((B, N, 3)).astype(np.float32)
    mask = rng.random((B, N)) < 0.85
    nbr = rng.integers(0, N, (B, N, K)).astype(np.int32)
    # graph invariant: valid slots connect valid nodes only
    nbr_mask = (rng.random((B, N, K)) < 0.6) & mask[:, :, None]
    nbr_mask &= np.take_along_axis(
        mask, nbr.reshape(B, -1), axis=1
    ).reshape(B, N, K)

    got = pool_graph(
        feat, pos, mask, nbr, nbr_mask,
        grid_ny=ny, grid_nx=nx, width=W, height=H,
        aggr=aggr, keep_temporal_ordering=temporal,
    )
    gf, gp, gm, gn, gnm, gt = map(np.asarray, got)
    wf, wp, wm, wadj, wt = naive_pool(
        feat, pos, mask, nbr, nbr_mask, ny, nx, W, H, aggr, temporal
    )
    np.testing.assert_array_equal(gm, wm)
    np.testing.assert_allclose(gf, wf, atol=1e-5)
    np.testing.assert_allclose(gp, wp, atol=1e-5)
    np.testing.assert_allclose(
        np.where(wm, gt, 0), np.where(wm, wt, 0), atol=1e-6
    )
    # adjacency: our mask additionally requires both cells valid + in-bounds,
    # which the naive adj already implies (edges only exist between real cells)
    np.testing.assert_array_equal(gnm, wadj)
    # neighbor indices point at the right cells
    ncells = ny * nx
    cid = np.arange(ncells)
    for o, (dy, dx) in enumerate(GRID_OFFSETS):
        tgt = np.clip(cid % nx + dx, 0, nx - 1) + nx * np.clip(cid // nx + dy, 0, ny - 1)
        sel = gnm[0, :, o]
        np.testing.assert_array_equal(gn[0, sel, o], tgt[sel])


def test_empty_input():
    B, N, C, K = 1, 16, 4, 3
    out = pool_graph(
        np.zeros((B, N, C), np.float32), np.zeros((B, N, 3), np.float32),
        np.zeros((B, N), bool), np.zeros((B, N, K), np.int32),
        np.zeros((B, N, K), bool),
        grid_ny=4, grid_nx=4, width=32, height=32,
    )
    assert not np.asarray(out[2]).any()
    assert not np.asarray(out[4]).any()
