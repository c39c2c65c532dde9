"""Property tests for the event-graph builder.

The jittable sort-based builder (dagr_tpu/graph/build.py) must
reproduce, slot for slot, the neighbor selection of the reference CUDA
kernels (reference: src/dagr/graph/ev_graph.cu:15-128), as captured by
the numpy oracle in dagr_tpu/graph/reference.py.  Invariants from
reference model/layers/ev_tgn.py:53-55: src_i <= dst_i, self edge
first, <= max_neighbors edges per destination, dt <= delta_t_us.
"""
import numpy as np
import pytest

from dagr_tpu.graph.build import build_graph
from dagr_tpu.graph.reference import build_graph_dense, spiral_offsets


def random_events(rng, B, N, W, H, T, n_valid=None):
    pos = np.zeros((B, N, 3), dtype=np.int32)
    mask = np.zeros((B, N), dtype=bool)
    for b in range(B):
        nv = n_valid if n_valid is not None else rng.integers(1, N + 1)
        pos[b, :nv, 0] = rng.integers(0, W, nv)
        pos[b, :nv, 1] = rng.integers(0, H, nv)
        pos[b, :nv, 2] = np.sort(rng.integers(0, T, nv))
        mask[b, :nv] = True
    return pos, mask


def test_spiral_matches_cuda_order():
    # first entries of the reference SpiralOut sequence
    # (reference: src/dagr/graph/spiral.h:8-14)
    s = spiral_offsets(2)
    assert s[:9] == [
        (0, 0), (1, 0), (1, 1), (0, 1), (-1, 1),
        (-1, 0), (-1, -1), (0, -1), (1, -1),
    ]
    assert len(s) == 25


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize(
    "W,H,T,radius,delta_t,K,Q",
    [
        (16, 12, 1000, 2, 300, 6, 4),     # small queue: eviction exercised
        (16, 12, 1000, 1, 1000000, 4, 128),  # no dt cutoff
        (32, 24, 5000, 3, 500, 16, 8),
    ],
)
def test_matches_oracle(seed, W, H, T, radius, delta_t, K, Q):
    rng = np.random.default_rng(seed)
    B, N = 2, 200
    pos, mask = random_events(rng, B, N, W, H, T)
    # force many same-pixel collisions to stress the queue
    pos[..., 0] %= 6
    pos[..., 1] %= 5

    nbr_ref, mask_ref = build_graph_dense(
        pos, mask, W, H, radius, delta_t, K, queue_size=Q
    )
    g = build_graph(
        pos, mask, width=W, height=H, radius=radius, delta_t_us=delta_t,
        max_neighbors=K, queue_size=Q, chunk=64,
    )
    nbr = np.asarray(g.nbr)
    nbr_mask = np.asarray(g.nbr_mask)

    np.testing.assert_array_equal(nbr_mask, mask_ref)
    np.testing.assert_array_equal(np.where(mask_ref, nbr, 0), np.where(mask_ref, nbr_ref, 0))


def test_matches_oracle_large_m_unsort_branch():
    """Cover the M >= 2**16 prefix-unsort branch (build.py) against the
    oracle — the branch real training shapes hit (e.g. batch 32 x 50k
    nodes).  All other oracle tests use M <= 800, so the two unsort
    paths (packed-u32 kv-sort vs 3-operand kv-sort) could silently
    diverge without this case.  Valid events are kept sparse so the
    numpy oracle stays cheap; M = B*N counts padded rows, which is what
    selects the branch."""
    rng = np.random.default_rng(3)
    B, N = 2, 33_000                      # M = 66k >= 65536
    W, H, T = 16, 12, 2000
    K, radius, delta_t, Q = 6, 2, 400, 4
    pos, mask = random_events(rng, B, N, W, H, T, n_valid=600)
    pos[..., 0] %= 5                      # force queue pressure
    pos[..., 1] %= 4

    nbr_ref, mask_ref = build_graph_dense(
        pos, mask, W, H, radius, delta_t, K, queue_size=Q)
    g = build_graph(
        pos, mask, width=W, height=H, radius=radius, delta_t_us=delta_t,
        max_neighbors=K, queue_size=Q)
    np.testing.assert_array_equal(np.asarray(g.nbr_mask), mask_ref)
    np.testing.assert_array_equal(
        np.where(mask_ref, np.asarray(g.nbr), 0),
        np.where(mask_ref, nbr_ref, 0))


@pytest.mark.parametrize("chunk", [0, 300, 256])
def test_slab_fast_path_and_deep_fallback(chunk):
    """The round-5 chunked slab FIFO fast path (build.py +
    graph/slab.py) and its lax.cond fallback must BOTH be bit-identical
    to the oracle.  The spread case keeps every pixel under the slab
    depth (Q=16) per chunk so the fast path's result is the one
    returned; the hot case plants one pixel with >16 in-dt events
    inside one chunk so the deep flag trips the exact sort_core
    fallback.  chunk=300/256 covers the cross-chunk table evolution
    (events whose neighbors live in earlier chunks; 256 leaves a
    padded remainder chunk).  The queue-cap regime (queue_size < slab
    Q) is routed to the sort path at trace time and exercised by
    test_matches_oracle's Q=4/8 cases."""
    rng = np.random.default_rng(11)
    W, H, T = 48, 36, 20000
    K, radius, delta_t = 16, 3, 5000
    B, N = 2, 900
    pos, mask = random_events(rng, B, N, W, H, T, n_valid=800)
    for case in ("spread", "hot"):
        p = pos.copy()
        if case == "hot":
            p[0, 100:124, 0] = 7
            p[0, 100:124, 1] = 9
        nbr_ref, mask_ref = build_graph_dense(
            p, mask, W, H, radius, delta_t, K)
        g = build_graph(p, mask, width=W, height=H, radius=radius,
                        delta_t_us=delta_t, max_neighbors=K,
                        fast_path="slab", chunk=chunk)
        np.testing.assert_array_equal(np.asarray(g.nbr_mask), mask_ref)
        np.testing.assert_array_equal(
            np.where(mask_ref, np.asarray(g.nbr), 0),
            np.where(mask_ref, nbr_ref, 0))


def test_invariants():
    rng = np.random.default_rng(7)
    B, N, W, H, T = 1, 500, 32, 24, 10000
    pos, mask = random_events(rng, B, N, W, H, T, n_valid=N)
    K, radius, delta_t = 8, 3, 2000
    g = build_graph(
        pos, mask, width=W, height=H, radius=radius, delta_t_us=delta_t,
        max_neighbors=K, queue_size=128,
    )
    nbr = np.asarray(g.nbr)[0]
    m = np.asarray(g.nbr_mask)[0]
    dst = np.arange(N)[:, None]
    # self edge first
    np.testing.assert_array_equal(nbr[:, 0], np.arange(N))
    assert m[:, 0].all()
    # src <= dst everywhere (reference: ev_tgn.py:54)
    assert (nbr[m] <= np.broadcast_to(dst, nbr.shape)[m]).all()
    # dt cap
    t = pos[0, :, 2]
    src_t = t[nbr]
    dt = t[:, None] - src_t
    assert (dt[m] <= delta_t).all()
    assert (dt[m] >= 0).all()
    # spatial cap (chebyshev radius)
    dx = np.abs(pos[0, :, 0][:, None] - pos[0, :, 0][nbr])
    dy = np.abs(pos[0, :, 1][:, None] - pos[0, :, 1][nbr])
    assert (np.maximum(dx, dy)[m] <= radius).all()


def test_empty_and_full_padding():
    pos = np.zeros((2, 16, 3), dtype=np.int32)
    mask = np.zeros((2, 16), dtype=bool)
    g = build_graph(
        pos, mask, width=8, height=8, radius=1, delta_t_us=100,
        max_neighbors=4, queue_size=8,
    )
    assert not np.asarray(g.nbr_mask).any()


def test_nbr_dpos_matches_positions():
    import jax.numpy as jnp
    """The builder's per-edge (dx, dy) deltas must equal
    pos_src - pos_dst for every valid edge (the conv basis and the
    pool cell mapping are derived from them algebraically)."""
    rng = np.random.default_rng(11)
    W, H = 64, 48
    B, N = 2, 300
    pos_px = np.zeros((B, N, 3), np.int32)
    pos_px[..., 0] = rng.integers(0, W, (B, N))
    pos_px[..., 1] = rng.integers(0, H, (B, N))
    pos_px[..., 2] = np.sort(rng.integers(0, 100_000, (B, N)), axis=1)
    mask = np.ones((B, N), bool)
    mask[1, 250:] = False
    g = build_graph(jnp.asarray(pos_px), jnp.asarray(mask), width=W,
                    height=H, radius=3, delta_t_us=30_000, max_neighbors=6)
    nbr = np.asarray(g.nbr)
    m = np.asarray(g.nbr_mask)
    dpos = np.asarray(g.nbr_dpos)
    pos = pos_px[..., :2].astype(np.float32) / np.array([W, H], np.float32)
    for b in range(B):
        src = pos[b][nbr[b]]                       # [N, K, 2]
        want = src - pos[b][:, None, :]
        np.testing.assert_allclose(dpos[b][m[b]], want[m[b]], atol=1e-6)


def test_pool_dpos_path_matches_gather_path():
    import jax.numpy as jnp
    """pool_graph's algebraic source-cell mapping (from nbr_dpos) must
    be bit-identical to gathering the source's own position."""
    from dagr_tpu.ops.pool import pool_graph

    rng = np.random.default_rng(12)
    W, H = 64, 48
    B, N = 2, 400
    pos_px = np.zeros((B, N, 3), np.int32)
    pos_px[..., 0] = rng.integers(0, W, (B, N))
    pos_px[..., 1] = rng.integers(0, H, (B, N))
    pos_px[..., 2] = np.sort(rng.integers(0, 100_000, (B, N)), axis=1)
    mask = np.ones((B, N), bool)
    mask[0, 350:] = False
    g = build_graph(jnp.asarray(pos_px), jnp.asarray(mask), width=W,
                    height=H, radius=4, delta_t_us=50_000, max_neighbors=8)
    pos = jnp.asarray(
        pos_px.astype(np.float32)
        / np.array([W, H, 100_000], np.float32))
    feat = jnp.asarray(rng.random((B, N, 4), np.float32))
    kw = dict(grid_ny=12, grid_nx=16, width=W, height=H, aggr="max",
              keep_temporal_ordering=True)
    a = pool_graph(feat, pos, jnp.asarray(mask), g.nbr, g.nbr_mask,
                   g.nbr_dpos, **kw)
    b = pool_graph(feat, pos, jnp.asarray(mask), g.nbr, g.nbr_mask,
                   None, **kw)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
