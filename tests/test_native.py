"""Native C++ kernels vs their numpy/jax references."""
import numpy as np
import pytest

native = pytest.importorskip("dagr_tpu.native")

from dagr_tpu.data.downsample import filter_events_resize_np
from dagr_tpu.graph.build import build_graph


def test_filter_events_resize_matches_numpy(rng):
    n = 5000
    x = rng.integers(0, 64, n).astype(np.int64)
    y = rng.integers(0, 48, n).astype(np.int64)
    p = (2 * rng.integers(0, 2, n) - 1).astype(np.float32)
    cm1 = np.zeros((24, 32), np.float32)
    cm2 = cm1.copy()
    m1, cm1 = filter_events_resize_np(x, y, p, cm1, 2, 2)
    m2, cm2 = native.filter_events_resize(x, y, p, cm2, 2, 2)
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_allclose(cm1, cm2, atol=1e-6)


def test_cpu_graph_builder_matches_xla(rng):
    n, W, H = 400, 24, 16
    x = rng.integers(0, W, n).astype(np.int32)
    y = rng.integers(0, H, n).astype(np.int32)
    t = np.sort(rng.integers(0, 5000, n)).astype(np.int32)
    K, radius, dt, Q = 6, 2, 1500, 8

    g = build_graph(
        np.stack([x, y, t], 1)[None], np.ones((1, n), bool),
        width=W, height=H, radius=radius, delta_t_us=dt,
        max_neighbors=K, queue_size=Q,
    )
    b = native.CpuGraphBuilder(W, H, queue_size=Q)
    # feed in two chunks to exercise the persistent queue
    n1, m1 = b.insert_and_search(x[:250], y[:250], t[:250], radius, dt, K)
    n2, m2 = b.insert_and_search(x[250:], y[250:], t[250:], radius, dt, K)
    nbr = np.concatenate([n1, n2])
    mask = np.concatenate([m1, m2])
    np.testing.assert_array_equal(mask, np.asarray(g.nbr_mask[0]))
    np.testing.assert_array_equal(
        np.where(mask, nbr, 0), np.where(mask, np.asarray(g.nbr[0]), 0))


def test_subsample_zoom_matches_python(rng):
    import dagr_tpu.data.augment as aug

    n = 800
    zoom = 0.6
    pos_x = rng.random(n) * 30
    pos_y = rng.random(n) * 20
    p = (2 * rng.integers(0, 2, n) - 1).astype(np.float32)
    thresh = 1.0 / zoom ** 2

    c1 = np.zeros((32, 48), np.float32)
    keep1, xs1, ys1 = aug._subsample(pos_x, pos_y, p, c1, thresh)
    c2 = np.zeros((32, 48), np.float32)
    keep2, xs2, ys2 = native.subsample_zoom(pos_x, pos_y, p, c2, thresh)
    np.testing.assert_array_equal(keep1, keep2)
    np.testing.assert_array_equal(xs1[keep1], xs2[keep2])
    np.testing.assert_array_equal(ys1[keep1], ys2[keep2])
