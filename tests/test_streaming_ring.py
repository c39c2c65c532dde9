"""Sliding-window (ring) streaming mode: bounded-memory eviction
(reference: graph/ev_graph.py:121-136, SlidingWindowGraph.delete_nodes)."""
import jax
import numpy as np

from dagr_tpu.config import DagrConfig
from dagr_tpu.data.synthetic import random_events
from dagr_tpu.models.dagr import DAGR
from dagr_tpu.streaming.engine import StreamingDetector, chunk_events

W, H = 64, 48


def setup(n_nodes, n_valid, seed=0):
    cfg = DagrConfig(n_nodes=n_nodes, max_neighbors=8, batch_size=1,
                     node_chunk=512, radius=0.05)
    model = DAGR(cfg, height=H, width=W)
    rng = np.random.default_rng(seed)
    ev = random_events(rng, 1, max(n_valid, n_nodes), width=W, height=H,
                       n_valid=n_valid)
    variables = model.init(jax.random.key(0), ev, train=False)
    pos_px = np.asarray(ev.pos_px()[0])[:n_valid]
    feat = np.asarray(ev.feat[0])[:n_valid]
    return cfg, model, variables, pos_px, feat


def run(engine, variables, pos_px, feat, chunk):
    step = engine.make_step(variables["params"], variables["batch_stats"])
    st = engine.init_state()
    raw = None
    for c in chunk_events(pos_px, feat, chunk):
        st, raw, _ = step(st, *c)
    return st, np.asarray(raw)


def test_ring_equals_grow_without_eviction():
    cfg, model, variables, pos_px, feat = setup(n_nodes=256, n_valid=200)
    g = StreamingDetector(cfg, H, W, chunk=64, window_mode="grow")
    r = StreamingDetector(cfg, H, W, chunk=64, window_mode="ring")
    _, raw_g = run(g, variables, pos_px, feat, 64)
    _, raw_r = run(r, variables, pos_px, feat, 64)
    np.testing.assert_allclose(raw_r, raw_g, atol=1e-5)
    # and both equal the sync forward
    from dagr_tpu.data.sample import collate
    from dagr_tpu.data.sample import EventSample  # noqa

    ev = random_events(np.random.default_rng(0), 1, 256, width=W, height=H,
                       n_valid=200)
    raw_sync = np.asarray(model.apply(variables, ev, train=False))
    assert np.abs(raw_g - raw_sync).max() < 1e-4


def test_ring_evicts_and_stays_consistent():
    cap = 64
    cfg, model, variables, pos_px, feat = setup(n_nodes=cap, n_valid=160)
    eng = StreamingDetector(cfg, H, W, chunk=16, window_mode="ring")
    st, raw = run(eng, variables, pos_px, feat, 16)

    assert int(st.num) == 160                      # all ingested
    assert bool(np.asarray(st.valid).all())        # store full
    # live events are exactly the last `cap` ingested
    vids = np.sort(np.asarray(st.vid))
    np.testing.assert_array_equal(vids, np.arange(160 - cap, 160))

    # aggregates match a numpy recompute over the live store
    cells = np.asarray(st.cells)
    x2 = np.asarray(st.x2)
    G1 = eng.ny1 * eng.nx1
    cnt = np.bincount(cells, minlength=G1)[:G1]
    np.testing.assert_array_equal(np.asarray(st.cell_cnt), cnt)
    for c in np.unique(cells):
        np.testing.assert_allclose(
            np.asarray(st.cell_max)[c], x2[cells == c].max(0), atol=1e-6)

    # adjacency only references live, in-stencil cell pairs
    adj = np.asarray(st.adj)
    nx1 = eng.nx1
    from dagr_tpu.core.types import GRID_OFFSETS

    for c in range(G1):
        for o, (dy, dx) in enumerate(GRID_OFFSETS):
            if not adj[c, o]:
                continue
            assert cnt[c] > 0
            sx, sy = c % nx1 + dx, c // nx1 + dy
            assert 0 <= sx < nx1
            assert cnt[sy * nx1 + sx] > 0

    assert np.isfinite(raw).all()


def test_ring_outputs_track_recent_window():
    """After heavy eviction, outputs must reflect recent events (the
    window moved), i.e. differ from an early-window snapshot."""
    cap = 64
    cfg, model, variables, pos_px, feat = setup(n_nodes=cap, n_valid=192,
                                                seed=3)
    eng = StreamingDetector(cfg, H, W, chunk=16, window_mode="ring")
    step = eng.make_step(variables["params"], variables["batch_stats"])
    st = eng.init_state()
    snaps = []
    for c in chunk_events(pos_px, feat, 16):
        st, raw, _ = step(st, *c)
        snaps.append(np.asarray(raw))
    assert np.abs(snaps[-1] - snaps[3]).max() > 1e-4
