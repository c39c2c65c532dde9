"""Multi-stream serving engine (streaming/serve.py) correctness.

The serve path must (a) select bit-identical edges to the sync graph
builder (the queue + row-gather search replaces the per-step sort-merge
join but keeps the CUDA selection semantics: spiral order x recency,
dt inclusive, self first), and (b) end-to-end match the sync forward
to < 1e-4 — the same standard streaming/consistency.py enforces for
the single-stream engine."""
import jax
import numpy as np
import pytest

from dagr_tpu.config import DagrConfig
from dagr_tpu.data.synthetic import random_events
from dagr_tpu.graph.build import build_graph
from dagr_tpu.models.dagr import DAGR
from dagr_tpu.streaming.serve import MultiStreamServer, chunk_streams

W, H = 64, 48
CFG = DagrConfig(n_nodes=128, max_neighbors=8, batch_size=1,
                 node_chunk=256, radius=0.05)
NV = 96


def _streams(rng, n_streams):
    evs = [random_events(rng, 1, CFG.n_nodes, width=W, height=H,
                         n_valid=NV) for _ in range(n_streams)]
    pos = np.stack([np.asarray(e.pos_px()[0])[:NV] for e in evs])
    feat = np.stack([np.asarray(e.feat[0])[:NV] for e in evs])
    return evs, pos, feat


PAYLOAD = {"slabv": "v", "slabv16": "v16", "slabv16p4": "v16",
           "slabv16p8": "v16", "slabvp4": "v", "slabvp8": "v"}
PACK = {"slabv16p4": 4, "slabv16p8": 8, "slabvp4": 4, "slabvp8": 8}


@pytest.mark.parametrize("mode", ["sort", "queue", "slab", "slab-split",
                                  "slabv", "slabv16", "slabv16p4",
                                  "slabv16p8", "slabvp4"])
def test_serve_edges_match_builder(mode):
    rng = np.random.default_rng(0)
    evs, pos, feat = _streams(rng, 2)
    model = DAGR(CFG, height=H, width=W)
    variables = model.init(jax.random.key(0), evs[0], train=False)

    base = mode.split("-")[0]
    srv = MultiStreamServer(
        CFG, H, W, n_streams=2, chunk=32,
        search_mode="slab" if base.startswith("slabv") else base,
        queue_payload=PAYLOAD.get(base, "vt"),
        slab_pack=PACK.get(base, 1))
    if mode.endswith("-split"):
        srv.split_gather = True
    step = srv.make_step(variables["params"], variables["batch_stats"],
                         debug=True)
    st = srv.init_state()
    got_nbr, got_mask = [], []
    for c in chunk_streams(pos, feat, 32):
        st, raw, info = step(st, *c)
        got_nbr.append(np.asarray(info["nbr_vid"]))
        got_mask.append(np.asarray(info["nbr_mask"]))
    assert bool(info["coverage_ok"])
    nbr = np.concatenate(got_nbr, axis=1)       # [S, NV, K]
    mask = np.concatenate(got_mask, axis=1)

    for s in range(2):
        p = np.zeros((1, NV, 3), np.int32)
        p[0] = pos[s]
        g = build_graph(
            p, np.ones((1, NV), bool), width=W, height=H,
            radius=CFG.radius_px(W), delta_t_us=CFG.delta_t_us(),
            max_neighbors=CFG.max_neighbors,
            queue_size=CFG.max_queue_size)
        ref_nbr = np.asarray(g.nbr[0])
        ref_mask = np.asarray(g.nbr_mask[0])
        np.testing.assert_array_equal(mask[s], ref_mask)
        np.testing.assert_array_equal(
            np.where(ref_mask, nbr[s], 0), np.where(ref_mask, ref_nbr, 0))


@pytest.mark.parametrize("mode,cfg", [
    ("sort", CFG), ("queue", CFG), ("slab", CFG),
    # per-stream split gathers (slab table + conv feature ring): a
    # bench-measured layout choice that must stay bit-equal
    ("slab-split-csplit", CFG),
    # vid-only FIFO payload: dt candidacy via the t-ring vmin join
    ("slabv", CFG),
    # uint16 rebased vids (half the table + row traffic)
    ("slabv16", CFG),
    # packed slab rows (4 pixels/row): alignment-affine selection
    ("slabv16p4", CFG),
    # single-scale + temporal-ordering variant (the ncaltech-style
    # config exercises the outs[-1:] tail and the tmax edge filter)
    ("sort", CFG.replace(num_scales=1, keep_temporal_ordering=True)),
])
def test_serve_matches_sync_forward(mode, cfg):
    rng = np.random.default_rng(1)
    evs, pos, feat = _streams(rng, 3)
    model = DAGR(cfg, height=H, width=W)
    variables = model.init(jax.random.key(0), evs[0], train=False)

    base = mode.split("-")[0]
    srv = MultiStreamServer(
        cfg, H, W, n_streams=3, chunk=32,
        search_mode="slab" if base.startswith("slabv") else base,
        queue_payload=PAYLOAD.get(base, "vt"),
        slab_pack=PACK.get(base, 1))
    if "-split" in mode:
        srv.split_gather = True
    if "-csplit" in mode:
        srv.split_conv_gather = True
    step = srv.make_step(variables["params"], variables["batch_stats"])
    st = srv.init_state()
    for c in chunk_streams(pos, feat, 32):
        st, raw, info = step(st, *c)
    assert bool(info["coverage_ok"])
    raw = np.asarray(raw)

    for s in range(3):
        ref = np.asarray(jax.jit(
            lambda v, e: model.apply(v, e, train=False)
        )(variables, evs[s]))[0]
        np.testing.assert_allclose(raw[s], ref, atol=1e-4)


def test_tail_every_cadence_matches_default():
    """tail_every=2 must produce raw == the cadence-1 server on fresh
    steps (state stays exact every step) and zeros + raw_fresh=False on
    skipped steps."""
    rng = np.random.default_rng(5)
    evs, pos, feat = _streams(rng, 2)
    model = DAGR(CFG, height=H, width=W)
    variables = model.init(jax.random.key(0), evs[0], train=False)

    srv1 = MultiStreamServer(CFG, H, W, n_streams=2, chunk=32,
                             search_mode="slab")
    srv2 = MultiStreamServer(CFG, H, W, n_streams=2, chunk=32,
                             search_mode="slab", tail_every=2)
    s1 = srv1.make_step(variables["params"], variables["batch_stats"])
    s2 = srv2.make_step(variables["params"], variables["batch_stats"])
    st1, st2 = srv1.init_state(), srv2.init_state()
    for i, c in enumerate(chunk_streams(pos, feat, 32)):
        st1, raw1, _ = s1(st1, *c)
        st2, raw2, info2 = s2(st2, *c)
        fresh = bool(info2["raw_fresh"])
        assert fresh == (i % 2 == 1)
        if fresh:
            np.testing.assert_allclose(
                np.asarray(raw2), np.asarray(raw1), atol=1e-6)
        else:
            assert not np.asarray(raw2).any()


@pytest.mark.parametrize("mode", ["slabv16p4", "slabvp4"])
def test_pol_payload_matches_gathered_conv1(mode):
    """Polarity-in-payload (algebraic conv1, round 5) must reproduce
    the gather-based server: identical edges + coverage, raw within the
    ~1 ulp of the algebraic px/py reconstruction.  Also pins the
    binary-feature certificate: a non-binary feat chunk must fail
    coverage_ok instead of silently corrupting conv1 inputs."""
    rng = np.random.default_rng(11)
    evs, pos, feat = _streams(rng, 2)
    model = DAGR(CFG, height=H, width=W)
    variables = model.init(jax.random.key(0), evs[0], train=False)

    kw = dict(search_mode="slab", queue_payload=PAYLOAD[mode],
              slab_pack=PACK[mode], chunk=32, n_streams=2)
    srv_p = MultiStreamServer(CFG, H, W, pol_payload=True, **kw)
    srv_g = MultiStreamServer(CFG, H, W, pol_payload=False, **kw)
    assert srv_p.pol_payload and not srv_g.pol_payload
    sp = srv_p.make_step(variables["params"], variables["batch_stats"],
                         debug=True)
    sg = srv_g.make_step(variables["params"], variables["batch_stats"],
                         debug=True)
    stp, stg = srv_p.init_state(), srv_g.init_state()
    for c in chunk_streams(pos, feat, 32):
        stp, raw_p, info_p = sp(stp, *c)
        stg, raw_g, info_g = sg(stg, *c)
        np.testing.assert_array_equal(
            np.asarray(info_p["nbr_vid"]), np.asarray(info_g["nbr_vid"]))
        np.testing.assert_array_equal(
            np.asarray(info_p["nbr_mask"]), np.asarray(info_g["nbr_mask"]))
        np.testing.assert_allclose(
            np.asarray(raw_p), np.asarray(raw_g), atol=1e-5)
    assert bool(info_p["coverage_ok"])

    # non-binary feat trips the certificate
    stp = srv_p.init_state()
    bad = feat.copy()
    bad[0, 5, 0] = 0.5
    for c in chunk_streams(pos, bad, 32):
        stp, _, info = sp(stp, *c)
    assert not bool(info["coverage_ok"])


def test_serve_chain_matches_stepwise():
    rng = np.random.default_rng(2)
    evs, pos, feat = _streams(rng, 2)
    model = DAGR(CFG, height=H, width=W)
    variables = model.init(jax.random.key(0), evs[0], train=False)

    srv = MultiStreamServer(CFG, H, W, n_streams=2, chunk=32)
    chunks = chunk_streams(pos, feat, 32)
    step = srv.make_step(variables["params"], variables["batch_stats"])
    st = srv.init_state()
    for c in chunks:
        st, raw_ref, _ = step(st, *c)

    chain = srv.make_chain(variables["params"], variables["batch_stats"],
                           n_steps=len(chunks))
    stacked = tuple(np.stack([c[j] for c in chunks]) for j in range(3))
    st2, raw_last, cover = chain(srv.init_state(), *stacked)
    assert bool(cover)
    np.testing.assert_allclose(
        np.asarray(raw_last), np.asarray(raw_ref), atol=1e-5)


@pytest.mark.parametrize("mode", ["queue", "slab", "slabv"])
def test_coverage_flag_fires_on_queue_overflow(mode):
    """More same-pixel events inside the dt window than the queue depth
    must trip the exactness certificate (the only loss mode of the
    fixed-depth design)."""
    n = 40
    pos = np.zeros((1, n, 3), np.int32)
    pos[0, :, 0] = 10
    pos[0, :, 1] = 10                       # all at one pixel
    pos[0, :, 2] = np.arange(n)             # all within dt
    feat = np.ones((1, n, 1), np.float32)

    model = DAGR(CFG, height=H, width=W)
    rng = np.random.default_rng(0)
    ev = random_events(rng, 1, CFG.n_nodes, width=W, height=H, n_valid=NV)
    variables = model.init(jax.random.key(0), ev, train=False)

    srv = MultiStreamServer(
        CFG, H, W, n_streams=1, chunk=20, queue_depth=4,
        search_mode="slab" if mode == "slabv" else mode,
        queue_payload="v" if mode == "slabv" else "vt")
    step = srv.make_step(variables["params"], variables["batch_stats"])
    st = srv.init_state()
    for c in chunk_streams(pos, feat, 20):
        st, _, info = step(st, *c)
    assert not bool(info["coverage_ok"])


def test_slabv_padded_and_empty_chunks_match_vt():
    """vid-only payload under padding: a tail-padded chunk AND a fully
    invalid mid-stream chunk must leave selection identical to the
    (vid, t)-payload slab engine — padding slots forward-fill the last
    real time so the t-ring stays monotone in vid order, which is what
    makes the vmin count an exact prefix split."""
    rng = np.random.default_rng(11)
    evs, pos, feat = _streams(rng, 2)
    model = DAGR(CFG, height=H, width=W)
    variables = model.init(jax.random.key(0), evs[0], train=False)

    C = 40                                  # 96 = 40 + 40 + 16(+24 pad)
    chunks = chunk_streams(pos, feat, C)
    empty = (np.zeros((2, C, 3), np.int32),
             np.zeros((2, C, feat.shape[-1]), np.float32),
             np.zeros((2, C), bool))
    seq = [chunks[0], empty, chunks[1], chunks[2]]

    raws = {}
    for payload in ("vt", "v"):
        srv = MultiStreamServer(CFG, H, W, n_streams=2, chunk=C,
                                search_mode="slab", queue_payload=payload)
        step = srv.make_step(variables["params"], variables["batch_stats"],
                             debug=True)
        st = srv.init_state()
        out = []
        for c in seq:
            st, raw, info = step(st, *c)
            out.append((np.asarray(raw), np.asarray(info["nbr_vid"]),
                        np.asarray(info["nbr_mask"])))
        assert bool(info["coverage_ok"])
        raws[payload] = out
    for (r1, n1, m1), (r2, n2, m2) in zip(raws["vt"], raws["v"]):
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_array_equal(np.where(m1, n1, 0),
                                      np.where(m2, n2, 0))
        np.testing.assert_allclose(r1, r2, atol=1e-6)


def test_v16_rebase_crossings_match_vt():
    """uint16 rebased payload: a long stream whose vid count crosses
    several rebase periods (P = NR here) must keep selection identical
    to the (vid, t) payload — the cond-gated subtract pass, the
    sentinel clamp, and the rel-space selection all exercised.  The
    per-stream event count (420) spans > 3 rebases at P = 128."""
    n = 420
    rng = np.random.default_rng(13)
    pos = np.zeros((2, n, 3), np.int32)
    feat = rng.random((2, n, 1)).astype(np.float32)
    for s in range(2):
        pos[s, :, 0] = rng.integers(0, W, n)
        pos[s, :, 1] = rng.integers(0, H, n)
        # spread times so the ring (128) always covers the dt window
        pos[s, :, 2] = np.cumsum(rng.integers(
            CFG.delta_t_us() // 48, CFG.delta_t_us() // 24, n))

    model = DAGR(CFG, height=H, width=W)
    ev = random_events(rng, 1, CFG.n_nodes, width=W, height=H, n_valid=NV)
    variables = model.init(jax.random.key(0), ev, train=False)

    recs = {}
    for payload in ("vt", "v16"):
        srv = MultiStreamServer(CFG, H, W, n_streams=2, chunk=32, ring=128,
                                search_mode="slab", queue_payload=payload)
        if payload == "v16":
            assert srv.P == 128 and n > 3 * srv.P
        step = srv.make_step(variables["params"], variables["batch_stats"],
                             debug=True)
        st = srv.init_state()
        out = []
        for c in chunk_streams(pos, feat, 32):
            st, raw, info = step(st, *c)
            out.append((np.asarray(info["nbr_vid"]),
                        np.asarray(info["nbr_mask"]), np.asarray(raw)))
        assert bool(np.asarray(st.coverage_ok))
        recs[payload] = out
    for (n1, m1, r1), (n2, m2, r2) in zip(recs["vt"], recs["v16"]):
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_array_equal(np.where(m1, n1, 0),
                                      np.where(m2, n2, 0))
        np.testing.assert_allclose(r1, r2, atol=1e-6)


def test_coverage_flag_fires_on_ring_overflow():
    """sort mode: evicting an event that is still inside some query's
    dt window must trip the certificate (its only loss mode)."""
    n = 200                                 # > ring (2 * chunk = 80)
    rng = np.random.default_rng(3)
    pos = np.zeros((1, n, 3), np.int32)
    pos[0, :, 0] = rng.integers(0, W, n)
    pos[0, :, 1] = rng.integers(0, H, n)
    pos[0, :, 2] = np.arange(n)             # all within dt of each other
    feat = np.ones((1, n, 1), np.float32)

    model = DAGR(CFG, height=H, width=W)
    ev = random_events(rng, 1, CFG.n_nodes, width=W, height=H, n_valid=NV)
    variables = model.init(jax.random.key(0), ev, train=False)

    srv = MultiStreamServer(CFG, H, W, n_streams=1, chunk=40, ring=80,
                            search_mode="sort")
    step = srv.make_step(variables["params"], variables["batch_stats"])
    st = srv.init_state()
    for c in chunk_streams(pos, feat, 40):
        st, _, info = step(st, *c)
    assert not bool(info["coverage_ok"])


@pytest.mark.parametrize("te", [1, 2])
def test_chain_decode_matches_step_detect(te):
    """decode=True chains the full detect (decode+NMS) path on fresh
    steps; its last output must equal detect() applied to the stepwise
    raw (and zeros on a skipped tail_every step)."""
    from dagr_tpu.models.dagr import detect

    rng = np.random.default_rng(7)
    evs, pos, feat = _streams(rng, 2)
    model = DAGR(CFG, height=H, width=W)
    variables = model.init(jax.random.key(0), evs[0], train=False)

    srv = MultiStreamServer(CFG, H, W, n_streams=2, chunk=32,
                            search_mode="slab", queue_payload="v",
                            tail_every=te)
    chunks = chunk_streams(pos, feat, 32)
    step = srv.make_step(variables["params"], variables["batch_stats"])
    st = srv.init_state()
    for c in chunks:
        st, raw_ref, info = step(st, *c)

    chain = srv.make_chain(variables["params"], variables["batch_stats"],
                           n_steps=len(chunks), decode=True)
    stacked = tuple(np.stack([c[j] for c in chunks]) for j in range(3))
    _, (boxes, scores), cover = chain(srv.init_state(), *stacked)
    assert bool(cover)
    last_fresh = (len(chunks) - 1) % te == te - 1
    if last_fresh:
        det = detect(np.asarray(raw_ref), CFG, H, W)
        np.testing.assert_allclose(np.asarray(boxes),
                                   np.asarray(det["boxes"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(scores),
                                   np.asarray(det["scores"]), atol=1e-5)
    else:
        assert not np.asarray(scores).any()


def test_sharded_serving_matches_global():
    """SPMD serving: 8 streams sharded 1-per-device over the virtual
    mesh must reproduce the single-device 8-stream server (same
    stream-major layout, zero data-path collectives) with the
    coverage certificate all-reduced."""
    from jax.sharding import NamedSharding
    from dagr_tpu.parallel.mesh import (
        make_mesh, serve_state_spec, shard_serve_step)

    n = 8
    rng = np.random.default_rng(21)
    evs, pos, feat = _streams(rng, n)
    model = DAGR(CFG, height=H, width=W)
    variables = model.init(jax.random.key(0), evs[0], train=False)
    kw = dict(search_mode="slab", queue_payload="v", chunk=32)

    srv_g = MultiStreamServer(CFG, H, W, n_streams=n, **kw)
    step_g = srv_g.make_step(variables["params"], variables["batch_stats"])
    st_g = srv_g.init_state()

    mesh = make_mesh(n)
    srv_l = MultiStreamServer(CFG, H, W, n_streams=1, **kw)
    step_s = shard_serve_step(srv_l, mesh)
    st_s = jax.device_put(
        srv_g.init_state(),
        jax.tree.map(lambda s: NamedSharding(mesh, s),
                     serve_state_spec(srv_g.init_state())))

    for c in chunk_streams(pos, feat, 32):
        st_g, raw_g, info_g = step_g(st_g, *c)
        st_s, raw_s, ok = step_s(
            variables["params"], variables["batch_stats"], st_s, *c)
    assert bool(info_g["coverage_ok"]) and bool(ok)
    np.testing.assert_allclose(
        np.asarray(raw_s), np.asarray(raw_g), atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["slab", "slabv", "slabv16p8"])
def test_serve_edges_match_builder_flagship_scale(mode):
    """Serve-vs-builder bit-identity at flagship geometry (320x240,
    K=16, radius 4 -> 81 spiral cells, thousands of events per stream)
    — the toy-geometry edge tests plus the bench coverage certificate
    were the only scale evidence before (round-3 verdict, weak item 6).
    Each chunk's selection is pinned to build_graph on the event prefix
    (identical queue state; selection contract ev_graph.cu:48-77)."""
    from dagr_tpu.config import DagrConfig

    cfg = DagrConfig()                       # flagship defaults
    Wf, Hf = 320, 240
    nv, chunk = 4096, 1024
    rng = np.random.default_rng(23)
    evs = [random_events(rng, 1, cfg.n_nodes, width=Wf, height=Hf,
                         n_valid=nv) for _ in range(2)]
    pos = np.stack([np.asarray(e.pos_px()[0])[:nv] for e in evs])
    feat = np.stack([np.asarray(e.feat[0])[:nv] for e in evs])

    model = DAGR(cfg, height=Hf, width=Wf)
    variables = model.init(jax.random.key(0), evs[0], train=False)
    srv = MultiStreamServer(
        cfg, Hf, Wf, n_streams=2, chunk=chunk, search_mode="slab",
        queue_payload=PAYLOAD.get(mode, "vt"),
        slab_pack=PACK.get(mode, 1))
    step = srv.make_step(variables["params"], variables["batch_stats"],
                         debug=True)
    st = srv.init_state()
    refs = []
    for s in range(2):
        g = build_graph(
            pos[s:s + 1], np.ones((1, nv), bool), width=Wf, height=Hf,
            radius=cfg.radius_px(Wf), delta_t_us=cfg.delta_t_us(),
            max_neighbors=cfg.max_neighbors,
            queue_size=cfg.max_queue_size)
        refs.append((np.asarray(g.nbr[0]), np.asarray(g.nbr_mask[0])))

    for k, c in enumerate(chunk_streams(pos, feat, chunk)):
        st, _, info = step(st, *c)
        assert bool(info["coverage_ok"])
        nbr = np.asarray(info["nbr_vid"])
        mask = np.asarray(info["nbr_mask"])
        for s in range(2):
            ref_nbr = refs[s][0][chunk * k:chunk * (k + 1)]
            ref_mask = refs[s][1][chunk * k:chunk * (k + 1)]
            np.testing.assert_array_equal(mask[s], ref_mask)
            np.testing.assert_array_equal(
                np.where(ref_mask, nbr[s], 0),
                np.where(ref_mask, ref_nbr, 0))


def _long_stream(rng, n_streams, n_windows):
    """Concatenate n_windows of NV events per stream with monotone
    times (the lockstep serving contract for infinite streams)."""
    pos_w, feat_w = [], []
    for w in range(n_windows):
        evs = [random_events(rng, 1, CFG.n_nodes, width=W, height=H,
                             n_valid=NV) for _ in range(n_streams)]
        p = np.stack([np.asarray(e.pos_px()[0])[:NV] for e in evs]).copy()
        p[..., 2] += np.int32(w * CFG.time_window_us)
        pos_w.append(p)
        feat_w.append(np.stack([np.asarray(e.feat[0])[:NV] for e in evs]))
    return np.concatenate(pos_w, axis=1), np.concatenate(feat_w, axis=1)


@pytest.mark.parametrize("mode", ["sort", "slabvp4", "slabvp8"])
def test_ring_window_matches_engine_ring(mode):
    """window_mode='ring' (sliding capacity window, incremental
    eviction accounting) must reproduce the single-stream engine's ring
    mode (the full-store recompute oracle, engine.py ring branch) on a
    stream that wraps the capacity several times.  Capacity eviction
    may drop in-dt events (the reference's delete_nodes does too,
    ev_graph.py:121-136) — equality is the contract here, coverage_ok
    merely reports whether the dt window was fully covered."""
    from dagr_tpu.streaming.engine import StreamingDetector, chunk_events

    rng = np.random.default_rng(13)
    pos, feat = _long_stream(rng, 1, 3)           # 288 events > ring 128
    model = DAGR(CFG, height=H, width=W)
    ev = random_events(rng, 1, CFG.n_nodes, width=W, height=H, n_valid=NV)
    variables = model.init(jax.random.key(0), ev, train=False)

    eng = StreamingDetector(CFG, H, W, chunk=32, count_flops=False,
                            window_mode="ring")
    est = eng.init_state()
    estep = eng.make_step(variables["params"], variables["batch_stats"])

    srv = MultiStreamServer(CFG, H, W, n_streams=1, chunk=32,
                            ring=CFG.n_nodes, window_mode="ring",
                            search_mode="slab" if mode != "sort" else "sort",
                            queue_payload=PAYLOAD.get(mode, "vt"),
                            slab_pack=PACK.get(mode, 1))
    sst = srv.init_state()
    sstep = srv.make_step(variables["params"], variables["batch_stats"])

    wrapped = False
    for c in chunk_streams(pos, feat, 32):
        est, raw_e, _ = estep(est, c[0][0], c[1][0], c[2][0])
        sst, raw_s, _ = sstep(sst, *c)
        if int(np.asarray(sst.num)) > CFG.n_nodes:
            wrapped = True
        np.testing.assert_allclose(
            np.asarray(raw_s), np.asarray(raw_e), atol=1e-4)
    assert wrapped                                # eviction really ran


@pytest.mark.parametrize("mode", ["sort", "slabv", "slabvp4"])
def test_ring_window_matches_grow_below_capacity(mode):
    """While the stream fits the capacity, ring mode's incremental
    eviction bookkeeping must be a no-op: raw == grow mode exactly,
    every step, any search mode (slabvp4 = the packed 'v' payload the
    serving-bench ring leg runs)."""
    rng = np.random.default_rng(17)
    evs, pos, feat = _streams(rng, 2)
    model = DAGR(CFG, height=H, width=W)
    variables = model.init(jax.random.key(0), evs[0], train=False)

    kw = dict(search_mode="slab" if mode.startswith("slabv") else mode,
              queue_payload=PAYLOAD.get(mode, "vt"),
              slab_pack=PACK.get(mode, 1),
              n_streams=2, chunk=32, ring=128)
    srv_g = MultiStreamServer(CFG, H, W, **kw)
    srv_r = MultiStreamServer(CFG, H, W, window_mode="ring", **kw)
    sg = srv_g.make_step(variables["params"], variables["batch_stats"])
    sr = srv_r.make_step(variables["params"], variables["batch_stats"])
    stg, str_ = srv_g.init_state(), srv_r.init_state()
    for c in chunk_streams(pos, feat, 32):      # 96 events < 128 slots
        stg, raw_g, info_g = sg(stg, *c)
        str_, raw_r, info_r = sr(str_, *c)
        np.testing.assert_allclose(
            np.asarray(raw_r), np.asarray(raw_g), atol=1e-6)
    assert bool(info_g["coverage_ok"]) and bool(info_r["coverage_ok"])


def test_sort_mode_queue_cap_matches_builder():
    """Force a pixel past max_queue_size so the cond-guarded cap path
    executes, and pin it to the sync builder's selection.

    When the cap BINDS, batch and streaming sequencing genuinely
    differ in the reference too: the batch path (graph/utils.py:6-18)
    inserts the WHOLE window before searching, so the newest-Q window
    is relative to the final queue, while the streaming path
    (ev_graph.py:62-103) inserts chunk-by-chunk.  Serve implements the
    streaming semantics, so each chunk is pinned against the builder
    run on the event PREFIX up to that chunk (identical queue state)."""
    cfg = CFG.replace(max_queue_size=4)
    n = 64
    rng = np.random.default_rng(4)
    pos = np.zeros((1, n, 3), np.int32)
    pos[0, :, 0] = rng.integers(0, 4, n)     # hot 4x3 pixel patch
    pos[0, :, 1] = rng.integers(0, 3, n)
    pos[0, :, 2] = np.sort(rng.integers(0, 4000, n))
    feat = np.ones((1, n, 1), np.float32)

    model = DAGR(cfg, height=H, width=W)
    ev = random_events(rng, 1, cfg.n_nodes, width=W, height=H, n_valid=NV)
    variables = model.init(jax.random.key(0), ev, train=False)

    srv = MultiStreamServer(cfg, H, W, n_streams=1, chunk=16,
                            search_mode="sort")
    step = srv.make_step(variables["params"], variables["batch_stats"],
                         debug=True)
    st = srv.init_state()
    for k, c in enumerate(chunk_streams(pos, feat, 16)):
        st, _, info = step(st, *c)
        assert bool(info["coverage_ok"])
        nbr = np.asarray(info["nbr_vid"])[0]
        mask = np.asarray(info["nbr_mask"])[0]

        hi = 16 * (k + 1)
        g = build_graph(
            pos[:, :hi], np.ones((1, hi), bool), width=W, height=H,
            radius=cfg.radius_px(W), delta_t_us=cfg.delta_t_us(),
            max_neighbors=cfg.max_neighbors,
            queue_size=cfg.max_queue_size)
        ref_nbr = np.asarray(g.nbr[0])[16 * k:]
        ref_mask = np.asarray(g.nbr_mask[0])[16 * k:]
        np.testing.assert_array_equal(mask, ref_mask)
        np.testing.assert_array_equal(
            np.where(ref_mask, nbr, 0), np.where(ref_mask, ref_nbr, 0))
