"""Multi-stream serving: the vmapped engine must equal independent
per-stream runs."""
import jax
import numpy as np

from dagr_tpu.config import DagrConfig
from dagr_tpu.data.synthetic import random_events
from dagr_tpu.models.dagr import DAGR
from dagr_tpu.streaming.engine import StreamingDetector, chunk_events

W, H = 64, 48
CFG = DagrConfig(n_nodes=128, max_neighbors=8, batch_size=1,
                 node_chunk=256, radius=0.05)


def test_multistream_matches_independent():
    model = DAGR(CFG, height=H, width=W)
    rng = np.random.default_rng(0)
    evs = [random_events(rng, 1, CFG.n_nodes, width=W, height=H, n_valid=96)
           for _ in range(3)]
    variables = model.init(jax.random.key(0), evs[0], train=False)

    eng = StreamingDetector(CFG, H, W, chunk=32, count_flops=False)
    # independent runs
    singles = []
    step1 = eng.make_step(variables["params"], variables["batch_stats"])
    for ev in evs:
        st = eng.init_state()
        pos_px = np.asarray(ev.pos_px()[0])[:96]
        feat = np.asarray(ev.feat[0])[:96]
        for c in chunk_events(pos_px, feat, 32):
            st, raw, _ = step1(st, *c)
        singles.append(np.asarray(raw))

    # vmapped over 3 streams
    stepN = eng.make_step_multistream(
        variables["params"], variables["batch_stats"])
    states = eng.init_states(3)
    per_stream = []
    for ev in evs:
        pos_px = np.asarray(ev.pos_px()[0])[:96]
        feat = np.asarray(ev.feat[0])[:96]
        per_stream.append(chunk_events(pos_px, feat, 32))
    raw = None
    for j in range(len(per_stream[0])):
        p = np.stack([cs[j][0] for cs in per_stream])
        f = np.stack([cs[j][1] for cs in per_stream])
        v = np.stack([cs[j][2] for cs in per_stream])
        states, raw, _ = stepN(states, p, f, v)
    raw = np.asarray(raw)
    for s in range(3):
        np.testing.assert_allclose(raw[s], singles[s], atol=1e-5)
