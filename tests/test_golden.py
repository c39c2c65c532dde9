"""Golden-value regression pin: fixed seeds + fixed input -> recorded
model output statistics.  Catches accidental numeric drift in future
refactors (there is no reference checkpoint in this environment to
compare against, so we pin our own numerics; recorded on CPU,
2026-08-16, round 1)."""
import jax
import numpy as np

from dagr_tpu.config import DagrConfig
from dagr_tpu.data.synthetic import random_events
from dagr_tpu.models.dagr import DAGR

GOLDEN_SUM = 0.5753729939460754
GOLDEN_ABSMAX = 0.0531671904027462


def test_model_numerics_pinned():
    cfg = DagrConfig(n_nodes=128, max_neighbors=8, node_chunk=256,
                     radius=0.05)
    model = DAGR(cfg, height=48, width=64)
    rng = np.random.default_rng(123)
    ev = random_events(rng, 1, cfg.n_nodes, width=64, height=48, n_valid=100)
    v = model.init(jax.random.key(7), ev, train=False)
    raw = np.asarray(model.apply(v, ev, train=False))
    np.testing.assert_allclose(float(raw.sum()), GOLDEN_SUM, rtol=1e-4)
    np.testing.assert_allclose(float(np.abs(raw).max()), GOLDEN_ABSMAX,
                               rtol=1e-4)
