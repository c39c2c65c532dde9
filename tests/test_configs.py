"""Every shipped model config must build and run a forward pass.
The reference's size ladder differs only in width multipliers
(reference: config/dagr-{n,s,m,l}-dsec.yaml); a user switching sizes
must not hit shape breakage."""
from pathlib import Path

import jax
import numpy as np
import pytest

from dagr_tpu.config import config_from_yaml
from dagr_tpu.data.synthetic import random_events
from dagr_tpu.models.dagr import DAGR

CONFIG_DIR = Path(__file__).parent.parent / "config"
YAMLS = sorted(CONFIG_DIR.glob("*.yaml"))


@pytest.mark.parametrize("yaml_path", YAMLS, ids=lambda p: p.stem)
def test_config_forward(yaml_path):
    # keep the YAML's width multipliers / scales; shrink only runtime
    # size knobs so the forward stays cheap
    cfg = config_from_yaml(yaml_path, n_nodes=256, max_neighbors=8,
                           batch_size=1, node_chunk=256)
    W, H = 64, 48
    model = DAGR(cfg, height=H, width=W)
    rng = np.random.default_rng(0)
    ev = random_events(rng, 1, cfg.n_nodes, width=W, height=H, n_valid=200)
    variables = model.init(jax.random.key(0), ev, train=False)
    raw = model.apply(variables, ev, train=False)
    hw = cfg.grid_shapes()[-cfg.num_scales:]
    A = sum(ny * nx for ny, nx in hw)
    assert raw.shape == (1, A, 5 + cfg.num_classes), yaml_path.name
    assert bool(np.isfinite(np.asarray(raw)).all()), yaml_path.name
