"""End-to-end CLI script tests on a fabricated DSEC dataset."""
import sys

import numpy as np
import pytest

from test_data import make_dsec_sequence

TINY_FLAGS = [
    "--n_nodes", "256", "--max_neighbors", "8", "--node_chunk", "256",
    "--radius", "0.05", "--batch_size", "2", "--tot_num_epochs", "1",
]


@pytest.fixture
def dsec_env(tmp_path, monkeypatch):
    split = make_dsec_sequence(tmp_path, "zurich_city_99_x", n_images=5)
    # point the package split config at our fabricated split
    import dagr_tpu.data.dsec as dsec_mod

    orig = dsec_mod.DSEC.__init__

    def patched(self, root, split_name, *a, **kw):
        kw["split_yaml"] = split
        return orig(self, root, "train", *a, **kw)

    monkeypatch.setattr(dsec_mod.DSEC, "__init__", patched)
    return tmp_path


def run_script(monkeypatch, module_name, argv):
    import importlib
    from pathlib import Path

    scripts_dir = str(Path(__file__).parent.parent / "scripts")
    if scripts_dir not in sys.path:
        sys.path.insert(0, scripts_dir)
    monkeypatch.setattr(sys, "argv", [module_name] + argv)
    mod = importlib.import_module(module_name)
    mod.main()


def test_train_script_one_epoch(dsec_env, tmp_path, monkeypatch):
    out = tmp_path / "logs"
    run_script(monkeypatch, "train_dsec", TINY_FLAGS + [
        "--dataset_directory", str(dsec_env),
        "--output_directory", str(out),
    ])
    run_dir = out / "low_latency-dsec-detection" / "default"
    assert (run_dir / "hparams.json").exists()
    assert (run_dir / "metrics.jsonl").exists()
    assert (run_dir / "last_model").exists()
    # validation bbox overlays written during the epoch-0 eval
    # (reference: utils/logging.py:119-211 wandb image logging)
    viz = sorted((run_dir / "viz_epoch_0").glob("*.png"))
    assert viz, "no bbox-overlay images written during validation"


def test_run_test_script(dsec_env, tmp_path, monkeypatch, capsys):
    run_script(monkeypatch, "run_test", TINY_FLAGS + [
        "--dataset_directory", str(dsec_env),
    ])
    out = capsys.readouterr().out
    assert "mAP" in out


def test_run_test_with_reference_pth(dsec_env, tmp_path, monkeypatch,
                                     capsys):
    """Day-one parity rehearsal for dagr_s_50.pth (reference:
    readme.md:66-76): a fabricated reference-style torch checkpoint
    must flow through --checkpoint -> converter -> run_test CLI, and
    the harness detections must be identical to the direct flax
    forward with the converted trees."""
    import jax
    import torch
    from pathlib import Path

    from test_torch_import import fake_state_dict_from_tree

    from dagr_tpu.config import DagrConfig
    from dagr_tpu.data.augment import Augmentations
    from dagr_tpu.data.dsec import DSEC
    from dagr_tpu.data.loader import Loader
    from dagr_tpu.models.dagr import DAGR, detect
    from dagr_tpu.models.torch_import import convert_backbone_head
    from dagr_tpu.train.checkpoint import load_eval_checkpoint
    from dagr_tpu.train.harness import detections_to_list
    from dagr_tpu.train.harness import run_test as run_test_h
    from dagr_tpu.train.state import init_state, make_optimizer

    cfg = DagrConfig(n_nodes=256, max_neighbors=8, node_chunk=256,
                     radius=0.05, batch_size=2)
    ds = DSEC(Path(dsec_env), "test", transform=Augmentations.testing(),
              min_bbox_diag=15, min_bbox_height=10)
    H, W = ds.height, ds.width
    model = DAGR(cfg, height=H, width=W)
    loader = Loader(ds, cfg.batch_size, cfg.n_nodes)
    sample = next(iter(loader))
    variables = model.init(jax.random.key(0), sample[0], train=False)
    sd = fake_state_dict_from_tree(
        jax.tree.map(np.asarray, variables["params"]),
        jax.tree.map(np.asarray, variables["batch_stats"]))
    # tame the unit-normal fabricated weights: the YOLOX decode
    # exponentiates regressions, and trained-scale weights keep the
    # rehearsal outputs finite (dagr_s_50.pth weights are O(0.1))
    sd = {k: (v if k.endswith("running_var") else v * 0.05)
          for k, v in sd.items()}
    sd_torch = {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}
    path = tmp_path / "dagr_fake_50.pth"
    torch.save({"ema": sd_torch, "model": {}, "epoch": 50}, path)

    # 1) the CLI end to end with --checkpoint <pth>
    run_script(monkeypatch, "run_test", TINY_FLAGS + [
        "--dataset_directory", str(dsec_env), "--checkpoint", str(path)])
    out = capsys.readouterr().out
    assert "loaded checkpoint" in out and "mAP" in out

    # 2) harness detections == direct flax forward on converted trees
    tx, _ = make_optimizer(cfg, num_iters_per_epoch=1)
    state = init_state(model, cfg, tx, jax.random.key(1), sample[0])
    state, loaded = load_eval_checkpoint(
        state, cfg.replace(checkpoint=str(path)))
    assert loaded
    _, dets = run_test_h(loader, model, state, cfg, H, W, ds.classes,
                         compile_detections=True)
    p, s = convert_backbone_head(sd, num_scales=cfg.num_scales)
    raw = model.apply({"params": p, "batch_stats": s}, sample[0],
                      train=False)
    ref = detections_to_list({
        k: np.asarray(v) for k, v in detect(raw, cfg, H, W).items()})
    for got, want in zip(dets[:len(ref)], ref):
        for k in want:
            # rtol covers jit-vs-eager float association in the decode
            np.testing.assert_allclose(got[k], want[k],
                                       rtol=1e-4, atol=1e-4)


def test_interframe_script(dsec_env, tmp_path, monkeypatch):
    out = tmp_path / "if_out"
    run_script(monkeypatch, "run_test_interframe", TINY_FLAGS + [
        "--dataset_directory", str(dsec_env),
        "--output_directory", str(out),
        "--num_interframe_steps", "2",
    ])
    assert (out / "interframe_sweep.json").exists()
    assert list(out.glob("detections_*.npy"))


def test_count_flops_script(dsec_env, tmp_path, monkeypatch, capsys):
    run_script(monkeypatch, "count_flops", TINY_FLAGS + [
        "--dataset_directory", str(dsec_env),
        "--output_directory", str(tmp_path / "fl"),
        "--num_samples", "1", "--check_consistency",
    ])
    out = capsys.readouterr().out
    assert "OK" in out          # sync<->streaming consistency passed
    assert "total" in out


def test_train_ncaltech_script(tmp_path, monkeypatch):
    from test_data import make_ncaltech

    make_ncaltech(tmp_path, n_classes=2, n_files=2)
    # the script expects training/validation splits
    import shutil

    # annotations dir is shared across splits (load_dir/../annotations)
    shutil.copytree(tmp_path / "training", tmp_path / "validation")
    out = tmp_path / "logs"
    run_script(monkeypatch, "train_ncaltech101", TINY_FLAGS + [
        "--dataset", "ncaltech101",
        "--dataset_directory", str(tmp_path),
        "--output_directory", str(out),
        "--num_scales", "1",
    ])
    run_dir = out / "low_latency-ncaltech101-detection" / "default"
    assert (run_dir / "last_model").exists()
    assert sorted((run_dir / "viz_epoch_0").glob("*.png")), \
        "no bbox-overlay images written during validation"


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from dagr_tpu.train.checkpoint import Checkpointer

    state = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 2))}}
    ck = Checkpointer(tmp_path)
    ck.checkpoint(state, epoch=3)
    assert ck.process({"mAP": 0.5}, 3, state)
    assert not ck.process({"mAP": 0.4}, 4, state)

    restored, epoch = ck.restore_if_existing(state)
    assert epoch == 4
    np.testing.assert_allclose(np.asarray(restored["a"]), np.arange(5.0))
    best, _ = ck.restore_if_existing(state, best=True)
    assert best is not None
    ck2 = Checkpointer(tmp_path)
    assert ck2.best_map == 0.5
