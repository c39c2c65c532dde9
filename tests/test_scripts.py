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
