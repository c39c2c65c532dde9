"""Inter-frame streaming evaluation: mAP vs latency offset over
0..50 ms with linearly interpolated ground truth.

CLI mirror of the reference scripts/run_test_interframe.py:48-92 —
sweeps ``num_us`` over ``num_interframe_steps`` window lengths, uses
only-perfect-tracks sequences, exports per-sequence detection .npy
files for the visualizer.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import json

import jax
import numpy as np

from dagr_tpu.config import parse_flags
from dagr_tpu.data.augment import Augmentations
from dagr_tpu.data.dsec import DSEC
from dagr_tpu.data.loader import Loader
from dagr_tpu.models.dagr import DAGR
from dagr_tpu.train.checkpoint import load_eval_checkpoint
from dagr_tpu.train.harness import run_test
from dagr_tpu.train.state import init_state, make_optimizer

DET_DTYPE = [("t", "<u8"), ("x", "<f4"), ("y", "<f4"), ("w", "<f4"),
             ("h", "<f4"), ("class_id", "u1"), ("class_confidence", "<f4")]


def save_detections(out_dir, dataset, detections):
    """Per-sequence detections_<seq>.npy (reference:
    run_test_interframe.py:34-45)."""
    by_seq = {}
    i = 0
    for seq in dataset.sequences:
        pairs = dataset.image_index_pairs[seq.name]
        for (i0, _) in pairs:
            if i >= len(detections):
                break
            det = detections[i]
            t = int(seq.timestamps[i0]) + max(dataset.num_us, 0)
            rows = np.zeros(len(det["boxes"]), DET_DTYPE)
            b = det["boxes"]
            rows["t"] = t
            rows["x"], rows["y"] = b[:, 0], b[:, 1]
            rows["w"], rows["h"] = b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]
            rows["class_id"] = det["labels"]
            rows["class_confidence"] = det["scores"]
            by_seq.setdefault(seq.name, []).append(rows)
            i += 1
    for name, rows in by_seq.items():
        np.save(Path(out_dir) / f"detections_{name}.npy", np.concatenate(rows))


def main():
    cfg = parse_flags()
    np.random.seed(42)
    ds = DSEC(Path(cfg.dataset_directory), "test",
              transform=Augmentations.testing(),
              min_bbox_diag=15, min_bbox_height=10,
              only_perfect_tracks=True, no_eval=cfg.no_eval)
    H, W = ds.height, ds.width
    model = DAGR(cfg, height=H, width=W)
    tx, _ = make_optimizer(cfg, num_iters_per_epoch=1)
    sample = next(iter(Loader(ds, 1, cfg.n_nodes, with_images=cfg.use_image)))
    state = init_state(model, cfg, tx, jax.random.key(0), sample[0])
    # .pth loads through the torch converter, else orbax
    state, _ = load_eval_checkpoint(state, cfg)

    out_dir = Path(cfg.output_directory)
    out_dir.mkdir(parents=True, exist_ok=True)
    sweep = {}
    for n_us in np.linspace(0, 50_000, cfg.num_interframe_steps):
        ds.set_num_us(int(n_us))
        loader = Loader(ds, cfg.batch_size, cfg.n_nodes,
                        with_images=cfg.use_image, drop_last=False)
        buf, dets = run_test(loader, model, state, cfg, H, W, ds.classes,
                             compile_detections=True)
        if not cfg.no_eval:
            metrics = buf.compute()
            sweep[int(n_us)] = metrics
            print(f"num_us={int(n_us)}: {metrics}")
        save_detections(out_dir, ds, dets)
    (out_dir / "interframe_sweep.json").write_text(json.dumps(sweep, indent=2))


if __name__ == "__main__":
    main()
