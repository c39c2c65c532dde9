"""Synchronous DSEC-Det evaluation: mAP after 1 image + 50 ms events.

CLI mirror of the reference scripts/run_test.py:20-66 — loads a
checkpoint's EMA weights, runs the sync eval pass, prints the COCO
metrics with Prophesee +-50 ms matching.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

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


def main():
    argv = [a for a in sys.argv[1:] if a != "--visualize"]
    cfg = parse_flags(argv)
    np.random.seed(42)
    ds = DSEC(Path(cfg.dataset_directory), "test",
              transform=Augmentations.testing(),
              min_bbox_diag=15, min_bbox_height=10)
    H, W = ds.height, ds.width
    loader = Loader(ds, cfg.batch_size, cfg.n_nodes,
                    with_images=cfg.use_image)

    model = DAGR(cfg, height=H, width=W)
    tx, _ = make_optimizer(cfg, num_iters_per_epoch=1)
    sample = next(iter(Loader(ds, 1, cfg.n_nodes, with_images=cfg.use_image)))
    state = init_state(model, cfg, tx, jax.random.key(0), sample[0])

    # .pth checkpoints load through the torch converter (dagr_s_50.pth
    # parity path), everything else through orbax
    state, loaded = load_eval_checkpoint(state, cfg)
    if loaded:
        print(f"loaded checkpoint from {cfg.checkpoint}")

    buf, dets = run_test(loader, model, state, cfg, H, W, ds.classes,
                         compile_detections=True)
    metrics = buf.compute()
    print({k: round(v, 4) for k, v in metrics.items()})

    if cfg.output_directory and "--visualize" in sys.argv:
        # render detections over events (reference:
        # utils/testing.py:16-55, run_test_with_visualization)
        import cv2

        from dagr_tpu.visualization.viz import render_detections_on_sample

        out = Path(cfg.output_directory) / "viz"
        out.mkdir(parents=True, exist_ok=True)
        for i, det in enumerate(dets[:100]):
            img = render_detections_on_sample(ds[i], det,
                                              class_names=ds.classes)
            cv2.imwrite(str(out / f"{i:06d}.png"),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        print(f"wrote visualizations to {out}")


if __name__ == "__main__":
    main()
