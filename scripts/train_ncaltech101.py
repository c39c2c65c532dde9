"""Train DAGR on N-Caltech101 (classification-as-detection).

CLI mirror of the reference scripts/train_ncaltech101.py: same recipe
as DSEC training with the ncaltech dataset/config (events only,
num_scales=1).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import numpy as np

from dagr_tpu.config import parse_flags
from dagr_tpu.data.augment import Augmentations
from dagr_tpu.data.loader import Loader
from dagr_tpu.data.ncaltech101 import NCaltech101
from dagr_tpu.models.dagr import DAGR
from dagr_tpu.train.checkpoint import Checkpointer
from dagr_tpu.train.harness import run_test, train_epoch
from dagr_tpu.train.state import init_state, make_optimizer, make_train_step
from dagr_tpu.utils.logging import MetricLogger, log_hparams, set_up_logging_directory


def main():
    cfg = parse_flags()
    np.random.seed(42)
    out_dir = set_up_logging_directory(
        cfg.dataset, cfg.task, cfg.output_directory, exp_name=cfg.exp_name)
    log_hparams(cfg, out_dir)
    logger = MetricLogger(out_dir)

    root = Path(cfg.dataset_directory)
    aug = Augmentations.training(cfg.aug_p_flip, cfg.aug_zoom, cfg.aug_trans)
    train_ds = NCaltech101(root, "training", transform=aug,
                           num_events=cfg.n_nodes)
    val_ds = NCaltech101(root, "validation",
                         transform=Augmentations.testing(),
                         num_events=cfg.n_nodes)
    H, W = train_ds.height, train_ds.width

    train_loader = Loader(train_ds, cfg.batch_size, cfg.n_nodes, shuffle=True)
    val_loader = Loader(val_ds, cfg.batch_size, cfg.n_nodes)

    model = DAGR(cfg, height=H, width=W)
    tx, _ = make_optimizer(cfg, num_iters_per_epoch=max(len(train_loader), 1))
    sample = next(iter(Loader(val_ds, 1, cfg.n_nodes)))
    state = init_state(model, cfg, tx, jax.random.key(0), sample[0])
    step = jax.jit(make_train_step(model, cfg, tx, H))

    ckpt = Checkpointer(out_dir)
    restored, start_epoch = ckpt.restore_if_existing(state)
    if restored is not None:
        state = restored

    classes = tuple(train_ds.classes)
    for epoch in range(start_epoch, cfg.tot_num_epochs):
        state, _ = train_epoch(train_loader, state, step, logger)
        ckpt.checkpoint(state, epoch, name="last_model")
        if epoch % 3 > 0:
            continue
        buf, dets = run_test(val_loader, model, state, cfg, H, W, classes,
                             compile_detections=True)
        metrics = buf.compute()
        logger.log({f"validation/metric/{k}": v for k, v in metrics.items()},
                   step=int(state.step))
        print(f"epoch {epoch}: {metrics}")
        ckpt.process(metrics, epoch, state)
        # bbox-overlay logging during validation (reference logs these
        # to wandb, utils/logging.py:119-211; here they land on disk)
        if cfg.n_viz_images > 0:
            import cv2

            from dagr_tpu.visualization.viz import render_detections_on_sample

            viz_dir = out_dir / f"viz_epoch_{epoch}"
            viz_dir.mkdir(parents=True, exist_ok=True)
            for i, det in enumerate(dets[:cfg.n_viz_images]):
                img = render_detections_on_sample(val_ds[i], det,
                                                  class_names=classes)
                cv2.imwrite(str(viz_dir / f"{i:06d}.png"),
                            cv2.cvtColor(img, cv2.COLOR_RGB2BGR))


if __name__ == "__main__":
    main()
