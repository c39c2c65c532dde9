"""Train DAGR on DSEC-Det.

CLI mirror of the reference entry point
(reference: scripts/train_dsec.py:103-184): YAML+CLI config, augmented
train/val loaders, AdamW + sqrt-batch LR + YOLOX schedule, EMA,
checkpointing with best-mAP tracking, eval every 3 epochs, dry-run
smoke eval before training.  Data parallelism over all local devices
is new TPU capability (--dp N).
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
from dagr_tpu.parallel.mesh import make_mesh, put_batch, put_replicated, shard_train_step
from dagr_tpu.train.checkpoint import Checkpointer
from dagr_tpu.train.harness import run_test, train_epoch
from dagr_tpu.train.state import (
    init_state, make_optimizer, make_train_step, make_train_step_fusion,
)
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
    train_ds = DSEC(root, "train", transform=aug,
                    min_bbox_diag=15, min_bbox_height=10)
    val_ds = DSEC(root, "val", transform=Augmentations.testing(),
                  min_bbox_diag=15, min_bbox_height=10)
    H, W = train_ds.height, train_ds.width

    train_loader = Loader(train_ds, cfg.batch_size, cfg.n_nodes,
                          shuffle=True, with_images=cfg.use_image,
                          with_bbox0=cfg.use_image)
    val_loader = Loader(val_ds, cfg.batch_size, cfg.n_nodes,
                        with_images=cfg.use_image)

    model = DAGR(cfg, height=H, width=W)
    # pretrained + frozen image trunk (reference: dagr.py:32-35,
    # init_subnetwork with freeze=True on backbone.net)
    frozen = ("cnn",) if (cfg.use_image and cfg.img_net_checkpoint) else ()
    tx, _ = make_optimizer(cfg, num_iters_per_epoch=max(len(train_loader), 1),
                           frozen_paths=frozen)

    sample = next(iter(Loader(val_ds, 1, cfg.n_nodes,
                              with_images=cfg.use_image)))
    if cfg.use_image:
        state = init_state(model, cfg, tx, jax.random.key(0), sample[0],
                           sample_image=sample[2])
        if cfg.img_net_checkpoint:
            from dagr_tpu.models.torch_import import load_reference_checkpoint

            p, s = load_reference_checkpoint(cfg.img_net_checkpoint, cfg)
            if "cnn" in p:
                state = state.replace(
                    params={**state.params, "cnn": p["cnn"]},
                    batch_stats={**state.batch_stats, "cnn": s["cnn"]},
                    ema_params={**state.ema_params, "cnn": p["cnn"]},
                    ema_stats={**state.ema_stats, "cnn": s["cnn"]},
                )
                print(f"loaded + froze image trunk from "
                      f"{cfg.img_net_checkpoint}")
        step = jax.jit(make_train_step_fusion(
            model, cfg, tx, H, pretrain_cnn=cfg.pretrain_cnn))
    else:
        state = init_state(model, cfg, tx, jax.random.key(0), sample[0])
        step = make_train_step(model, cfg, tx, H)
        if cfg.dp > 1:
            mesh = make_mesh(cfg.dp)
            sharded = shard_train_step(step, mesh)
            state = put_replicated(state, mesh)

            def step(s, e, t, _sh=sharded, _m=mesh):   # noqa: F811
                return _sh(s, put_batch(e, _m), put_batch(t, _m))
        else:
            step = jax.jit(step)

    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"Training with {n_params} parameters on {H}x{W}")

    ckpt = Checkpointer(out_dir)
    restored, start_epoch = ckpt.restore_if_existing(state)
    if cfg.resume_checkpoint:
        # explicit resume path wins (reference: train_dsec.py:164-166)
        restored, start_epoch = Checkpointer(
            Path(cfg.resume_checkpoint)).restore_if_existing(state)
    if restored is not None:
        state = restored
        print(f"resumed from epoch {start_epoch}")

    # dry-run smoke eval (reference: train_dsec.py:168-170)
    buf, _ = run_test(val_loader, model, state, cfg, H, W,
                      train_ds.classes, dry_run_steps=2)
    buf.compute()

    for epoch in range(start_epoch, cfg.tot_num_epochs):
        state, losses = train_epoch(train_loader, state, step, logger,
                                    use_image=cfg.use_image)
        ckpt.checkpoint(state, epoch, name="last_model")
        if epoch % 3 > 0:
            continue
        buf, dets = run_test(val_loader, model, state, cfg, H, W,
                             train_ds.classes, compile_detections=True)
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
                                                  class_names=val_ds.classes)
                cv2.imwrite(str(viz_dir / f"{i:06d}.png"),
                            cv2.cvtColor(img, cv2.COLOR_RGB2BGR))


if __name__ == "__main__":
    main()
