"""Asynchronous per-event FLOP census.

CLI mirror of the reference scripts/count_flops.py:19-70 /
asynchronous/evaluate_flops.py:82-165: for each sample, initialize the
streaming engine with all-but-the-last event, feed the last event, and
record the per-layer sparse-equivalent FLOPs of that single-event
update (running mean over the dataset).  --check_consistency compares
streaming vs sync outputs (tolerance 1e-3, evaluate_flops.py:139-146).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import argparse
import json

import jax
import numpy as np

from dagr_tpu.config import add_config_flags, config_from_yaml, DagrConfig
from dagr_tpu.data.augment import Augmentations
from dagr_tpu.data.dsec import DSEC
from dagr_tpu.data.loader import Loader
from dagr_tpu.eval.buffers import DictBuffer
from dagr_tpu.models.dagr import DAGR
from dagr_tpu.streaming.engine import StreamingDetector, chunk_events
from dagr_tpu.train.checkpoint import Checkpointer
from dagr_tpu.train.state import init_state, make_optimizer


def main():
    parser = argparse.ArgumentParser("count_flops")
    parser.add_argument("--config", type=Path, default=None)
    parser.add_argument("--check_consistency", action="store_true")
    parser.add_argument("--num_samples", type=int, default=100)
    parser.add_argument(
        "--synthetic", type=int, default=0,
        help="run on N synthetic flagship windows (45k events, 320x240) "
             "instead of DSEC — the census is analytic off the touched "
             "masks, so synthetic events give the honest number when "
             "the real dataset is absent")
    parser.add_argument(
        "--markdown", type=Path, default=None,
        help="also write a per-layer 1-event vs dense-window table "
             "(the paper's async-efficiency headline) to this file")
    add_config_flags(parser)
    args = parser.parse_args()
    overrides = {k: v for k, v in vars(args).items()
                 if k not in ("config", "check_consistency", "num_samples",
                              "synthetic", "markdown")}
    cfg = (config_from_yaml(args.config, **overrides)
           if args.config else DagrConfig(**overrides))

    np.random.seed(42)
    if args.synthetic:
        from dagr_tpu.data.synthetic import random_events

        H, W = 240, 320
        NV = 45_000
        rng = np.random.default_rng(0)
        model = DAGR(cfg, height=H, width=W)
        ev0 = random_events(rng, 1, cfg.n_nodes, width=W, height=H,
                            n_valid=NV)
        variables = model.init(jax.random.key(0), ev0, train=False)

        def samples():
            for _ in range(args.synthetic):
                e = random_events(rng, 1, cfg.n_nodes, width=W, height=H,
                                  n_valid=NV)
                yield (np.asarray(e.pos_px()[0])[:NV],
                       np.asarray(e.feat[0])[:NV])
    else:
        ds = DSEC(Path(cfg.dataset_directory), "test",
                  transform=Augmentations.testing(),
                  min_bbox_diag=15, min_bbox_height=10)
        H, W = ds.height, ds.width
        model = DAGR(cfg, height=H, width=W)
        tx, _ = make_optimizer(cfg, num_iters_per_epoch=1)
        sample = next(iter(Loader(ds, 1, cfg.n_nodes)))
        state0 = init_state(model, cfg, tx, jax.random.key(0), sample[0])
        if cfg.checkpoint:
            ckpt = Checkpointer(Path(cfg.checkpoint).parent)
            restored, _ = ckpt.restore_if_existing(state0, best=True)
            if restored is not None:
                state0 = restored
        variables = {"params": state0.ema_params,
                     "batch_stats": state0.ema_stats}

        def samples():
            for i in range(min(args.num_samples, len(ds))):
                s = ds[i]
                n = min(s.num_events, cfg.n_nodes)
                yield (np.stack([s.x[-n:], s.y[-n:], s.t[-n:]],
                                1).astype(np.int32),
                       s.p[-n:].reshape(-1, 1).astype(np.float32))

    fill_chunk = min(1024, cfg.n_nodes)
    eng_fill = StreamingDetector(cfg, H, W, chunk=fill_chunk)
    eng_one = StreamingDetector(cfg, H, W, chunk=1)
    fill = eng_fill.make_step(variables["params"], variables["batch_stats"])
    one = eng_one.make_step(variables["params"], variables["batch_stats"])

    # dense-window census: one full-window step from a fresh state —
    # every node/edge is "changed", so the same accounting yields the
    # sync forward's sparse-equivalent FLOPs (the reference compares
    # the same pair, evaluate_flops.py:82-165)
    eng_dense = StreamingDetector(cfg, H, W, chunk=cfg.n_nodes)
    dense_step = eng_dense.make_step(variables["params"],
                                     variables["batch_stats"])

    buf = DictBuffer()
    buf_dense = DictBuffer()
    for i, (pos_px, feat) in enumerate(samples()):
        st = eng_fill.init_state()
        for c in chunk_events(pos_px[:-1], feat[:-1], fill_chunk):
            st, raw, _ = fill(st, *c)
        st, raw, flops = one(st, pos_px[-1:], feat[-1:], np.ones(1, bool))
        buf.update({k: int(v) for k, v in flops.items()})

        n = len(pos_px)
        pd = np.zeros((cfg.n_nodes, 3), np.int32)
        fd = np.zeros((cfg.n_nodes, feat.shape[-1]), np.float32)
        vd = np.zeros((cfg.n_nodes,), bool)
        pd[:n], fd[:n], vd[:n] = pos_px, feat, True
        _, _, dflops = dense_step(eng_dense.init_state(), pd, fd, vd)
        buf_dense.update({k: int(v) for k, v in dflops.items()})

        if args.check_consistency and not args.synthetic:
            from dagr_tpu.data.sample import collate
            from dagr_tpu.streaming.consistency import check_consistency

            batch, _, _ = collate([ds[i]], cfg.n_nodes)
            ok, diffs = check_consistency(
                variables, batch, cfg, H, W, chunk=fill_chunk)
            status = "OK" if ok else "MISMATCH"
            detail = ", ".join(f"{k}={v:.2e}" for k, v in diffs.items())
            print(f"sample {i}: sync<->streaming {status} ({detail})")

    means = buf.compute()
    dense = buf_dense.compute()
    report = {"per_event": means, "dense_window": dense,
              "reduction_x": {k: round(dense[k] / means[k], 1)
                              for k in means if means.get(k)}}
    print(json.dumps(report, indent=2))
    out = Path(cfg.output_directory)
    out.mkdir(parents=True, exist_ok=True)
    (out / "flops_per_layer.json").write_text(json.dumps(report, indent=2))

    if args.markdown:
        rows = ["| layer | 1-event update | dense window | reduction |",
                "|---|---|---|---|"]
        for k in sorted(means):
            if k == "total":
                continue
            red = dense[k] / means[k] if means[k] else float("inf")
            rows.append(f"| {k} | {means[k]:,.0f} | {dense[k]:,.0f} | "
                        f"{red:,.0f}x |")
        rows.append(f"| **total** | **{means['total']:,.0f}** | "
                    f"**{dense['total']:,.0f}** | "
                    f"**{dense['total'] / means['total']:,.0f}x** |")
        args.markdown.write_text("\n".join(rows) + "\n")
        print(f"wrote {args.markdown}")


if __name__ == "__main__":
    main()
