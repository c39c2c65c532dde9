"""Convert reference torch checkpoints (dagr_s_50.pth) to our params.

The reference ships ``dagr_s_50.pth`` (DAGR-S + ResNet-50 on DSEC,
reference: download_example_data.sh:6) whose state_dict keys follow the
torch module tree (DAGR(YOLOX) -> backbone Net / head GNNHead,
reference: src/dagr/model/networks/dagr.py, net.py, net_img.py).  This
module maps that tree onto our flax params/batch_stats trees:

* PyG SplineConv: ``weight [P, Cin, Cout]`` maps 1:1 (the degree-1
  basis flat tap order is kx + 5*ky in both implementations);
  ``lin.weight [Cout, Cin]`` transposes into our ``root [Cin, Cout]``;
  optional ``bias``.
* torch Linear/Conv2d kernels transpose into flax layouts
  (Dense: [in, out]; Conv: [kh, kw, in, out]).
* BatchNorm weight/bias/running_mean/running_var -> scale/bias +
  batch_stats mean/var.
* torchvision ResNet trunks map onto models/cnn.py's ResNetTaps naming.

Checkpoints are loaded with ``torch.load`` on CPU; torch is only
imported here.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _bn(sd, prefix):
    params = {"scale": _np(sd[f"{prefix}.weight"]),
              "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def _spline(sd, prefix, bias=False):
    p = {"weight": _np(sd[f"{prefix}.weight"]),
         "root": _np(sd[f"{prefix}.lin.weight"]).T}
    if bias and f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def _conv_block(sd, prefix):
    """reference ConvBlock: .conv (SplineConv) + .norm (PyG BatchNorm
    wrapping torch BatchNorm1d as .module)."""
    bnp, bns = _bn(sd, f"{prefix}.norm.module")
    return ({"conv": _spline(sd, f"{prefix}.conv"), "norm": bnp},
            {"norm": bns})


def _conv_block_skip(sd, prefix):
    p, s = _conv_block(sd, prefix)
    p["lin"] = {"kernel": _np(sd[f"{prefix}.lin.mlp.weight"]).T}
    bnp, bns = _bn(sd, f"{prefix}.norm_skip.module")
    p["norm_skip"] = bnp
    s["norm_skip"] = bns
    return p, s


def _layer(sd, prefix):
    p1, s1 = _conv_block(sd, f"{prefix}.conv_block1")
    p2, s2 = _conv_block_skip(sd, f"{prefix}.conv_block2")
    return {"conv_block1": p1, "conv_block2": p2}, \
           {"conv_block1": s1, "conv_block2": s2}


def _scale_head(sd, k):
    """reference GNNHead scale-k members stem{k}/cls_conv{k}/... map to
    our ScaleHead submodule names (models/head.py)."""
    p, s = {}, {}
    for ours, theirs in (("stem", f"stem{k}"), ("cls_conv", f"cls_conv{k}"),
                         ("reg_conv", f"reg_conv{k}")):
        pp, ss = _conv_block(sd, f"head.{theirs}")
        p[ours], s[ours] = pp, ss
    for ours, theirs in (("cls_pred", f"cls_pred{k}"),
                         ("reg_pred", f"reg_pred{k}"),
                         ("obj_pred", f"obj_pred{k}")):
        p[ours] = _spline(sd, f"head.{theirs}", bias=True)
    return p, s


def convert_backbone_head(
    sd: Dict[str, np.ndarray], num_scales: int = 2
) -> Tuple[Dict, Dict]:
    """torch state_dict -> (params, batch_stats) for the event branch
    (backbone + GNN head)."""
    params = {"backbone": {}, "head": {}}
    stats = {"backbone": {}, "head": {}}
    for name in ("conv_block1", "layer2", "layer3", "layer4", "layer5"):
        p, s = _layer(sd, f"backbone.{name}")
        params["backbone"][name] = p
        stats["backbone"][name] = s
    for k in range(1, num_scales + 1):
        p, s = _scale_head(sd, k)
        params["head"][f"scale{k}"] = p
        stats["head"][f"scale{k}"] = s
    return params, stats


def _torch_conv(sd, prefix):
    p = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def convert_resnet_trunk(
    sd: Dict[str, np.ndarray], prefix: str = "backbone.net.module.",
    stages: Tuple[int, ...] = (2, 2, 2, 2),
) -> Tuple[Dict, Dict]:
    """torchvision ResNet state_dict (under ``prefix``) -> ResNetTaps
    params/batch_stats (models/cnn.py)."""
    P = lambda k: f"{prefix}{k}"
    params, stats = {}, {}
    params["conv1"] = _torch_conv(sd, P("conv1"))
    bnp, bns = _bn(sd, P("bn1"))
    params["bn1"] = {"BatchNorm_0": bnp}
    stats["bn1"] = {"BatchNorm_0": bns}
    for li, n_blocks in enumerate(stages):
        for bi in range(n_blocks):
            tp = P(f"layer{li + 1}.{bi}")
            name = f"layer{li + 1}_{bi}"
            bp, bs = {}, {}
            n_convs = 3 if f"{tp}.conv3.weight" in sd else 2
            for ci in range(1, n_convs + 1):
                bp[f"conv{ci}"] = _torch_conv(sd, f"{tp}.conv{ci}")
                p_, s_ = _bn(sd, f"{tp}.bn{ci}")
                bp[f"bn{ci}"] = {"BatchNorm_0": p_}
                bs[f"bn{ci}"] = {"BatchNorm_0": s_}
            if f"{tp}.downsample.0.weight" in sd:
                bp["downsample_conv"] = _torch_conv(sd, f"{tp}.downsample.0")
                p_, s_ = _bn(sd, f"{tp}.downsample.1")
                bp["downsample_bn"] = {"BatchNorm_0": p_}
                bs["downsample_bn"] = {"BatchNorm_0": s_}
            params[name] = bp
            stats[name] = bs
    return params, stats


def convert_cnn_branch(sd: Dict, arch: str = "resnet50") -> Tuple[Dict, Dict]:
    """Full HookModule (trunk + 1x1 reductions) -> CNNFeatures tree."""
    stages = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3),
              "resnet50": (3, 4, 6, 3)}[arch]
    tp, ts = convert_resnet_trunk(sd, "backbone.net.module.", stages)
    params = {"trunk": tp}
    stats = {"trunk": ts}
    for i in range(5):
        key = f"backbone.net.feature_dconv.{i}"
        if f"{key}.weight" in sd:
            params[f"feature_dconv_{i}"] = _torch_conv(sd, key)
    for i in range(2):
        key = f"backbone.net.output_dconv.{i}"
        if f"{key}.weight" in sd:
            params[f"output_dconv_{i}"] = _torch_conv(sd, key)
    return params, stats


def load_reference_checkpoint(
    path, cfg, use_ema: bool = True
) -> Tuple[Dict, Dict]:
    """Load dagr_s_50.pth-style checkpoint -> (params, batch_stats)
    trees for our DAGR flax model.  The eval scripts load the 'ema'
    weights (reference: scripts/run_test.py:57-58)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("ema" if use_ema else "model", ckpt)
    sd = {k: v for k, v in sd.items()}
    params, stats = convert_backbone_head(sd, num_scales=cfg.num_scales)
    if cfg.use_image and "backbone.net.module.conv1.weight" in sd:
        cp, cs = convert_cnn_branch(sd, cfg.img_net)
        params["cnn"] = cp
        stats["cnn"] = cs
    return params, stats
