"""Image branch: ResNet feature extractor with taps, 1x1 reductions,
node-aligned bilinear feature sampling, and the dense CNN detection
head.

TPU-native equivalent of the reference's HookModule around torchvision
ResNets (reference: src/dagr/model/networks/net_img.py:42-135) and the
CNNHead (reference: src/dagr/model/networks/dagr.py:106-122, built on
the external YOLOX repo's YOLOXHead conv stack).  Forward hooks become
explicit tap returns; ``grid_sample`` becomes a vectorized gather-lerp
(reference: net.py:193-221, align_corners=True semantics).

All convs are NHWC (TPU-native layout).
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

RESNET_STAGES = {
    "resnet18": ((2, 2, 2, 2), "basic"),
    "resnet34": ((3, 4, 6, 3), "basic"),
    "resnet50": ((3, 4, 6, 3), "bottleneck"),
}


class _BN(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
        )(x)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        res = x
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=1, use_bias=False, name="conv1")(x)
        y = _BN(name="bn1")(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = _BN(name="bn2")(y, train)
        if res.shape[-1] != self.features or self.stride != 1:
            res = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                          use_bias=False, name="downsample_conv")(res)
            res = _BN(name="downsample_bn")(res, train)
        return nn.relu(y + res)


class Bottleneck(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        res = x
        out_f = self.features * 4
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(_BN(name="bn1")(y, train))
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=1, use_bias=False, name="conv2")(y)
        y = nn.relu(_BN(name="bn2")(y, train))
        y = nn.Conv(out_f, (1, 1), use_bias=False, name="conv3")(y)
        y = _BN(name="bn3")(y, train)
        if res.shape[-1] != out_f or self.stride != 1:
            res = nn.Conv(out_f, (1, 1), (self.stride, self.stride),
                          use_bias=False, name="downsample_conv")(res)
            res = _BN(name="downsample_bn")(res, train)
        return nn.relu(y + res)


class ResNetTaps(nn.Module):
    """ResNet trunk returning the 5 tap activations the reference hooks:
    conv1 (raw conv output, pre-BN — forward hooks fire on the conv
    module itself, net_img.py:110-120), layer1..layer4."""

    arch: str = "resnet18"

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        stages, block = RESNET_STAGES[self.arch]
        block_cls = BasicBlock if block == "basic" else Bottleneck
        taps = []
        y = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        taps.append(y)                       # 'conv1' tap: pre-BN
        y = nn.relu(_BN(name="bn1")(y, train))
        y = nn.max_pool(y, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        widths = (64, 128, 256, 512)
        for li, (n_blocks, w) in enumerate(zip(stages, widths)):
            for bi in range(n_blocks):
                stride = 2 if (li > 0 and bi == 0) else 1
                y = block_cls(w, stride, name=f"layer{li + 1}_{bi}")(y, train)
            taps.append(y)
        return taps


class CNNFeatures(nn.Module):
    """HookModule equivalent: trunk taps + 1x1 reductions
    (reference: net_img.py:70-90,122-135).  Returns (features[5],
    outputs[2])."""

    arch: str = "resnet18"
    feature_channels: Sequence[int] = (16, 64, 64, 64, 64)
    output_channels: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, image, train: bool = False):
        taps = ResNetTaps(self.arch, name="trunk")(image, train)
        features = [
            nn.Conv(c, (1, 1), name=f"feature_dconv_{i}")(t)
            for i, (t, c) in enumerate(zip(taps, self.feature_channels))
        ]
        outputs = [
            nn.Conv(c, (1, 1), name=f"output_dconv_{i}")(t)
            for i, (t, c) in enumerate(zip(taps[3:5], self.output_channels))
        ]
        return features, outputs


def sample_features(pos, mask, image_feat, width, height):
    """Bilinear feature sampling at node positions
    (reference: net.py:193-221 — grid_sample, align_corners=True).

    pos: [B, N, >=2] normalized; image_feat: [B, Hf, Wf, C].
    Returns [B, N, C], zero at invalid nodes.
    """
    B, Hf, Wf, C = image_feat.shape
    x_px = pos[..., 0] * width       # pixel coords in full-image frame
    y_px = pos[..., 1] * height
    # align_corners=True: [0, W-1] maps linearly onto [0, Wf-1]
    u = x_px / max(width - 1, 1) * (Wf - 1)
    v = y_px / max(height - 1, 1) * (Hf - 1)
    u = jnp.clip(u, 0.0, Wf - 1)
    v = jnp.clip(v, 0.0, Hf - 1)
    u0 = jnp.clip(jnp.floor(u), 0, Wf - 2).astype(jnp.int32)
    v0 = jnp.clip(jnp.floor(v), 0, Hf - 2).astype(jnp.int32)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]

    def gather(feat, vy, ux):
        # take_along_axis, not x[idx]: row gathers are ~100x slower than
        # take_along_axis on this backend (same trick as ops/spline.py)
        idx = (vy * Wf + ux).astype(jnp.int32)  # [N]
        return jnp.take_along_axis(
            feat.reshape(Hf * Wf, C), idx[:, None], axis=0)

    out = jax.vmap(
        lambda feat, v0_, u0_, fu_, fv_: (
            gather(feat, v0_, u0_) * (1 - fu_) * (1 - fv_)
            + gather(feat, v0_, u0_ + 1) * fu_ * (1 - fv_)
            + gather(feat, v0_ + 1, u0_) * (1 - fu_) * fv_
            + gather(feat, v0_ + 1, u0_ + 1) * fu_ * fv_
        )
    )(image_feat, v0, u0, fu, fv)
    return jnp.where(mask[..., None], out, 0.0)


class BaseConv(nn.Module):
    """Conv + BN + SiLU (the external YOLOX repo's BaseConv)."""

    features: int
    ksize: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.ksize - 1) // 2
        x = nn.Conv(self.features, (self.ksize, self.ksize), padding=pad,
                    use_bias=False, name="conv")(x)
        x = _BN(name="bn")(x, train)
        return nn.silu(x)


class CNNHead(nn.Module):
    """Dense YOLOX head on the CNN branch
    (reference: dagr.py:106-122; stems/convs from YOLOXHead with width
    = yolo_stem_width).  Returns per-scale (cls, reg, obj) NHWC maps."""

    num_classes: int
    width: float = 0.5
    num_scales: int = 2

    @nn.compact
    def __call__(self, xin: List[jnp.ndarray], train: bool = False):
        hidden = int(256 * self.width)
        outs = []
        for k, x in enumerate(xin[: self.num_scales]):
            x = BaseConv(hidden, 1, name=f"stem{k + 1}")(x, train)
            cls_f = BaseConv(hidden, 3, name=f"cls_conv{k + 1}_0")(x, train)
            cls_f = BaseConv(hidden, 3, name=f"cls_conv{k + 1}_1")(cls_f, train)
            reg_f = BaseConv(hidden, 3, name=f"reg_conv{k + 1}_0")(x, train)
            reg_f = BaseConv(hidden, 3, name=f"reg_conv{k + 1}_1")(reg_f, train)
            cls_o = nn.Conv(self.num_classes, (1, 1), name=f"cls_pred{k + 1}")(cls_f)
            reg_o = nn.Conv(4, (1, 1), name=f"reg_pred{k + 1}")(reg_f)
            obj_o = nn.Conv(1, (1, 1), name=f"obj_pred{k + 1}")(reg_f)
            outs.append((cls_o, reg_o, obj_o))
        return outs
