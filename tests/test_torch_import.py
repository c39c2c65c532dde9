"""Checkpoint converter: fabricated reference-style state_dicts must
convert into trees exactly matching our model's init trees."""
import jax
import numpy as np
import pytest

from dagr_tpu.config import DagrConfig
from dagr_tpu.data.synthetic import random_events
from dagr_tpu.models.dagr import DAGR
from dagr_tpu.models.torch_import import (
    convert_backbone_head, convert_cnn_branch,
)

W, H = 64, 48


def fake_state_dict_from_tree(params, stats):
    """Build the torch-style key set for the event branch from our own
    tree shapes (inverse of the converter's mapping)."""
    rng = np.random.default_rng(0)
    sd = {}

    def spline(prefix, p):
        sd[f"{prefix}.weight"] = rng.standard_normal(p["weight"].shape).astype(np.float32)
        sd[f"{prefix}.lin.weight"] = rng.standard_normal(
            p["root"].shape[::-1]).astype(np.float32)
        if "bias" in p:
            sd[f"{prefix}.bias"] = rng.standard_normal(p["bias"].shape).astype(np.float32)

    def bn(prefix, p, s):
        sd[f"{prefix}.weight"] = rng.standard_normal(p["scale"].shape).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.standard_normal(p["bias"].shape).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.standard_normal(s["mean"].shape).astype(np.float32)
        sd[f"{prefix}.running_var"] = np.abs(
            rng.standard_normal(s["var"].shape)).astype(np.float32)

    def conv_block(prefix, p, s):
        spline(f"{prefix}.conv", p["conv"])
        bn(f"{prefix}.norm.module", p["norm"], s["norm"])

    for name in ("conv_block1", "layer2", "layer3", "layer4", "layer5"):
        p = params["backbone"][name]
        s = stats["backbone"][name]
        conv_block(f"backbone.{name}.conv_block1",
                   p["conv_block1"], s["conv_block1"])
        conv_block(f"backbone.{name}.conv_block2",
                   p["conv_block2"], s["conv_block2"])
        sd[f"backbone.{name}.conv_block2.lin.mlp.weight"] = rng.standard_normal(
            p["conv_block2"]["lin"]["kernel"].shape[::-1]).astype(np.float32)
        bn(f"backbone.{name}.conv_block2.norm_skip.module",
           p["conv_block2"]["norm_skip"], s["conv_block2"]["norm_skip"])

    for k in (1, 2):
        hp = params["head"][f"scale{k}"]
        hs = stats["head"][f"scale{k}"]
        for ours, theirs in (("stem", f"stem{k}"), ("cls_conv", f"cls_conv{k}"),
                             ("reg_conv", f"reg_conv{k}")):
            conv_block(f"head.{theirs}", hp[ours], hs[ours])
        for ours, theirs in (("cls_pred", f"cls_pred{k}"),
                             ("reg_pred", f"reg_pred{k}"),
                             ("obj_pred", f"obj_pred{k}")):
            spline(f"head.{theirs}", hp[ours])
    return sd


def tree_shapes(t):
    return jax.tree.map(lambda a: tuple(np.shape(a)), t)


def test_event_branch_roundtrip():
    cfg = DagrConfig(n_nodes=128, max_neighbors=8, node_chunk=256, radius=0.05)
    model = DAGR(cfg, height=H, width=W)
    rng = np.random.default_rng(0)
    ev = random_events(rng, 1, cfg.n_nodes, width=W, height=H)
    variables = model.init(jax.random.key(0), ev, train=False)
    p0 = jax.tree.map(np.asarray, variables["params"])
    s0 = jax.tree.map(np.asarray, variables["batch_stats"])

    sd = fake_state_dict_from_tree(p0, s0)
    p1, s1 = convert_backbone_head(sd, num_scales=cfg.num_scales)
    assert tree_shapes(p1) == tree_shapes(p0)
    assert tree_shapes(s1) == tree_shapes(s0)

    # converted weights run through the model
    raw = model.apply({"params": p1, "batch_stats": s1}, ev, train=False)
    assert bool(np.isfinite(np.asarray(raw)).all())

    # spot-check orientation: root weight transposed
    w = sd["backbone.layer2.conv_block1.conv.lin.weight"]
    np.testing.assert_array_equal(
        p1["backbone"]["layer2"]["conv_block1"]["conv"]["root"], w.T)


def fake_resnet_sd(arch="resnet18", prefix="backbone.net.module."):
    """Key set of a torchvision resnet state_dict."""
    rng = np.random.default_rng(1)
    stages = {"resnet18": (2, 2, 2, 2), "resnet50": (3, 4, 6, 3)}[arch]
    bottleneck = arch == "resnet50"
    sd = {}

    def conv(k, ci, co, ks):
        sd[k + ".weight"] = rng.standard_normal((co, ci, ks, ks)).astype(np.float32)

    def bn(k, c):
        sd[k + ".weight"] = np.ones(c, np.float32)
        sd[k + ".bias"] = np.zeros(c, np.float32)
        sd[k + ".running_mean"] = np.zeros(c, np.float32)
        sd[k + ".running_var"] = np.ones(c, np.float32)

    conv(prefix + "conv1", 3, 64, 7)
    bn(prefix + "bn1", 64)
    cin = 64
    widths = (64, 128, 256, 512)
    for li, (n, w) in enumerate(zip(stages, widths)):
        for bi in range(n):
            p = f"{prefix}layer{li + 1}.{bi}"
            if bottleneck:
                conv(p + ".conv1", cin, w, 1); bn(p + ".bn1", w)
                conv(p + ".conv2", w, w, 3); bn(p + ".bn2", w)
                conv(p + ".conv3", w, w * 4, 1); bn(p + ".bn3", w * 4)
                cout = w * 4
            else:
                conv(p + ".conv1", cin, w, 3); bn(p + ".bn1", w)
                conv(p + ".conv2", w, w, 3); bn(p + ".bn2", w)
                cout = w
            if cin != cout or (li > 0 and bi == 0):
                conv(p + ".downsample.0", cin, cout, 1)
                bn(p + ".downsample.1", cout)
            cin = cout
    for i, c in enumerate((16, 64, 64, 64, 64)):
        src = (64, 64, 128, 256, 512)[i] * (4 if bottleneck and i >= 1 else 1)
        sd[f"backbone.net.feature_dconv.{i}.weight"] = rng.standard_normal(
            (c, src, 1, 1)).astype(np.float32)
        sd[f"backbone.net.feature_dconv.{i}.bias"] = np.zeros(c, np.float32)
    for i in range(2):
        src = (256, 512)[i] * (4 if bottleneck else 1)
        sd[f"backbone.net.output_dconv.{i}.weight"] = rng.standard_normal(
            (256, src, 1, 1)).astype(np.float32)
        sd[f"backbone.net.output_dconv.{i}.bias"] = np.zeros(256, np.float32)
    return sd


@pytest.mark.parametrize("arch", ["resnet18"])
def test_cnn_branch_roundtrip(arch):
    import jax.numpy as jnp

    from dagr_tpu.models.cnn import CNNFeatures

    cnn = CNNFeatures(arch=arch, feature_channels=(16, 64, 64, 64, 64))
    img = jnp.zeros((1, H, W, 3))
    variables = cnn.init(jax.random.key(0), img)
    p0 = jax.tree.map(np.asarray, variables["params"])
    s0 = jax.tree.map(np.asarray, variables["batch_stats"])

    sd = fake_resnet_sd(arch)
    p1, s1 = convert_cnn_branch(sd, arch)
    assert tree_shapes(p1) == tree_shapes(p0)
    assert tree_shapes(s1) == tree_shapes(s0)
    feats, outs = cnn.apply({"params": p1, "batch_stats": s1}, img)
    assert len(feats) == 5 and len(outs) == 2


def test_torch_load_roundtrip(tmp_path):
    """Exercise the REAL torch.load path of load_reference_checkpoint:
    torch.save a reference-style {"ema": state_dict} file and check the
    loaded trees equal the in-memory conversion (the contract of
    dagr_s_50.pth, reference: download_example_data.sh:6,
    scripts/run_test.py:57-58)."""
    import torch

    from dagr_tpu.models.torch_import import load_reference_checkpoint

    cfg = DagrConfig(n_nodes=128, max_neighbors=8, node_chunk=256, radius=0.05)
    model = DAGR(cfg, height=H, width=W)
    rng = np.random.default_rng(0)
    ev = random_events(rng, 1, cfg.n_nodes, width=W, height=H)
    variables = model.init(jax.random.key(0), ev, train=False)
    p0 = jax.tree.map(np.asarray, variables["params"])
    s0 = jax.tree.map(np.asarray, variables["batch_stats"])

    sd = fake_state_dict_from_tree(p0, s0)
    sd_torch = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    path = tmp_path / "dagr_fake.pth"
    torch.save({"ema": sd_torch, "model": {}, "epoch": 3}, path)

    p1, s1 = load_reference_checkpoint(path, cfg)
    p_mem, s_mem = convert_backbone_head(sd, num_scales=cfg.num_scales)
    jax.tree.map(np.testing.assert_array_equal, p1, p_mem)
    jax.tree.map(np.testing.assert_array_equal, s1, s_mem)
