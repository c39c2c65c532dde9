"""Image-fusion branch tests: CNN taps, sampling, hybrid head, dual
loss, and CNN-gradient isolation (the fusion path must be detached,
reference: net.py:118, dagr.py:219-223)."""
import jax
import jax.numpy as jnp
import numpy as np

from dagr_tpu.config import DagrConfig
from dagr_tpu.data.synthetic import random_events, random_targets
from dagr_tpu.models.cnn import CNNFeatures, sample_features
from dagr_tpu.models.dagr import DAGR, detection_loss_fusion

W, H = 64, 48
CFG = DagrConfig(
    n_nodes=128, max_neighbors=8, batch_size=2, node_chunk=256,
    radius=0.05, use_image=True, img_net="resnet18",
)


def test_cnn_taps_shapes():
    cnn = CNNFeatures(arch="resnet18", feature_channels=(16, 64, 64, 64, 64))
    img = jnp.zeros((1, H, W, 3))
    vars_ = cnn.init(jax.random.key(0), img)
    feats, outs = cnn.apply(vars_, img)
    def cdiv(a, b):
        return -(-a // b)

    assert [f.shape[1:3] for f in feats] == [
        (cdiv(H, 2), cdiv(W, 2)), (cdiv(H, 4), cdiv(W, 4)),
        (cdiv(H, 8), cdiv(W, 8)), (cdiv(H, 16), cdiv(W, 16)),
        (cdiv(H, 32), cdiv(W, 32))]
    assert [f.shape[-1] for f in feats] == [16, 64, 64, 64, 64]
    assert [o.shape[-1] for o in outs] == [256, 256]


def test_sample_features_bilinear():
    # constant-gradient feature map: sampling must reproduce the ramp
    Hf, Wf, C = 6, 8, 2
    yy, xx = np.meshgrid(np.arange(Hf), np.arange(Wf), indexing="ij")
    feat = np.stack([xx, yy], -1).astype(np.float32)[None]
    pos = np.array([[[0.5, 0.5, 0.0], [0.25, 0.75, 0.0]]], np.float32)
    mask = np.ones((1, 2), bool)
    out = np.asarray(sample_features(
        jnp.asarray(pos), jnp.asarray(mask), jnp.asarray(feat),
        width=64, height=48))
    # u = x_px/(W-1)*(Wf-1) = 0.5*64/63*7
    np.testing.assert_allclose(out[0, 0, 0], 0.5 * 64 / 63 * 7, rtol=1e-5)
    np.testing.assert_allclose(out[0, 1, 1], 0.75 * 48 / 47 * 5, rtol=1e-5)


def make_fusion_model():
    model = DAGR(CFG, height=H, width=W)
    rng = np.random.default_rng(0)
    ev = random_events(rng, 2, CFG.n_nodes, width=W, height=H)
    img = jnp.asarray(rng.random((2, H, W, 3)), dtype=jnp.float32)
    variables = model.init(jax.random.key(0), ev, image=img, train=False)
    return model, variables, ev, img


def test_fusion_forward_and_loss():
    model, variables, ev, img = make_fusion_model()
    raw, raw_img = model.apply(variables, ev, image=img, train=False)
    A = sum(ny * nx for ny, nx in CFG.grid_shapes()[-2:])
    assert raw.shape == (2, A, 5 + CFG.num_classes)
    assert raw_img.shape == (2, A, 5 + CFG.num_classes)

    rng = np.random.default_rng(1)
    t1 = jnp.asarray(random_targets(rng, 2, width=W, height=H))
    t0 = jnp.asarray(random_targets(rng, 2, width=W, height=H))
    losses = detection_loss_fusion(raw, raw_img, t1, t0, CFG, H)
    assert bool(jnp.isfinite(losses["total_loss"]))


def test_cnn_grads_only_from_image_loss():
    """With pretrain_cnn=True (image loss only), event-branch params get
    zero grads; the hybrid loss must NOT backprop into the CNN trunk
    (detached fusion)."""
    model, variables, ev, img = make_fusion_model()
    rng = np.random.default_rng(2)
    t1 = jnp.asarray(random_targets(rng, 2, width=W, height=H))
    t0 = jnp.asarray(random_targets(rng, 2, width=W, height=H))

    def loss(p, pretrain):
        (raw, raw_img), _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            ev, image=img, train=True, mutable=["batch_stats"])
        return detection_loss_fusion(
            raw, raw_img, t1, t0, CFG, H, pretrain_cnn=pretrain
        )["total_loss"]

    g_img_only = jax.grad(lambda p: loss(p, True))(variables["params"])
    # image-only loss -> no grads on the event backbone
    bb = jax.tree.leaves(g_img_only["backbone"])
    assert all(float(jnp.abs(x).max()) == 0.0 for x in bb)
    # but CNN head gets gradients
    ch = jax.tree.leaves(g_img_only["cnn_head"])
    assert any(float(jnp.abs(x).max()) > 0 for x in ch)

    g_full = jax.grad(lambda p: loss(p, False))(variables["params"])
    # full loss: event backbone now gets gradients
    bb = jax.tree.leaves(g_full["backbone"])
    assert any(float(jnp.abs(x).max()) > 0 for x in bb)
    # CNN trunk grads identical in both (hybrid path is detached)
    for a, b in zip(jax.tree.leaves(g_img_only["cnn"]),
                    jax.tree.leaves(g_full["cnn"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
