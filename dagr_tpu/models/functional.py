"""Pure eval-mode layer applications over explicit param subtrees.

The streaming engine (and FLOP tools) need to run individual backbone
stages against persistent state, which flax's compact modules can't
expose.  These helpers apply the SAME parameter trees produced by
models/blocks.py / models/head.py in eval mode (frozen batch-norm
statistics — the reference's asynchronous runtime does the same,
reference: src/dagr/asynchronous/batch_norm.py:25-55).

Consistency between these and the flax modules is enforced by the
sync<->streaming equivalence tests (the reference's
``test_and_compare_activations`` harness, evaluate_flops.py:240-261).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dagr_tpu.core.types import NodeSet
from dagr_tpu.models.blocks import activation_fn
from dagr_tpu.ops.spline import (
    bilinear_basis, level_basis, nodeset_conv, spline_conv,
)

BN_EPS = 1e-5


def bn_eval(x, params, stats):
    return (x - stats["mean"]) * jax.lax.rsqrt(stats["var"] + BN_EPS) \
        * params["scale"] + params["bias"]


def conv_block_eval(p, s, ns: NodeSet, max_value: float, activation: str,
                    node_chunk: int = 2048, basis=None) -> jnp.ndarray:
    """ConvBlock in eval mode (reference: conv.py:10-28)."""
    x = nodeset_conv(
        ns, p["conv"]["weight"], p["conv"]["root"], None, basis,
        max_value=max_value, node_chunk=node_chunk,
    )
    x = bn_eval(x, p["norm"], s["norm"])
    x = activation_fn(activation)(x)
    return jnp.where(ns.mask[..., None], x, 0.0)


def layer_eval(p, s, ns: NodeSet, max_value: float, activation: str,
               node_chunk: int = 2048) -> NodeSet:
    """Layer in eval mode (reference: conv.py:59-72)."""
    skip = ns.feat
    # basis shared across both convs (see models/blocks.py Layer)
    basis = level_basis(ns, max_value=max_value)
    x1 = conv_block_eval(p["conv_block1"], s["conv_block1"], ns,
                         max_value, activation, node_chunk, basis)
    ns1 = ns.replace(feat=x1)
    x2 = nodeset_conv(
        ns1, p["conv_block2"]["conv"]["weight"],
        p["conv_block2"]["conv"]["root"],
        None, basis, max_value=max_value, node_chunk=node_chunk,
    )
    x2 = bn_eval(x2, p["conv_block2"]["norm"], s["conv_block2"]["norm"])
    sk = skip @ p["conv_block2"]["lin"]["kernel"]
    sk = bn_eval(sk, p["conv_block2"]["norm_skip"], s["conv_block2"]["norm_skip"])
    x2 = activation_fn(activation)(x2 + sk)
    return ns.replace(feat=jnp.where(ns.mask[..., None], x2, 0.0))


def pred_eval(p, ns: NodeSet, max_value: float,
              node_chunk: int = 2048, basis=None) -> jnp.ndarray:
    """SplineConvToDense's conv part (bias=True, reference:
    spline_conv.py:110-118); canvas reshape is done by the caller."""
    return nodeset_conv(
        ns, p["weight"], p["root"], p["bias"], basis,
        max_value=max_value, node_chunk=node_chunk,
    )


def scale_head_eval(p, s, ns: NodeSet, max_value: float, activation: str,
                    node_chunk: int = 2048):
    """ScaleHead in eval mode (reference: dagr.py:179-190).  Returns
    (cls, reg, obj) dense canvases [B, ny, nx, C]."""
    basis = level_basis(ns, max_value=max_value)
    ns = ns.replace(feat=conv_block_eval(
        p["stem"], s["stem"], ns, max_value, activation, node_chunk, basis))
    cls_f = ns.replace(feat=conv_block_eval(
        p["cls_conv"], s["cls_conv"], ns, max_value, activation,
        node_chunk, basis))
    reg_f = ns.replace(feat=conv_block_eval(
        p["reg_conv"], s["reg_conv"], ns, max_value, activation,
        node_chunk, basis))
    cls_o = pred_eval(p["cls_pred"], cls_f, max_value, node_chunk, basis)
    # reg + obj preds share reg_feat: fuse into one conv
    fused = {
        k: jnp.concatenate(
            [p["reg_pred"][k], p["obj_pred"][k]],
            axis=-1 if k != "bias" else 0,
        )
        for k in ("weight", "root", "bias")
    }
    regobj = pred_eval(fused, reg_f, max_value, node_chunk, basis)
    reg_o, obj_o = regobj[..., :4], regobj[..., 4:]
    ny, nx = ns.grid_hw
    B = ns.feat.shape[0]

    def canvas(x):
        return jnp.where(ns.mask[..., None], x, 0.0).reshape(B, ny, nx, -1)

    return canvas(cls_o), canvas(reg_o), canvas(obj_o)


def spline_conv_gather(
    x_table: jnp.ndarray,    # [N, Cin] source feature table
    pos_table: jnp.ndarray,  # [N, >=2] source positions (normalized)
    dst_pos: jnp.ndarray,    # [C, >=2]
    dst_x: jnp.ndarray,      # [C, Cin] destination features (for root)
    nbr: jnp.ndarray,        # [C, K] global indices into the table
    nbr_mask: jnp.ndarray,   # [C, K]
    weight: jnp.ndarray,     # [P, Cin, Cout]
    root: jnp.ndarray = None,
    bias: jnp.ndarray = None,
    *,
    max_value: float,
    kernel_size: int = 5,
) -> jnp.ndarray:
    """Spline conv for a chunk of destination nodes whose sources live
    in a global table — the streaming-engine inner op (the masked
    per-row equivalent of the reference's masked_lin + message deltas,
    reference: asynchronous/conv.py:94-238)."""
    C, K = nbr.shape
    P, cin, cout = weight.shape
    N = x_table.shape[0]
    idx = jnp.clip(nbr, 0, N - 1).reshape(-1)
    # take_along_axis: ~100x faster than x[idx] on the axon backend
    x_src = jnp.take_along_axis(x_table, idx[:, None], axis=0)   # [C*K, Cin]
    pos_src = jnp.take_along_axis(pos_table[:, :2], idx[:, None], axis=0)
    attr = (pos_src - jnp.repeat(dst_pos[:, :2], K, axis=0)) \
        / (2.0 * max_value) + 0.5
    attr = jnp.clip(attr, 0.0, 1.0)
    basis = bilinear_basis(attr, kernel_size)              # [C*K, P]
    # factored node form (spline_conv impl="node_dot"): aggregate the
    # masked basis-weighted sources per (dst, tap) with one batched
    # dot_general, then a single node-level MXU matmul — K*Cout/(K+Cout)
    # ~ 8x fewer MXU FLOPs than the edge-major form at K=16
    b_m = basis.reshape(C, K, P) * nbr_mask[..., None]
    g = jax.lax.dot_general(
        b_m, x_src.reshape(C, K, cin),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                # [C, P, Cin]
    msg = jnp.dot(g.reshape(C, P * cin), weight.reshape(P * cin, cout),
                  preferred_element_type=jnp.float32)
    if root is not None:
        msg = msg + dst_x @ root
    if bias is not None:
        msg = msg + bias
    return msg
