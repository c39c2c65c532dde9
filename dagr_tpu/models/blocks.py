"""Flax building blocks of the GNN backbone.

TPU-native equivalents of the reference layer modules
(reference: src/dagr/model/layers/conv.py — ConvBlock,
ConvBlockWithSkip, Layer; src/dagr/model/layers/components.py —
BatchNormData, Linear).  They operate on masked ``[B, N, C]`` node
tables + fixed-degree neighbor lists instead of PyG ``Data``.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dagr_tpu.core.types import NodeSet
from dagr_tpu.ops.spline import spline_conv


def _spline_weight_init(key, shape, dtype=jnp.float32):
    """PyG SplineConv init: U(+-1/sqrt(P * Cin))
    (torch_geometric.nn.inits.uniform with size = kernels * in)."""
    P, cin, _ = shape
    bound = 1.0 / (P * cin) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _root_weight_init(key, shape, dtype=jnp.float32):
    cin = shape[0]
    bound = 1.0 / cin ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class SplineConvLayer(nn.Module):
    """MySplineConv equivalent (reference: spline_conv.py:9-78).

    ``max_value`` is the level's Cartesian normalization constant; edge
    attributes are recomputed from node positions inside the op.
    """

    in_channels: int
    out_channels: int
    max_value: float
    kernel_size: int = 5
    use_bias: bool = False
    root_weight: bool = True
    node_chunk: int = 2048

    def setup(self):
        P = self.kernel_size ** 2
        self.w = self.param(
            "weight", _spline_weight_init,
            (P, self.in_channels, self.out_channels),
        )
        self.root_w = (
            self.param(
                "root", _root_weight_init,
                (self.in_channels, self.out_channels),
            )
            if self.root_weight else None
        )
        self.b = (
            self.param("bias", nn.initializers.zeros, (self.out_channels,))
            if self.use_bias else None
        )

    def tensors(self):
        """Expose the parameter tensors so sibling prediction layers
        sharing an input can be fused into one conv."""
        return self.w, self.root_w, self.b

    def __call__(self, ns: NodeSet, basis=None) -> jnp.ndarray:
        from dagr_tpu.ops.spline import nodeset_conv

        return nodeset_conv(
            ns, self.w, self.root_w, self.b, basis,
            max_value=self.max_value, kernel_size=self.kernel_size,
            node_chunk=self.node_chunk,
        )


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid nodes only (reference: components.py:9-12
    wraps PyG BatchNorm == torch BatchNorm1d over the node dim; in the
    reference every node is real, so masked statistics are the faithful
    padded-table equivalent).  Torch conventions: biased variance for
    normalization, unbiased for the running update, momentum 0.1."""

    num_features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, train: bool):
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros(self.num_features, jnp.float32),
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones(self.num_features, jnp.float32),
        )
        gamma = self.param("scale", nn.initializers.ones, (self.num_features,))
        beta = self.param("bias", nn.initializers.zeros, (self.num_features,))

        if train:
            m = mask.reshape(-1).astype(x.dtype)
            n = jnp.maximum(m.sum(), 1.0)
            xf = x.reshape(-1, self.num_features)
            mean = (xf * m[:, None]).sum(0) / n
            var = (((xf - mean) ** 2) * m[:, None]).sum(0) / n
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * gamma + beta
        return jnp.where(mask[..., None], y, 0.0)


def activation_fn(name: str) -> Callable:
    return {
        "relu": jax.nn.relu,
        "elu": jax.nn.elu,
        "silu": jax.nn.silu,
        "gelu": jax.nn.gelu,
    }.get(name, jax.nn.elu)


class ConvBlock(nn.Module):
    """SplineConv -> BN -> activation (reference: conv.py:10-28)."""

    in_channels: int
    out_channels: int
    max_value: float
    activation: str = "relu"
    kernel_size: int = 5
    node_chunk: int = 2048

    @nn.compact
    def __call__(self, ns: NodeSet, train: bool = False,
                 basis=None) -> NodeSet:
        x = SplineConvLayer(
            self.in_channels, self.out_channels, self.max_value,
            kernel_size=self.kernel_size, node_chunk=self.node_chunk,
            name="conv",
        )(ns, basis)
        x = MaskedBatchNorm(self.out_channels, name="norm")(x, ns.mask, train)
        x = activation_fn(self.activation)(x)
        return ns.replace(feat=jnp.where(ns.mask[..., None], x, 0.0))


class ConvBlockWithSkip(nn.Module):
    """SplineConv + linear skip, summed before activation
    (reference: conv.py:31-56)."""

    in_channels: int
    out_channels: int
    skip_in_channels: int
    max_value: float
    activation: str = "relu"
    kernel_size: int = 5
    node_chunk: int = 2048

    @nn.compact
    def __call__(self, ns: NodeSet, skip_feat: jnp.ndarray,
                 train: bool = False, basis=None) -> NodeSet:
        x = SplineConvLayer(
            self.in_channels, self.out_channels, self.max_value,
            kernel_size=self.kernel_size, node_chunk=self.node_chunk,
            name="conv",
        )(ns, basis)
        x = MaskedBatchNorm(self.out_channels, name="norm")(x, ns.mask, train)

        s = nn.Dense(self.out_channels, use_bias=False, name="lin")(skip_feat)
        s = MaskedBatchNorm(self.out_channels, name="norm_skip")(s, ns.mask, train)

        x = activation_fn(self.activation)(x + s)
        return ns.replace(feat=jnp.where(ns.mask[..., None], x, 0.0))


class Layer(nn.Module):
    """Residual pair: ConvBlock + ConvBlockWithSkip
    (reference: conv.py:59-72)."""

    in_channels: int
    out_channels: int
    max_value: float
    activation: str = "relu"
    kernel_size: int = 5
    node_chunk: int = 2048

    @nn.compact
    def __call__(self, ns: NodeSet, train: bool = False) -> NodeSet:
        skip_feat = ns.feat
        # compute the level's conv basis once and share it across both
        # convs — at the event level this trades an 80 MB [N, K, 25]
        # buffer for the second conv's 800k-index position gather
        # (gathers, not dense HBM reads, are the slow primitive here)
        from dagr_tpu.ops.spline import level_basis

        basis = level_basis(
            ns, max_value=self.max_value, kernel_size=self.kernel_size,
        )
        ns = ConvBlock(
            self.in_channels, self.out_channels, self.max_value,
            self.activation, self.kernel_size, self.node_chunk,
            name="conv_block1",
        )(ns, train, basis)
        ns = ConvBlockWithSkip(
            self.out_channels, self.out_channels, self.in_channels,
            self.max_value, self.activation, self.kernel_size,
            self.node_chunk, name="conv_block2",
        )(ns, skip_feat, train, basis)
        return ns
