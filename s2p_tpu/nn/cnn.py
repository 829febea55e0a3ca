"""Generic CNN / deconv building blocks.

Capability contract follows the reference's rlkit conv nets
(rlkit/torch/networks/cnn.py:14-187 CNN, networks/dcnn.py DCNN): stacks of
conv (kernel/stride/padding per layer), optional norm + pooling, flatten,
then an MLP head; DCNN is the transposed mirror.

TPU-first design choice: images are **NHWC** (channels-last), the layout XLA
tiles best onto the MXU — the reference's NCHW tensors are transposed at the
converter boundary, not inside models. Conv + bias + activation are left to
XLA fusion.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from s2p_tpu.nn.mlp import Mlp


class ConvTranspose2dTorch(nn.Module):
    """Transposed conv with exact PyTorch ``ConvTranspose2d`` semantics.

    ``H_out = (H-1)*stride - 2*padding + kernel + output_padding`` — required
    for bit-parity with the reference's decoders (SLAC decoder
    rlkit/torch/slac/network/latent.py:55-113 and the SPADE-lineage GAN).
    flax's own ConvTranspose uses different padding conventions, so we lower
    directly to ``lax.conv_general_dilated`` with lhs dilation + flipped
    kernel, which is the mathematical definition of the fractionally-strided
    conv. Kernel stored flax-style (k, k, in, out); the torch converter maps
    torch's (in, out, k, k) into it.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, s, p, op = self.kernel_size, self.stride, self.padding, self.output_padding
        c_in = x.shape[-1]
        w = self.param("kernel", self.kernel_init, (k, k, c_in, self.features))
        w_flipped = w[::-1, ::-1]
        pad = (k - 1 - p, k - 1 - p + op)
        y = jax.lax.conv_general_dilated(
            x,
            w_flipped,
            window_strides=(1, 1),
            padding=(pad, pad),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + self.param("bias", self.bias_init, (self.features,))
        return y


class CNN(nn.Module):
    """Conv stack + MLP head over NHWC images."""

    channels: Sequence[int]
    kernel_sizes: Sequence[int]
    strides: Sequence[int]
    paddings: Sequence[int]
    hidden_sizes: Sequence[int] = ()
    output_size: Optional[int] = None
    hidden_activation: Callable = nn.relu
    output_activation: Optional[Callable] = None
    norm: Optional[str] = None  # None | 'layer' | 'group'
    pool_every: int = 0  # max-pool (2x2 stride 2) after every k-th conv
    init_w: float = 3e-3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert x.ndim >= 3, "expects (..., H, W, C)"
        lead = x.shape[:-3]
        h = x.reshape((-1,) + x.shape[-3:])
        for i, (c, k, s, p) in enumerate(
            zip(self.channels, self.kernel_sizes, self.strides, self.paddings, strict=True)
        ):
            h = nn.Conv(
                c, (k, k), strides=(s, s), padding=[(p, p), (p, p)], name=f"conv{i}"
            )(h)
            if self.norm == "layer":
                h = nn.LayerNorm(name=f"norm{i}")(h)
            elif self.norm == "group":
                h = nn.GroupNorm(num_groups=min(32, c), name=f"norm{i}")(h)
            h = self.hidden_activation(h)
            if self.pool_every and (i + 1) % self.pool_every == 0:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = h.reshape(h.shape[0], -1)
        if self.output_size is not None:
            h = Mlp(
                hidden_sizes=self.hidden_sizes,
                output_size=self.output_size,
                init_w=self.init_w,
                hidden_activation=self.hidden_activation,
                output_activation=self.output_activation,
                name="head",
            )(h)
        return h.reshape(lead + h.shape[1:])


class DCNN(nn.Module):
    """MLP stem + transposed-conv stack producing NHWC images
    (reference: rlkit/torch/networks/dcnn.py)."""

    fc_hidden_sizes: Sequence[int]
    deconv_input_shape: Tuple[int, int, int]  # (H, W, C) of the conv stem
    channels: Sequence[int]
    kernel_sizes: Sequence[int]
    strides: Sequence[int]
    paddings: Sequence[int]
    hidden_activation: Callable = nn.relu
    output_activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        lead = x.shape[:-1]
        h = x.reshape(-1, x.shape[-1])
        H, W, C = self.deconv_input_shape
        h = Mlp(
            hidden_sizes=self.fc_hidden_sizes,
            output_size=H * W * C,
            hidden_activation=self.hidden_activation,
            name="stem",
        )(h)
        h = self.hidden_activation(h).reshape(-1, H, W, C)
        n = len(self.channels)
        for i, (c, k, s, p) in enumerate(
            zip(self.channels, self.kernel_sizes, self.strides, self.paddings, strict=True)
        ):
            h = ConvTranspose2dTorch(
                c, kernel_size=k, stride=s, padding=p, name=f"deconv{i}"
            )(h)
            if i < n - 1:
                h = self.hidden_activation(h)
        if self.output_activation is not None:
            h = self.output_activation(h)
        return h.reshape(lead + h.shape[1:])
