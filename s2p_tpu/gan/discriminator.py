"""Multiscale PatchGAN discriminator (SPADE/pix2pixHD lineage).

Spec: /root/reference/README.md:73 (architecture borrows from NVlabs/SPADE)
and BASELINE.json ("multiscale PatchGAN discriminator"). Each scale is an
N-layer 4×4 stride-2 conv stack with instance norm + leaky-relu; the input
to scale k is the scale-(k-1) input average-pooled by 2. All intermediate
activations are returned for the feature-matching loss.

Conditioning: the discriminator judges (condition, image) pairs where the
condition is the previous image concatenated with the state broadcast
spatially — the direct analog of SPADE's (segmap, image) concat, carrying
both of S2P's modalities.
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp


def avg_pool_2x(x: jax.Array) -> jax.Array:
    """3×3 stride-2 average pool, pad 1, edge pixels averaged over the valid
    window only (matches torch ``count_include_pad=False`` semantics so the
    torch converter stays bit-faithful)."""
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    window = (1, 3, 3, 1)
    strides = (1, 2, 2, 1)
    pads = ((0, 0), (1, 1), (1, 1), (0, 0))
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, pads)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, strides, pads)
    return summed / counts


class InstanceNorm(nn.Module):
    """Affine-free instance norm (torch ``InstanceNorm2d(affine=False)``)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps)


class NLayerDiscriminator(nn.Module):
    """One PatchGAN scale; returns [feat_0, ..., feat_{n-1}, logits]."""

    ndf: int = 64
    n_layers: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        feats: List[jax.Array] = []
        c = self.ndf
        h = nn.Conv(c, (4, 4), strides=(2, 2), padding=[(2, 2), (2, 2)], name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)
        for i in range(1, self.n_layers):
            c = min(c * 2, 512)
            stride = 2 if i < self.n_layers - 1 else 1
            h = nn.Conv(
                c, (4, 4), strides=(stride, stride), padding=[(2, 2), (2, 2)],
                use_bias=False, name=f"conv{i}",
            )(h)
            h = InstanceNorm(name=f"norm{i}")(h)
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)
        logits = nn.Conv(1, (4, 4), padding=[(2, 2), (2, 2)], name="conv_out")(h)
        feats.append(logits)
        return feats


class MultiscaleDiscriminator(nn.Module):
    """num_scales PatchGANs over progressively pooled inputs.

    ``__call__(state, prev_image, image)`` builds the conditioned input once
    and returns a list (per scale) of lists (per layer) of features; the
    last entry of each inner list is the patch logit map."""

    num_scales: int = 2
    ndf: int = 64
    n_layers: int = 4

    @nn.compact
    def __call__(
        self, state: jax.Array, prev_image: jax.Array, image: jax.Array
    ) -> List[List[jax.Array]]:
        b, h, w, _ = image.shape
        state_map = jnp.broadcast_to(
            state[:, None, None, :], (b, h, w, state.shape[-1])
        )
        x = jnp.concatenate([prev_image, state_map, image], axis=-1)
        outs = []
        for s in range(self.num_scales):
            outs.append(
                NLayerDiscriminator(self.ndf, self.n_layers, name=f"scale{s}")(x)
            )
            if s < self.num_scales - 1:
                x = avg_pool_2x(x)
        return outs
