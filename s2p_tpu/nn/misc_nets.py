"""Misc network components.

Capability contracts:
- ``SpatialSoftmaxEncoder``/``FeatPointMlp`` (reference: rlkit/torch/
  networks/feat_point_mlp.py): conv stem → per-feature-map spatial softmax
  with temperature → (x, y) expected keypoints → MLP decoder (an
  autoencoder over downsampled images in the reference).
- ``ImageStatePolicy``/``ImageStateQ`` (reference: networks/image_state.py):
  switch between an image tower and a state tower on a flat concat input.
- ``PretrainedCNN`` (reference: networks/pretrained_cnn.py): frozen-or-not
  feature extractor + MLP head composition.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from s2p_tpu.nn.mlp import Mlp


def spatial_softmax(features: jax.Array, temperature: float = 1.0) -> jax.Array:
    """NHWC feature maps → [B, C·2] expected (x, y) keypoints."""
    B, H, W, C = features.shape
    flat = features.reshape(B, H * W, C) / temperature
    probs = jax.nn.softmax(flat, axis=1).reshape(B, H, W, C)
    ys = jnp.linspace(-1.0, 1.0, H)[None, :, None, None]
    xs = jnp.linspace(-1.0, 1.0, W)[None, None, :, None]
    ey = jnp.sum(probs * ys, axis=(1, 2))  # [B, C]
    ex = jnp.sum(probs * xs, axis=(1, 2))
    return jnp.concatenate([ex, ey], axis=-1)


class SpatialSoftmaxEncoder(nn.Module):
    """conv(5,2)→conv(5,1)→conv(5,1, num_feat_points ch) → spatial softmax
    (reference FeatPointMlp.encoder)."""

    num_feat_points: int
    temperature: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.relu(nn.Conv(48, (5, 5), strides=(2, 2), padding="VALID",
                            name="conv1")(x))
        h = nn.relu(nn.Conv(48, (5, 5), padding="VALID", name="conv2")(h))
        h = nn.Conv(self.num_feat_points, (5, 5), padding="VALID",
                    name="conv3")(h)
        return spatial_softmax(h, self.temperature)


class FeatPointMlp(nn.Module):
    """Keypoint autoencoder: spatial-softmax encoder → MLP decoder to a
    downsampled image (reference feat_point_mlp.py forward)."""

    num_feat_points: int
    input_channels: int = 3
    downsample_size: int = 8
    temperature: float = 1.0

    def setup(self) -> None:
        self.encoder = SpatialSoftmaxEncoder(
            self.num_feat_points, self.temperature
        )
        d = self.downsample_size
        self.decoder = Mlp(
            hidden_sizes=(400, 300), output_size=self.input_channels * d * d
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        d = self.downsample_size
        out = self.decoder(self.encoder(x))
        return out.reshape(-1, d, d, self.input_channels)

    def encode(self, x: jax.Array) -> jax.Array:
        return self.encoder(x)


class ImageStatePolicy(nn.Module):
    """Route a flat [image ‖ state] input to exactly one tower
    (reference image_state.py:5-33)."""

    image_net: Optional[Any] = None
    state_net: Optional[Any] = None
    image_dim: int = 21168  # reference's hard-coded 84*84*3 flat image

    @nn.compact
    def __call__(self, x: jax.Array):
        assert (self.image_net is None) != (self.state_net is None)
        if self.image_net is not None:
            return self.image_net(x[:, : self.image_dim])
        return self.state_net(x[:, self.image_dim :])


class ImageStateQ(nn.Module):
    """Q variant of the switch (reference image_state.py:36+)."""

    image_net: Optional[Any] = None
    state_net: Optional[Any] = None
    image_dim: int = 21168

    @nn.compact
    def __call__(self, x: jax.Array, action: jax.Array):
        assert (self.image_net is None) != (self.state_net is None)
        if self.image_net is not None:
            return self.image_net(
                jnp.concatenate([x[:, : self.image_dim], action], axis=-1)
            )
        return self.state_net(
            jnp.concatenate([x[:, self.image_dim :], action], axis=-1)
        )


class PretrainedCNN(nn.Module):
    """Feature extractor (optionally frozen via stop_gradient) + MLP head
    (reference networks/pretrained_cnn.py composition)."""

    feature_fn: Callable  # e.g. a bound flax apply
    hidden_sizes: Sequence[int]
    output_size: int
    freeze_features: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        feat = self.feature_fn(x)
        if self.freeze_features:
            feat = jax.lax.stop_gradient(feat)
        feat = feat.reshape(feat.shape[0], -1)
        return Mlp(hidden_sizes=self.hidden_sizes,
                   output_size=self.output_size, name="head")(feat)
