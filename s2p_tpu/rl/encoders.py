"""Pixel encoders and encoder-wrapped heads (the CURL/RAD image-RL path).

Capability contract (reference: examples/iql/custom_networks.py:4-97 —
conv OUT_DIM tables, ``Critic``/``VFunctionCritic`` with shared encoder,
``TanhGaussianPolicyWithEncoder`` :128-139 — plus the CURL contrastive
update invoked by the trainers' ``curl_learning`` flags, whose module the
checkout references but does not ship; rebuilt here from the public CURL
recipe: bilinear similarity W with detached key encoder).

Layout: NHWC pixel input in [0, 1]; ``detach_encoder`` becomes an explicit
``stop_gradient`` flag.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from s2p_tpu.nn.mlp import Mlp
from s2p_tpu.rl.policies import TanhGaussianPolicy

# conv output sizes for the 4-layer stride (2,1,1,1) CURL stem
# (reference custom_networks.py:4-11)
OUT_DIM_64 = {2: 29, 4: 25, 6: 21}
OUT_DIM_84 = {2: 39, 4: 35, 6: 31}
OUT_DIM_100 = {2: 47, 4: 43, 6: 39}
OUT_DIM_128 = {2: 61, 4: 57, 6: 53}


class PixelEncoder(nn.Module):
    """CURL-style conv stem: conv s2 + (n−1)× conv s1 (3×3, 32ch) →
    flatten → dense → layernorm → tanh."""

    feature_dim: int = 50
    num_layers: int = 4
    num_filters: int = 32

    @nn.compact
    def __call__(self, obs: jax.Array, detach: bool = False) -> jax.Array:
        h = obs
        h = nn.relu(nn.Conv(self.num_filters, (3, 3), strides=(2, 2),
                            padding="VALID", name="conv0")(h))
        for i in range(1, self.num_layers):
            h = nn.relu(nn.Conv(self.num_filters, (3, 3), strides=(1, 1),
                                padding="VALID", name=f"conv{i}")(h))
        h = h.reshape(h.shape[0], -1)
        if detach:
            h = jax.lax.stop_gradient(h)
        h = nn.Dense(self.feature_dim, name="fc")(h)
        h = nn.LayerNorm(name="ln")(h)
        return jnp.tanh(h)


class EncoderQfunction(nn.Module):
    """Q(encode(obs), action) (reference Qfunction with encoder,
    custom_networks.py:21-33)."""

    encoder: PixelEncoder
    hidden_sizes: Sequence[int] = (1024, 1024)

    @nn.compact
    def __call__(self, obs, action, detach_encoder: bool = False):
        feat = self.encoder(obs, detach=detach_encoder)
        return Mlp(hidden_sizes=self.hidden_sizes, output_size=1,
                   name="head")(jnp.concatenate([feat, action], axis=-1))


class EncoderVFunction(nn.Module):
    """V(encode(obs)) (reference VFunctionCritic, custom_networks.py:86-97)."""

    encoder: PixelEncoder
    hidden_sizes: Sequence[int] = (1024, 1024)

    @nn.compact
    def __call__(self, obs, detach_encoder: bool = False):
        feat = self.encoder(obs, detach=detach_encoder)
        return Mlp(hidden_sizes=self.hidden_sizes, output_size=1,
                   name="head")(feat)


class EncoderCritic(nn.Module):
    """Twin Q over a shared encoder; target evaluation = apply with the
    target param subtree (reference Critic, custom_networks.py:52-84)."""

    encoder: PixelEncoder
    hidden_sizes: Sequence[int] = (1024, 1024)

    def setup(self) -> None:
        self.qf1 = EncoderQfunction(self.encoder, self.hidden_sizes)
        self.qf2 = EncoderQfunction(self.encoder, self.hidden_sizes)

    def __call__(self, obs, action, detach_encoder: bool = False):
        return (
            self.qf1(obs, action, detach_encoder),
            self.qf2(obs, action, detach_encoder),
        )


class TanhGaussianPolicyWithEncoder(nn.Module):
    """Pixel policy: encoder (usually detached — the critic trains it) →
    TanhGaussian head (reference custom_networks.py:128-139)."""

    encoder: PixelEncoder
    action_dim: int
    hidden_sizes: Sequence[int] = (1024, 1024)

    @nn.compact
    def __call__(self, obs, detach_encoder: bool = True):
        feat = self.encoder(obs, detach=detach_encoder)
        return TanhGaussianPolicy(
            hidden_sizes=self.hidden_sizes, action_dim=self.action_dim,
            name="head",
        )(feat)


class CURL(nn.Module):
    """Contrastive bilinear head: logits[i, j] = z_a[i]·W·z_pos[j], rows
    max-subtracted; the InfoNCE label is the diagonal."""

    encoder: PixelEncoder

    @nn.compact
    def __call__(self, obs_anchor: jax.Array, obs_pos: jax.Array) -> jax.Array:
        z_a = self.encoder(obs_anchor)
        z_pos = jax.lax.stop_gradient(self.encoder(obs_pos))
        W = self.param(
            "W", nn.initializers.normal(1.0),
            (z_a.shape[-1], z_a.shape[-1]),
        )
        logits = z_a @ W @ z_pos.T
        return logits - jnp.max(logits, axis=1, keepdims=True)


def curl_loss(logits: jax.Array) -> jax.Array:
    """InfoNCE with diagonal labels."""
    labels = jnp.arange(logits.shape[0])
    return jnp.mean(
        -jax.nn.log_softmax(logits, axis=1)[labels, labels]
    )
