"""SLAC sequential latent-variable model.

Capability contract (reference: rlkit/torch/slac/network/latent.py):

- factorized latent z = (z1 ‖ z2) with z1_dim=32, z2_dim=256;
  priors/posteriors are (256, 256) LeakyReLU(0.2) MLP Gaussian heads with
  ``softplus(std)+1e-5`` (latent.py:29-52), xavier-uniform init
  (network/initializer.py);
- shared modules: q(z2|·) ≡ p(z2|·) and q(z2(0)|z1(0)) ≡ p(z2(0)|z1(0))
  (latent.py:210-219) — shared here by construction (same submodule);
- conv Encoder and deconv Decoder with exact 64px and 100px layer
  configurations (latent.py:55-171); decoder output std = √0.1
  (latent.py:231-235);
- reward head p(r|z(t), a(t), z(t+1)) (latent.py:221-226);
- ELBO = KL(post‖prior on z1) + image NLL + (1−done)-masked reward NLL,
  each ``.mean(dim=0).sum()`` (latent.py:283-311).

TPU-first notes: images are NHWC float in [0, 1] (the reference divides
uint8 by 255, slac/buffer.py:158-161); the 8-step posterior unroll is a
static Python loop over a fixed ``num_sequences`` — it traces once into a
single XLA program (the reference pays a Python loop per call,
latent.py:264-275). Sampling noise comes from explicit PRNG keys.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from s2p_tpu.nn.cnn import ConvTranspose2dTorch

xavier = nn.initializers.xavier_uniform()


class FixedGaussianParams(NamedTuple):
    """p(z1(0)) = N(0, std²I) (reference latent.py:12-26)."""

    dim: int
    std: float

    def __call__(self, batch: int) -> Tuple[jax.Array, jax.Array]:
        return (
            jnp.zeros((batch, self.dim)),
            jnp.full((batch, self.dim), self.std),
        )


class GaussianHead(nn.Module):
    """MLP → (mean, softplus(std)+1e-5) (reference latent.py:29-52)."""

    output_dim: int
    hidden_units: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        h = x
        for i, u in enumerate(self.hidden_units):
            h = nn.Dense(u, kernel_init=xavier, name=f"fc{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        h = nn.Dense(2 * self.output_dim, kernel_init=xavier,
                     name=f"fc{len(self.hidden_units)}")(h)
        mean, std = jnp.split(h, 2, axis=-1)
        return mean, jax.nn.softplus(std) + 1e-5


_ENCODER_CFG = {
    # (out_ch, kernel, stride, padding) per conv (reference latent.py:124-162)
    64: [(32, 5, 2, 2), (64, 3, 2, 1), (128, 3, 2, 1), (256, 3, 2, 1),
         (None, 4, 1, 0)],
    100: [(32, 5, 2, 2), (64, 3, 2, 1), (128, 3, 2, 1), (256, 3, 2, 1),
          (256, 3, 2, 1), (None, 4, 1, 0)],
}

_DECODER_CFG = {
    # (out_ch, kernel, stride, padding, output_padding) (latent.py:63-101)
    64: [(256, 4, 1, 0, 0), (128, 3, 2, 1, 1), (64, 3, 2, 1, 1),
         (32, 3, 2, 1, 1), (None, 5, 2, 2, 1)],
    100: [(256, 4, 1, 0, 0), (256, 3, 2, 1, 0), (128, 3, 2, 1, 0),
          (64, 3, 2, 1, 0), (32, 3, 2, 1, 1), (None, 5, 2, 2, 1)],
}


class SlacEncoder(nn.Module):
    """[B, S, H, W, C] in [0,1] → features [B, S, feature_dim]."""

    feature_dim: int = 256
    image_size: int = 64

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, S = x.shape[:2]
        h = x.reshape((B * S,) + x.shape[2:])
        for i, (c, k, s, p) in enumerate(_ENCODER_CFG[self.image_size]):
            c = c if c is not None else self.feature_dim
            h = nn.Conv(c, (k, k), strides=(s, s), padding=[(p, p), (p, p)],
                        kernel_init=xavier, name=f"conv{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        return h.reshape(B, S, -1)


class SlacDecoder(nn.Module):
    """z [B, S, z_dim] → (mean [B, S, H, W, C], std) with std=√0.1."""

    out_channels: int = 3
    std: float = math.sqrt(0.1)
    image_size: int = 64

    @nn.compact
    def __call__(self, z: jax.Array) -> Tuple[jax.Array, jax.Array]:
        B, S, D = z.shape
        h = z.reshape(B * S, 1, 1, D)
        cfg = _DECODER_CFG[self.image_size]
        for i, (c, k, s, p, op) in enumerate(cfg):
            c = c if c is not None else self.out_channels
            h = ConvTranspose2dTorch(
                c, kernel_size=k, stride=s, padding=p, output_padding=op,
                kernel_init=xavier, name=f"deconv{i}",
            )(h)
            h = nn.leaky_relu(h, 0.2)
        h = h.reshape((B, S) + h.shape[1:])
        return h, jnp.full_like(h, self.std)


def calculate_kl_divergence(
    p_mean: jax.Array, p_std: jax.Array, q_mean: jax.Array, q_std: jax.Array
) -> jax.Array:
    """Elementwise KL(N(p)‖N(q)) (reference slac/utils.py:66-69)."""
    var_ratio = (p_std / q_std) ** 2
    t1 = ((p_mean - q_mean) / q_std) ** 2
    return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))


def create_feature_actions(
    feature_: jax.Array, action_: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """(fa(t), fa(t+1)) flattened windows (reference slac/utils.py:7-18)."""
    N = feature_.shape[0]
    f = feature_[:, :-1].reshape(N, -1)
    n_f = feature_[:, 1:].reshape(N, -1)
    a = action_[:, :-1].reshape(N, -1)
    n_a = action_[:, 1:].reshape(N, -1)
    return (
        jnp.concatenate([f, a], axis=-1),
        jnp.concatenate([n_f, n_a], axis=-1),
    )


class LatentModel(nn.Module):
    """Sequential VAE over (num_sequences+1)-frame windows."""

    action_dim: int
    feature_dim: int = 256
    z1_dim: int = 32
    z2_dim: int = 256
    hidden_units: Sequence[int] = (256, 256)
    image_size: int = 64
    channels: int = 3

    def setup(self) -> None:
        self.z1_prior_init = FixedGaussianParams(self.z1_dim, 1.0)
        # q(z2(0)|z1(0)) ≡ p(z2(0)|z1(0)); q(z2|·) ≡ p(z2|·): one module each
        self.z2_prior_init = GaussianHead(self.z2_dim, self.hidden_units)
        self.z1_prior = GaussianHead(self.z1_dim, self.hidden_units)
        self.z2_prior = GaussianHead(self.z2_dim, self.hidden_units)
        self.z1_posterior_init = GaussianHead(self.z1_dim, self.hidden_units)
        self.z1_posterior = GaussianHead(self.z1_dim, self.hidden_units)
        self.reward = GaussianHead(1, self.hidden_units)
        self.encoder = SlacEncoder(self.feature_dim, self.image_size)
        self.decoder = SlacDecoder(self.channels, math.sqrt(0.1), self.image_size)

    def __call__(self, state_, action_, reward_, done_, rng):
        """init-path = full ELBO computation."""
        return self.compute_loss(state_, action_, reward_, done_, rng)

    # -- sampling ----------------------------------------------------------
    def sample_posterior(self, features_: jax.Array, actions_: jax.Array, rng):
        """features [B, S+1, F], actions [B, S, A] →
        (z1_means, z1_stds, z1s, z2s) each [B, S+1, ·]
        (reference latent.py:250-281)."""
        S = actions_.shape[1]
        z1_mean, z1_std = self.z1_posterior_init(features_[:, 0])
        rng, k = jax.random.split(rng)
        z1 = z1_mean + jax.random.normal(k, z1_std.shape) * z1_std
        z2_mean, z2_std = self.z2_prior_init(z1)
        rng, k = jax.random.split(rng)
        z2 = z2_mean + jax.random.normal(k, z2_std.shape) * z2_std

        z1_means, z1_stds, z1s, z2s = [z1_mean], [z1_std], [z1], [z2]
        # static unroll over the fixed window (traces to one XLA program)
        for t in range(1, S + 1):
            z1_mean, z1_std = self.z1_posterior(
                jnp.concatenate([features_[:, t], z2, actions_[:, t - 1]], axis=1)
            )
            rng, k = jax.random.split(rng)
            z1 = z1_mean + jax.random.normal(k, z1_std.shape) * z1_std
            z2_mean, z2_std = self.z2_prior(
                jnp.concatenate([z1, z2, actions_[:, t - 1]], axis=1)
            )
            rng, k = jax.random.split(rng)
            z2 = z2_mean + jax.random.normal(k, z2_std.shape) * z2_std
            z1_means.append(z1_mean)
            z1_stds.append(z1_std)
            z1s.append(z1)
            z2s.append(z2)
        stack = lambda xs: jnp.stack(xs, axis=1)
        return stack(z1_means), stack(z1_stds), stack(z1s), stack(z2s)

    def sample_prior(self, actions_: jax.Array, z2_post_: jax.Array):
        """prior z1 means/stds given posterior z2 trace
        (reference latent.py:239-248)."""
        S = actions_.shape[1]
        m0, s0 = self.z1_prior_init(actions_.shape[0])
        m_, s_ = self.z1_prior(
            jnp.concatenate([z2_post_[:, :S], actions_], axis=-1)
        )
        return (
            jnp.concatenate([m0[:, None], m_], axis=1),
            jnp.concatenate([s0[:, None], s_], axis=1),
        )

    # -- ELBO --------------------------------------------------------------
    def compute_loss(self, state_, action_, reward_, done_, rng):
        """state [B, S+1, H, W, C] in [0,1]; action [B, S, A]; reward/done
        [B, S, 1] → (loss_kld, loss_image, loss_reward)
        (reference latent.py:283-311)."""
        feature_ = self.encoder(state_)
        z1_mean_post, z1_std_post, z1_, z2_ = self.sample_posterior(
            feature_, action_, rng
        )
        z1_mean_pri, z1_std_pri = self.sample_prior(action_, z2_)

        kld = calculate_kl_divergence(
            z1_mean_post, z1_std_post, z1_mean_pri, z1_std_pri
        )
        loss_kld = jnp.sum(jnp.mean(kld, axis=0))

        z_ = jnp.concatenate([z1_, z2_], axis=-1)
        state_mean, state_std = self.decoder(z_)
        noise = (state_ - state_mean) / (state_std + 1e-8)
        ll = (-0.5 * noise**2 - jnp.log(state_std)) - 0.5 * math.log(2 * math.pi)
        loss_image = -jnp.sum(jnp.mean(ll, axis=0))

        x = jnp.concatenate([z_[:, :-1], action_, z_[:, 1:]], axis=-1)
        r_mean, r_std = self.reward(x)
        r_noise = (reward_ - r_mean) / (r_std + 1e-8)
        ll_r = (-0.5 * r_noise**2 - jnp.log(r_std)) - 0.5 * math.log(2 * math.pi)
        loss_reward = -jnp.sum(jnp.mean(ll_r * (1.0 - done_), axis=0))
        return loss_kld, loss_image, loss_reward

    # -- inference helpers --------------------------------------------------
    def encode(self, state_: jax.Array) -> jax.Array:
        return self.encoder(state_)

    def latent_z(self, features_: jax.Array, actions_: jax.Array, rng):
        """z trace [B, S+1, z1+z2] (posterior samples, no grads needed by
        callers — reference algo.py:127-141 wraps in no_grad)."""
        _, _, z1_, z2_ = self.sample_posterior(features_, actions_, rng)
        return jnp.concatenate([z1_, z2_], axis=-1)
