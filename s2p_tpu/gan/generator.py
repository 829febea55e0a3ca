"""S2P generator — state-conditioned image synthesis, TPU-native.

Capability contract (the GAN source is absent from the reference checkout;
the public surface and architecture lineage are specified by
/root/reference/README.md:27-34,56-60,72-75 and /root/reference/rebuttal.md:
145-156,170-175):

- inputs: next state ``s_{t+1}`` (NeRF-style positional embedding,
  README.md:74) and previous image ``i_t``; output: image ``i_{t+1}``.
- SPADE-lineage conv generator: a low-resolution seed is progressively
  upsampled through residual blocks whose normalization layers are
  *spatially modulated* — but where SPADE computes the modulation γ/β from
  the semantic map alone, S2P's **MAT (Multi-modal Affine Transform)**
  computes them from BOTH the state embedding and previous-image features
  (rebuttal.md:145-156). The single-modality ablation **SAT**
  (rebuttal.md:170-175) is exposed via ``mat_mode``.
- zero-masking semantics fall out of the design: zeroing the state kills the
  agent, zeroing the previous image kills the background
  (rebuttal.md:79-80,126-128) because each modality enters only through its
  own modulation pathway.

TPU-first design choices:
- NHWC everywhere; convs + norm + activation left to XLA fusion; the full
  generator is one jit-traceable function with static shapes.
- Non-power-of-two image sizes (the RL pipeline is 100×100,
  examples/iql/mujoco_finetune.py:349) are handled by a ``ceil(n/2)``
  resolution chain: the image encoder's stride-2 convs (k3 s2 p1, out =
  floor((n-1)/2)+1 = ceil(n/2)) produce exactly the sizes the decoder's
  nearest-neighbor resizes step through, so encoder features align with
  decoder stages at every scale with no dynamic shapes.
- modulation conditioning (state broadcast ‖ encoder feature) is computed
  once per resolution and shared by both MAT norms of a block.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def resolution_chain(size: int, n_levels: int) -> List[int]:
    """Full-res → seed-res sizes via repeated ceil(n/2).

    E.g. 100 → [100, 50, 25, 13, 7]; 64 → [64, 32, 16, 8, 4].
    """
    sizes = [size]
    for _ in range(n_levels):
        sizes.append(-(-sizes[-1] // 2))
    return sizes


class PositionalEmbedding(nn.Module):
    """NeRF-style sinusoidal embedding of the low-dim state (README.md:74;
    frequency convention of the cited nerf-pytorch lineage: x·2^k)."""

    num_freqs: int = 6
    include_input: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        freqs = jnp.asarray([2.0**k for k in range(self.num_freqs)], x.dtype)
        xf = x[..., None] * freqs  # [..., S, F]
        enc = jnp.concatenate([jnp.sin(xf), jnp.cos(xf)], axis=-1)
        enc = enc.reshape(*x.shape[:-1], -1)
        if self.include_input:
            enc = jnp.concatenate([x, enc], axis=-1)
        return enc

    @staticmethod
    def out_dim(state_dim: int, num_freqs: int, include_input: bool = True) -> int:
        return state_dim * (2 * num_freqs + (1 if include_input else 0))


def upsample_nearest(x: jax.Array, out_size: int) -> jax.Array:
    """Nearest-neighbor upsample to (out_size, out_size), bit-faithful to
    torch ``F.interpolate(mode='nearest')``.

    Exact 2× (the 64px chain) lowers as broadcast+reshape — cheaper on TPU
    than a gather; the ceil(n/2) 100px chain's non-integer steps (7→13,
    13→25) use torch's index rule ``src = floor(dst·in/out)`` explicitly
    (jax.image.resize's nearest rounds differently — measured divergence)."""
    B, H, W, C = x.shape
    if out_size == 2 * H:
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
        return x.reshape(B, 2 * H, 2 * W, C)
    idx = jnp.arange(out_size) * H // out_size
    return x[:, idx][:, :, idx]


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Parameter-free instance norm over spatial dims (NHWC) — the
    normalization that MAT modulates (AdaIN family, rebuttal.md:151)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class MATNorm(nn.Module):
    """Multi-modal Affine Transform norm.

    Instance-normalizes ``x`` and modulates with spatial γ/β predicted from
    the fused condition map (state embedding broadcast ‖ previous-image
    encoder features at this resolution). ``mat_mode`` selects which
    modalities feed the modulation (SAT ablations, rebuttal.md:170-175).
    """

    hidden: int = 128
    mat_mode: str = "mat"  # 'mat' | 'sat_state' | 'sat_image'
    use_pallas: bool = False  # fused norm+modulation kernel (inference path)

    @nn.compact
    def __call__(self, x: jax.Array, state_map: jax.Array, image_feat: jax.Array) -> jax.Array:
        if self.mat_mode == "mat":
            cond = jnp.concatenate([state_map, image_feat], axis=-1)
        elif self.mat_mode == "sat_state":
            cond = state_map
        elif self.mat_mode == "sat_image":
            cond = image_feat
        else:
            raise ValueError(f"unknown mat_mode {self.mat_mode!r}")
        h = nn.Conv(self.hidden, (3, 3), padding=[(1, 1), (1, 1)], name="mlp_shared")(cond)
        h = nn.relu(h)
        gamma = nn.Conv(x.shape[-1], (3, 3), padding=[(1, 1), (1, 1)], name="mlp_gamma")(h)
        beta = nn.Conv(x.shape[-1], (3, 3), padding=[(1, 1), (1, 1)], name="mlp_beta")(h)
        if self.use_pallas:
            from s2p_tpu.gan.pallas_kernels import fused_mat_norm

            return fused_mat_norm(x, gamma, beta)
        return instance_norm(x) * (1.0 + gamma) + beta


class MATResBlock(nn.Module):
    """SPADE-style residual block with MAT norms.

    norm → lrelu(0.2) → conv3x3 → norm → lrelu → conv3x3, with a
    MAT-normed 1×1 shortcut when channel counts change (SPADE lineage,
    README.md:73)."""

    out_features: int
    mat_hidden: int = 128
    mat_mode: str = "mat"
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, state_map: jax.Array, image_feat: jax.Array) -> jax.Array:
        fmid = min(x.shape[-1], self.out_features)
        norm = lambda name: MATNorm(
            self.mat_hidden, self.mat_mode, self.use_pallas, name=name
        )
        h = norm("norm_0")(x, state_map, image_feat)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(fmid, (3, 3), padding=[(1, 1), (1, 1)], name="conv_0")(h)
        h = norm("norm_1")(h, state_map, image_feat)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.out_features, (3, 3), padding=[(1, 1), (1, 1)], name="conv_1")(h)
        if x.shape[-1] != self.out_features:
            s = norm("norm_s")(x, state_map, image_feat)
            s = nn.Conv(self.out_features, (1, 1), use_bias=False, name="conv_s")(s)
        else:
            s = x
        return s + h


class ImageEncoder(nn.Module):
    """Stride-2 pyramid over the previous image producing one feature map per
    generator resolution (the image half of MAT's multi-modal condition).

    k3 s2 p1 convs walk the exact ceil(n/2) chain the decoder upsamples
    through, so no resizing is needed to align scales."""

    channels: Sequence[int]  # per level, full-res first

    @nn.compact
    def __call__(self, img: jax.Array) -> List[jax.Array]:
        feats = []
        h = img
        for i, c in enumerate(self.channels):
            if i == 0:
                h = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)], name=f"enc{i}")(h)
            else:
                h = nn.Conv(
                    c, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], name=f"enc{i}"
                )(h)
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)
        return feats


class S2PGenerator(nn.Module):
    """``netG=s2p``: i_{t+1} = G(s_{t+1}, i_t).

    Reference CLI surface: train.py / simple_test.py ``--netG=s2p``
    (README.md:33,59). Progressive upsampling from a state-seeded
    ``hw0×hw0`` grid through MAT res-blocks to ``image_size``; tanh output
    in [-1, 1].
    """

    image_size: int = 64
    ngf: int = 64
    state_freqs: int = 6
    state_embed_dim: int = 256
    n_up: int = 4
    mat_hidden: int = 128
    mat_mode: str = "mat"
    out_channels: int = 3
    use_pallas: bool = False  # fused MAT-norm kernel (TPU inference path)

    @property
    def sizes(self) -> List[int]:
        """Decoder resolutions, seed-res first (e.g. [4, 8, 16, 32, 64])."""
        return resolution_chain(self.image_size, self.n_up)[::-1]

    @property
    def block_channels(self) -> List[Tuple[int, int]]:
        ngf = self.ngf
        ins = [8 * ngf, 8 * ngf, 4 * ngf, 2 * ngf, ngf]
        outs = [8 * ngf, 4 * ngf, 2 * ngf, ngf, ngf]
        return list(zip(ins[: self.n_up + 1], outs[: self.n_up + 1]))

    @property
    def encoder_channels(self) -> List[int]:
        ngf = self.ngf
        # full-res first, mirroring the decoder's channel progression
        return [ngf, 2 * ngf, 4 * ngf, 8 * ngf, 8 * ngf][: self.n_up + 1]

    @nn.compact
    def __call__(self, state: jax.Array, prev_image: jax.Array) -> jax.Array:
        """state [B, S] float32; prev_image [B, H, W, C] in [-1, 1]."""
        sizes = self.sizes
        blocks = self.block_channels
        enc_feats = ImageEncoder(self.encoder_channels, name="img_enc")(prev_image)
        enc_by_size = {f.shape[1]: f for f in enc_feats}

        e = PositionalEmbedding(self.state_freqs, name="pos_embed")(state)
        e = nn.Dense(self.state_embed_dim, name="state_fc0")(e)
        e = nn.leaky_relu(e, 0.2)
        e = nn.Dense(self.state_embed_dim, name="state_fc1")(e)
        e = nn.leaky_relu(e, 0.2)

        hw0 = sizes[0]
        x = nn.Dense(hw0 * hw0 * blocks[0][0], name="seed_fc")(e)
        x = x.reshape(x.shape[0], hw0, hw0, blocks[0][0])

        for i, (size, (_, c_out)) in enumerate(zip(sizes, blocks)):
            state_map = jnp.broadcast_to(
                e[:, None, None, :], (e.shape[0], size, size, e.shape[-1])
            )
            x = MATResBlock(
                c_out, self.mat_hidden, self.mat_mode, self.use_pallas,
                name=f"block_{i}",
            )(x, state_map, enc_by_size[size])
            if i < len(sizes) - 1:
                nxt = sizes[i + 1]
                x = upsample_nearest(x, nxt)

        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(
            self.out_channels, (3, 3), padding=[(1, 1), (1, 1)], name="conv_img"
        )(x)
        return jnp.tanh(x)
