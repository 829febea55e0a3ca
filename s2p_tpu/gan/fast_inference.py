"""Fast-inference generator apply: constant-state-map modulation shortcut.

The generator's MAT condition is ``concat(state_map, image_feat)`` where
``state_map`` is a *spatially constant* broadcast of the state embedding
(generator.py S2PGenerator.__call__). A 3×3 zero-padded conv over a
constant map is a dense product for interior pixels plus border
corrections for the taps that fall outside:

    out(y, x) = e @ Σ_valid_taps K[ky, kx]
              = e @ K_sum                       (interior)
              − e @ Σ_kx K[0, kx]               (top row: ky=0 taps missing)
              − ...                             (bottom/left/right likewise)
              + e @ K[corner tap]               (corners: overlap added back)

So the state half of every ``mlp_shared`` conv (state_embed_dim input
channels at EVERY resolution and EVERY norm) collapses from an
O(H·W·9·S·F) conv to an O(S·F) dense plus O((H+W)·F) border fixups; only
the image half still pays a real conv. Mathematically exact, but float
re-association changes bits vs the fused conv — hence a separate apply
path (``fast_apply``), NOT the default: parity tests compare against
``S2PGenerator.apply`` with tolerance (docs/ROUND1_NOTES.md headroom #3).

Pure functions over the SAME param pytree the flax module trains/loads —
no re-export, no conversion; ``simple_test.py --fast_inference`` and the
benchmarks opt in.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from s2p_tpu.gan.generator import (
    PositionalEmbedding,
    S2PGenerator,
    instance_norm,
    upsample_nearest,
)


def _conv(x: jax.Array, p: Dict[str, Any], stride: int = 1) -> jax.Array:
    k = p["kernel"]
    pad = (k.shape[0] - 1) // 2
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        out = out + p["bias"]
    return out


def _dense(x: jax.Array, p: Dict[str, Any]) -> jax.Array:
    return x @ p["kernel"] + p["bias"]


def conv_const_map(e: jax.Array, kernel: jax.Array, H: int, W: int) -> jax.Array:
    """3×3 zero-padded conv applied to ``broadcast(e) → [B,H,W,S]``,
    computed without materializing the constant map. kernel [3,3,S,F]."""
    B = e.shape[0]
    full = e @ kernel.sum((0, 1))  # [B, F]
    top = e @ kernel[0].sum(0)
    bot = e @ kernel[2].sum(0)
    left = e @ kernel[:, 0].sum(0)
    right = e @ kernel[:, 2].sum(0)
    out = jnp.broadcast_to(full[:, None, None, :], (B, H, W, full.shape[-1]))
    out = out.at[:, 0, :, :].add(-top[:, None, :])
    out = out.at[:, H - 1, :, :].add(-bot[:, None, :])
    out = out.at[:, :, 0, :].add(-left[:, None, :])
    out = out.at[:, :, W - 1, :].add(-right[:, None, :])
    # corners subtracted their overlap tap twice — add it back once
    out = out.at[:, 0, 0, :].add(e @ kernel[0, 0])
    out = out.at[:, 0, W - 1, :].add(e @ kernel[0, 2])
    out = out.at[:, H - 1, 0, :].add(e @ kernel[2, 0])
    out = out.at[:, H - 1, W - 1, :].add(e @ kernel[2, 2])
    return out


def _mat_norm_fast(
    x: jax.Array, e: jax.Array, image_feat: jax.Array, p: Dict[str, Any],
    use_pallas: bool = False,
) -> jax.Array:
    """MATNorm with the shared conv split: state half via the constant-map
    shortcut, image half as a real conv (mat_mode='mat' layout: cond =
    [state_map ‖ image_feat] along channels). ``use_pallas`` routes the
    final norm+modulation through the fused VMEM kernel
    (gan/pallas_kernels.py; shapes it can't tile fall back to plain)."""
    S = e.shape[-1]
    k = p["mlp_shared"]["kernel"]  # [3, 3, S + C_img, hidden]
    H, W = x.shape[1], x.shape[2]
    h_state = conv_const_map(e, k[:, :, :S, :], H, W)
    h_img = jax.lax.conv_general_dilated(
        image_feat, k[:, :, S:, :], window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    h = jax.nn.relu(h_state + h_img + p["mlp_shared"]["bias"])
    gamma = _conv(h, p["mlp_gamma"])
    beta = _conv(h, p["mlp_beta"])
    if use_pallas:
        from s2p_tpu.gan.pallas_kernels import fused_mat_norm

        return fused_mat_norm(x, gamma, beta)
    return instance_norm(x) * (1.0 + gamma) + beta


def _res_block_fast(
    x: jax.Array, e: jax.Array, image_feat: jax.Array, p: Dict[str, Any],
    use_pallas: bool = False,
) -> jax.Array:
    h = _mat_norm_fast(x, e, image_feat, p["norm_0"], use_pallas)
    h = jax.nn.leaky_relu(h, 0.2)
    h = _conv(h, p["conv_0"])
    h = _mat_norm_fast(h, e, image_feat, p["norm_1"], use_pallas)
    h = jax.nn.leaky_relu(h, 0.2)
    h = _conv(h, p["conv_1"])
    if "conv_s" in p:
        s = _mat_norm_fast(x, e, image_feat, p["norm_s"], use_pallas)
        s = _conv(s, p["conv_s"])
    else:
        s = x
    return s + h


def fast_apply(
    gen: S2PGenerator, variables: Dict[str, Any],
    state: jax.Array, prev_image: jax.Array,
    use_pallas: bool = False,
) -> jax.Array:
    """Drop-in for ``gen.apply(variables, state, prev_image)`` (mat_mode
    'mat' only); same params, same output up to float re-association."""
    assert gen.mat_mode == "mat", "fast path specializes the MAT layout"
    p = variables["params"]
    sizes = gen.sizes

    # image encoder pyramid
    feats: List[jax.Array] = []
    h = prev_image
    for i in range(len(gen.encoder_channels)):
        h = _conv(h, p["img_enc"][f"enc{i}"], stride=1 if i == 0 else 2)
        h = jax.nn.leaky_relu(h, 0.2)
        feats.append(h)
    enc_by_size = {f.shape[1]: f for f in feats}

    # state embedding
    e = PositionalEmbedding(gen.state_freqs).apply({}, state)
    e = jax.nn.leaky_relu(_dense(e, p["state_fc0"]), 0.2)
    e = jax.nn.leaky_relu(_dense(e, p["state_fc1"]), 0.2)

    hw0 = sizes[0]
    x = _dense(e, p["seed_fc"])
    x = x.reshape(x.shape[0], hw0, hw0, -1)

    for i, size in enumerate(sizes):
        x = _res_block_fast(x, e, enc_by_size[size], p[f"block_{i}"],
                            use_pallas)
        if i < len(sizes) - 1:
            x = upsample_nearest(x, sizes[i + 1])

    x = jax.nn.leaky_relu(x, 0.2)
    x = _conv(x, p["conv_img"])
    return jnp.tanh(x)


@partial(jax.jit, static_argnums=(0, 4))
def _fast_rollout(gen, variables, init_image, states, use_pallas=False):
    """seq_len autoregressive generation with the fast apply
    (gan/rollout.py::generate_rollout contract: states [T, B, S])."""

    def step(img, s):
        nxt = fast_apply(gen, variables, s, img, use_pallas)
        return nxt, nxt

    _, frames = jax.lax.scan(step, init_image, states)
    return frames


def generate_rollout_fast(gen, variables, init_image, states,
                          use_pallas: bool = False):
    return _fast_rollout(gen, variables, init_image, states, use_pallas)
