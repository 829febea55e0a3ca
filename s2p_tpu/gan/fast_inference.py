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


def _const_map_terms(kernel: jax.Array) -> jax.Array:
    """Stack the 9 border-correction kernel reductions of a [3,3,S,F]
    kernel into ONE [S, 9, F] operand so the constant-map shortcut is a
    single matmul instead of nine (chip probe: the 9 small dispatches +
    8 scatter-adds cost ~9% of the fast step). Order: full-sum, top,
    bottom, left, right, then the 4 corner taps."""
    return jnp.stack([
        kernel.sum((0, 1)),
        kernel[0].sum(0), kernel[2].sum(0),
        kernel[:, 0].sum(0), kernel[:, 2].sum(0),
        kernel[0, 0], kernel[0, 2], kernel[2, 0], kernel[2, 2],
    ], axis=1)  # [S, 9, F]


def _const_map_from_t(t: jax.Array, H: int, W: int) -> jax.Array:
    """Assemble the constant-map conv output from the per-batch reduced
    terms ``t = e @ terms`` [B, 9, F].

    Border corrections are expressed as broadcast mask arithmetic (one
    fused elementwise pass XLA folds into the consumer) instead of the
    previous 8 sequential ``.at[].add`` updates, each of which re-wrote
    the whole [B,H,W,F] buffer."""
    B = t.shape[0]
    full, top, bot, left, right, c00, c02, c20, c22 = (
        t[:, i, None, None, :] for i in range(9)
    )
    # masks compare INTEGER indices (comparing in t.dtype breaks for
    # half precision once H/W exceed the mantissa's exact-int range:
    # at bf16 H=1024, indices 1021..1023 all round to 1024 and the
    # bottom-border correction would hit three rows); only the 0/1 mask
    # is cast to the compute dtype
    ii = jnp.arange(H)[None, :, None, None]
    jj = jnp.arange(W)[None, None, :, None]
    ym0, ymH = (ii == 0).astype(t.dtype), (ii == H - 1).astype(t.dtype)
    xm0, xmW = (jj == 0).astype(t.dtype), (jj == W - 1).astype(t.dtype)
    # interior = full kernel sum; each border row/col misses one tap row/
    # col of the zero-padded conv; corners subtracted their overlap twice
    return (
        jnp.broadcast_to(full, (B, H, W, full.shape[-1]))
        - ym0 * top - ymH * bot - xm0 * left - xmW * right
        + (ym0 * xm0) * c00 + (ym0 * xmW) * c02
        + (ymH * xm0) * c20 + (ymH * xmW) * c22
    )


def _const_map_apply(e: jax.Array, terms: jax.Array, H: int, W: int) -> jax.Array:
    """Constant-map conv output from the stacked kernel terms [S, 9, F]."""
    return _const_map_from_t(jnp.einsum("bs,snf->bnf", e, terms), H, W)


def conv_const_map(e: jax.Array, kernel: jax.Array, H: int, W: int) -> jax.Array:
    """3×3 zero-padded conv applied to ``broadcast(e) → [B,H,W,S]``,
    computed without materializing the constant map. kernel [3,3,S,F]."""
    return _const_map_apply(e, _const_map_terms(kernel), H, W)


def _quantize_gb_kernel(kernel: jax.Array) -> Dict[str, Any]:
    """Per-output-channel symmetric int8 quantization of a γ‖β conv
    kernel [3,3,Cin,N] → int8 weights + f32 dequant scale [N]."""
    absmax = jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=(0, 1, 2))
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(kernel.astype(jnp.float32) / scale), -127, 127)
    return {"kernel_i8": q.astype(jnp.int8), "scale_w": scale}


def fuse_fast_params(params: Dict[str, Any],
                     block_level: bool = True,
                     gb_int8: bool = False) -> Dict[str, Any]:
    """Precompute the fused operands the fast path consumes, once,
    OUTSIDE the rollout scan (returns a copy; the original leaves stay
    so the flax apply/convert paths are unaffected):

    - ``mlp_gb``: mlp_gamma ‖ mlp_beta concatenated along output
      channels — the modulation convs are ~49% of the fast step's time
      (docs/flagship2/perf_probe.py, chip), and fusing them reads ``h``
      once and doubles the matmul width for the MXU.
    - ``cmap_terms`` [S, 9, F]: the constant-map kernel reductions.
    - ``k_img``: the image half of mlp_shared, pre-sliced.
    - per block, ``shared_cat``: the 2–3 norms of a block all condition on
      the SAME ``(e, image_feat)`` and their modulation inputs are
      independent of the block's dataflow, so their mlp_shared image-half
      convs concatenate into ONE conv (image_feat read once, 2–3× matmul
      width for the MXU); the per-norm hidden ``h`` maps are slices.
    - top-level ``cmap_terms_all`` [S, 9, ΣF]: every norm's constant-map
      terms across ALL blocks, concatenated in (block index, norm_0,
      norm_1, norm_s) order — the state-side reduction ``e @ terms`` is
      resolution-independent, so the whole network's state modulation
      collapses to ONE [B,S]×[S,9·ΣF] matmul per generator step
      (``fast_apply`` slices it per block).

    ``_mat_norm_fast``/``_res_block_fast`` fall back to on-the-fly
    fusion when these keys are absent, so unfused param pytrees remain
    drop-in.

    ``block_level=False`` keeps only the per-norm fusions (mlp_gb,
    cmap_terms, k_img) and skips shared_cat/cmap_terms_all: the block-
    level concat materializes a hidden map 2–3× wider per block (~3×128
    ch at the base resolution), which exhausts HBM at very large batch
    (observed: batch 4096 on v5e). Memory-pressure callers trade the
    ~+3% block-fusion win for a 3× smaller peak hidden-map footprint.

    ``gb_int8=True`` additionally pre-quantizes each fused γ‖β kernel to
    per-output-channel int8 (``mlp_gb_q``) for the opt-in int8
    modulation path (v5e's MXU doubles int8 throughput; the γ/β convs
    are 76% of the post-fusion step, docs/E2E_RESULTS.md session-19).
    NOT the default: output differs from bf16 by quantization noise —
    adoption is gated on the measured fps AND quality A/B
    (docs/flagship2/gb_probe.py, gb_int8_ab.py)."""
    def fuse_norm(n: Dict[str, Any], S: int) -> Dict[str, Any]:
        k = n["mlp_shared"]["kernel"]
        gb_kernel = jnp.concatenate(
            [n["mlp_gamma"]["kernel"], n["mlp_beta"]["kernel"]], -1)
        fused = dict(
            n,
            mlp_gb=dict(
                kernel=gb_kernel,
                bias=jnp.concatenate(
                    [n["mlp_gamma"]["bias"], n["mlp_beta"]["bias"]], -1),
            ),
            cmap_terms=_const_map_terms(k[:, :, :S, :]),
            k_img=k[:, :, S:, :],
        )
        if gb_int8:
            fused["mlp_gb_q"] = _quantize_gb_kernel(gb_kernel)
        return fused

    S = params["state_fc1"]["kernel"].shape[-1]
    out = dict(params)
    all_terms: List[jax.Array] = []
    i = 0
    while f"block_{i}" in params:
        name = f"block_{i}"
        block = params[name]
        out[name] = dict(block)
        norms = [n for n in ("norm_0", "norm_1", "norm_s") if n in block]
        for nname in norms:
            out[name][nname] = fuse_norm(block[nname], S)
        if block_level:
            fused = [out[name][n] for n in norms]
            out[name]["shared_cat"] = dict(
                kernel=jnp.concatenate([f["k_img"] for f in fused], -1),
                bias=jnp.concatenate(
                    [block[n]["mlp_shared"]["bias"] for n in norms], -1),
            )
            all_terms.extend(f["cmap_terms"] for f in fused)
        i += 1
    if all_terms:
        out["cmap_terms_all"] = jnp.concatenate(all_terms, -1)
    return out


def _mat_norm_fast(
    x: jax.Array, e: jax.Array, image_feat: jax.Array, p: Dict[str, Any],
    use_pallas: bool = False, gb_int8: bool = False,
) -> jax.Array:
    """MATNorm with the shared conv split: state half via the constant-map
    shortcut, image half as a real conv (mat_mode='mat' layout: cond =
    [state_map ‖ image_feat] along channels). ``use_pallas`` routes the
    final norm+modulation through the fused VMEM kernel
    (gan/pallas_kernels.py; shapes it can't tile fall back to plain)."""
    S = e.shape[-1]
    H, W = x.shape[1], x.shape[2]
    if "cmap_terms" in p:  # pre-fused by fuse_fast_params
        h_state = _const_map_apply(e, p["cmap_terms"], H, W)
        k_img = p["k_img"]
    else:
        k = p["mlp_shared"]["kernel"]  # [3, 3, S + C_img, hidden]
        h_state = conv_const_map(e, k[:, :, :S, :], H, W)
        k_img = k[:, :, S:, :]
    h_img = jax.lax.conv_general_dilated(
        image_feat, k_img, window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    h = jax.nn.relu(h_state + h_img + p["mlp_shared"]["bias"])
    return _modulate(x, h, p, use_pallas, gb_int8)


def _conv_gb_int8(h: jax.Array, q: Dict[str, Any],
                  bias: jax.Array) -> jax.Array:
    """γ‖β conv with int8 weights AND dynamically-quantized activations
    (per-sample symmetric absmax scale), int32 MXU accumulation, f32
    dequant. K-depth 9·128=1152 is exact in int32; the only error is the
    two operands' 8-bit rounding."""
    s_h = jnp.max(jnp.abs(h.astype(jnp.float32)), axis=(1, 2, 3),
                  keepdims=True)
    s_h = jnp.maximum(s_h, 1e-12) / 127.0
    qh = jnp.clip(jnp.round(h.astype(jnp.float32) / s_h), -127, 127)
    acc = jax.lax.conv_general_dilated(
        qh.astype(jnp.int8), q["kernel_i8"], window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (s_h * q["scale_w"]) + bias
    return out.astype(h.dtype)


def _modulate(
    x: jax.Array, h: jax.Array, p: Dict[str, Any], use_pallas: bool = False,
    gb_int8: bool = False,
) -> jax.Array:
    """γ/β conv over the norm's hidden map ``h``, then the modulated
    instance norm (the tail of MATNorm after mlp_shared+relu)."""
    if gb_int8 and "mlp_gb_q" in p:
        gb = _conv_gb_int8(h, p["mlp_gb_q"], p["mlp_gb"]["bias"])
    elif "mlp_gb" in p:
        gb = _conv(h, p["mlp_gb"])
    else:
        gb = _conv(h, dict(
            kernel=jnp.concatenate(
                [p["mlp_gamma"]["kernel"], p["mlp_beta"]["kernel"]], -1),
            bias=jnp.concatenate(
                [p["mlp_gamma"]["bias"], p["mlp_beta"]["bias"]], -1),
        ))
    gamma, beta = jnp.split(gb, 2, axis=-1)
    if use_pallas:
        from s2p_tpu.gan.pallas_kernels import fused_mat_norm

        return fused_mat_norm(x, gamma, beta)
    return instance_norm(x) * (1.0 + gamma) + beta


def _block_hidden_maps(
    image_feat: jax.Array, t_blk: jax.Array, p: Dict[str, Any],
    norms: List[str],
) -> List[jax.Array]:
    """All of a block's MATNorm hidden maps in one pass: ONE conv over
    ``image_feat`` (kernels concatenated across the block's norms) plus
    the pre-reduced state terms ``t_blk`` (sliced from the global
    ``e @ cmap_terms_all`` matmul), split back per norm."""
    sc = p["shared_cat"]
    H, W = image_feat.shape[1], image_feat.shape[2]
    h_img = jax.lax.conv_general_dilated(
        image_feat, sc["kernel"], window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    h_state = _const_map_from_t(t_blk, H, W)
    h = jax.nn.relu(h_state + h_img + sc["bias"])
    widths = [p[n]["mlp_shared"]["bias"].shape[0] for n in norms]
    splits = [sum(widths[: i + 1]) for i in range(len(widths) - 1)]
    return jnp.split(h, splits, axis=-1)


def _res_block_fast(
    x: jax.Array, e: jax.Array, image_feat: jax.Array, p: Dict[str, Any],
    use_pallas: bool = False, t_blk: jax.Array | None = None,
    gb_int8: bool = False,
) -> jax.Array:
    if t_blk is not None and "shared_cat" in p:
        norms = [n for n in ("norm_0", "norm_1", "norm_s") if n in p]
        hmaps = dict(zip(norms, _block_hidden_maps(image_feat, t_blk, p, norms)))
        mat_norm = lambda x, n: _modulate(x, hmaps[n], p[n], use_pallas,
                                          gb_int8)
    else:
        mat_norm = lambda x, n: _mat_norm_fast(x, e, image_feat, p[n],
                                               use_pallas, gb_int8)
    h = mat_norm(x, "norm_0")
    h = jax.nn.leaky_relu(h, 0.2)
    h = _conv(h, p["conv_0"])
    h = mat_norm(h, "norm_1")
    h = jax.nn.leaky_relu(h, 0.2)
    h = _conv(h, p["conv_1"])
    if "conv_s" in p:
        s = mat_norm(x, "norm_s")
        s = _conv(s, p["conv_s"])
    else:
        s = x
    return s + h


def fast_apply(
    gen: S2PGenerator, variables: Dict[str, Any],
    state: jax.Array, prev_image: jax.Array,
    use_pallas: bool = False, gb_int8: bool = False,
) -> jax.Array:
    """Drop-in for ``gen.apply(variables, state, prev_image)`` (mat_mode
    'mat' only); same params, same output up to float re-association
    (``gb_int8`` additionally introduces 8-bit quantization noise in the
    γ/β maps — opt-in, see fuse_fast_params)."""
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

    # the whole network's state-side modulation reduction in ONE matmul
    # (resolution-independent; sliced per block below)
    t_all = (
        jnp.einsum("bs,snf->bnf", e, p["cmap_terms_all"])
        if "cmap_terms_all" in p else None
    )

    off = 0
    for i, size in enumerate(sizes):
        blk = p[f"block_{i}"]
        t_blk = None
        if t_all is not None and "shared_cat" in blk:
            w = blk["shared_cat"]["kernel"].shape[-1]
            t_blk = jax.lax.slice_in_dim(t_all, off, off + w, axis=2)
            off += w
        x = _res_block_fast(x, e, enc_by_size[size], blk, use_pallas, t_blk,
                            gb_int8)
        if i < len(sizes) - 1:
            x = upsample_nearest(x, sizes[i + 1])

    x = jax.nn.leaky_relu(x, 0.2)
    x = _conv(x, p["conv_img"])
    return jnp.tanh(x)


@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _fast_rollout(gen, variables, init_image, states, use_pallas=False,
                  block_fusion=True, gb_int8=False):
    """seq_len autoregressive generation with the fast apply
    (gan/rollout.py::generate_rollout contract: states [T, B, S]).

    Params are pre-fused ONCE here, outside the scan, so the per-step
    body never re-concatenates loop-invariant kernels. ``block_fusion``
    toggles the block-level concat fusion (see fuse_fast_params): turn
    it off under HBM pressure at very large batch. ``gb_int8`` routes
    the γ/β convs through the opt-in int8 path."""
    variables = dict(variables, params=fuse_fast_params(
        variables["params"], block_level=block_fusion, gb_int8=gb_int8))

    def step(img, s):
        nxt = fast_apply(gen, variables, s, img, use_pallas, gb_int8)
        return nxt, nxt

    _, frames = jax.lax.scan(step, init_image, states)
    return frames


def generate_rollout_fast(gen, variables, init_image, states,
                          use_pallas: bool = False,
                          block_fusion: bool = True,
                          gb_int8: bool = False):
    return _fast_rollout(gen, variables, init_image, states, use_pallas,
                         block_fusion, gb_int8)
