"""Fast-inference apply (constant-state-map shortcut) parity vs the flax
generator — same params, same pixels up to float re-association."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2p_tpu.gan import S2PGenerator
from s2p_tpu.gan.fast_inference import (
    _const_map_from_t,
    conv_const_map,
    fast_apply,
    generate_rollout_fast,
)
from s2p_tpu.gan.rollout import generate_rollout

STATE_DIM = 17
KW = dict(ngf=8, state_freqs=2, state_embed_dim=16, mat_hidden=8)


def _setup(size):
    gen = S2PGenerator(image_size=size, **KW)
    rs = np.random.RandomState(0)
    s = jnp.asarray(rs.randn(2, STATE_DIM).astype(np.float32))
    img = jnp.asarray((rs.rand(2, size, size, 3).astype(np.float32) * 2) - 1)
    variables = gen.init(jax.random.PRNGKey(0), s, img)
    return gen, variables, s, img


def test_conv_const_map_matches_real_conv():
    """The dense+border shortcut equals an actual conv over the broadcast
    constant map, including the 1-pixel border and corners."""
    rs = np.random.RandomState(1)
    B, H, W, S, F = 2, 7, 5, 6, 4
    e = jnp.asarray(rs.randn(B, S).astype(np.float32))
    k = jnp.asarray(rs.randn(3, 3, S, F).astype(np.float32))
    const_map = jnp.broadcast_to(e[:, None, None, :], (B, H, W, S))
    ref = jax.lax.conv_general_dilated(
        const_map, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = conv_const_map(e, k, H, W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_const_map_border_masks_exact_in_bf16_at_large_res():
    """Border masks must compare INTEGER indices: a bf16 arange rounds
    indices above 256 to the 2-/4-spaced grid, so (ii == H-1) built in
    the param dtype would select several rows near the border and
    corrupt them (regression: masks are now built from integer arange
    and only cast afterwards)."""
    B, F, H, W = 1, 1, 512, 512
    # full-sum term 0; distinct values on each border/corner term
    t = np.zeros((B, 9, F), np.float32)
    t[:, 1:5, :] = [[1], [2], [3], [4]]       # top/bottom/left/right
    t[:, 5:9, :] = [[10], [20], [30], [40]]   # the 4 corners
    out = np.asarray(_const_map_from_t(jnp.asarray(t, jnp.bfloat16), H, W),
                     np.float32)[0, :, :, 0]
    # interior rows/cols untouched; each border correction hits EXACTLY
    # its one row/col even though 511 is not representable-adjacent in bf16
    assert (out[1:-1, 1:-1] == 0).all()
    assert (out[0, 1:-1] == -1).all() and (out[-1, 1:-1] == -2).all()
    assert (out[1:-1, 0] == -3).all() and (out[1:-1, -1] == -4).all()
    assert out[0, 0] == -1 - 3 + 10 and out[-1, -1] == -2 - 4 + 40


@pytest.mark.parametrize("size", [64, 100])
@pytest.mark.slow
def test_fast_apply_matches_module(size):
    gen, variables, s, img = _setup(size)
    ref = gen.apply(variables, s, img)
    out = fast_apply(gen, variables, s, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
@pytest.mark.parametrize("size", [64, 100])
def test_fused_params_match_unfused(size):
    """fuse_fast_params (gamma‖beta conv fusion + per-block shared-conv
    concatenation + the global cmap_terms_all state matmul) computes the
    same dot products — pixels match the unfused fast apply tightly."""
    from s2p_tpu.gan.fast_inference import fuse_fast_params

    gen, variables, s, img = _setup(size)
    ref = fast_apply(gen, variables, s, img)
    fused_params = fuse_fast_params(variables["params"])
    assert "cmap_terms_all" in fused_params
    assert all(
        "shared_cat" in fused_params[f"block_{i}"] for i in range(5)
    )
    fused = dict(variables, params=fused_params)
    out = fast_apply(gen, fused, s, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_per_norm_fusion_fallback_matches():
    """block_level=False (the large-batch HBM-pressure fallback the bench
    sweep retries OOM cells with) keeps only the per-norm fusions and must
    produce the same pixels as the block-level fused path."""
    from s2p_tpu.gan.fast_inference import fuse_fast_params

    gen, variables, s, img = _setup(64)
    ref = fast_apply(
        gen, dict(variables, params=fuse_fast_params(variables["params"])),
        s, img)
    pn_params = fuse_fast_params(variables["params"], block_level=False)
    assert "cmap_terms_all" not in pn_params
    assert all("shared_cat" not in pn_params[f"block_{i}"] for i in range(5))
    assert "cmap_terms" in pn_params["block_0"]["norm_0"]  # per-norm kept
    out = fast_apply(gen, dict(variables, params=pn_params), s, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # and through the public rollout entry point
    rs = np.random.RandomState(3)
    states = jnp.asarray(rs.randn(2, 2, STATE_DIM).astype(np.float32))
    r_fused = generate_rollout_fast(gen, variables, img, states)
    r_pn = generate_rollout_fast(gen, variables, img, states,
                                 block_fusion=False)
    np.testing.assert_allclose(np.asarray(r_pn), np.asarray(r_fused),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_fast_rollout_matches_scan_rollout():
    gen, variables, s, img = _setup(64)
    rs = np.random.RandomState(2)
    states = jnp.asarray(rs.randn(3, 2, STATE_DIM).astype(np.float32))
    ref = generate_rollout(gen, variables, img, states)
    out = generate_rollout_fast(gen, variables, img, states)
    assert out.shape == ref.shape == (3, 2, 64, 64, 3)
    # autoregressive error compounds over steps; final frame stays close
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-3, atol=5e-3)


def test_gb_int8_path_close_and_optin():
    """Opt-in int8 γ/β path (fusion round 3): per-channel int8 weights +
    per-sample dynamically quantized activations, int32 accumulation.
    Quality bar: ≥40 dB PSNR vs the float fast path (measured ~51 dB) —
    far below the GAN's own ~30 dB reconstruction noise floor. The
    default (bf16) path must be bit-identical with the quantized
    operands merely present."""
    from s2p_tpu.gan.fast_inference import fuse_fast_params

    gen, variables, s, img = _setup(64)
    pf = fuse_fast_params(variables["params"], gb_int8=True)
    ref = fast_apply(gen, variables, s, img)
    out = fast_apply(gen, dict(variables, params=pf), s, img, gb_int8=True)
    mse = float(jnp.mean((ref - out) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
    assert psnr > 40.0, psnr
    out_bf16 = fast_apply(gen, dict(variables, params=pf), s, img,
                          gb_int8=False)
    np.testing.assert_allclose(np.asarray(out_bf16), np.asarray(ref),
                               atol=1e-5)


def test_gb_int8_rollout_runs():
    gen, variables, s, img = _setup(64)
    states = jnp.stack([s, s * 0.5])
    r_int8 = generate_rollout_fast(gen, variables, img, states,
                                   gb_int8=True)
    r_ref = generate_rollout_fast(gen, variables, img, states)
    mse = float(jnp.mean((r_ref - r_int8) ** 2))
    assert 10 * np.log10(4.0 / max(mse, 1e-12)) > 38.0
