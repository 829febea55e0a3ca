"""Pallas TPU kernels for the GAN hot path.

The S2P generator's non-matmul cost is dominated by the MAT norm's
instance-norm statistics + affine modulation: XLA lowers it as a reduction
pass plus an elementwise pass over large activations (HBM-bandwidth bound
at the top resolutions). ``fused_mat_norm`` performs the whole op —
per-(image, channel) mean/var over pixels, normalize, ``·(1+γ)+β`` — in a
single VMEM-resident kernel, one HBM read of x instead of two.

Layout: each image is processed as a ``[C, H·W]`` block (channels on
sublanes, pixels on lanes) so the pixel reduction is a lane reduction.
Mosaic tiling requires H·W % 128 == 0 and C % 8 == 0; other shapes (the
tiny low-resolution blocks, 100px odd sizes) fall back to the plain jnp
implementation — they are a negligible share of the runtime.

Wired into the fast-inference path behind the ``use_pallas`` opt-in
(fast_inference.fast_apply, ``simple_test.py --use_pallas``, and the
bench.py A/B); training uses the plain jnp implementation so autodiff
stays simple.

MEASURED VERDICT (round 3, real v5e chip, bench.py A/B at 64px/ngf=64):
plain 10,629 fps vs pallas 8,833 fps — the kernel LOSES (0.83x) and is
therefore not adopted (bench auto-picks the winner; ``use_pallas``
defaults False everywhere). Diagnosis: on the fast path the big
activations are already consumed by a single fused XLA
reduction+elementwise pair, and the NHWC→[C, HW] relayout this kernel
needs costs more HBM round-trips than the fusion saves. Kept as the A/B
harness + a worked Pallas example; do not enable by default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _plain(x, gamma, beta, eps):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    normed = (x - mean) * jax.lax.rsqrt(var + eps)
    return normed * (1.0 + gamma) + beta


@functools.partial(jax.jit, static_argnames=("eps",))
def fused_mat_norm(
    x: jax.Array, gamma: jax.Array, beta: jax.Array, eps: float = 1e-5
) -> jax.Array:
    """instance_norm(x) * (1 + gamma) + beta over NHWC, fused on TPU.

    Matches s2p_tpu.gan.generator.MATNorm's final compute (population var,
    eps inside the rsqrt)."""
    B, H, W, C = x.shape
    hw = H * W
    if jax.default_backend() not in ("tpu", "axon") or hw % 128 or C % 8:
        return _plain(x, gamma, beta, eps)

    # NHWC → [B, C, HW]: channels on sublanes, pixels on lanes
    to_chw = lambda t: t.reshape(B, hw, C).transpose(0, 2, 1)
    x3, g3, b3 = to_chw(x), to_chw(gamma), to_chw(beta)

    def kernel(x_ref, g_ref, b_ref, o_ref):
        xf = x_ref[0].astype(jnp.float32)  # [C, HW]
        mean = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.mean(xf * xf, axis=1, keepdims=True) - mean * mean
        inv = jax.lax.rsqrt(var + eps)
        out = (xf - mean) * inv * (1.0 + g_ref[0].astype(jnp.float32)) + b_ref[
            0
        ].astype(jnp.float32)
        o_ref[0] = out.astype(o_ref.dtype)

    spec = lambda: pl.BlockSpec(
        (1, C, hw), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[spec(), spec(), spec()],
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct((B, C, hw), x.dtype),
    )(x3, g3, b3)
    return out.transpose(0, 2, 1).reshape(B, H, W, C)
