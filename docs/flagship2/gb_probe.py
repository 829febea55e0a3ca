"""Third fusion round probe (VERDICT r4 #3): the γ/β modulation convs.

The session-19 ablation ladder pinned 76% of the post-fusion step on the
mlp_gamma/mlp_beta convs. The r5 roofline correction (docs/E2E_RESULTS.md)
showed the whole fast path already runs at ~67% of the bf16 MXU roof, so
the realistic prize here is Amdahl-bounded at ~1.2–1.3×. This probe
measures, per γ/β conv shape in the 64px ngf=64 generator:

  1. the standalone XLA bf16 conv's TFLOP/s and % of the 197-TFLOP/s
     bf16 peak (which shapes, if any, under-perform);
  2. an int8×int8→int32 conv of the same shape vs the 394-TOP/s int8
     peak (the one lever with a 2× ceiling — v5e's MXU doubles int8);
  3. a wide-N variant for the N=128 cells (γ‖β of norm_0‖norm_1 batched
     as if independent — an upper bound on what extra N-tiling buys;
     NOT semantically valid, dependency-wise, for adoption).

Each timing runs the op inside a lax.scan (iota-scaled inputs so XLA
cannot hoist the conv as loop-invariant) to amortize dispatch. Adoption
decision: only wire an int8 path into fast_inference if (a) the int8
conv wins ≥1.3× on the dominant shapes here AND (b) the end-to-end
PSNR-vs-bf16 A/B stays visually clean; otherwise record the negative.

Run on the chip: PYTHONPATH=/root/repo:/root/.axon_site python -u
docs/flagship2/gb_probe.py [--iters 50] [--batch 256] [--smoke]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

BF16_PEAK = 197e12
INT8_PEAK = 394e12

# (label, H, W, Cout_per_conv) for every γ/β conv in the 64px ngf=64
# generator (Cin is always mat_hidden=128; the fused mlp_gb conv emits
# 2*C). norm_1's C is fmid=min(cin,cout); norm_s exists when cin!=cout.
GB_SHAPES = [
    ("b0.n0 4x4 2C=1024", 4, 4, 1024),
    ("b0.n1 4x4 2C=1024", 4, 4, 1024),
    ("b1.n0 8x8 2C=1024", 8, 8, 1024),
    ("b1.n1 8x8 2C=512", 8, 8, 512),
    ("b1.ns 8x8 2C=1024", 8, 8, 1024),
    ("b2.n0 16x16 2C=512", 16, 16, 512),
    ("b2.n1 16x16 2C=256", 16, 16, 256),
    ("b2.ns 16x16 2C=512", 16, 16, 512),
    ("b3.n0 32x32 2C=256", 32, 32, 256),
    ("b3.n1 32x32 2C=128", 32, 32, 128),
    ("b3.ns 32x32 2C=256", 32, 32, 256),
    ("b4.n0 64x64 2C=128", 64, 64, 128),
    ("b4.n1 64x64 2C=128", 64, 64, 128),
]
CIN = 128


def _conv(x, k, out_dtype=None):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype,
    )


def timed_scan(op, x0, n_iters: int) -> float:
    """Seconds per op application, op scanned n_iters times with an
    iteration-dependent input perturbation (defeats loop hoisting)."""

    @jax.jit
    def run(x0):
        def body(c, i):
            y = op(c, i)
            return y, ()
        y, _ = jax.lax.scan(body, x0, jnp.arange(n_iters))
        return y

    r = run(x0)
    jax.device_get(jnp.asarray(r).ravel()[0])  # warmup + materialize
    t0 = time.perf_counter()
    r = run(x0)
    jax.device_get(jnp.asarray(r).ravel()[0])
    dt = time.perf_counter() - t0
    return dt / n_iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny dims on CPU for a logic check")
    args = ap.parse_args()
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    B = 8 if args.smoke else args.batch
    iters = 4 if args.smoke else args.iters
    shapes = GB_SHAPES[:3] if args.smoke else GB_SHAPES
    print(f"backend={jax.default_backend()} batch={B} iters={iters}")

    key = jax.random.PRNGKey(0)
    total_bf16_us = 0.0
    total_int8_us = 0.0
    print(f"{'shape':24s} {'bf16 us':>9s} {'TF/s':>7s} {'%bf16':>6s}"
          f" {'int8 us':>9s} {'TOP/s':>7s} {'%int8':>6s} {'i8/bf16':>8s}")
    for label, H, W, N in shapes:
        k1, k2, key = jax.random.split(key, 3)
        x = jax.random.normal(k1, (B, H, W, CIN), jnp.bfloat16)
        k = jax.random.normal(k2, (3, 3, CIN, N), jnp.bfloat16)
        flops = 2.0 * B * H * W * 9 * CIN * N

        # bf16: perturb input per-iteration via a cheap scale so the conv
        # stays in the loop; fold a slice of the output back into the
        # carry so the op chain is data-dependent end to end
        def op_bf16_carry(c, i, k=k):
            y = _conv(c * (1.0 + 1e-6 * i.astype(jnp.bfloat16)), k)
            return c + y[..., :CIN].astype(jnp.bfloat16) * jnp.bfloat16(1e-6)

        t_bf16 = timed_scan(lambda c, i: op_bf16_carry(c, i), x, iters)

        xi8 = (x * 10).astype(jnp.int8)
        ki8 = (k * 10).astype(jnp.int8)

        def op_int8_carry(c, i, ki8=ki8):
            y = _conv(c, ki8, out_dtype=jnp.int32)
            # cheap data-dependent fold so the conv isn't hoisted/elided
            return c ^ (y[..., :CIN] & 1).astype(jnp.int8) ^ (
                i.astype(jnp.int8) & 0)

        try:
            t_int8 = timed_scan(lambda c, i: op_int8_carry(c, i), xi8, iters)
        except Exception as e:
            t_int8 = None
            print(f"  int8 failed for {label}: {type(e).__name__}: {e}",
                  file=sys.stderr)

        tf = flops / t_bf16 / 1e12
        line = (f"{label:24s} {t_bf16*1e6:9.1f} {tf:7.1f}"
                f" {100*flops/t_bf16/BF16_PEAK:6.1f}")
        total_bf16_us += t_bf16 * 1e6
        if t_int8:
            top = flops / t_int8 / 1e12
            line += (f" {t_int8*1e6:9.1f} {top:7.1f}"
                     f" {100*flops/t_int8/INT8_PEAK:6.1f}"
                     f" {t_bf16/t_int8:8.2f}")
            total_int8_us += t_int8 * 1e6
        print(line, flush=True)

    print(f"\nTOTAL bf16 {total_bf16_us:.0f} us/iter"
          + (f"; int8 {total_int8_us:.0f} us/iter"
             f" (speedup {total_bf16_us/max(total_int8_us,1e-9):.2f}x)"
             if total_int8_us else ""))
    print(f"per-frame bf16 {total_bf16_us/B:.2f} us "
          f"(ladder attributed 55.3 us/frame incl. modulate consumers)")


if __name__ == "__main__":
    main()
