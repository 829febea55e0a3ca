"""Attribute the fast-path generator's step cost by ablation (chip probe).

bench.py's round-4 sweep showed the headline plateaus at ~7.7% of the
MXU roof and ~8.2% of the HBM roof — neither matmul- nor
bandwidth-bound, so the time is going somewhere else (VPU pointwise
chains, instance-norm reduction passes, the constant-map border
scatter-adds, or op-dispatch latency inside the scan body). Profiling
through the tunneled axon backend is unreliable, so this probe measures
fps for the real fast path and a ladder of semantically-ablated variants
(each removes ONE class of work); the fps deltas attribute the cost.

Ablations (each is wrong numerically — attribution only):
  full          the real fast_apply rollout (bench.py headline path)
  no_border     conv_const_map without the 8 border/corner scatter-adds
  no_inorm      instance_norm replaced by identity (skips 2 reduction
                passes + rsqrt per MATNorm)
  no_gamma_beta MATNorm modulation replaced by relu(h) passthrough
                (skips the mlp_gamma/mlp_beta convs — MXU work)
  no_encoder    encoder pyramid replaced by zeros feats (skips 5 strided
                convs; MATNorm image-half convs still run)
  convs_only    res blocks reduced to conv_0/conv_1 (+shortcut) with no
                MATNorm at all

Usage: python docs/flagship2/perf_probe.py [--batch 256] [--rolls 16]
Prints one JSON line per variant; run on the chip (CPU works at tiny
dims for a smoke test: --batch 4 --rolls 1 --timed 1).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from s2p_tpu.gan import S2PGenerator
from s2p_tpu.gan import fast_inference as fi

SEQ_LEN = 8
IMAGE_SIZE = 64
STATE_DIM = 17


def conv_const_map_no_border(e, kernel, H, W):
    B = e.shape[0]
    full = e @ kernel.sum((0, 1))
    return jnp.broadcast_to(full[:, None, None, :], (B, H, W, full.shape[-1]))


def make_variant(name: str):
    """Monkeypatched fast_apply variant; returns a fast_apply-compatible fn."""
    orig_ccm = fi.conv_const_map
    orig_norm = fi.instance_norm

    def mat_norm_variant(x, e, image_feat, p, use_pallas=False):
        S = e.shape[-1]
        k = p["mlp_shared"]["kernel"]
        H, W = x.shape[1], x.shape[2]
        ccm = (conv_const_map_no_border if name == "no_border" else orig_ccm)
        h_state = ccm(e, k[:, :, :S, :], H, W)
        h_img = jax.lax.conv_general_dilated(
            image_feat, k[:, :, S:, :], window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        h = jax.nn.relu(h_state + h_img + p["mlp_shared"]["bias"])
        if name == "no_gamma_beta":
            # skip the gamma/beta convs; project h to x's channels via mean
            return x + h.mean(-1, keepdims=True)
        gamma = fi._conv(h, p["mlp_gamma"])
        beta = fi._conv(h, p["mlp_beta"])
        xn = x if name == "no_inorm" else orig_norm(x)
        return xn * (1.0 + gamma) + beta

    def res_block_variant(x, e, image_feat, p, use_pallas=False):
        if name == "convs_only":
            h = jax.nn.leaky_relu(x, 0.2)
            h = fi._conv(h, p["conv_0"])
            h = jax.nn.leaky_relu(h, 0.2)
            h = fi._conv(h, p["conv_1"])
            s = fi._conv(x, p["conv_s"]) if "conv_s" in p else x
            return s + h
        h = mat_norm_variant(x, e, image_feat, p["norm_0"], use_pallas)
        h = jax.nn.leaky_relu(h, 0.2)
        h = fi._conv(h, p["conv_0"])
        h = mat_norm_variant(h, e, image_feat, p["norm_1"], use_pallas)
        h = jax.nn.leaky_relu(h, 0.2)
        h = fi._conv(h, p["conv_1"])
        if "conv_s" in p:
            s = mat_norm_variant(x, e, image_feat, p["norm_s"], use_pallas)
            s = fi._conv(s, p["conv_s"])
        else:
            s = x
        return s + h

    def fast_apply_variant(gen, variables, state, prev_image):
        p = variables["params"]
        sizes = gen.sizes
        feats = []
        h = prev_image
        for i in range(len(gen.encoder_channels)):
            if name == "no_encoder":
                size = prev_image.shape[1] // (2 ** i)
                ch = p["img_enc"][f"enc{i}"]["kernel"].shape[-1]
                feats.append(jnp.zeros(
                    (prev_image.shape[0], size, size, ch), prev_image.dtype))
                continue
            h = fi._conv(h, p["img_enc"][f"enc{i}"], stride=1 if i == 0 else 2)
            h = jax.nn.leaky_relu(h, 0.2)
            feats.append(h)
        enc_by_size = {f.shape[1]: f for f in feats}

        e = fi.PositionalEmbedding(gen.state_freqs).apply({}, state)
        e = jax.nn.leaky_relu(fi._dense(e, p["state_fc0"]), 0.2)
        e = jax.nn.leaky_relu(fi._dense(e, p["state_fc1"]), 0.2)

        hw0 = sizes[0]
        x = fi._dense(e, p["seed_fc"])
        x = x.reshape(x.shape[0], hw0, hw0, -1)
        for i, size in enumerate(sizes):
            x = res_block_variant(x, e, enc_by_size[size], p[f"block_{i}"])
            if i < len(sizes) - 1:
                x = fi.upsample_nearest(x, sizes[i + 1])
        x = jax.nn.leaky_relu(x, 0.2)
        x = fi._conv(x, p["conv_img"])
        return jnp.tanh(x)

    return fast_apply_variant


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--rolls", type=int, default=16)
    ap.add_argument("--timed", type=int, default=3)
    args = ap.parse_args()

    gen = S2PGenerator(image_size=IMAGE_SIZE, ngf=64)
    key = jax.random.PRNGKey(0)
    state0 = jnp.zeros((args.batch, STATE_DIM), jnp.float32)
    prev0 = jnp.zeros((args.batch, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32)
    params = gen.init(key, state0, prev0)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)

    st = jax.random.normal(
        jax.random.PRNGKey(1),
        (args.rolls, SEQ_LEN, args.batch, STATE_DIM), jnp.bfloat16)
    ini = jax.random.uniform(
        jax.random.PRNGKey(2),
        (args.rolls, args.batch, IMAGE_SIZE, IMAGE_SIZE, 3),
        jnp.bfloat16, minval=-1.0, maxval=1.0)

    variants = ["full", "fused_v1", "unfused", "no_border", "no_inorm",
                "no_gamma_beta", "no_encoder", "convs_only"]
    results = {}
    for name in variants:
        params_v = params
        if name == "full":
            # production path: params pre-fused outside the scan, as in
            # _fast_rollout (gamma||beta conv + stacked const-map terms +
            # per-block shared-conv concat + global cmap_terms_all matmul)
            apply_fn = partial(fi.fast_apply, use_pallas=False)
            params_v = {"params": fi.fuse_fast_params(params["params"])}
        elif name == "fused_v1":
            # session-10 fusion ONLY (gamma||beta conv + stacked terms),
            # i.e. the config behind the 12,661-12,863 fps chip records —
            # strip the session-12 block-level keys so fast_apply takes
            # its per-norm fallback; the full-vs-fused_v1 delta
            # attributes the second fusion round
            apply_fn = partial(fi.fast_apply, use_pallas=False)
            fp = fi.fuse_fast_params(params["params"])
            fp.pop("cmap_terms_all", None)
            fp = {k: ({kk: vv for kk, vv in v.items() if kk != "shared_cat"}
                      if k.startswith("block_") else v)
                  for k, v in fp.items()}
            params_v = {"params": fp}
        elif name == "unfused":
            # raw params through fast_apply (on-the-fly per-step fusion);
            # unfused-vs-full is the total pre-fusion win
            apply_fn = partial(fi.fast_apply, use_pallas=False)
        else:
            apply_fn = make_variant(name)

        @jax.jit
        def run_multi(params, ini, st, apply_fn=apply_fn):
            def one(_, inp):
                i0, s_seq = inp

                def step(img, s):
                    nxt = apply_fn(gen, {"params": params}, s, img)
                    return nxt, nxt
                _, frames = jax.lax.scan(step, i0, s_seq)
                return (), frames
            _, frames = jax.lax.scan(one, (), (ini, st))
            return frames

        def run_once():
            return float(jax.device_get(
                run_multi(params_v["params"], ini, st).sum()))

        try:
            run_once()  # compile + warmup
            t0 = time.perf_counter()
            for _ in range(args.timed):
                run_once()
            dt = time.perf_counter() - t0
            fps = args.timed * args.rolls * SEQ_LEN * args.batch / dt
            results[name] = round(fps, 1)
        except Exception as e:  # attribution ladder: report and continue
            results[name] = f"error: {type(e).__name__}"
        print(json.dumps({"variant": name, "fps": results[name],
                          "backend": jax.default_backend()}), flush=True)

    full = results.get("full")
    if isinstance(full, (int, float)):
        # fused_v1/unfused ADD work relative to full (they are the
        # slower pre-fusion baselines, not ablations), so they belong in
        # a speedup table, not the removed-work attribution — the
        # "negative ~ noise" reading would mislabel the fusion win.
        baselines = ("fused_v1", "unfused")
        attrib = {k: (round(100 * (1 - full / v), 1)
                      if isinstance(v, (int, float)) and v > 0 else None)
                  for k, v in results.items()
                  if k != "full" and k not in baselines}
        print(json.dumps({"pct_step_time_attributed_to_removed_work": attrib,
                          "note": "1 - full_fps/variant_fps per ablation; "
                                  "negative ~ noise"}), flush=True)
        speedups = {k: (round(full / v, 3)
                        if isinstance(v, (int, float)) and v > 0 else None)
                    for k, v in results.items() if k in baselines}
        if speedups:
            print(json.dumps({"fusion_speedup_vs_baseline": speedups,
                              "note": "full_fps / baseline_fps; >1 means "
                                      "the fusion rounds help"}), flush=True)


if __name__ == "__main__":
    main()
