"""Attribute the fast-path generator's step cost by ablation (chip probe).

bench.py's round-4 sweep plateaus at ~8% of the MXU roof and ~8% of the
HBM roof — neither matmul- nor bandwidth-bound, so the time goes to VPU
pointwise chains, reduction passes, or dispatch latency inside the scan
body. Profiling through the tunneled axon backend is unreliable, so this
probe measures fps for the real fast path and a ladder of semantically-
ablated variants (each removes ONE class of work); the fps deltas
attribute the cost.

The ladder ablates the POST-FUSION path (fuse_fast_params block-level
fusion — the production/headline configuration), so the attribution
reflects what still costs time after the two round-4 fusion rounds. The
session-10 ladder ablated the unfused structure; comparing those numbers
against the fused `full` mixes the fusion win into every rung.

Baselines (slower configurations, reported as speedups, not ablations):
  fused_v1      per-norm fusion only (session-10: gamma||beta conv +
                stacked const-map terms) — the 12,661–12,863 fps config
  unfused       raw params, on-the-fly per-step fusion

Ablations of the fused path (each is wrong numerically — attribution
only):
  no_border       constant-map assembled from the full-sum term only
                  (skips the 8 border/corner mask corrections)
  no_cmap         state-side modulation removed entirely (skips the
                  global [B,S]x[S,9*sumF] matmul + border assembly)
  no_shared_conv  per-block shared_cat conv over image_feat removed
                  (hidden maps from the state side only)
  no_inorm        instance_norm replaced by identity (skips 2 reduction
                  passes + rsqrt per norm)
  no_gb_conv      gamma/beta modulation removed: _modulate returns
                  instance_norm(x) (skips the mlp_gb convs — the widest
                  matmul class)
  no_encoder      encoder pyramid replaced by zeros feats (skips 5
                  strided convs; shared_cat convs still run)
  block_convs_1x1 conv_0/conv_1 reduced to their center tap (8/9 of the
                  res-block conv FLOPs removed; conv_s is 1x1 already)

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

ABLATIONS = ["no_border", "no_cmap", "no_shared_conv", "no_inorm",
             "no_gb_conv", "no_encoder", "block_convs_1x1"]
BASELINES = ["fused_v1", "unfused"]


def _center_tap(p):
    """3x3 conv params reduced to the center tap (pad 0 in fi._conv)."""
    out = dict(kernel=p["kernel"][1:2, 1:2])
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def make_fused_variant(name: str):
    """fast_apply clone over BLOCK-FUSED params with one work class
    removed. Mirrors fi.fast_apply/_res_block_fast/_block_hidden_maps/
    _modulate; keep in sync with gan/fast_inference.py."""

    def modulate_v(x, h, p):
        if name == "no_gb_conv":
            return fi.instance_norm(x)
        gamma, beta = jnp.split(fi._conv(h, p["mlp_gb"]), 2, axis=-1)
        xn = x if name == "no_inorm" else fi.instance_norm(x)
        return xn * (1.0 + gamma) + beta

    def block_hmaps_v(image_feat, t_blk, p, norms):
        sc = p["shared_cat"]
        H, W = image_feat.shape[1], image_feat.shape[2]
        h = jnp.asarray(0.0, image_feat.dtype)
        if name != "no_shared_conv":
            h = h + jax.lax.conv_general_dilated(
                image_feat, sc["kernel"], window_strides=(1, 1),
                padding=[(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if name == "no_border":
            full = t_blk[:, 0, None, None, :]
            h = h + jnp.broadcast_to(
                full, (t_blk.shape[0], H, W, full.shape[-1]))
        elif name != "no_cmap":
            h = h + fi._const_map_from_t(t_blk, H, W)
        h = jax.nn.relu(h + sc["bias"])
        widths = [p[n]["mlp_shared"]["bias"].shape[0] for n in norms]
        splits = [sum(widths[: i + 1]) for i in range(len(widths) - 1)]
        return jnp.split(h, splits, axis=-1)

    def res_block_v(x, e, image_feat, p, t_blk):
        norms = [n for n in ("norm_0", "norm_1", "norm_s") if n in p]
        hmaps = dict(zip(norms, block_hmaps_v(image_feat, t_blk, p, norms)))
        conv_0, conv_1 = p["conv_0"], p["conv_1"]
        if name == "block_convs_1x1":
            conv_0, conv_1 = _center_tap(conv_0), _center_tap(conv_1)
        h = modulate_v(x, hmaps["norm_0"], p["norm_0"])
        h = jax.nn.leaky_relu(h, 0.2)
        h = fi._conv(h, conv_0)
        h = modulate_v(h, hmaps["norm_1"], p["norm_1"])
        h = jax.nn.leaky_relu(h, 0.2)
        h = fi._conv(h, conv_1)
        if "conv_s" in p:
            s = modulate_v(x, hmaps["norm_s"], p["norm_s"])
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

        # no_cmap removes the global state matmul too (that IS part of
        # the work class being ablated); other variants keep it
        t_all = None
        if name != "no_cmap":
            t_all = jnp.einsum("bs,snf->bnf", e, p["cmap_terms_all"])

        off = 0
        for i, size in enumerate(sizes):
            blk = p[f"block_{i}"]
            w = blk["shared_cat"]["kernel"].shape[-1]
            if t_all is not None:
                t_blk = jax.lax.slice_in_dim(t_all, off, off + w, axis=2)
            else:
                # shape-only placeholder so split widths line up
                t_blk = jnp.zeros((x.shape[0], 9, w), x.dtype)
            off += w
            x = res_block_v(x, e, enc_by_size[size], blk, t_blk)
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
    fused = fi.fuse_fast_params(params["params"])

    st = jax.random.normal(
        jax.random.PRNGKey(1),
        (args.rolls, SEQ_LEN, args.batch, STATE_DIM), jnp.bfloat16)
    ini = jax.random.uniform(
        jax.random.PRNGKey(2),
        (args.rolls, args.batch, IMAGE_SIZE, IMAGE_SIZE, 3),
        jnp.bfloat16, minval=-1.0, maxval=1.0)

    variants = ["full"] + BASELINES + ABLATIONS
    results = {}
    for name in variants:
        if name == "full":
            # production path: params pre-fused outside the scan, as in
            # _fast_rollout (gamma||beta conv + stacked const-map terms +
            # per-block shared-conv concat + global cmap_terms_all matmul)
            apply_fn = partial(fi.fast_apply, use_pallas=False)
            params_v = fused
        elif name == "fused_v1":
            # session-10 fusion ONLY (gamma||beta conv + stacked terms),
            # i.e. the config behind the 12,661-12,863 fps chip records —
            # strip the session-12 block-level keys so fast_apply takes
            # its per-norm fallback; the full-vs-fused_v1 delta
            # attributes the second fusion round
            apply_fn = partial(fi.fast_apply, use_pallas=False)
            fp = dict(fused)
            fp.pop("cmap_terms_all", None)
            fp = {k: ({kk: vv for kk, vv in v.items() if kk != "shared_cat"}
                      if k.startswith("block_") else v)
                  for k, v in fp.items()}
            params_v = fp
        elif name == "unfused":
            # raw params through fast_apply (on-the-fly per-step fusion);
            # unfused-vs-full is the total pre-fusion win
            apply_fn = partial(fi.fast_apply, use_pallas=False)
            params_v = params["params"]
        else:
            apply_fn = make_fused_variant(name)
            params_v = fused

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
            return float(jax.device_get(run_multi(params_v, ini, st).sum()))

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
        # a speedup table, not the removed-work attribution
        attrib = {k: (round(100 * (1 - full / v), 1)
                      if isinstance(v, (int, float)) and v > 0 else None)
                  for k, v in results.items()
                  if k in ABLATIONS}
        print(json.dumps({"pct_step_time_attributed_to_removed_work": attrib,
                          "note": "1 - full_fps/variant_fps per ablation of "
                                  "the FUSED path; negative ~ noise"}),
              flush=True)
        speedups = {k: (round(full / v, 3)
                        if isinstance(v, (int, float)) and v > 0 else None)
                    for k, v in results.items() if k in BASELINES}
        if speedups:
            print(json.dumps({"fusion_speedup_vs_baseline": speedups,
                              "note": "full_fps / baseline_fps; >1 means "
                                      "the fusion rounds help"}), flush=True)


if __name__ == "__main__":
    main()
