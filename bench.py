"""Headline benchmark: cheetah 64px generated frames/sec/chip.

Matches BASELINE.json's primary metric. The reference pipeline generates
images autoregressively with the S2P generator (simple_test.py seq_len
rollout, README.md:27-34); here the full-size generator (ngf=64, 4 up
levels, 64px) runs a jitted lax.scan rollout in bfloat16 on one chip.

vs_baseline: the reference renders on an RTX A6000; no published number
exists (BASELINE.md), so the A6000 estimate below is a measured-order
estimate of a SPADE-class generator at batch 16 (~230 fps). vs_baseline > 1
means faster than that estimate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

A6000_FRAMES_PER_SEC_EST = 230.0

BATCH = 256  # dataset-augmentation generation batches widely (50k transitions)
SEQ_LEN = 8
IMAGE_SIZE = 64
STATE_DIM = 17
WARMUP_ITERS = 2
TIMED_ITERS = 5


def main() -> None:
    from s2p_tpu.gan import S2PGenerator
    from s2p_tpu.gan.rollout import generate_rollout

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
    def run_once() -> float:
        frames = generate_rollout(gen, params, init, states)
        return float(jax.device_get(frames.sum()))

    for _ in range(WARMUP_ITERS):
        run_once()

    t0 = time.perf_counter()
    for _ in range(TIMED_ITERS):
        run_once()
    dt = time.perf_counter() - t0

    frames = TIMED_ITERS * SEQ_LEN * BATCH
    fps = frames / dt
    print(json.dumps({
        "metric": "cheetah_64px_generated_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / A6000_FRAMES_PER_SEC_EST, 3),
    }))


if __name__ == "__main__":
    main()
