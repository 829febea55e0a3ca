"""Standalone SLAC latent-model pretraining (producer of latent.pkl).

Capability contract (reference: rlkit/torch/slac/trainer.py:176-325
``only_train_latent_model``): load the real HDF5 into the sequence buffer,
run ``num_steps`` ELBO updates (reference default 300k, batch 32), and
checkpoint every ``save_every`` (reference 5k) to ``save_dir``.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax

from s2p_tpu.slac.algo import SlacAlgorithm


def pretrain_latent(
    algo: SlacAlgorithm,
    dataset_path: Optional[str] = None,
    num_steps: int = 300_000,
    save_every: int = 5_000,
    save_dir: Optional[str] = None,
    log_every: int = 1_000,
    log_fn: Callable[[str], None] = print,
    scan_chunk: int = 1_000,
) -> Dict[str, float]:
    """``scan_chunk > 1`` folds that many ELBO steps into one compiled
    lax.scan per host dispatch (checkpoint/log cadence snaps to chunk
    boundaries); ``scan_chunk=1`` is the reference-style per-step loop."""
    if dataset_path is not None:
        added = algo.load_data_in_buffer(dataset_path)
        log_fn(f"buffer filled with {added} sequence slots from {dataset_path}")
    assert len(algo.buffer) > 0, "buffer is empty"
    t0 = time.time()
    losses: Dict[str, float] = {}
    chunk = max(1, min(scan_chunk, save_every if save_dir else scan_chunk,
                       log_every or scan_chunk))
    i = 0
    while i < num_steps:
        n = min(chunk, num_steps - i)
        if n == 1:
            losses = algo.update_latent()
        else:
            losses = algo.update_latent_many(n)
        i += n
        if log_every and i % log_every == 0:
            host = {k: float(v) for k, v in jax.device_get(losses).items()}
            rate = i / (time.time() - t0)
            log_fn(
                f"latent step {i}/{num_steps} ({rate:.1f} it/s): "
                + " ".join(f"{k}={v:.3f}" for k, v in host.items())
            )
        if save_dir is not None and i % save_every == 0:
            algo.save_model(save_dir)
    if save_dir is not None:
        algo.save_model(save_dir)
    return {k: float(v) for k, v in jax.device_get(losses).items()}
