"""Pure gradient-step offline loop.

Capability contract (reference: rlkit/core/simple_offline_rl_algorithm.py:
36-53 ``SimpleOfflineRlAlgorithm``): no env interaction at all — N epochs ×
num_batches gradient steps over a fixed buffer, logging trainer diagnostics
per epoch."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from s2p_tpu.utils.logging import Logger, logger as global_logger
from s2p_tpu.utils.timer import Timer


class SimpleOfflineRlAlgorithm:
    def __init__(
        self,
        trainer,
        replay_buffer,
        batch_size: int,
        num_epochs: int,
        num_batches_per_epoch: int,
        logger: Optional[Logger] = None,
        seed: int = 0,
    ):
        self.trainer = trainer
        self.replay_buffer = replay_buffer
        self.batch_size = batch_size
        self.num_epochs = num_epochs
        self.num_batches_per_epoch = num_batches_per_epoch
        self.logger = logger or global_logger
        self.timer = Timer()
        self._rng = np.random.RandomState(seed)
        self._key = jax.random.PRNGKey(seed)

    def _random_batch(self):
        if getattr(self.replay_buffer, "sampling_style", "rng") == "key":
            self._key, sub = jax.random.split(self._key)
            return self.replay_buffer.random_batch(sub, self.batch_size)
        return self.replay_buffer.random_batch(self.batch_size, rng=self._rng)

    def train(self) -> None:
        for epoch in range(self.num_epochs):
            self.timer.start_epoch()
            self.timer.start_timer("training")
            last = None
            for _ in range(self.num_batches_per_epoch):
                last = self.trainer.train(self._random_batch())
            if last is not None:
                jax.block_until_ready(last)
            self.timer.stop_timer("training")
            self.logger.record_tabular("epoch", epoch)
            self.logger.record_dict(
                {k: float(v) for k, v in jax.device_get(
                    self.trainer.get_diagnostics()).items()},
                prefix="trainer/",
            )
            self.logger.record_dict(
                {f"time/{k}": v for k, v in self.timer.get_times().items()}
            )
            self.logger.dump_tabular()
            self.trainer.end_epoch(epoch)
