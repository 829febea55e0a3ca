"""Batch RL algorithm loop (the L7 core runtime).

Capability contract (reference: rlkit/core/rl_algorithm.py:25-173 +
rlkit/core/batch_rl_algorithm.py:13-144):

- epoch range ``[start_epoch, num_epochs)``; negative epochs are offline
  (epoch < 0 → no buffer writes, 1-step dummy exploration);
- per epoch: eval collect → [expl collect → buffer add (online only) →
  ``num_trains_per_train_loop ×`` (random_batch → trainer.train)] ×
  ``num_train_loops_per_epoch``;
- optional 50/50 real/generated dual-buffer sampling
  (batch_rl_algorithm.py:131-136);
- ``_end_epoch``: snapshot every ``snapshot_gap`` epochs via the logger,
  stats fan-out (buffer/trainer/expl/eval diagnostics, per-path stats,
  rewards_list.pkl), phase timing columns, post-epoch hooks.

Host-side by design: this loop is bookkeeping; the hot work is the
trainer's single compiled step (SURVEY §7). ``random_batch`` takes a jax
PRNG key when the buffer is device-resident (SlacReplayBuffer) and a
numpy RandomState otherwise.
"""

from __future__ import annotations

import os.path as osp
import pickle
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from s2p_tpu.utils.logging import Logger, logger as global_logger
from s2p_tpu.utils.stats import get_generic_path_information
from s2p_tpu.utils.timer import PhaseTimer


class BatchRLAlgorithm:
    def __init__(
        self,
        trainer,
        exploration_env,
        evaluation_env,
        exploration_data_collector,
        evaluation_data_collector,
        replay_buffer,
        batch_size: int,
        max_path_length: int,
        num_epochs: int,
        num_eval_steps_per_epoch: int,
        num_expl_steps_per_train_loop: int,
        num_trains_per_train_loop: int,
        num_train_loops_per_epoch: int = 1,
        min_num_steps_before_training: int = 0,
        start_epoch: int = 0,
        replay_buffer_gen=None,
        slac_representation: bool = False,
        logger: Optional[Logger] = None,
        snapshot_gap: int = 10,
        seed: int = 0,
        scan_training: bool = False,
        eval_period: int = 1,
    ):
        self.trainer = trainer
        self.expl_env = exploration_env
        self.eval_env = evaluation_env
        self.expl_data_collector = exploration_data_collector
        self.eval_data_collector = evaluation_data_collector
        self.replay_buffer = replay_buffer
        self.replay_buffer_gen = replay_buffer_gen
        self.batch_size = batch_size
        self.max_path_length = max_path_length
        self.num_epochs = num_epochs
        self.num_eval_steps_per_epoch = num_eval_steps_per_epoch
        self.num_expl_steps_per_train_loop = num_expl_steps_per_train_loop
        self.num_trains_per_train_loop = num_trains_per_train_loop
        self.num_train_loops_per_epoch = num_train_loops_per_epoch
        self.min_num_steps_before_training = min_num_steps_before_training
        self._start_epoch = start_epoch
        self.slac_representation = slac_representation
        self.logger = logger or global_logger
        self.snapshot_gap = snapshot_gap
        self.post_epoch_funcs: List[Callable] = []
        # fold the whole inner training loop into ONE compiled lax.scan with
        # on-device batch sampling (requires trainer.train_many +
        # device-resident buffers; dual-buffer configs sample 50/50 in-scan)
        self.scan_training = (
            scan_training
            and hasattr(trainer, "train_many")
            and getattr(replay_buffer, "scannable", False)
            and (replay_buffer_gen is None
                 or getattr(replay_buffer_gen, "scannable", False))
        )
        # eval rollouts are host↔device per step (MuJoCo on host, policy on
        # device) — through a remote runtime they dominate wall-clock, so
        # eval_period>1 collects eval paths only every N epochs (stats carry
        # forward between evals to keep the frozen csv key-set; reference
        # behavior = 1, rl_algorithm.py:95-169)
        self.eval_period = max(1, eval_period)
        self._last_eval_stats: Dict[str, Any] = {}
        self.timer = PhaseTimer()
        self.epoch = start_epoch
        self.offline_rl = start_epoch < 0
        self._rewards_log_list: List[np.ndarray] = []
        self._sample_rng = np.random.RandomState(seed)
        self._sample_key = jax.random.PRNGKey(seed)

    # -- sampling dispatch --------------------------------------------------
    def _random_batch(self, buffer, batch_size: int) -> Dict[str, Any]:
        # explicit sampling_style attribute, NOT hasattr(device_state):
        # SimpleReplayBuffer also exposes device_state() for the scanned
        # state-RL path but samples with a numpy RandomState
        if getattr(buffer, "sampling_style", "rng") == "key":
            self._sample_key, sub = jax.random.split(self._sample_key)
            return buffer.random_batch(sub, batch_size)
        return buffer.random_batch(batch_size, rng=self._sample_rng)

    # -- main loop ----------------------------------------------------------
    def train(self) -> None:
        """Negative epochs are offline, positive online
        (batch_rl_algorithm.py:79-88)."""
        for self.epoch in range(self._start_epoch, self.num_epochs):
            self.offline_rl = self.epoch < 0
            self._train_epoch()
            self._end_epoch(self.epoch)

    def _train_epoch(self) -> None:
        if self.epoch == 0 and self.min_num_steps_before_training > 0:
            init_paths = self.expl_data_collector.collect_new_paths(
                self.max_path_length, self.min_num_steps_before_training,
                discard_incomplete_paths=False,
            )
            if not self.offline_rl and not self.slac_representation:
                self.replay_buffer.add_paths(init_paths)
            self.expl_data_collector.end_epoch(-1)

        # gate relative to start_epoch so the FIRST epoch always evals —
        # otherwise (e.g. after --resume_dir shifts start_epoch) the first
        # csv dump freezes the header without the eval/ columns and every
        # later eval stat is silently dropped for the whole run
        if ((self.epoch - self._start_epoch) % self.eval_period == 0
                or self.epoch == self.num_epochs - 1):
            self.eval_data_collector.collect_new_paths(
                self.max_path_length, self.num_eval_steps_per_epoch,
                discard_incomplete_paths=True,
            )
        self.timer.stamp("evaluation sampling")

        for _ in range(self.num_train_loops_per_epoch):
            new_paths = self.expl_data_collector.collect_new_paths(
                self.max_path_length,
                self.num_expl_steps_per_train_loop if not self.offline_rl else 1,
                discard_incomplete_paths=False,
            )
            self.timer.stamp("exploration sampling")
            if not self.offline_rl and not self.slac_representation:
                self.replay_buffer.add_paths(new_paths)
            self.timer.stamp("data storing")

            if self.scan_training:
                last_metrics = self.trainer.train_many(
                    self.num_trains_per_train_loop, self.batch_size,
                    buffer=self.replay_buffer,
                    buffer_gen=self.replay_buffer_gen,
                )
                self.timer.stamp("training", sync=last_metrics)
                continue
            last_metrics = None
            for _ in range(self.num_trains_per_train_loop):
                if self.replay_buffer_gen is not None:
                    # 50/50 real/generated per gradient step
                    # (batch_rl_algorithm.py:131-136 intent; the trainers
                    # consume one concatenated batch)
                    half = self.batch_size // 2
                    batch = self._random_batch(self.replay_buffer, half)
                    batch_gen = self._random_batch(
                        self.replay_buffer_gen, self.batch_size - half
                    )
                    batch = jax.tree_util.tree_map(
                        lambda a, b: jnp.concatenate(
                            [jnp.asarray(a), jnp.asarray(b)], axis=0
                        ),
                        dict(batch), dict(batch_gen),
                    )
                    last_metrics = self.trainer.train(batch)
                else:
                    batch = self._random_batch(self.replay_buffer, self.batch_size)
                    last_metrics = self.trainer.train(batch)
            self.timer.stamp("training", sync=last_metrics)

    # -- epoch lifecycle ----------------------------------------------------
    def _end_epoch(self, epoch: int) -> None:
        if epoch % self.snapshot_gap == 0:
            self.logger.save_itr_params(epoch, self.trainer.get_snapshot())
        self.timer.stamp("saving")
        self._log_stats(epoch)
        self.expl_data_collector.end_epoch(epoch)
        self.eval_data_collector.end_epoch(epoch)
        self.replay_buffer.end_epoch(epoch)
        self.trainer.end_epoch(epoch)
        for fn in self.post_epoch_funcs:
            fn(self, epoch)

    def _get_snapshot(self) -> Dict[str, Any]:
        snapshot = {}
        for prefix, src in (
            ("trainer/", self.trainer),
            ("exploration/", self.expl_data_collector),
            ("evaluation/", self.eval_data_collector),
            ("replay_buffer/", self.replay_buffer),
        ):
            for k, v in src.get_snapshot().items():
                snapshot[prefix + k] = v
        return snapshot

    def _log_stats(self, epoch: int) -> None:
        log = self.logger
        log.log(f"Epoch {epoch} finished")
        log.record_tabular("epoch", epoch)
        log.record_dict(self.replay_buffer.get_diagnostics(), prefix="replay_buffer/")
        log.record_dict(
            {k: float(v) for k, v in jax.device_get(
                self.trainer.get_diagnostics()).items()},
            prefix="trainer/",
        )
        log.record_dict(self.expl_data_collector.get_diagnostics(), prefix="expl/")
        expl_paths = self.expl_data_collector.get_epoch_paths()
        log.record_dict(get_generic_path_information(expl_paths), prefix="expl/")

        eval_paths = self.eval_data_collector.get_epoch_paths()
        eval_diag = dict(self.eval_data_collector.get_diagnostics())
        if eval_paths:
            self._last_eval_diag = eval_diag
        else:
            # path-length stats exist only on epochs with fresh eval paths;
            # backfill from the last eval so the frozen csv header stays
            # fully populated under eval_period > 1
            eval_diag = {**getattr(self, "_last_eval_diag", {}), **eval_diag}
        log.record_dict(eval_diag, prefix="eval/")
        if eval_paths:
            rewards = [np.asarray(p["rewards"]).ravel() for p in eval_paths]
            if len({len(r) for r in rewards}) == 1:
                self._rewards_log_list.append(np.stack(rewards, axis=0))
            if log.log_dir is not None:
                with open(osp.join(log.log_dir, "rewards_list.pkl"), "wb") as f:
                    pickle.dump(self._rewards_log_list, f)
        eval_stats = get_generic_path_information(eval_paths)
        if eval_paths:
            self._last_eval_stats = eval_stats
        else:
            # eval_period > 1: repeat the last measured stats so the frozen
            # csv key-set stays satisfied on non-eval epochs
            eval_stats = self._last_eval_stats
        log.record_dict(eval_stats, prefix="eval/")
        # carried-forward rows are marked stale so per-epoch aggregates over
        # the csv can't silently over-weight repeated eval values
        log.record_tabular("eval/is_fresh", int(bool(eval_paths)))

        self.timer.stamp("logging")
        log.record_dict(self.timer.end_epoch())
        log.record_tabular("Epoch", epoch)
        log.dump_tabular()
