"""Path collector.

Capability contract (reference: rlkit/samplers/data_collector/
path_collector.py:11-118): accumulate rollouts until the step budget,
per-loop max_path_length clamping, discard-incomplete-paths rule, epoch path
deque, diagnostics (num steps/paths + path-length stats), and a snapshot of
policy (+ env)."""

from __future__ import annotations

from collections import OrderedDict, deque
from typing import Callable, Optional

from s2p_tpu.samplers.rollout import rollout as default_rollout
from s2p_tpu.utils.stats import create_stats_ordered_dict


class MdpPathCollector:
    def __init__(
        self,
        env,
        policy,
        max_num_epoch_paths_saved: Optional[int] = None,
        render: bool = False,
        render_kwargs: Optional[dict] = None,
        rollout_fn: Callable = default_rollout,
        save_env_in_snapshot: bool = True,
        slac_algo=None,
        slac_policy_input_type: Optional[str] = None,
        slac_obs_reset_w_same_obs: bool = False,
    ):
        self._env = env
        self._policy = policy
        self._max_num_epoch_paths_saved = max_num_epoch_paths_saved
        self._epoch_paths = deque(maxlen=max_num_epoch_paths_saved)
        self._render = render
        self._render_kwargs = render_kwargs or {}
        self._rollout_fn = rollout_fn
        self._num_steps_total = 0
        self._num_paths_total = 0
        self._save_env_in_snapshot = save_env_in_snapshot
        self._slac_algo = slac_algo
        self._slac_policy_input_type = slac_policy_input_type
        self._slac_obs_reset_w_same_obs = slac_obs_reset_w_same_obs

    def collect_new_paths(self, max_path_length, num_steps,
                          discard_incomplete_paths):
        paths = []
        num_steps_collected = 0
        while num_steps_collected < num_steps:
            max_len_this_loop = min(
                max_path_length, num_steps - num_steps_collected
            )
            path = self._rollout_fn(
                self._env, self._policy,
                max_path_length=max_len_this_loop,
                render=self._render, render_kwargs=self._render_kwargs,
                slac_algo=self._slac_algo,
                slac_policy_input_type=self._slac_policy_input_type,
                slac_obs_reset_w_same_obs=self._slac_obs_reset_w_same_obs,
            )
            path_len = len(path["actions"])
            if (
                path_len != max_path_length
                and not path["dones"][-1]
                and discard_incomplete_paths
            ):
                break
            num_steps_collected += path_len
            paths.append(path)
        self._num_paths_total += len(paths)
        self._num_steps_total += num_steps_collected
        self._epoch_paths.extend(paths)
        return paths

    def get_epoch_paths(self):
        return self._epoch_paths

    def end_epoch(self, epoch: int) -> None:
        self._epoch_paths = deque(maxlen=self._max_num_epoch_paths_saved)

    def get_diagnostics(self):
        path_lens = [len(p["actions"]) for p in self._epoch_paths]
        stats = OrderedDict([
            ("num steps total", self._num_steps_total),
            ("num paths total", self._num_paths_total),
        ])
        stats.update(
            create_stats_ordered_dict("path length", path_lens,
                                      always_show_all_stats=True)
        )
        return stats

    def get_snapshot(self):
        snap = dict(policy=self._policy)
        if self._save_env_in_snapshot:
            snap["env"] = self._env
        return snap
