"""Step collector for online RL.

Capability contract (reference: rlkit/samplers/data_collector/
step_collector.py:10-120 ``MdpStepCollector``): collect the environment one
step at a time, maintaining the in-progress path; completed (or max-length)
paths roll into the epoch path deque; ``collect_new_steps`` loops
``collect_one_step``."""

from __future__ import annotations

from collections import OrderedDict, deque
from typing import Optional

import numpy as np

from s2p_tpu.utils.stats import create_stats_ordered_dict


class MdpStepCollector:
    def __init__(
        self,
        env,
        policy,
        max_num_epoch_paths_saved: Optional[int] = None,
        render: bool = False,
        render_kwargs: Optional[dict] = None,
    ):
        self._env = env
        self._policy = policy
        self._max_num_epoch_paths_saved = max_num_epoch_paths_saved
        self._epoch_paths = deque(maxlen=max_num_epoch_paths_saved)
        self._render = render
        self._render_kwargs = render_kwargs or {}
        self._num_steps_total = 0
        self._num_paths_total = 0
        self._obs: Optional[np.ndarray] = None
        self._current_path: Optional[dict] = None

    def collect_new_steps(self, max_path_length, num_steps,
                          discard_incomplete_paths):
        steps = []
        for _ in range(num_steps):
            steps.append(
                self.collect_one_step(max_path_length, discard_incomplete_paths)
            )
        return steps

    def collect_one_step(self, max_path_length, discard_incomplete_paths):
        if self._obs is None:
            self._start_new_rollout()
        action, agent_info = self._policy.get_action(self._obs)
        next_ob, reward, done, env_info = self._env.step(np.array(action, copy=True))
        if self._render:
            self._env.render(**self._render_kwargs)
        terminal = bool(done) and not env_info.get("TimeLimit.truncated", False)
        p = self._current_path
        p["observations"].append(self._obs)
        p["actions"].append(action)
        p["rewards"].append(reward)
        p["next_observations"].append(next_ob)
        p["terminals"].append(terminal)
        p["dones"].append(bool(done))
        p["agent_infos"].append(agent_info)
        p["env_infos"].append(env_info)
        self._num_steps_total += 1
        step = dict(
            observation=self._obs, action=action, reward=reward,
            next_observation=next_ob, terminal=terminal, done=bool(done),
            agent_info=agent_info, env_info=env_info,
        )
        if done or len(p["actions"]) >= max_path_length:
            self._handle_rollout_ending()
        else:
            self._obs = next_ob
        return step

    def _start_new_rollout(self):
        self._policy.reset()
        self._obs = self._env.reset()
        self._current_path = dict(
            observations=[], actions=[], rewards=[], next_observations=[],
            terminals=[], dones=[], agent_infos=[], env_infos=[],
        )

    def _handle_rollout_ending(self):
        p = self._current_path
        path = dict(
            observations=np.array(p["observations"]),
            actions=np.array(p["actions"]),
            rewards=np.array(p["rewards"]).reshape(-1, 1),
            next_observations=np.array(p["next_observations"]),
            terminals=np.array(p["terminals"]).reshape(-1, 1),
            dones=np.array(p["dones"]).reshape(-1, 1),
            agent_infos=p["agent_infos"],
            env_infos=p["env_infos"],
        )
        self._epoch_paths.append(path)
        self._num_paths_total += 1
        self._obs = None
        self._current_path = None

    def get_epoch_paths(self):
        return self._epoch_paths

    def end_epoch(self, epoch):
        self._epoch_paths = deque(maxlen=self._max_num_epoch_paths_saved)
        self._obs = None
        self._current_path = None

    def get_diagnostics(self):
        path_lens = [len(p["actions"]) for p in self._epoch_paths]
        stats = OrderedDict([
            ("num steps total", self._num_steps_total),
            ("num paths total", self._num_paths_total),
        ])
        stats.update(create_stats_ordered_dict("path length", path_lens,
                                               always_show_all_stats=True))
        return stats

    def get_snapshot(self):
        return dict(policy=self._policy, env=self._env)
