"""Env–policy rollout loop.

Capability contract (reference: rlkit/samplers/rollout_functions.py:74-233):
step the env with the agent's action until done or ``max_path_length``;
SLAC branch builds the SlacObservation window and feeds the policy either
the ``feature_action`` encoding or the posterior ``latent_z`` per step
(:127-152); TimeLimit-aware terminal split (``terminals`` excludes
truncation, ``dones`` includes it, :183-195); optional per-step render
capture for state-RL video (:118-125,176-179).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import numpy as np

from s2p_tpu.samplers.agents import SlacObservation


def rollout(
    env,
    agent,
    max_path_length: float = np.inf,
    render: bool = False,
    render_kwargs: Optional[dict] = None,
    preprocess_obs_for_policy_fn: Optional[Callable] = None,
    render_image_for_video_when_state_rl: bool = False,
    slac_algo=None,
    slac_policy_input_type: Optional[str] = None,
    slac_obs_reset_w_same_obs: bool = False,
) -> Dict[str, Any]:
    render_kwargs = render_kwargs or {}
    preprocess = preprocess_obs_for_policy_fn or (lambda x: x)

    observations, actions, rewards = [], [], []
    terminals, dones, next_observations = [], [], []
    agent_infos, env_infos, images = [], [], []

    agent.reset()
    o = env.reset()
    if render:
        env.render(**render_kwargs)
    if render_image_for_video_when_state_rl:
        images.append(np.asarray(env.render(**render_kwargs)))

    slac_ob = None
    if slac_algo is not None:
        slac_ob = SlacObservation(
            env.observation_space.shape, env.action_space.shape,
            num_sequences=slac_algo.num_sequences,
            reset_w_same_obs=slac_obs_reset_w_same_obs,
        )
        slac_ob.reset_episode(o)

    path_length = 0
    while path_length < max_path_length:
        if slac_algo is not None:
            if slac_policy_input_type in (None, "feature_action"):
                fa = slac_algo.preprocess(slac_ob.state, slac_ob.action)
                o_for_agent = np.asarray(fa).squeeze(0)
            elif slac_policy_input_type == "latent_z":
                import jax.numpy as jnp

                obs = jnp.asarray(slac_ob.state, jnp.float32)[None] / 255.0
                act = jnp.asarray(slac_ob.action, jnp.float32).reshape(
                    1, slac_algo.num_sequences - 1, -1
                )
                z, *_ = slac_algo.prepare_batch(obs, act)
                o_for_agent = np.asarray(z).squeeze(0)
            else:
                raise ValueError(slac_policy_input_type)
        else:
            o_for_agent = preprocess(o)

        a, agent_info = agent.get_action(o_for_agent)
        next_o, r, done, env_info = env.step(np.array(a, copy=True))
        if slac_ob is not None:
            slac_ob.append(next_o, a)

        if render:
            env.render(**render_kwargs)
        if render_image_for_video_when_state_rl:
            images.append(np.asarray(env.render(**render_kwargs)))

        observations.append(o)
        actions.append(a)
        rewards.append(r)
        terminal = bool(done) and not env_info.get("TimeLimit.truncated", False)
        terminals.append(terminal)
        dones.append(bool(done))
        next_observations.append(next_o)
        agent_infos.append(agent_info)
        env_infos.append(env_info)
        path_length += 1
        if done:
            break
        o = next_o

    actions = np.array(actions)
    if actions.ndim == 1:
        actions = actions[:, None]
    rewards = np.array(rewards).reshape(-1, 1)
    path = dict(
        observations=np.array(observations),
        actions=actions,
        rewards=rewards,
        next_observations=np.array(next_observations),
        terminals=np.array(terminals).reshape(-1, 1),
        dones=np.array(dones).reshape(-1, 1),
        agent_infos=agent_infos,
        env_infos=env_infos,
    )
    if render_image_for_video_when_state_rl:
        path["image_observations"] = np.stack(images, axis=0)  # [T+1, H, W, C]
    return path
