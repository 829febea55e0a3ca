#!/usr/bin/env python
"""Collect an offline dataset with online SAC (the pipeline's front end).

Pipeline role: the reference's datasets ("mixed_first_500k": the first N
transitions of a SAC training run, rebuttal.md:46-47) were collected
upstream of the checkout. This script trains SAC on a DMC env while
recording every transition — observations/actions/rewards/
next_observations/terminals/timeouts plus ``qpos_qvel`` for image
rendering via image_render.py — and writes the state dataset HDF5.
"""

from __future__ import annotations

import argparse

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--env_name", default="cheetah-run")
    p.add_argument("--num_steps", type=int, default=100_000)
    p.add_argument("--start_random_steps", type=int, default=1_000)
    p.add_argument("--train_every", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--buffer_size", type=int, default=1_000_000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output", default="state_dataset.hdf5")
    p.add_argument("--log_interval", type=int, default=1_000)
    p.add_argument("--target_entropy", type=float, default=None,
                   help="SAC auto-alpha target entropy (default -|A|). "
                        "Raise (e.g. -|A|/2) for a higher-entropy dataset "
                        "with less action saturation — CQL's BC warmup "
                        "degenerates on bang-bang datasets")
    return p


def main(argv=None) -> str:
    args = build_parser().parse_args(argv)

    import jax

    from s2p_tpu.data.env_replay_buffer import EnvReplayBuffer
    from s2p_tpu.data.hdf5 import save_dataset
    from s2p_tpu.envs import make_dmc
    from s2p_tpu.rl import CriticSLAC, TanhGaussianPolicy
    from s2p_tpu.rl.sac import SACTrainer
    from s2p_tpu.samplers import PolicyAgent
    from s2p_tpu.utils.seeding import set_seed

    set_seed(args.seed)
    env = make_dmc(args.env_name, from_pixels=False, seed=args.seed)
    obs_dim = env.observation_space.shape[0]
    act_dim = env.action_space.shape[0]

    trainer = SACTrainer(
        policy=TanhGaussianPolicy(hidden_sizes=(256, 256), action_dim=act_dim),
        critic=CriticSLAC(hidden_sizes=(256, 256)),
        obs_dim=obs_dim, action_dim=act_dim, seed=args.seed,
        target_entropy=args.target_entropy,
    )
    agent = PolicyAgent(trainer.policy_module, trainer.policy_state.params,
                        seed=args.seed)
    buf = EnvReplayBuffer(args.buffer_size, env)

    rec = {k: [] for k in ("observations", "actions", "rewards",
                           "next_observations", "terminals", "timeouts",
                           "qpos_qvel")}
    o = env.reset()
    ep_return, returns = 0.0, []
    for t in range(args.num_steps):
        qq = np.concatenate([env.physics.data.qpos, env.physics.data.qvel])
        if t < args.start_random_steps:
            a = env.action_space.sample()
        else:
            agent.set_params(trainer.policy_state.params)
            a, _ = agent.get_action(o)
        next_o, r, done, info = env.step(a)
        truncated = info.get("TimeLimit.truncated", False)
        rec["observations"].append(o)
        rec["actions"].append(a)
        rec["rewards"].append(r)
        rec["next_observations"].append(next_o)
        rec["terminals"].append(float(done and not truncated))
        rec["timeouts"].append(float(truncated))
        rec["qpos_qvel"].append(qq)
        buf.add_sample(o, a, r, float(done and not truncated), next_o)
        ep_return += r

        if done:
            returns.append(ep_return)
            ep_return = 0.0
            o = env.reset()
        else:
            o = next_o

        if t >= args.start_random_steps and t % args.train_every == 0:
            trainer.train(buf.random_batch(args.batch_size))
        if args.log_interval and (t + 1) % args.log_interval == 0:
            avg = np.mean(returns[-5:]) if returns else float("nan")
            print(f"step {t + 1}/{args.num_steps}  recent return {avg:.1f}")

    ds = {k: np.asarray(v, np.float32) for k, v in rec.items()}
    save_dataset(args.output, ds)
    print(f"wrote {len(ds['actions'])} transitions to {args.output}")
    return args.output


if __name__ == "__main__":
    main()
