"""Multi-path final evaluation of an RL snapshot (``python -m s2p_tpu.cli.final_eval``).

The training loop's per-epoch eval is a single 250-step path (eval_period
throughput knob); this script replays the FINAL params.pkl for N full
episodes with the deterministic policy and reports mean/std return —
the low-variance headline score (reference protocol: 5000 eval
steps/epoch = 5 paths, mujoco_finetune.py:260-266).
"""

import argparse
import glob
import pickle

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", required=True)
    ap.add_argument("--env_name", default="cheetah-run")
    ap.add_argument("--snapshot", default="params.pkl")
    ap.add_argument("--n_paths", type=int, default=5)
    ap.add_argument("--image_size", type=int, default=100)
    ap.add_argument("--seed", type=int, default=100)
    args = ap.parse_args(argv)

    from s2p_tpu.envs import make_dmc
    from s2p_tpu.rl import TanhGaussianPolicy
    from s2p_tpu.samplers import MdpPathCollector, PolicyAgent
    from s2p_tpu.slac import SlacAlgorithm

    path = glob.glob(f"{args.run_dir}/{args.snapshot}")[0]
    with open(path, "rb") as f:
        snap = pickle.load(f)

    env = make_dmc(args.env_name, from_pixels=True, height=args.image_size,
                   width=args.image_size, seed=args.seed)
    action_dim = env.action_space.shape[0]
    slac = SlacAlgorithm(action_dim=action_dim, num_sequences=8,
                         buffer_size=1000, feature_dim=256, z1_dim=32,
                         z2_dim=256, image_size=args.image_size, seed=args.seed)
    import jax
    import jax.numpy as jnp

    slac.params = jax.tree_util.tree_map(jnp.asarray, snap["latent_params"])
    policy = TanhGaussianPolicy(hidden_sizes=(1024, 1024), action_dim=action_dim)
    agent = PolicyAgent(policy, snap["policy_params"], deterministic=True,
                        seed=args.seed)
    col = MdpPathCollector(env, agent, slac_algo=slac,
                           slac_policy_input_type="feature_action")
    horizon = env._max_episode_steps
    paths = col.collect_new_paths(horizon, args.n_paths * horizon,
                                  discard_incomplete_paths=True)
    rets = [float(np.sum(p["rewards"])) for p in paths]
    print(f"{args.env_name} {args.snapshot}: n={len(rets)} "
          f"return mean {np.mean(rets):.1f} std {np.std(rets):.1f} "
          f"min {np.min(rets):.1f} max {np.max(rets):.1f}")
    return rets


if __name__ == "__main__":
    main()
