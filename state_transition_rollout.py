#!/usr/bin/env python
"""Synthetic state-transition dataset CLI.

Reference surface: /root/reference/state_transition_rollout.py (run with no
args over a hard-coded config). Here the paths/dims are flags; the output
schema (all_state_1step_random_action_dataset_augment.hdf5) is identical.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import pickle


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True,
                   help="real RL HDF5 (image_numpy_dataset_stack3_imgsize_100.hdf5 schema)")
    p.add_argument("--model", default=None,
                   help="ensemble checkpoint: torch .pkl/.pth state_dict or "
                        "pickled flax params; omit to train a fresh ensemble")
    p.add_argument("--normalize_configs", default=None,
                   help="normalize_configs_dict.pkl; omit to compute from data")
    p.add_argument("--output", default="all_state_1step_random_action_dataset_augment.hdf5")
    p.add_argument("--action_low", type=float, default=-1.0)
    p.add_argument("--action_high", type=float, default=1.0)
    p.add_argument("--ensemble_size", type=int, default=7)
    p.add_argument("--hidden_features", type=int, default=256)
    p.add_argument("--hidden_layers", type=int, default=3)
    p.add_argument("--train_steps", type=int, default=2000,
                   help="used only when --model is omitted")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_sequences", type=int, default=8)
    return p


def main(argv=None) -> str:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from s2p_tpu.data.hdf5 import load_rl_dataset, save_dataset
    from s2p_tpu.world_model import (
        EnsembleTransition,
        compute_normalization,
        convert_ensemble_state_dict,
        generate_augmented_dataset,
        make_ensemble_train_step,
    )

    ds = load_rl_dataset(args.dataset)
    obs_dim = ds["observations"].shape[1]
    act_dim = ds["actions"].shape[1]
    model = EnsembleTransition(
        obs_dim=obs_dim, action_dim=act_dim,
        hidden_features=args.hidden_features, hidden_layers=args.hidden_layers,
        ensemble_size=args.ensemble_size,
    )

    if args.normalize_configs:
        with open(args.normalize_configs, "rb") as f:
            normalization = pickle.load(f)
    else:
        normalization = compute_normalization(ds)

    if args.model:
        if args.model.endswith((".pth",)) or _looks_torch(args.model):
            from s2p_tpu.gan.convert import load_pth

            params = convert_ensemble_state_dict(load_pth(args.model))
            params.pop("saved", None)
        else:
            with open(args.model, "rb") as f:
                params = pickle.load(f)
    else:
        # train a fresh ensemble on normalized transitions (the reference's
        # pretrained .pkl is a stripped blob; SURVEY §0)
        init_state, step = make_ensemble_train_step(model)
        params, opt_state = init_state(jax.random.PRNGKey(args.seed))
        x = np.concatenate([
            (ds["observations"] - normalization["obs_mean"]) / normalization["obs_std"],
            ds["actions"],
        ], axis=-1).astype(np.float32)
        y = np.concatenate([
            (ds["next_observations"] - normalization["next_obs_mean"]) / normalization["next_obs_std"],
            ((ds["rewards"] - normalization["reward_mean"]) / normalization["reward_std"])[:, None],
        ], axis=-1).astype(np.float32)
        rs = np.random.RandomState(args.seed)
        bs = min(256, len(x))
        for i in range(args.train_steps):
            idx = rs.randint(0, len(x), bs)
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(x[idx]), jnp.asarray(y[idx])
            )
            if i % 500 == 0:
                print(f"ensemble step {i}: nll {float(loss):.4f}")

    out = generate_augmented_dataset(
        ds, model, params, normalization,
        action_low=np.full(act_dim, args.action_low),
        action_high=np.full(act_dim, args.action_high),
        num_sequences=args.num_sequences, seed=args.seed,
    )
    os.makedirs(osp.dirname(osp.abspath(args.output)), exist_ok=True)
    save_dataset(args.output, out)
    print(f"wrote {len(out['actions'])} augmented transitions to {args.output}")
    return args.output


def _looks_torch(path: str) -> bool:
    with open(path, "rb") as f:
        head = f.read(2)
    return head == b"PK"  # torch zip serialization


if __name__ == "__main__":
    main()
