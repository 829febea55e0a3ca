#!/usr/bin/env python
"""Pretrain the SLAC latent model on an image dataset (producer of the
latent checkpoint consumed by run_iql_image/run_cql_image).

Reference surface: rlkit/torch/slac/trainer.py:176-325
``only_train_latent_model`` (300k ELBO steps, batch 32 sequence windows,
checkpoint every 5k).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True,
                   help="image RL HDF5 (image_render.py output)")
    p.add_argument("--action_dim", type=int, default=None,
                   help="default: inferred from the dataset")
    p.add_argument("--num_steps", type=int, default=300_000)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--save_every", type=int, default=5_000)
    p.add_argument("--save_dir", default="./slac_logs/model")
    p.add_argument("--num_sequences", type=int, default=8)
    p.add_argument("--image_size", type=int, default=None,
                   help="default: inferred from the dataset (64 or 100)")
    p.add_argument("--feature_dim", type=int, default=256)
    p.add_argument("--z1_dim", type=int, default=32)
    p.add_argument("--z2_dim", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data_num", type=int, default=None)
    p.add_argument("--log_every", type=int, default=1_000)
    p.add_argument("--scan_chunk", type=int, default=1_000,
                   help="ELBO steps folded into one compiled lax.scan per "
                        "host dispatch (1 = reference-style per-step loop)")
    return p


def main(argv=None) -> str:
    args = build_parser().parse_args(argv)

    from s2p_tpu.data.hdf5 import load_rl_dataset
    from s2p_tpu.slac import SlacAlgorithm, pretrain_latent
    from s2p_tpu.utils.seeding import set_seed

    set_seed(args.seed)
    ds = load_rl_dataset(args.dataset, args.data_num)
    action_dim = args.action_dim or ds["actions"].shape[1]
    image_size = args.image_size or ds["image_observations"].shape[1]

    algo = SlacAlgorithm(
        action_dim=action_dim,
        num_sequences=args.num_sequences,
        buffer_size=max(len(ds["actions"]) + 10, 1000),
        batch_size_latent=args.batch_size,
        lr_latent=args.lr,
        feature_dim=args.feature_dim,
        z1_dim=args.z1_dim,
        z2_dim=args.z2_dim,
        image_size=image_size,
        seed=args.seed,
    )
    added = algo.buffer.ingest_real(ds)
    print(f"buffer: {added} sequence windows from {args.dataset}")
    pretrain_latent(
        algo, num_steps=args.num_steps, save_every=args.save_every,
        save_dir=args.save_dir, log_every=args.log_every,
        scan_chunk=args.scan_chunk,
    )
    print(f"saved latent checkpoint to {args.save_dir}/latent.pkl")
    return args.save_dir


if __name__ == "__main__":
    main()
