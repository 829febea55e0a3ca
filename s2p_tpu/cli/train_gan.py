"""``train.py`` — S2P GAN training.

Reference public surface (/root/reference/README.md:56-60):

    python train.py --dataroot=./datasets/cheetah.hdf5 --env_type=cheetah \
        --netG=s2p --batchSize=16 --gpu_ids=0

TPU-native: one jitted step runs the D update and the G update back-to-back
(s2p_tpu.gan.training); the batch dim shards over the mesh 'data' axis, so
the same script trains on 1 chip or a v5e-8. Epoch-numbered checkpoints are
written both as pickled flax params and, when torch is importable, as
torch-layout ``{env}_{epoch}.pth`` so downstream reference consumers load
TPU-trained weights directly.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import pickle
import time
from typing import Optional

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataroot", type=str, required=True,
                   help="HDF5 path; comma-separate for multi-env training")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (fp32 params/optimizer)")
    p.add_argument("--env_type", type=str, default="cheetah")
    p.add_argument("--netG", type=str, default="s2p",
                   choices=["s2p", "sat_state", "sat_image"])
    p.add_argument("--batchSize", type=int, default=16)
    p.add_argument("--gpu_ids", type=str, default="0",
                   help="accepted for reference-CLI parity; ignored (jax-native)")
    p.add_argument("--niter", type=int, default=30, help="training epochs")
    p.add_argument("--save_epoch_freq", type=int, default=10)
    p.add_argument("--checkpoints_dir", type=str, default="./checkpoints")
    p.add_argument("--log_dir", type=str, default="./logs")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ngf", type=int, default=64)
    p.add_argument("--ndf", type=int, default=64)
    p.add_argument("--num_D", type=int, default=2, help="discriminator scales")
    p.add_argument("--n_layers_D", type=int, default=4)
    p.add_argument("--g_lr", type=float, default=1e-4)
    p.add_argument("--d_lr", type=float, default=4e-4)
    p.add_argument("--lambda_L1", type=float, default=10.0)
    p.add_argument("--lambda_feat", type=float, default=10.0)
    p.add_argument("--lambda_vgg", type=float, default=10.0)
    p.add_argument("--r1_gamma", type=float, default=1.0,
                   help="R1 gradient penalty on real images (StyleGAN2 "
                        "convention; 0 disables). Counters D-dominance "
                        "collapse. Default ON (1.0) since round 4: the "
                        "no-R1 reference default is known-degrading on "
                        "2 of 3 datasets (walker collapses outright; "
                        "cheetah decays 33.93->30.14 dB after epoch 25) "
                        "while +R1 beats the no-R1 PEAK at final epoch "
                        "(37.21/0.959 vs 33.93/0.956, D alive; "
                        "docs/RESULTS_TABLE.md). Pass 0 to reproduce the "
                        "reference's exact protocol")
    p.add_argument("--r1_interval", type=int, default=16,
                   help="lazy-R1: apply the penalty every k-th step, "
                        "scaled by k (1 = every step)")
    p.add_argument("--d_every", type=int, default=1,
                   help="update D only every k-th step (adaptive cadence; "
                        "1 = reference behavior)")
    p.add_argument("--no_vgg_loss", action="store_true")
    p.add_argument("--vgg_weights", type=str, default=None,
                   help="torchvision vgg19 .pth for the perceptual loss")
    p.add_argument("--data_num", type=int, default=None,
                   help="truncate dataset (smoke runs)")
    p.add_argument("--max_steps", type=int, default=None,
                   help="hard cap on total grad steps (smoke runs)")
    p.add_argument("--log_interval", type=int, default=100)
    p.add_argument("--scan_chunk", type=int, default=1,
                   help=">1 stages the whole dataset on device and folds "
                        "that many D+G updates into one compiled lax.scan "
                        "per host dispatch (uniform in-scan sampling; "
                        "1 = reference-style per-batch epoch shuffle)")
    p.add_argument("--eval_interval", type=int, default=1,
                   help="evaluate PSNR/SSIM (and FID when enough samples) "
                        "every N epochs; 0 disables")
    p.add_argument("--eval_num", type=int, default=256,
                   help="held-out pairs used for evaluation")
    p.add_argument("--no_save_best", action="store_true",
                   help="disable the eval-driven {env}_best.pkl/.pth "
                        "export (on by default: whenever a fresh held-out "
                        "PSNR eval improves on the best seen, the current "
                        "generator is saved as {env}_best — checkpoint "
                        "cadence no longer decides which epoch survives)")
    p.add_argument("--init_g", type=str, default=None,
                   help="initialize the generator from a saved checkpoint "
                        "(.pkl flax params or torch-layout .pth) before "
                        "training — finetune a released/earlier checkpoint "
                        "with fresh optimizer + discriminator")
    p.add_argument("--resume_dir", type=str, default=None,
                   help="orbax checkpoint dir: saves full train state "
                        "(G+D params/optimizers) per epoch and auto-resumes "
                        "from the latest step")
    return p


def evaluate_generator(trainer, ds, n: int, batch_size: int = 64) -> dict:
    """Image-fidelity eval (FID/PSNR/SSIM spec: rebuttal.md:49-50) on the
    first ``n`` pairs: one-step generation vs ground-truth next frames.

    Multi-env datasets (``--dataroot a.hdf5,b.hdf5``) additionally get
    per-env ``psnr_env{i}``/``ssim_env{i}`` columns over the first ``n``
    pairs of EACH env, and the pooled metrics are computed over that
    union — a head slice of the concatenated dataset would silently
    measure only the first dataroot."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from s2p_tpu.gan.metrics import evaluate_pairs, compute_fid, vgg_fid_extractor
    from s2p_tpu.gan.training import _to_signed

    def _gen_pairs(sub) -> tuple:
        m = min(n, len(sub))
        fakes, reals = [], []
        for lo in range(0, m, batch_size):
            b = sub.eval_batch(lo, min(batch_size, m - lo))
            prev = _to_signed(jnp.asarray(b["prev_image"]))
            real = _to_signed(jnp.asarray(b["target_image"]))
            fake = trainer.generate(jnp.asarray(b["state"]), prev)
            fakes.append(np.asarray(jax.device_get(fake)))
            reals.append(np.asarray(jax.device_get(real)))
        return fakes, reals

    per_env = {}
    if ds.n_envs > 1:
        fakes, reals = [], []
        for env in range(ds.n_envs):
            f, r = _gen_pairs(ds.env_subset(env))
            env_metrics = evaluate_pairs(np.concatenate(f), np.concatenate(r))
            per_env.update({f"{k}_env{env}": v for k, v in env_metrics.items()})
            fakes += f
            reals += r
    else:
        fakes, reals = _gen_pairs(ds)
    fakes_np = np.concatenate(fakes)
    reals_np = np.concatenate(reals)
    out = evaluate_pairs(fakes_np, reals_np)
    out.update(per_env)
    if len(fakes_np) >= 128:  # Fréchet stats need a reasonable sample
        extractor = vgg_fid_extractor(image_shape=fakes_np.shape[1:])
        out["fid_vgg"] = compute_fid(extractor, reals, fakes)
    return out


def main(argv: Optional[list] = None) -> str:
    args = build_parser().parse_args(argv)

    import jax

    from s2p_tpu.data.pair_dataset import S2PPairDataset
    from s2p_tpu.gan import GANOptConfig, GANTrainer
    from s2p_tpu.gan.losses import GANLossConfig
    from s2p_tpu.gan.convert import params_to_state_dict
    from s2p_tpu.parallel import MeshSpec, make_mesh, shard_batch, shard_pytree
    from s2p_tpu.utils.logging import setup_logger, logger
    from s2p_tpu.utils.seeding import set_seed

    set_seed(args.seed)
    variant = vars(args)
    log_dir = setup_logger(
        f"s2p_{args.env_type}", variant=variant, base_log_dir=args.log_dir,
        seed=args.seed, snapshot_mode="none",
    )

    ds = S2PPairDataset.from_hdf5(args.dataroot, args.data_num)
    H = ds.image_shape[0]
    logger.log(f"dataset: {len(ds)} pairs, image {ds.image_shape}, "
               f"state_dim {ds.state_dim}")
    if ds.n_envs > 1:
        for i, root in enumerate(p for p in args.dataroot.split(",") if p):
            n_i = int((ds.env_ids == i).sum())
            logger.log(f"  env{i} = {root} ({n_i} pairs; eval columns "
                       f"psnr_env{i}/ssim_env{i})")

    mesh = make_mesh(MeshSpec(data=-1, model=1))
    n_data = mesh.shape["data"]
    assert args.batchSize % n_data == 0, (
        f"batchSize {args.batchSize} must divide over {n_data} data-parallel "
        "devices"
    )

    vgg_vars = None
    if args.vgg_weights:
        from s2p_tpu.gan.perceptual import load_torch_vgg19
        from s2p_tpu.gan.convert import load_pth

        vgg_vars = load_torch_vgg19(load_pth(args.vgg_weights))

    mat_mode = "mat" if args.netG == "s2p" else args.netG
    trainer = GANTrainer.create(
        jax.random.PRNGKey(args.seed),
        state_dim=ds.state_dim,
        image_size=H,
        channels=ds.image_shape[-1],
        generator_kwargs=dict(ngf=args.ngf, mat_mode=mat_mode),
        discriminator_kwargs=dict(
            num_scales=args.num_D, ndf=args.ndf, n_layers=args.n_layers_D
        ),
        opt_cfg=GANOptConfig(g_lr=args.g_lr, d_lr=args.d_lr),
        loss_cfg=GANLossConfig(
            lambda_l1=args.lambda_L1, lambda_feat=args.lambda_feat,
            lambda_vgg=args.lambda_vgg, r1_gamma=args.r1_gamma,
            r1_interval=args.r1_interval,
        ),
        use_perceptual=not args.no_vgg_loss,
        vgg_variables=vgg_vars,
        compute_dtype=jax.numpy.bfloat16 if args.bf16 else jax.numpy.float32,
        d_every=args.d_every,
    )
    # Replicate params over the mesh only when it is non-trivial AND the
    # per-step path runs: NamedSharding-annotated carries through the
    # scanned train_many trip XLA's SPMD partitioner into a pathological
    # compile (hours for a toy model — measured on the CPU backend, and the
    # same combination wedged on the TPU relay). Single-device meshes need
    # no annotation at all (params are device-resident from init), and the
    # scanned path samples batches on-device so there is nothing to shard
    # per-dispatch.
    if mesh.devices.size > 1 and args.scan_chunk <= 1:
        trainer.g_state = shard_pytree(mesh, trainer.g_state)
        trainer.d_state = shard_pytree(mesh, trainer.d_state)
    elif mesh.devices.size > 1:
        logger.log(
            f"scan_chunk={args.scan_chunk} on a {mesh.devices.size}-device "
            "mesh: using the shard_map data-parallel scanned path "
            "(dataset rows sharded over 'data', in-scan grad pmean)"
        )

    if args.init_g:
        import jax.numpy as jnp

        from s2p_tpu.gan.convert import load_generator_checkpoint

        g_params = load_generator_checkpoint(
            args.init_g, trainer.generator,
            jnp.zeros((1, ds.state_dim)),
            jnp.zeros((1, H, H, ds.image_shape[-1])),
        )
        trainer.g_state = trainer.g_state.replace(params=g_params)
        logger.log(f"generator initialized from {args.init_g}")

    os.makedirs(args.checkpoints_dir, exist_ok=True)

    ckpt_mgr = None
    start_epoch = 1
    best_psnr, best_epoch = float("-inf"), None
    if args.resume_dir:
        from s2p_tpu.utils.checkpoint import CheckpointManager

        ckpt_mgr = CheckpointManager(args.resume_dir, max_to_keep=2)
        latest = ckpt_mgr.latest_step()
        if latest is not None:
            template = dict(
                g=trainer.g_state.params, g_opt=trainer.g_state.opt_state,
                d=trainer.d_state.params, d_opt=trainer.d_state.opt_state,
                best=np.zeros(2, np.float64),
            )
            try:
                state = ckpt_mgr.restore(template, latest)
            except Exception:
                # legacy checkpoint written before best-PSNR tracking was
                # part of the resume state
                template.pop("best")
                state = ckpt_mgr.restore(template, latest)
            trainer.g_state = trainer.g_state.replace(
                params=state["g"], opt_state=state["g_opt"], step=latest
            )
            trainer.d_state = trainer.d_state.replace(
                params=state["d"], opt_state=state["d_opt"], step=latest
            )
            if "best" in state:
                bp, be = np.asarray(state["best"]).tolist()
                if be >= 0:
                    best_psnr, best_epoch = float(bp), int(be)
            start_epoch = latest + 1
            logger.log(
                f"resumed from {args.resume_dir} at epoch {latest}"
                + (f" (best PSNR {best_psnr:.2f} @ epoch {best_epoch})"
                   if best_epoch is not None else "")
            )

    rng = np.random.RandomState(args.seed + start_epoch)
    step = 0
    last_eval = None
    t_start = time.time()

    device_data = None
    scan_dp = args.scan_chunk > 1 and mesh.devices.size > 1
    if args.scan_chunk > 1:
        import jax.numpy as jnp

        # stage the full dataset on device once (uint8 frames: 1 B/px);
        # the DP path shards rows over the mesh, so clip to a multiple
        n = len(ds)
        if scan_dp:
            n -= n % mesh.devices.size
            if n != len(ds):
                logger.log(f"DP sharding: dropped {len(ds) - n} trailing "
                           f"row(s) to make the dataset divide over "
                           f"{mesh.devices.size} devices ({n} rows kept)")
        device_data = dict(
            prev_image=jnp.asarray(ds.prev_images[:n]),
            state=jnp.asarray(ds.states[:n]),
            target_image=jnp.asarray(ds.target_images[:n]),
        )
        logger.log(f"scan_chunk={args.scan_chunk}: dataset staged on device "
                   f"({sum(x.nbytes for x in device_data.values()) / 1e9:.2f} GB"
                   + (f", sharded over {mesh.devices.size} devices)" if scan_dp
                      else ")"))

    for epoch in range(start_epoch, args.niter + 1):
        if device_data is not None:
            # one epoch = len(ds)//batchSize updates, run in scanned chunks
            steps_per_epoch = max(len(ds) // args.batchSize, 1)
            if args.max_steps:
                steps_per_epoch = min(steps_per_epoch, args.max_steps - step)
            done_in_epoch = 0
            while done_in_epoch < steps_per_epoch:
                chunk = min(args.scan_chunk, steps_per_epoch - done_in_epoch)
                # collision-free per-chunk keys regardless of epoch length
                key = jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(args.seed), epoch),
                    done_in_epoch,
                )
                if scan_dp:
                    metrics = trainer.train_many_dp(
                        mesh, device_data, key, chunk, args.batchSize
                    )
                else:
                    metrics = trainer.train_many(
                        device_data, key, chunk, args.batchSize
                    )
                step += chunk
                done_in_epoch += chunk
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                logger.log(
                    f"epoch {epoch} step {step} "
                    f"({step / max(time.time() - t_start, 1e-9):.1f} it/s "
                    "cum): " +
                    " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items()))
                )
        else:
            for batch in ds.batches(args.batchSize, rng):
                metrics = trainer.train_step(shard_batch(mesh, batch))
                step += 1
                if step % args.log_interval == 0:
                    m = {k: float(v)
                         for k, v in jax.device_get(metrics).items()}
                    logger.log(
                        f"epoch {epoch} step {step}: " +
                        " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items()))
                    )
                if args.max_steps and step >= args.max_steps:
                    break
        m = {k: float(v) for k, v in jax.device_get(metrics).items()}
        logger.record_tabular("epoch", epoch)
        logger.record_tabular("step", step)
        logger.record_dict(m)
        if args.eval_interval and (
            epoch == start_epoch or epoch % args.eval_interval == 0
        ):
            last_eval = evaluate_generator(trainer, ds, args.eval_num)
            if not args.no_save_best and last_eval["psnr"] > best_psnr:
                best_psnr, best_epoch = last_eval["psnr"], epoch
                _save_checkpoint(args, "best", trainer, params_to_state_dict)
                logger.log(f"new best PSNR {best_psnr:.2f} at epoch {epoch} "
                           f"→ {args.env_type}_best.pkl")
        if last_eval is not None:
            if not args.no_save_best:
                # numeric even before any finite-PSNR eval (NaN evals leave
                # best unset): the frozen-header csv must stay parseable
                logger.record_tabular(
                    "eval/best_psnr",
                    best_psnr if best_epoch is not None else float("nan"))
                logger.record_tabular(
                    "eval/best_epoch",
                    best_epoch if best_epoch is not None else -1)
            # record every epoch so the frozen csv header includes the eval
            # columns from the first dump (logging.py key-freeze contract)
            logger.record_dict(last_eval, prefix="eval/")
        logger.record_tabular("time_s", round(time.time() - t_start, 1))
        logger.dump_tabular()
        if epoch % args.save_epoch_freq == 0 or epoch == args.niter:
            _save_checkpoint(args, epoch, trainer, params_to_state_dict)
        if ckpt_mgr is not None:
            state = jax.device_get(dict(
                g=trainer.g_state.params, g_opt=trainer.g_state.opt_state,
                d=trainer.d_state.params, d_opt=trainer.d_state.opt_state,
            ))
            # carry the best-PSNR tracker through resume: a stall-kill +
            # relaunch must not let a worse later eval overwrite {env}_best
            state["best"] = np.array(
                [best_psnr, -1.0 if best_epoch is None else float(best_epoch)],
                np.float64,
            )
            ckpt_mgr.save(epoch, state)
        if args.max_steps and step >= args.max_steps:
            break
    if ckpt_mgr is not None:
        ckpt_mgr.wait_until_finished()
        ckpt_mgr.close()
    logger.close()
    return log_dir


def _save_checkpoint(args, epoch: int, trainer, params_to_state_dict) -> None:
    import jax

    params = jax.device_get(trainer.g_state.params)["params"]
    base = osp.join(args.checkpoints_dir, f"{args.env_type}_{epoch}")
    with open(base + ".pkl", "wb") as f:
        pickle.dump({"params": params}, f)
    try:
        import torch

        sd = {k: torch.from_numpy(np.array(v, copy=True))
              for k, v in params_to_state_dict(params).items()}
        torch.save(sd, base + ".pth")
    except ImportError:
        pass
    print(f"saved checkpoint {base}.pkl/.pth")


if __name__ == "__main__":
    main()
