"""Offline image-RL experiment entry point.

Capability contract (reference: examples/iql/mujoco_finetune.py:22-423 +
rlkit/launchers/experiments/awac/finetune_rl.py:81-629, invoked by
run_iql_image.sh / run_cql_image.sh): assemble the variant, build DMC eval
/expl envs, the SLAC algorithm (+ pretrained latent), the fused critic and
feature_action policy, collectors, the IQL/CQL trainer, ingest real +
S2P-generated HDF5 data with the uncertainty-penalized reward rule, and run
the offline→online batch RL loop with video and csv observability.

Reference scale (mujoco_finetune.py:260-266,346-349): 100×100 pixels,
start_epoch=−150, 151 epochs, 2000 grad steps/epoch, batch 128;
``--debug`` shrinks everything for smoke runs. ``--gpu_id`` is accepted for
CLI parity and ignored (jax-native device selection).
"""

from __future__ import annotations

import argparse
import os.path as osp
from typing import Optional


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp_name", type=str, default="s2p_rl")
    p.add_argument("--env_name", type=str, default="cheetah-run")
    p.add_argument("--algo_type", type=str, default="iql", choices=["iql", "cql"])
    p.add_argument("--image_rl", action="store_true")
    p.add_argument("--slac_representation", action="store_true")
    p.add_argument("--freeze_slac", action="store_true")
    p.add_argument("--slac_latent_model_load_dir", type=str, default="")
    p.add_argument("--slac_policy_input_type", type=str,
                   default="feature_action",
                   choices=["feature_action", "latent_z"])
    p.add_argument("--slac_obs_reset_w_same_obs", action="store_true")
    p.add_argument("--data_path_real", type=str, default=None,
                   help="real image RL HDF5")
    p.add_argument("--data_path_gen", type=str, default=None,
                   help="S2P-generated augment HDF5")
    p.add_argument("--gan_checkpoint", type=str, default=None,
                   help="S2P generator checkpoint (.pth/.pkl): synthesize "
                        "the generated next-frames ON DEVICE while "
                        "ingesting --data_path_gen (no -rl.hdf5 file needed)")
    p.add_argument("--gan_ngf", type=int, default=64)
    p.add_argument("--data_mix_type", type=str,
                   default="all_state_1step_random_action")
    p.add_argument("--data_mix_num_real", type=int, default=None)
    p.add_argument("--data_mix_num_gen", type=int, default=None)
    p.add_argument("--uncertainty_type", type=str, default=None)
    p.add_argument("--uncertainty_penalty_lambda", type=float, default=1.0)
    p.add_argument("--seperate_buffer", action="store_true")
    # CQL conservatism knobs (reference hardcodes these in its
    # trainer_kwargs table, mujoco_finetune.py:134-138; exposed here as
    # flags — same defaults). with_lagrange trades the fixed penalty
    # weight for a dual variable targeting lagrange_thresh action-gap,
    # the standard fix for late-training Q over-conservatism drift
    # (docs/ROUND3_NOTES.md image-CQL analysis).
    p.add_argument("--min_q_weight", type=float, default=5.0)
    p.add_argument("--with_lagrange", action="store_true")
    p.add_argument("--lagrange_thresh", type=float, default=-1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--gpu_id", type=int, default=0,
                   help="accepted for reference-CLI parity; ignored")
    p.add_argument("--no_curl_contrastive_learning", action="store_true",
                   help="accepted for reference-CLI parity (CURL path is "
                        "always off in the shipped configs)")
    p.add_argument("--image_size", type=int, default=100)
    p.add_argument("--num_epochs", type=int, default=151)
    p.add_argument("--start_epoch", type=int, default=-150)
    p.add_argument("--num_trains_per_train_loop", type=int, default=2000)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--num_eval_steps_per_epoch", type=int, default=None)
    p.add_argument("--max_path_length", type=int, default=None)
    p.add_argument("--scan_training", action="store_true",
                   help="compile the whole inner training loop into one "
                        "lax.scan with on-device batch sampling (TPU fast "
                        "path; single-buffer configs only)")
    p.add_argument("--eval_period", type=int, default=1,
                   help="collect eval rollouts every N epochs (1 = every "
                        "epoch, the reference cadence; >1 trades eval-curve "
                        "density for wall-clock when env stepping is the "
                        "bottleneck)")
    p.add_argument("--save_video_period", type=int, default=5)
    p.add_argument("--no_video", action="store_true")
    p.add_argument("--log_dir", type=str, default="./logs")
    p.add_argument("--resume_dir", type=str, default=None,
                   help="orbax checkpoint dir: save the FULL trainer state "
                        "(params + optimizer states + entropy temperatures "
                        "+ SLAC latent/opt + rng) every epoch and "
                        "auto-resume from the latest one after a crash "
                        "(data is re-ingested; epoch counter restored from "
                        "the train-step count)")
    p.add_argument("--debug", action="store_true")
    return p


def _setup_resume(variant, trainer, start_epoch):
    """Restore the latest full-state checkpoint (if any) and return
    (ckpt_manager, possibly-advanced start_epoch, save_hook)."""
    d = variant.get("resume_dir")
    if not d:
        return None, start_epoch, None
    import jax

    from s2p_tpu.utils.checkpoint import CheckpointManager
    from s2p_tpu.utils.logging import logger

    mgr = CheckpointManager(d, max_to_keep=2)
    latest = mgr.latest_step()
    if latest is not None:
        trainer.load_full_state(mgr.restore(trainer.full_state(), latest))
        done = latest // max(variant["num_trains_per_train_loop"], 1)
        start_epoch = start_epoch + done
        logger.log(f"resumed from {d} at {latest} train steps "
                   f"→ epoch {start_epoch}")

    def save_hook(algo, epoch):
        mgr.save(trainer._n_train_steps_total,
                 jax.device_get(trainer.full_state()))

    return mgr, start_epoch, save_hook


def make_variant(args) -> dict:
    from s2p_tpu.utils.config import Config

    variant = Config(vars(args))
    if args.debug:  # reference --debug shrink (mujoco_finetune.py:260-266)
        variant.num_epochs = 1
        variant.start_epoch = -2
        variant.num_trains_per_train_loop = 2
        variant.batch_size = 8
        variant.save_video_period = 1
    return variant


def experiment(variant) -> str:
    import jax
    import numpy as np

    from s2p_tpu.core import BatchRLAlgorithm, VideoSaveFunction
    from s2p_tpu.envs import make_dmc, DMC_ENVS
    from s2p_tpu.rl import CQLTrainer, CriticSLAC, IQLTrainer, TanhGaussianPolicy
    from s2p_tpu.samplers import MdpPathCollector, PolicyAgent
    from s2p_tpu.slac import SlacAlgorithm
    from s2p_tpu.utils.logging import logger, setup_logger
    from s2p_tpu.utils.seeding import set_seed

    set_seed(variant["seed"])
    log_dir = setup_logger(
        variant["exp_name"], variant=variant, base_log_dir=variant["log_dir"],
        seed=variant["seed"], snapshot_mode="gap_and_last", snapshot_gap=10,
    )

    env_key = variant["env_name"]
    for known in DMC_ENVS:
        if env_key.startswith(known.split("-")[0]):
            env_key = known
            break
    image_size = variant["image_size"]
    eval_env = make_dmc(env_key, from_pixels=variant["image_rl"],
                        height=image_size, width=image_size,
                        seed=variant["seed"])
    expl_env = make_dmc(env_key, from_pixels=variant["image_rl"],
                        height=image_size, width=image_size,
                        seed=variant["seed"] + 1)
    action_dim = eval_env.action_space.shape[0]
    max_path_length = variant["max_path_length"] or eval_env._max_episode_steps
    num_eval_steps = variant["num_eval_steps_per_epoch"] or max_path_length
    if variant["debug"]:
        max_path_length = min(max_path_length, 10)
        num_eval_steps = max_path_length

    if not variant["slac_representation"]:
        return _state_rl_experiment(
            variant, eval_env, expl_env, action_dim, max_path_length,
            num_eval_steps,
        )
    slac = SlacAlgorithm(
        action_dim=action_dim,
        num_sequences=8,
        buffer_size=int(1.05e5),
        feature_dim=256, z1_dim=32, z2_dim=256,
        image_size=image_size,
        use_seperate_buffer=variant["seperate_buffer"],
        seed=variant["seed"],
    )
    if variant["slac_latent_model_load_dir"]:
        d = variant["slac_latent_model_load_dir"]
        path = d if osp.isfile(d) else _find_latent(d)
        slac.load_latent(path)
        logger.log(f"loaded SLAC latent from {path}")

    # data ingestion (finetune_rl.py:505-577)
    if variant["data_path_real"]:
        n = slac.load_data_in_buffer(
            variant["data_path_real"], data_num=variant["data_mix_num_real"]
        )
        logger.log(f"real data: {n} sequence slots")
    if variant["data_path_gen"]:
        generated_frames = None
        if variant.get("gan_checkpoint"):
            # on-device generation: i_{t+1} = G(s_{t+1}, i_t) synthesized by
            # the S2P generator straight into the replay buffer
            import jax.numpy as jnp

            from s2p_tpu.cli.generate_images import generate_images_for_dataset
            from s2p_tpu.data.hdf5 import load_augment_dataset
            from s2p_tpu.gan import S2PGenerator
            from s2p_tpu.gan.convert import load_generator_checkpoint

            gen_ds = load_augment_dataset(
                variant["data_path_gen"], variant["data_mix_num_gen"]
            )
            H = gen_ds["image_observations"].shape[1]
            gen = S2PGenerator(image_size=H, ngf=variant["gan_ngf"])
            gan_vars = load_generator_checkpoint(
                variant["gan_checkpoint"], gen,
                jnp.zeros((1, gen_ds["next_observations"].shape[1])),
                jnp.zeros((1, H, H, gen_ds["image_observations"].shape[-1])),
            )
            generated_frames = generate_images_for_dataset(
                gen_ds, gen, gan_vars, bf16=True
            )
            logger.log(
                f"synthesized {len(generated_frames)} next-frames on device "
                f"from {variant['gan_checkpoint']}"
            )
            buf = slac.buffer_gen if slac.use_seperate_buffer else slac.buffer
            n = buf.ingest_generated(
                gen_ds, variant["uncertainty_type"],
                variant["uncertainty_penalty_lambda"],
                generated_frames=generated_frames,
            )
        else:
            n = slac.load_data_in_buffer(
                variant["data_path_gen"], data_num=variant["data_mix_num_gen"],
                generated_for_slac=True, data_mix_type=variant["data_mix_type"],
                uncertainty_type=variant["uncertainty_type"],
                uncertainty_penalty_lambda=variant["uncertainty_penalty_lambda"],
            )
        logger.log(f"generated data: {n} sequence slots "
                   f"(uncertainty={variant['uncertainty_type']}, "
                   f"lambda={variant['uncertainty_penalty_lambda']})")
    assert len(slac.buffer) > 0, "no data ingested — pass --data_path_real"

    z_dim = slac.z_dim
    policy_input_dim = (
        slac.feature_action_dim
        if variant["slac_policy_input_type"] == "feature_action"
        else z_dim
    )
    policy = TanhGaussianPolicy(hidden_sizes=(1024, 1024), action_dim=action_dim)
    critic = CriticSLAC(hidden_sizes=(1024, 1024))
    common = dict(
        policy=policy, critic=critic, obs_dim=z_dim,
        policy_input_dim=policy_input_dim, action_dim=action_dim,
        slac_algo=slac, slac_policy_input_type=variant["slac_policy_input_type"],
        freeze_slac=variant["freeze_slac"], seed=variant["seed"],
    )
    if variant["algo_type"] == "iql":
        trainer = IQLTrainer(
            discount=0.99, policy_lr=1e-4, qf_lr=3e-4, reward_scale=1.0,
            soft_target_tau=0.005, beta=1.0 / 10, quantile=0.7,
            clip_score=100, target_update_period=2, **common,
        )
    else:
        trainer = CQLTrainer(
            discount=0.99, policy_lr=1e-4, qf_lr=3e-4, reward_scale=1.0,
            soft_target_tau=5e-3, policy_eval_start=40_000, temp=1.0,
            min_q_version=3, min_q_weight=variant["min_q_weight"],
            num_random=10, with_lagrange=variant["with_lagrange"],
            lagrange_thresh=variant["lagrange_thresh"], **common,
        )

    eval_agent = PolicyAgent(policy, trainer.policy_state.params,
                             deterministic=True, seed=variant["seed"])
    expl_agent = PolicyAgent(policy, trainer.policy_state.params,
                             deterministic=False, seed=variant["seed"] + 1)

    def _sync_agents(algo, epoch):
        eval_agent.set_params(algo.trainer.policy_state.params)
        expl_agent.set_params(algo.trainer.policy_state.params)

    slac_kw = dict(
        slac_algo=slac,
        slac_policy_input_type=variant["slac_policy_input_type"],
        slac_obs_reset_w_same_obs=variant["slac_obs_reset_w_same_obs"],
    )
    eval_col = MdpPathCollector(eval_env, eval_agent, **slac_kw)
    expl_col = MdpPathCollector(expl_env, expl_agent, **slac_kw)

    ckpt_mgr, resume_start, save_hook = _setup_resume(
        variant, trainer, variant["start_epoch"]
    )
    algo = BatchRLAlgorithm(
        trainer=trainer,
        exploration_env=expl_env, evaluation_env=eval_env,
        exploration_data_collector=expl_col,
        evaluation_data_collector=eval_col,
        replay_buffer=slac.buffer,
        replay_buffer_gen=slac.buffer_gen,
        batch_size=variant["batch_size"],
        max_path_length=max_path_length,
        num_epochs=variant["num_epochs"],
        num_eval_steps_per_epoch=num_eval_steps,
        num_expl_steps_per_train_loop=max_path_length,
        num_trains_per_train_loop=variant["num_trains_per_train_loop"],
        start_epoch=resume_start,
        slac_representation=True,
        seed=variant["seed"],
        scan_training=variant.get("scan_training", False),
        eval_period=variant.get("eval_period", 1),
    )
    algo.post_epoch_funcs.append(_sync_agents)
    if save_hook is not None:
        algo.post_epoch_funcs.append(save_hook)
    if not variant["no_video"]:
        algo.post_epoch_funcs.append(
            VideoSaveFunction(
                eval_env, eval_agent, log_dir, tag="eval",
                save_video_period=variant["save_video_period"],
                horizon=max_path_length, **slac_kw,
            )
        )
    # keep the agents acting with the latest policy even before epoch hooks
    _sync_agents(algo, algo.epoch)
    algo.train()
    if ckpt_mgr is not None:
        ckpt_mgr.wait_until_finished()
        ckpt_mgr.close()
    logger.close()
    return log_dir


def _state_rl_experiment(variant, eval_env, expl_env, action_dim,
                         max_path_length, num_eval_steps) -> str:
    """State-observation offline RL (reference image_rl=False branch,
    iql_trainer.py:276-301 / cql_trainer.py state path): plain IQL/CQL over
    flat observations loaded from the HDF5 into an EnvReplayBuffer."""
    from s2p_tpu.core import BatchRLAlgorithm
    from s2p_tpu.data.env_replay_buffer import EnvReplayBuffer
    from s2p_tpu.data.hdf5 import load_state_dataset
    from s2p_tpu.data.path_loaders import load_hdf5
    from s2p_tpu.rl import CQLTrainer, CriticSLAC, IQLTrainer, TanhGaussianPolicy
    from s2p_tpu.samplers import MdpPathCollector, PolicyAgent
    from s2p_tpu.utils.logging import logger

    assert not variant["image_rl"], "state RL path expects --image_rl unset"
    obs_dim = eval_env.observation_space.shape[0]
    buf = EnvReplayBuffer(int(2e6), eval_env)
    assert variant["data_path_real"], "state RL needs --data_path_real"
    ds = load_state_dataset(variant["data_path_real"],
                            variant["data_mix_num_real"])
    n = load_hdf5(ds, buf)
    logger.log(f"state-RL buffer: {n} transitions")

    policy = TanhGaussianPolicy(hidden_sizes=(256, 256), action_dim=action_dim)
    critic = CriticSLAC(hidden_sizes=(256, 256))
    common = dict(policy=policy, critic=critic, obs_dim=obs_dim,
                  policy_input_dim=obs_dim, action_dim=action_dim,
                  seed=variant["seed"])
    if variant["algo_type"] == "iql":
        trainer = IQLTrainer(
            discount=0.99, policy_lr=1e-4, qf_lr=3e-4, beta=1.0 / 10,
            quantile=0.7, clip_score=100, soft_target_tau=0.005,
            target_update_period=2, **common,
        )
    else:
        trainer = CQLTrainer(
            discount=0.99, policy_lr=1e-4, qf_lr=3e-4, soft_target_tau=5e-3,
            policy_eval_start=40_000, min_q_weight=variant["min_q_weight"],
            with_lagrange=variant["with_lagrange"],
            lagrange_thresh=variant["lagrange_thresh"], **common,
        )
    eval_agent = PolicyAgent(policy, trainer.policy_state.params,
                             deterministic=True, seed=variant["seed"])
    expl_agent = PolicyAgent(policy, trainer.policy_state.params,
                             seed=variant["seed"] + 1)

    def _sync(algo, epoch):
        eval_agent.set_params(algo.trainer.policy_state.params)
        expl_agent.set_params(algo.trainer.policy_state.params)

    ckpt_mgr, resume_start, save_hook = _setup_resume(
        variant, trainer, variant["start_epoch"]
    )
    algo = BatchRLAlgorithm(
        trainer=trainer,
        exploration_env=expl_env, evaluation_env=eval_env,
        exploration_data_collector=MdpPathCollector(expl_env, expl_agent),
        evaluation_data_collector=MdpPathCollector(eval_env, eval_agent),
        replay_buffer=buf,
        batch_size=variant["batch_size"],
        max_path_length=max_path_length,
        num_epochs=variant["num_epochs"],
        num_eval_steps_per_epoch=num_eval_steps,
        num_expl_steps_per_train_loop=max_path_length,
        num_trains_per_train_loop=variant["num_trains_per_train_loop"],
        start_epoch=resume_start,
        seed=variant["seed"],
        eval_period=variant.get("eval_period", 1),
    )
    algo.post_epoch_funcs.append(_sync)
    if save_hook is not None:
        algo.post_epoch_funcs.append(save_hook)
    _sync(algo, algo.epoch)
    algo.train()
    if ckpt_mgr is not None:
        ckpt_mgr.wait_until_finished()
        ckpt_mgr.close()
    logger.close()
    return logger.log_dir or ""


def _find_latent(d: str) -> str:
    for name in ("latent.pkl", "latent.pth"):
        p = osp.join(d, name)
        if osp.exists(p):
            return p
    raise FileNotFoundError(f"no latent checkpoint in {d}")


def main(argv: Optional[list] = None) -> str:
    args = build_parser().parse_args(argv)
    return experiment(make_variant(args))


if __name__ == "__main__":
    main()
