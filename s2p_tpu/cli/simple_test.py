"""``simple_test.py`` — N-step autoregressive S2P generation.

Reference public surface (/root/reference/README.md:27-34):

    python simple_test.py --env_type=cheetah --dataroot=./datasets \
        --netG=s2p --start_idx=0 --seq_len=5 --gpu_ids=0

Behavior: take the ground-truth image i_{t0} at ``--start_idx`` from the
dataset and states s_{t0+1..t0+L}, generate i_{t+1} = G(s_{t+1}, î_t)
autoregressively for ``--seq_len`` steps (SURVEY §3.6), and save the frames
(plus the ground-truth strip when available) as PNGs. On TPU the whole
rollout is one compiled ``lax.scan`` (s2p_tpu.gan.rollout).

``--gpu_ids`` is accepted for CLI parity and ignored: device selection is
jax-native (a TPU chip, or JAX_PLATFORMS=cpu).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
from typing import Optional

import numpy as np

ENV_DEFAULTS = {
    # env_type -> (image_size, default seq_len) per README.md:22-34
    "cheetah": (64, 5),
    "walker": (64, 10),
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--env_type", type=str, default="cheetah",
                   choices=sorted(ENV_DEFAULTS))
    p.add_argument("--dataroot", type=str, default="./datasets",
                   help="HDF5 file or directory containing {env_type}.hdf5")
    p.add_argument("--netG", type=str, default="s2p",
                   choices=["s2p", "sat_state", "sat_image"])
    p.add_argument("--start_idx", type=int, default=0)
    p.add_argument("--seq_len", type=int, default=None,
                   help="default: 5 (cheetah) / 10 (walker)")
    p.add_argument("--gpu_ids", type=str, default="0",
                   help="accepted for reference-CLI parity; ignored (jax-native)")
    p.add_argument("--checkpoints_dir", type=str, default="./checkpoints")
    p.add_argument("--which_epoch", type=str, default="30",
                   help="loads {env_type}_{which_epoch}.pth")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="explicit checkpoint path (.pth or .pkl); overrides "
                        "checkpoints_dir/which_epoch")
    p.add_argument("--results_dir", type=str, default="./results")
    p.add_argument("--ngf", type=int, default=64)
    p.add_argument("--init_random", action="store_true",
                   help="skip checkpoint loading (smoke runs)")
    p.add_argument("--fast_inference", action="store_true",
                   help="constant-state-map modulation shortcut "
                        "(gan/fast_inference.py): same params, faster on "
                        "TPU, pixels equal up to float re-association")
    p.add_argument("--use_pallas", action="store_true",
                   help="with --fast_inference: route the MAT norm+"
                        "modulation through the fused Pallas VMEM kernel "
                        "(gan/pallas_kernels.py; TPU only, A/B vs plain)")
    p.add_argument("--gb_int8", action="store_true",
                   help="with --fast_inference: int8 γ/β modulation convs "
                        "(per-channel int8 weights + dynamic activation "
                        "quant, int32 accumulation; ~51 dB PSNR vs the "
                        "float path — opt-in speed/quality trade)")
    return p


def resolve_dataroot(dataroot: str, env_type: str) -> str:
    if osp.isdir(dataroot):
        return osp.join(dataroot, f"{env_type}.hdf5")
    return dataroot


def _mat_mode(netG: str) -> str:
    return "mat" if netG == "s2p" else netG


def main(argv: Optional[list] = None) -> str:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from s2p_tpu.data.hdf5 import load_rl_dataset
    from s2p_tpu.gan import S2PGenerator, generate_rollout
    from s2p_tpu.gan.convert import load_generator_checkpoint

    image_size, default_len = ENV_DEFAULTS[args.env_type]
    seq_len = args.seq_len if args.seq_len is not None else default_len

    ds = load_rl_dataset(resolve_dataroot(args.dataroot, args.env_type))
    imgs = ds["image_observations"]
    states = ds["next_observations"]
    t0, L = args.start_idx, seq_len
    assert t0 + L <= len(states), (
        f"start_idx={t0} + seq_len={L} exceeds dataset length {len(states)}"
    )
    image_size = imgs.shape[1]

    gen = S2PGenerator(image_size=image_size, ngf=args.ngf,
                       mat_mode=_mat_mode(args.netG))
    init_img = jnp.asarray(
        imgs[t0].astype(np.float32) / 127.5 - 1.0
    )[None]
    roll_states = jnp.asarray(states[t0 : t0 + L].astype(np.float32))[:, None]

    if args.init_random:
        variables = gen.init(jax.random.PRNGKey(0), roll_states[0], init_img)
    else:
        ckpt = args.checkpoint or osp.join(
            args.checkpoints_dir, f"{args.env_type}_{args.which_epoch}.pth"
        )
        variables = load_generator_checkpoint(ckpt, gen, roll_states[0], init_img)

    if args.fast_inference:
        from s2p_tpu.gan.fast_inference import generate_rollout_fast

        frames = generate_rollout_fast(gen, variables, init_img, roll_states,
                                       use_pallas=args.use_pallas,
                                       gb_int8=args.gb_int8)
    else:
        frames = generate_rollout(gen, variables, init_img, roll_states)
    frames = np.asarray(jax.device_get(frames))[:, 0]  # [L, H, W, C]
    frames_u8 = ((frames + 1.0) * 127.5).clip(0, 255).astype(np.uint8)

    out_dir = osp.join(args.results_dir, f"{args.env_type}_{args.netG}")
    os.makedirs(out_dir, exist_ok=True)
    import imageio.v2 as imageio

    imageio.imwrite(osp.join(out_dir, f"real_{t0:05d}.png"), imgs[t0])
    for i, fr in enumerate(frames_u8):
        imageio.imwrite(osp.join(out_dir, f"gen_{t0 + 1 + i:05d}.png"), fr)
    # side-by-side strip: generated row over ground-truth row when available
    gt = imgs[t0 + 1 : t0 + 1 + L]
    strip = np.concatenate(list(frames_u8), axis=1)
    if len(gt) == L:
        strip = np.concatenate([strip, np.concatenate(list(gt), axis=1)], axis=0)
    imageio.imwrite(osp.join(out_dir, f"rollout_{t0:05d}.png"), strip)
    print(f"wrote {L} generated frames to {out_dir}")
    return out_dir


if __name__ == "__main__":
    main()
