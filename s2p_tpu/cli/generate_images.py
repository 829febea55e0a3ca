"""S2P image generation for augmented datasets — the GAN→RL bridge.

Pipeline role (SURVEY §1 data flow): the world-model rollout
(state_transition_rollout.py) produces synthetic transitions WITHOUT next
images; the S2P generator then renders ``image_observations_tp1`` for every
row, yielding the ``..._dataset-rl.hdf5`` consumed by the offline RL loop
(reference: rlkit/torch/slac/algo.py:179-210,336 — the generated frame at
window position num_seq comes from ``image_observations_tp1``).

For each augment row i: ``i_{t+1} = G(s_{t+1} = next_observations[i],
i_t = image_observations[i])`` — one batched jitted generator call per
chunk, device-resident end to end.
"""

from __future__ import annotations

import argparse
from typing import Optional

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True, help="augment HDF5 (no images yet)")
    p.add_argument("--checkpoint", required=True,
                   help="S2P generator checkpoint (.pth or .pkl)")
    p.add_argument("--output", required=True, help="output -rl.hdf5 path")
    p.add_argument("--netG", type=str, default="s2p",
                   choices=["s2p", "sat_state", "sat_image"])
    p.add_argument("--ngf", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--bf16", action="store_true",
                   help="run the generator in bfloat16 (TPU fast path)")
    return p


def generate_images_for_dataset(
    dataset: dict,
    generator,
    variables,
    batch_size: int = 256,
    bf16: bool = False,
) -> np.ndarray:
    """Returns generated uint8 frames [N, H, W, C]."""
    import jax
    import jax.numpy as jnp

    imgs = np.asarray(dataset["image_observations"])
    states = np.asarray(dataset["next_observations"], np.float32)
    n = len(states)
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    if bf16:
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), variables
        )

    @jax.jit
    def gen_batch(state, prev_u8):
        prev = prev_u8.astype(dtype) / 127.5 - 1.0
        out = generator.apply(variables, state.astype(dtype), prev)
        return ((out.astype(jnp.float32) + 1.0) * 127.5).clip(0, 255).astype(jnp.uint8)

    # async pipeline: dispatch every chunk without waiting (jax queues the
    # device work; host→device uploads of chunk k+1 overlap compute of k),
    # then fetch all results in one pass
    device_outs = []
    lens = []
    for lo in range(0, n, batch_size):
        sl = slice(lo, min(lo + batch_size, n))
        # pad the tail to keep a single compiled shape
        s = states[sl]
        p = imgs[sl]
        pad = batch_size - len(s)
        if pad:
            s = np.concatenate([s, np.zeros((pad,) + s.shape[1:], s.dtype)])
            p = np.concatenate([p, np.zeros((pad,) + p.shape[1:], p.dtype)])
        device_outs.append(gen_batch(jnp.asarray(s), jnp.asarray(p)))
        lens.append(sl.stop - sl.start)
    outs = jax.device_get(device_outs)
    return np.concatenate(
        [np.asarray(o)[:k] for o, k in zip(outs, lens)], axis=0
    )


def main(argv: Optional[list] = None) -> str:
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp

    from s2p_tpu.data.hdf5 import load_augment_dataset, save_dataset
    from s2p_tpu.gan import S2PGenerator
    from s2p_tpu.gan.convert import load_generator_checkpoint

    ds = load_augment_dataset(args.dataset)
    assert "image_observations" in ds, "augment dataset must carry i_t frames"
    H = ds["image_observations"].shape[1]
    mat_mode = "mat" if args.netG == "s2p" else args.netG
    gen = S2PGenerator(image_size=H, ngf=args.ngf, mat_mode=mat_mode)
    variables = load_generator_checkpoint(
        args.checkpoint, gen,
        jnp.zeros((1, ds["next_observations"].shape[1])),
        jnp.zeros((1, H, H, ds["image_observations"].shape[-1])),
    )
    frames = generate_images_for_dataset(
        ds, gen, variables, batch_size=args.batch_size, bf16=args.bf16
    )
    out = dict(ds)
    out["image_observations_tp1"] = frames
    save_dataset(args.output, out)
    print(f"wrote {len(frames)} generated frames to {args.output}")
    return args.output


if __name__ == "__main__":
    main()
