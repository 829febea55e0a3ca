#!/usr/bin/env python
"""Render images for a state-only dataset by qpos/qvel replay.

Pipeline role: the reference pipeline requires
``image_numpy_dataset_stack3_imgsize_100.hdf5`` to be generated "by
image_render.py" (/root/reference/state_transition_rollout.py:76) — a
script absent from the checkout. Reconstructed behavior: for every
transition, restore the simulator to its recorded ``qpos_qvel`` state
(the set_state replay hook, examples/iql/custom_gym_to_multi_env.py:18-24),
render at ``--imsize``, and write the image dataset with the 3-frame-stack
companions (``image_observations_tm1``/``_tm2`` — previous frames within
the episode, repeated at episode starts) and ``image_observations_tp1``.
"""

from __future__ import annotations

import argparse

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True,
                   help="state dataset HDF5 with qpos_qvel")
    p.add_argument("--env_name", default="cheetah-run")
    p.add_argument("--imsize", type=int, default=100)
    p.add_argument("--camera_id", type=int, default=0)
    p.add_argument("--output",
                   default="image_numpy_dataset_stack3_imgsize_100.hdf5")
    return p


def render_images_for_dataset(env, qpos_qvel: np.ndarray, imsize: int,
                              camera_id: int = 0) -> np.ndarray:
    """[N, H, W, 3] uint8 frames via state replay."""
    nq = env.physics.model.nq
    frames = np.empty((len(qpos_qvel), imsize, imsize, 3), np.uint8)
    for i, row in enumerate(qpos_qvel):
        env.set_state(np.asarray(row[:nq]), np.asarray(row[nq:]))
        frames[i] = env.render(height=imsize, width=imsize,
                               camera_id=camera_id)
    return frames


def add_frame_stacks(frames: np.ndarray, timeouts: np.ndarray) -> dict:
    """tm1/tm2/tp1 companions respecting episode boundaries (the
    memory-efficient 3-stack schema, SURVEY §2.5)."""
    from s2p_tpu.data.hdf5 import episode_slices

    n = len(frames)
    tm1 = np.empty_like(frames)
    tm2 = np.empty_like(frames)
    tp1 = np.empty_like(frames)
    eps = list(episode_slices(timeouts))
    tail = eps[-1].stop if eps else 0
    if tail < n:
        eps.append(slice(tail, n))
    for ep in eps:
        f = frames[ep]
        tm1[ep] = np.concatenate([f[:1], f[:-1]], axis=0)
        tm2[ep] = np.concatenate([f[:1], f[:1], f[:-2]], axis=0) if len(f) > 1 \
            else f
        tp1[ep] = np.concatenate([f[1:], f[-1:]], axis=0)
    return dict(
        image_observations=frames,
        image_observations_tm1=tm1,
        image_observations_tm2=tm2,
        image_observations_tp1=tp1,
    )


def main(argv=None) -> str:
    args = build_parser().parse_args(argv)

    import h5py

    from s2p_tpu.data.hdf5 import save_dataset
    from s2p_tpu.envs import make_dmc

    with h5py.File(args.dataset, "r") as f:
        ds = {k: f[k][:] for k in f.keys()}
    assert "qpos_qvel" in ds, "dataset must carry qpos_qvel for replay"

    env = make_dmc(args.env_name, from_pixels=False)
    frames = render_images_for_dataset(
        env, ds["qpos_qvel"], args.imsize, args.camera_id
    )
    ds.update(add_frame_stacks(frames, np.asarray(ds["timeouts"]).ravel()))
    save_dataset(args.output, ds)
    print(f"rendered {len(frames)} frames at {args.imsize}px → {args.output}")
    return args.output


if __name__ == "__main__":
    main()
