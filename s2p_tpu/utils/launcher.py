"""Experiment launcher.

Capability contract (reference: rlkit/launchers/launcher_util.py:90-180,
440+ ``run_experiment``/``run_experiment_here`` and the seed-parallel
process launcher at examples/iql/mujoco_finetune.py:366-404): set seeds,
create the run dir + variant.json via setup_logger, pickle the launch args
(experiment.pkl), call ``experiment(variant)``; ``run_parallel_seeds``
launches one process per seed (the reference staggers starts to ease h5py
contention — kept, configurable). Doodad/EC2 modes are out of scope
(shipped scripts use mode='here_no_doodad')."""

from __future__ import annotations

import multiprocessing as mp
import os.path as osp
import time
from typing import Any, Callable, List, Mapping

from s2p_tpu.utils.io import save_pickle
from s2p_tpu.utils.logging import logger, setup_logger
from s2p_tpu.utils.seeding import set_seed


def run_experiment_here(
    experiment_function: Callable[[Mapping[str, Any]], Any],
    variant: Mapping[str, Any],
    exp_name: str = "experiment",
    seed: int = 0,
    base_log_dir: str = "./logs",
    snapshot_mode: str = "gap_and_last",
    snapshot_gap: int = 10,
) -> Any:
    set_seed(seed)
    variant = dict(variant)
    variant.setdefault("seed", seed)
    variant.setdefault("exp_name", exp_name)
    log_dir = setup_logger(
        exp_name, variant=variant, base_log_dir=base_log_dir, seed=seed,
        snapshot_mode=snapshot_mode, snapshot_gap=snapshot_gap,
    )
    save_pickle(
        dict(variant=variant, exp_name=exp_name, seed=seed),
        osp.join(log_dir, "experiment.pkl"),
    )
    try:
        return experiment_function(variant)
    finally:
        logger.close()


def run_experiment(
    experiment_function: Callable[[Mapping[str, Any]], Any],
    variant: Mapping[str, Any],
    mode: str = "here_no_doodad",
    **kwargs: Any,
) -> Any:
    assert mode == "here_no_doodad", (
        f"mode {mode!r} not supported (reference shipped scripts only use "
        "here_no_doodad; doodad/EC2 modes are out of scope)"
    )
    return run_experiment_here(experiment_function, variant, **kwargs)


def run_parallel_seeds(
    experiment_function: Callable[[Mapping[str, Any]], Any],
    variant: Mapping[str, Any],
    seeds: List[int],
    exp_name: str = "experiment",
    base_log_dir: str = "./logs",
    stagger_seconds: float = 10.0,
) -> List[mp.Process]:
    """One process per seed (reference mujoco_finetune.py:366-404; the 10s
    stagger eases concurrent h5py loads, :400)."""
    procs = []
    for i, seed in enumerate(seeds):
        p = mp.Process(
            target=run_experiment_here,
            args=(experiment_function, dict(variant)),
            kwargs=dict(exp_name=exp_name, seed=seed, base_log_dir=base_log_dir),
        )
        p.start()
        procs.append(p)
        if i < len(seeds) - 1 and stagger_seconds:
            time.sleep(stagger_seconds)
    return procs
