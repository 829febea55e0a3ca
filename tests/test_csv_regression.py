"""Walker image-path CSV regression (reference validation pattern,
SURVEY §4: seeded tiny run, compare progress.csv against a COMMITTED
reference CSV with ``csv_util.check_equal``).

This locks the full walker image pipeline — synthetic HDF5 → SLAC
ingestion → on-device S2P generation of the augment frames →
IQL(+SLAC) training → dm_control eval rollouts → frozen-key progress.csv
— against regressions without TPU hardware (VERDICT r3 next-#9).

Regenerate the fixture after an INTENTIONAL behavior change with:

    JAX_PLATFORMS=cpu python tests/test_csv_regression.py --regen

(the test itself always runs on the forced-CPU conftest platform, so the
fixture is backend-stable).
"""

import os.path as osp
import pickle
import shutil

import numpy as np
import pytest

pytest.importorskip("dm_control")

FIXTURE = osp.join(osp.dirname(__file__), "fixtures",
                   "walker_image_iql_progress.csv")
# columns that legitimately vary run-to-run (wall clock)
_SKIP_PREFIXES = ("time/",)

OBS, ACT, HW = 24, 6, 64  # walker-walk dims


def run_tiny_walker_image(tmp_path) -> str:
    """Seeded tiny walker image-IQL run; returns the run's log dir."""
    import jax
    import jax.numpy as jnp

    from s2p_tpu.cli.mujoco_finetune import (
        build_parser, experiment, make_variant,
    )
    from s2p_tpu.data.hdf5 import (
        make_slac_window_indices,
        make_synthetic_rl_dataset,
        save_dataset,
    )
    from s2p_tpu.gan import S2PGenerator

    ep_len = 12
    real = make_synthetic_rl_dataset(n_episodes=2, episode_len=ep_len,
                                     obs_dim=OBS, act_dim=ACT, img_hw=HW,
                                     seed=3)
    real_path = str(tmp_path / "real.hdf5")
    save_dataset(real_path, real)
    n = len(real["timeouts"])
    obs_i, act_i = [], []
    for start in (0, ep_len):
        o, a = make_slac_window_indices(ep_len, start, 8)
        obs_i.append(o)
        act_i.append(a)
    aug = dict(real, original_actions=real["actions"],
               original_rewards=real["rewards"],
               slac_observation_indices=np.concatenate(obs_i),
               slac_action_indices=np.concatenate(act_i),
               aleatoric_uncertainty=np.full((n, 1), 0.5, np.float32),
               disagreement_uncertainty=np.full((n, 1), 0.25, np.float32))
    aug.pop("image_observations_tp1")  # frames must come from the GAN
    aug_path = str(tmp_path / "aug.hdf5")
    save_dataset(aug_path, aug)

    gen = S2PGenerator(image_size=HW, ngf=8)
    params = gen.init(jax.random.PRNGKey(5), jnp.zeros((1, OBS)),
                      jnp.zeros((1, HW, HW, 3)))
    ckpt = str(tmp_path / "g.pkl")
    with open(ckpt, "wb") as f:
        pickle.dump(jax.device_get(params), f)

    args = build_parser().parse_args([
        "--env_name", "walker-walk", "--exp_name", "walker_csv_reg",
        "--algo_type", "iql", "--image_rl", "--slac_representation",
        "--data_path_real", real_path, "--data_path_gen", aug_path,
        "--gan_checkpoint", ckpt, "--gan_ngf", "8",
        "--uncertainty_type", "aleatoric",
        "--uncertainty_penalty_lambda", "2",
        "--image_size", str(HW), "--debug", "--no_video",
        "--seed", "11",
        "--log_dir", str(tmp_path / "logs"),
    ])
    return experiment(make_variant(args))


@pytest.mark.slow
def test_walker_image_csv_regression(tmp_path):
    from s2p_tpu.testing import check_equal, get_exp

    assert osp.exists(FIXTURE), (
        "fixture missing — regenerate with "
        "`JAX_PLATFORMS=cpu python tests/test_csv_regression.py --regen`"
    )
    log_dir = run_tiny_walker_image(tmp_path)
    got = get_exp(osp.join(log_dir, "progress.csv"))
    want = get_exp(FIXTURE)
    assert len(got) == len(want)
    keys = [k for k in want[0]
            if not any(k.startswith(p) for p in _SKIP_PREFIXES)]
    # frozen-key contract: the header must not silently change either
    assert set(want[0].keys()) == set(got[0].keys())
    check_equal(want, got, keys, rel_tol=1e-5)


if __name__ == "__main__":
    import sys
    import tempfile

    if "--regen" not in sys.argv:
        sys.exit("usage: python tests/test_csv_regression.py --regen")
    # mirror tests/conftest.py EXACTLY — the fixture must be produced in
    # the same backend configuration the test runs under (thread-pool /
    # device-count differences change float reduction order)
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import pathlib

    with tempfile.TemporaryDirectory() as td:
        log_dir = run_tiny_walker_image(pathlib.Path(td))
        src = osp.join(log_dir, "progress.csv")
        dst = FIXTURE
        import os

        os.makedirs(osp.dirname(dst), exist_ok=True)
        shutil.copy(src, dst)
        print(f"fixture written: {dst}")
