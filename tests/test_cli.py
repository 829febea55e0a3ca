"""CLI surface tests — train.py / simple_test.py with tiny HDF5 fixtures
(reference CLI contract: README.md:27-34,56-60)."""

import os
import os.path as osp

import numpy as np
import pytest

from s2p_tpu.data.hdf5 import make_synthetic_rl_dataset, save_dataset


@pytest.fixture()
def tiny_hdf5(tmp_path):
    ds = make_synthetic_rl_dataset(
        n_episodes=2, episode_len=12, obs_dim=17, act_dim=6, img_hw=16
    )
    path = str(tmp_path / "cheetah.hdf5")
    save_dataset(path, ds)
    return path


@pytest.mark.slow
def test_train_gan_cli_smoke(tiny_hdf5, tmp_path):
    from s2p_tpu.cli.train_gan import main

    log_dir = main([
        "--dataroot", tiny_hdf5,
        "--env_type", "cheetah",
        "--netG", "s2p",
        "--batchSize", "8",
        "--niter", "1",
        "--max_steps", "2",
        "--ngf", "8",
        "--ndf", "8",
        "--num_D", "1",
        "--n_layers_D", "2",
        "--no_vgg_loss",
        "--log_interval", "1",
        "--checkpoints_dir", str(tmp_path / "ckpt"),
        "--log_dir", str(tmp_path / "logs"),
    ])
    assert osp.exists(osp.join(log_dir, "progress.csv"))
    assert osp.exists(osp.join(log_dir, "variant.json"))
    ckpts = os.listdir(tmp_path / "ckpt")
    assert any(c.endswith(".pkl") for c in ckpts)
    assert any(c.endswith(".pth") for c in ckpts)  # torch export (torch available)
    # eval-driven best export: first fresh eval sets the best
    assert "cheetah_best.pkl" in ckpts


@pytest.mark.slow
def test_simple_test_cli_from_trained_checkpoint(tiny_hdf5, tmp_path):
    """train → generate end-to-end: the .pth written by the train CLI loads
    through the torch converter and drives the rollout CLI."""
    from s2p_tpu.cli.train_gan import main as train_main
    from s2p_tpu.cli.simple_test import main as gen_main

    train_main([
        "--dataroot", tiny_hdf5,
        "--batchSize", "8",
        "--niter", "1",
        "--max_steps", "1",
        "--ngf", "8",
        "--ndf", "8",
        "--num_D", "1",
        "--n_layers_D", "2",
        "--no_vgg_loss",
        "--checkpoints_dir", str(tmp_path / "ckpt"),
        "--log_dir", str(tmp_path / "logs"),
    ])
    out_dir = gen_main([
        "--env_type", "cheetah",
        "--dataroot", tiny_hdf5,
        "--netG", "s2p",
        "--start_idx", "0",
        "--seq_len", "3",
        "--ngf", "8",
        "--checkpoint", str(tmp_path / "ckpt" / "cheetah_1.pth"),
        "--results_dir", str(tmp_path / "results"),
    ])
    files = sorted(os.listdir(out_dir))
    assert "rollout_00000.png" in files
    assert sum(f.startswith("gen_") for f in files) == 3
    import imageio.v2 as imageio

    strip = imageio.imread(osp.join(out_dir, "rollout_00000.png"))
    assert strip.shape == (32, 48, 3)  # gen row + gt row, 3 frames of 16px


@pytest.mark.slow
def test_simple_test_cli_init_random(tiny_hdf5, tmp_path):
    from s2p_tpu.cli.simple_test import main as gen_main

    out_dir = gen_main([
        "--dataroot", tiny_hdf5,
        "--start_idx", "2",
        "--seq_len", "2",
        "--ngf", "8",
        "--init_random",
        "--results_dir", str(tmp_path / "results"),
    ])
    assert any(f.startswith("gen_") for f in os.listdir(out_dir))


@pytest.mark.slow
def test_simple_test_cli_gb_int8(tiny_hdf5, tmp_path):
    """--fast_inference --gb_int8 drives the opt-in int8 modulation path
    end to end through the generation CLI."""
    from s2p_tpu.cli.simple_test import main as gen_main

    out_dir = gen_main([
        "--dataroot", tiny_hdf5,
        "--start_idx", "2",
        "--seq_len", "2",
        "--ngf", "8",
        "--init_random",
        "--fast_inference",
        "--gb_int8",
        "--results_dir", str(tmp_path / "results"),
    ])
    assert any(f.startswith("gen_") for f in os.listdir(out_dir))


@pytest.mark.slow
def test_train_gan_resume(tiny_hdf5, tmp_path):
    """Orbax resume: a second invocation with --resume_dir continues from
    the saved epoch instead of restarting (SURVEY §5.4 aux subsystem)."""
    from s2p_tpu.cli.train_gan import main

    common = [
        "--dataroot", tiny_hdf5, "--batchSize", "8", "--ngf", "8",
        "--ndf", "8", "--num_D", "1", "--n_layers_D", "2", "--no_vgg_loss",
        "--eval_interval", "0", "--max_steps", "1",
        "--checkpoints_dir", str(tmp_path / "ckpt"),
        "--log_dir", str(tmp_path / "logs"),
        "--resume_dir", str(tmp_path / "orbax"),
    ]
    main(common + ["--niter", "1"])
    log_dir = main(common + ["--niter", "2"])
    with open(osp.join(log_dir, "debug.log")) as f:
        text = f.read()
    assert "resumed from" in text and "at epoch 1" in text


@pytest.mark.slow
def test_train_gan_resume_keeps_best_tracker(tiny_hdf5, tmp_path, monkeypatch):
    """The best-PSNR tracker is part of the orbax resume state: after a
    stall-kill + relaunch, a WORSE post-resume eval must not overwrite
    {env}_best.pkl (stage 5 of the chip queue prefers walker_best.pkl as
    the GAN checkpoint for walker CQL — a reset tracker would silently
    train RL on a degraded generator)."""
    import csv

    import s2p_tpu.cli.train_gan as tg

    common = [
        "--dataroot", tiny_hdf5, "--batchSize", "8", "--ngf", "8",
        "--ndf", "8", "--num_D", "1", "--n_layers_D", "2", "--no_vgg_loss",
        "--eval_interval", "1", "--eval_num", "8", "--max_steps", "1",
        "--checkpoints_dir", str(tmp_path / "ckpt"),
        "--log_dir", str(tmp_path / "logs"),
        "--resume_dir", str(tmp_path / "orbax"),
    ]
    tg.main(common + ["--niter", "1"])
    best_path = tmp_path / "ckpt" / "cheetah_best.pkl"
    before = best_path.read_bytes()

    # resumed run: force the epoch-2 eval to be terrible — pre-fix the
    # tracker reset to -inf and -100 > -inf overwrote the best export
    monkeypatch.setattr(
        tg, "evaluate_generator",
        lambda trainer, ds, n, batch_size=64: {"psnr": -100.0, "ssim": 0.0})
    log_dir = tg.main(common + ["--niter", "2"])

    with open(osp.join(log_dir, "debug.log")) as f:
        text = f.read()
    assert "resumed from" in text and "best PSNR" in text
    assert best_path.read_bytes() == before, "worse eval overwrote best.pkl"
    with open(osp.join(log_dir, "progress.csv")) as f:
        rows = list(csv.DictReader(f))
    assert rows and float(rows[-1]["eval/best_epoch"]) == 1.0


def test_final_eval_cli_parser():
    """final_eval: multi-path deterministic snapshot evaluation CLI."""
    from s2p_tpu.cli.final_eval import main as fe_main
    import inspect
    sig = inspect.signature(fe_main)
    assert "argv" in sig.parameters


def test_final_eval_select_best_snapshot(tmp_path):
    """--snapshot best picks the itr_N.pkl with the highest FRESH logged
    eval return, skipping carried-forward (is_fresh=0) rows and epochs
    without a saved snapshot."""
    from s2p_tpu.cli.final_eval import select_best_snapshot

    run = tmp_path / "run"
    run.mkdir()
    rows = [
        # epoch, return, fresh, has_snapshot
        (-150, 10.0, 1, True),
        (-140, 500.0, 1, False),   # best return but no snapshot on disk
        (-130, 400.0, 1, True),    # ← expected pick
        (-120, 450.0, 0, True),    # stale carried-forward eval: skip
        (-110, 50.0, 1, True),
    ]
    with open(run / "progress.csv", "w") as f:
        f.write("epoch,eval/Returns Mean,eval/is_fresh\n")
        for e, r, fresh, _ in rows:
            f.write(f"{e},{r},{fresh}\n")
    for e, _, _, has in rows:
        if has:
            (run / f"itr_{e}.pkl").write_bytes(b"x")
    picked = select_best_snapshot(str(run))
    assert picked.endswith("itr_-130.pkl")


def test_final_eval_select_best_without_is_fresh(tmp_path):
    """Runs logged before the is_fresh column existed still work: every
    row is eligible."""
    from s2p_tpu.cli.final_eval import select_best_snapshot

    run = tmp_path / "run"
    run.mkdir()
    with open(run / "progress.csv", "w") as f:
        f.write("epoch,eval/Returns Mean\n")
        f.write("-20,100.0\n-10,300.0\n0,200.0\n")
    for e in (-20, -10, 0):
        (run / f"itr_{e}.pkl").write_bytes(b"x")
    assert select_best_snapshot(str(run)).endswith("itr_-10.pkl")


def test_final_eval_resolve_snapshot_aliases(tmp_path):
    """--snapshot 'final' is an alias for params.pkl; unknown patterns
    raise instead of IndexError (the queue's final-eval stages pass
    'final' literally)."""
    import pytest

    from s2p_tpu.cli.final_eval import resolve_snapshot

    run = tmp_path / "run"
    run.mkdir()
    (run / "params.pkl").write_bytes(b"x")
    (run / "itr_-10.pkl").write_bytes(b"x")
    assert resolve_snapshot(str(run), "final").endswith("params.pkl")
    assert resolve_snapshot(str(run), "itr_*.pkl").endswith("itr_-10.pkl")
    with pytest.raises(FileNotFoundError):
        resolve_snapshot(str(run), "nope.pkl")


def test_train_gan_r1_default_on():
    """R1 defaults ON since round 4 (no-R1 is known-degrading on 2/3
    datasets: walker collapses outright, cheetah decays after epoch 25,
    while +R1 beats the no-R1 peak at final epoch — docs/E2E_RESULTS.md
    round 4). --r1_gamma 0 reproduces the reference's exact protocol."""
    from s2p_tpu.cli.train_gan import build_parser

    args = build_parser().parse_args(
        ["--dataroot", "x.hdf5", "--env_type", "cheetah"])
    assert args.r1_gamma == 1.0
    assert args.r1_interval == 16  # lazy-R1 cadence unchanged
