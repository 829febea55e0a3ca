"""Foundation-layer tests: config, logger, timer, seeding, checkpointing."""

import csv
import json
import os.path as osp
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2p_tpu.utils import Config, Logger, PhaseTimer, RngStream, set_seed
from s2p_tpu.utils.checkpoint import CheckpointManager


class TestConfig:
    def test_attr_access_and_nesting(self):
        c = Config(trainer_kwargs=dict(discount=0.99, beta=0.1), seed=0)
        assert c.trainer_kwargs.discount == 0.99
        c.trainer_kwargs.quantile = 0.9
        assert c["trainer_kwargs"]["quantile"] == 0.9

    def test_deep_update_does_not_mutate(self):
        base = Config(a=dict(x=1, y=2), b=3)
        new = base.deep_update({"a": {"y": 20}, "c": 4})
        assert new.a.y == 20 and new.a.x == 1 and new.c == 4
        assert base.a.y == 2 and "c" not in base

    def test_json_roundtrip(self):
        c = Config(algo_kwargs=dict(batch_size=128, num_epochs=151), arr=np.float32(1.5))
        c2 = Config.from_json(c.to_json())
        assert c2.algo_kwargs.batch_size == 128
        assert c2.arr == 1.5

    def test_paths_and_flatten(self):
        c = Config()
        c.set_path("a.b.c", 7)
        assert c.get_path("a.b.c") == 7
        assert c.get_path("a.z", "dflt") == "dflt"
        assert c.flatten() == {"a.b.c": 7}


class TestLogger:
    def test_csv_frozen_keys_and_snapshot_modes(self, tmp_logdir):
        log = Logger()
        log.set_log_dir(tmp_logdir)
        log.set_print_tabular(False)
        log.set_snapshot_mode("gap_and_last")
        log.set_snapshot_gap(2)
        log.log_variant({"algo_kwargs": {"batch_size": 4}})

        for itr in range(4):
            log.record_tabular("Epoch", itr)
            log.record_dict({"loss": 1.0 / (itr + 1)}, prefix="trainer/")
            if itr == 3:
                log.record_tabular("surprise", 1)  # extra key -> ignored, warned
            log.dump_tabular()
            log.save_itr_params(itr, {"w": np.ones(3) * itr})
        log.close()

        with open(osp.join(tmp_logdir, "progress.csv")) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 4
        assert set(rows[0].keys()) == {"Epoch", "trainer/loss"}
        assert float(rows[2]["trainer/loss"]) == pytest.approx(1 / 3)

        with open(osp.join(tmp_logdir, "variant.json")) as f:
            assert json.load(f)["algo_kwargs"]["batch_size"] == 4

        # gap_and_last: itr_0, itr_2 exist; params.pkl holds the last
        assert osp.exists(osp.join(tmp_logdir, "itr_0.pkl"))
        assert osp.exists(osp.join(tmp_logdir, "itr_2.pkl"))
        assert not osp.exists(osp.join(tmp_logdir, "itr_1.pkl"))
        with open(osp.join(tmp_logdir, "params.pkl"), "rb") as f:
            snap = pickle.load(f)
        np.testing.assert_allclose(snap["w"], np.ones(3) * 3)

    def test_prefix_stack(self, tmp_logdir):
        log = Logger()
        log.set_log_dir(tmp_logdir)
        log.set_print_tabular(False)
        log.push_prefix("eval/")
        log.record_tabular("ret", 1.0)
        log.pop_prefix()
        log.record_tabular("epoch", 0)
        log.dump_tabular()
        log.close()
        with open(osp.join(tmp_logdir, "progress.csv")) as f:
            rows = list(csv.DictReader(f))
        assert set(rows[0].keys()) == {"eval/ret", "epoch"}


class TestTimer:
    def test_phase_accumulation(self):
        t = PhaseTimer()
        with t.phase("training"):
            pass
        t.stamp("logging")
        cols = t.end_epoch()
        assert "time/training (s)" in cols and "time/logging (s)" in cols
        assert cols["time/epoch (s)"] >= 0


class TestSeeding:
    def test_set_seed_reproducible(self):
        k1 = set_seed(7)
        a = np.random.rand(3)
        k2 = set_seed(7)
        b = np.random.rand(3)
        np.testing.assert_array_equal(a, b)
        assert jnp.array_equal(jax.random.key_data(k1), jax.random.key_data(k2))

    def test_rng_streams_independent_and_reproducible(self):
        s1, s2 = RngStream(3), RngStream(3)
        a = jax.random.normal(s1.next("init"), (4,))
        b = jax.random.normal(s2.next("init"), (4,))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # different names give different streams
        c = jax.random.normal(s1.next("dropout"), (4,))
        assert not np.allclose(np.asarray(a), np.asarray(c))
        # sequential draws differ
        d = jax.random.normal(s1.next("init"), (4,))
        assert not np.allclose(np.asarray(a), np.asarray(d))

    def test_rng_stream_resume(self):
        s = RngStream(5)
        s.next("x")
        state = s.state()
        k_a = s.next("x")
        s2 = RngStream(5)
        s2.restore(state)
        k_b = s2.next("x")
        assert jnp.array_equal(jax.random.key_data(k_a), jax.random.key_data(k_b))


class TestCheckpoint:
    def test_save_restore_latest(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
        state = {"params": {"w": jnp.arange(4.0)}, "step": jnp.int32(0)}
        for step in range(3):
            st = jax.tree_util.tree_map(lambda x: x + step, state)
            mgr.save(step, st)
        mgr.wait_until_finished()
        assert mgr.latest_step() == 2
        restored = mgr.restore(state)
        np.testing.assert_allclose(np.asarray(restored["params"]["w"]), np.arange(4.0) + 2)
        mgr.close()
