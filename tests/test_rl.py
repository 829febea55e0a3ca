"""Offline-RL trainer tests: policies, fused critic, IQL/CQL semantics
(reference: rlkit/torch/sac/{iql_trainer,cql_trainer}.py,
examples/iql/custom_networks.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2p_tpu.rl import (
    CQLTrainer,
    CriticSLAC,
    IQLTrainer,
    TanhGaussianPolicy,
    make_deterministic,
    q_subtree,
    soft_update,
)

OBS, ACT = 6, 3


def _batch(seed=0, B=16):
    rs = np.random.RandomState(seed)
    return dict(
        observations=rs.randn(B, OBS).astype(np.float32),
        next_observations=rs.randn(B, OBS).astype(np.float32),
        actions=np.tanh(rs.randn(B, ACT)).astype(np.float32),
        rewards=rs.rand(B, 1).astype(np.float32),
        terminals=np.zeros((B, 1), np.float32),
    )


def _iql(**kw):
    return IQLTrainer(
        policy=TanhGaussianPolicy(hidden_sizes=(32, 32), action_dim=ACT),
        critic=CriticSLAC(hidden_sizes=(32, 32)),
        obs_dim=OBS, policy_input_dim=OBS, action_dim=ACT, **kw,
    )


def _cql(**kw):
    return CQLTrainer(
        policy=TanhGaussianPolicy(hidden_sizes=(32, 32), action_dim=ACT),
        critic=CriticSLAC(hidden_sizes=(32, 32)),
        obs_dim=OBS, policy_input_dim=OBS, action_dim=ACT, **kw,
    )


def test_tanh_gaussian_policy_dist_and_logprob():
    pol = TanhGaussianPolicy(hidden_sizes=(16,), action_dim=ACT)
    obs = jnp.asarray(np.random.RandomState(0).randn(4, OBS), jnp.float32)
    params = pol.init(jax.random.PRNGKey(0), obs)
    dist = pol.apply(params, obs)
    a, lp = dist.sample_and_log_prob(jax.random.PRNGKey(1))
    assert a.shape == (4, ACT) and lp.shape == (4,)
    assert (np.abs(np.asarray(a)) < 1.0).all()
    # deterministic wrapper takes the mode
    det = make_deterministic(dist)
    np.testing.assert_allclose(
        np.asarray(det.sample(jax.random.PRNGKey(2))),
        np.tanh(np.asarray(dist.loc)), atol=1e-6,
    )
    # log_prob from value alone is consistent with pre-tanh version
    lp2 = dist.log_prob(a)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp2), atol=1e-3)


def test_critic_slac_fused_outputs_and_soft_update():
    critic = CriticSLAC(hidden_sizes=(16,))
    z = jnp.zeros((2, OBS))
    a = jnp.zeros((2, ACT))
    params = critic.init(jax.random.PRNGKey(0), z, a)
    q1, q2, vf = critic.apply(params, z, a)
    assert q1.shape == q2.shape == vf.shape == (2, 1)
    # q1 and q2 are distinct heads
    assert float(jnp.abs(q1 - q2).max()) >= 0.0
    tq = q_subtree(params)
    tq2 = soft_update(tq, jax.tree_util.tree_map(lambda x: x + 1.0, tq), 0.5)
    for x, y in zip(jax.tree_util.tree_leaves(tq2), jax.tree_util.tree_leaves(tq)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y) + 0.5, atol=1e-6)


@pytest.mark.slow
def test_iql_state_rl_losses_decrease_and_targets_track():
    tr = _iql(target_update_period=1, quantile=0.7, beta=0.5)
    batch = _batch()
    t0 = jax.device_get(tr.target_q)
    first = None
    for _ in range(30):
        m = tr.train(batch)
        if first is None:
            first = jax.device_get(m)
    last = jax.device_get(m)
    assert np.isfinite(last["critic_loss"])
    assert last["qf1_loss"] < first["qf1_loss"]
    t1 = jax.device_get(tr.target_q)
    diff = max(
        float(np.abs(a - b).max())
        for a, b in zip(jax.tree_util.tree_leaves(t1), jax.tree_util.tree_leaves(t0))
    )
    assert diff > 0  # targets moved


@pytest.mark.slow
def test_iql_expectile_weighting():
    """quantile=0.9 penalizes under-estimation of V more than over —
    check the vf loss asymmetry indirectly via convergence above median."""
    tr_hi = _iql(quantile=0.95, seed=0)
    tr_lo = _iql(quantile=0.05, seed=0)
    batch = _batch()
    for _ in range(60):
        m_hi = tr_hi.train(batch)
        m_lo = tr_lo.train(batch)
    # expectile 0.95 pushes V toward the upper tail of Q, 0.05 toward lower
    assert float(jax.device_get(m_hi["vf_pred"])) > float(jax.device_get(m_lo["vf_pred"]))


def test_iql_update_periods_gate_param_changes():
    tr = _iql(policy_update_period=1000, q_update_period=1)
    batch = _batch()
    p0 = jax.device_get(tr.policy_state.params)
    tr.train(batch)  # step 0: 0 % 1000 == 0 → policy updates once
    tr.train(batch)  # step 1: gated
    p2 = jax.device_get(tr.policy_state.params)
    tr.train(batch)
    p3 = jax.device_get(tr.policy_state.params)
    for a, b in zip(jax.tree_util.tree_leaves(p2), jax.tree_util.tree_leaves(p3)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_cql_trains_and_penalty_lowers_q():
    """The conservative penalty must push dataset-action Q estimates below
    a penalty-free run's (hallmark CQL behavior)."""
    batch = _batch(B=8)
    tr_pen = _cql(min_q_weight=10.0, policy_eval_start=0, seed=0)
    tr_free = _cql(min_q_weight=0.0, policy_eval_start=0, seed=0)
    for _ in range(40):
        m_pen = tr_pen.train(batch)
        m_free = tr_free.train(batch)
    q_pen = float(jax.device_get(m_pen["q1_pred"]))
    q_free = float(jax.device_get(m_free["q1_pred"]))
    assert np.isfinite(q_pen) and np.isfinite(q_free)
    assert q_pen < q_free


@pytest.mark.slow
def test_cql_bc_warmup_gate():
    """During policy_eval_start steps the policy loss is the BC objective —
    it should push log π(dataset actions) up."""
    tr = _cql(policy_eval_start=10_000, seed=0)
    batch = _batch(B=8)
    lp_first = None
    for _ in range(30):
        tr.train(batch)
        dist = tr.policy_module.apply(
            tr.policy_state.params, jnp.asarray(batch["observations"])
        )
        lp = float(jnp.mean(dist.log_prob(jnp.asarray(batch["actions"]))))
        if lp_first is None:
            lp_first = lp
    assert lp > lp_first


@pytest.mark.slow
def test_cql_alpha_moves_with_entropy_tuning():
    tr = _cql(policy_eval_start=0, seed=0)
    batch = _batch(B=8)
    a0 = float(tr.log_alpha)
    for _ in range(10):
        tr.train(batch)
    assert float(tr.log_alpha) != a0


@pytest.mark.slow
def test_iql_with_slac_representation():
    """Full image path: prepare_batch inside the compiled IQL step."""
    from s2p_tpu.slac import SlacAlgorithm

    ns = 4
    slac = SlacAlgorithm(
        action_dim=ACT, num_sequences=ns, buffer_size=100, batch_size_latent=2,
        feature_dim=16, z1_dim=4, z2_dim=8, hidden_units=(16, 16),
        image_size=64, seed=0,
    )
    from s2p_tpu.data.hdf5 import make_synthetic_rl_dataset

    slac.buffer.ingest_real(
        make_synthetic_rl_dataset(n_episodes=1, episode_len=8, obs_dim=5,
                                  act_dim=ACT, img_hw=64)
    )
    z_dim = 4 + 8
    tr = IQLTrainer(
        policy=TanhGaussianPolicy(hidden_sizes=(32,), action_dim=ACT),
        critic=CriticSLAC(hidden_sizes=(32,)),
        obs_dim=z_dim, policy_input_dim=slac.feature_action_dim,
        action_dim=ACT, slac_algo=slac, slac_update_period=1,
    )
    rs = np.random.RandomState(0)
    batch = dict(
        observations=rs.rand(4, ns + 1, 64, 64, 3).astype(np.float32),
        actions=np.tanh(rs.randn(4, ns, ACT)).astype(np.float32),
        rewards=rs.rand(4, 1).astype(np.float32),
        terminals=np.zeros((4, 1), np.float32),
    )
    m = tr.train(batch)
    host = jax.device_get(m)
    assert np.isfinite(host["critic_loss"]) and np.isfinite(host["policy_loss"])
    assert "loss_kld" in m  # joint latent update ran
    snap = tr.get_snapshot()
    assert "latent_params" in snap


@pytest.mark.slow
def test_iql_train_many_scan():
    """Scanned multi-step training: N updates in one compiled call with
    on-device batch sampling, joint latent updates in-scan (SURVEY §7)."""
    from s2p_tpu.data.hdf5 import make_synthetic_rl_dataset
    from s2p_tpu.slac import SlacAlgorithm

    ns = 4
    slac = SlacAlgorithm(
        action_dim=ACT, num_sequences=ns, buffer_size=100, batch_size_latent=2,
        feature_dim=16, z1_dim=4, z2_dim=8, hidden_units=(16, 16),
        image_size=64, seed=0,
    )
    slac.buffer.ingest_real(
        make_synthetic_rl_dataset(n_episodes=1, episode_len=8, obs_dim=5,
                                  act_dim=ACT, img_hw=64)
    )
    tr = IQLTrainer(
        policy=TanhGaussianPolicy(hidden_sizes=(16,), action_dim=ACT),
        critic=CriticSLAC(hidden_sizes=(16,)),
        obs_dim=4 + 8, policy_input_dim=slac.feature_action_dim,
        action_dim=ACT, slac_algo=slac,
    )
    p0 = jax.device_get(tr.policy_state.params)
    lat0 = jax.device_get(slac.params)
    m = tr.train_many(num_steps=5, batch_size=4)
    host = jax.device_get(m)
    assert np.isfinite(host["critic_loss"]) and np.isfinite(host["policy_loss"])
    assert "loss_kld" in host  # joint latent update ran in-scan
    assert tr._n_train_steps_total == 5
    # both policy and latent params moved
    p1 = jax.device_get(tr.policy_state.params)
    changed = any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1))
    )
    lat_changed = any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(lat0),
                        jax.tree_util.tree_leaves(jax.device_get(slac.params)))
    )
    assert changed and lat_changed


@pytest.mark.slow
def test_batch_algorithm_scan_training_path():
    from s2p_tpu.core import BatchRLAlgorithm
    from s2p_tpu.data.hdf5 import make_synthetic_rl_dataset
    from s2p_tpu.envs import StubEnv
    from s2p_tpu.samplers import MdpPathCollector, PolicyAgent
    from s2p_tpu.slac import SlacAlgorithm
    from s2p_tpu.utils.logging import Logger
    import tempfile

    ns, hw = 4, 64
    slac = SlacAlgorithm(
        action_dim=ACT, num_sequences=ns, buffer_size=100, batch_size_latent=2,
        feature_dim=16, z1_dim=4, z2_dim=8, hidden_units=(16, 16),
        image_size=hw, seed=0,
    )
    slac.buffer.ingest_real(
        make_synthetic_rl_dataset(n_episodes=1, episode_len=8, obs_dim=5,
                                  act_dim=ACT, img_hw=hw)
    )
    policy = TanhGaussianPolicy(hidden_sizes=(16,), action_dim=ACT)
    tr = IQLTrainer(
        policy=policy, critic=CriticSLAC(hidden_sizes=(16,)),
        obs_dim=4 + 8, policy_input_dim=slac.feature_action_dim,
        action_dim=ACT, slac_algo=slac, freeze_slac=True,
    )
    env = StubEnv(action_dim=ACT, max_episode_steps=4, image_shape=(hw, hw, 3))
    agent = PolicyAgent(policy, tr.policy_state.params, deterministic=True)
    with tempfile.TemporaryDirectory() as d:
        log = Logger()
        log.set_log_dir(d)
        log.set_print_tabular(False)
        algo = BatchRLAlgorithm(
            trainer=tr, exploration_env=env, evaluation_env=env,
            exploration_data_collector=MdpPathCollector(env, agent, slac_algo=slac),
            evaluation_data_collector=MdpPathCollector(env, agent, slac_algo=slac),
            replay_buffer=slac.buffer, batch_size=4, max_path_length=4,
            num_epochs=1, num_eval_steps_per_epoch=4,
            num_expl_steps_per_train_loop=1, num_trains_per_train_loop=3,
            start_epoch=0, slac_representation=True, logger=log,
            scan_training=True,
        )
        assert algo.scan_training
        algo.train()
    assert tr._n_train_steps_total == 3


@pytest.mark.slow
def test_cql_train_many_and_dual_buffer():
    """CQL scanned loop + 50/50 real/generated sampling in-scan."""
    from s2p_tpu.data.hdf5 import make_synthetic_rl_dataset
    from s2p_tpu.slac import SlacAlgorithm

    ns = 4
    slac = SlacAlgorithm(
        action_dim=ACT, num_sequences=ns, buffer_size=100, batch_size_latent=2,
        feature_dim=16, z1_dim=4, z2_dim=8, hidden_units=(16, 16),
        image_size=64, use_seperate_buffer=True, seed=0,
    )
    ds = make_synthetic_rl_dataset(n_episodes=1, episode_len=8, obs_dim=5,
                                   act_dim=ACT, img_hw=64)
    slac.buffer.ingest_real(ds)
    slac.buffer_gen.ingest_real(
        make_synthetic_rl_dataset(n_episodes=1, episode_len=8, obs_dim=5,
                                  act_dim=ACT, img_hw=64, seed=1)
    )
    tr = CQLTrainer(
        policy=TanhGaussianPolicy(hidden_sizes=(16,), action_dim=ACT),
        critic=CriticSLAC(hidden_sizes=(16,)),
        obs_dim=4 + 8, policy_input_dim=slac.feature_action_dim,
        action_dim=ACT, slac_algo=slac, policy_eval_start=0, num_random=2,
    )
    m = tr.train_many(num_steps=3, batch_size=4, buffer=slac.buffer,
                      buffer_gen=slac.buffer_gen)
    host = jax.device_get(m)
    assert np.isfinite(host["critic_loss"]) and np.isfinite(host["policy_loss"])
    assert "loss_kld" in host
    assert tr._n_train_steps_total == 3


def test_iql_train_many_state_rl():
    """State-RL scanned loop over a device-resident flat buffer."""
    from s2p_tpu.data.env_replay_buffer import EnvReplayBuffer
    from s2p_tpu.envs import StubEnv

    env = StubEnv(obs_dim=OBS, action_dim=ACT)
    buf = EnvReplayBuffer(200, env)
    rs = np.random.RandomState(0)
    for _ in range(50):
        buf.add_sample(rs.randn(OBS), np.tanh(rs.randn(ACT)), rs.rand(), 0.0,
                       rs.randn(OBS))
    tr = _iql()
    first = None
    for _ in range(4):
        m = tr.train_many(num_steps=10, batch_size=8, buffer=buf)
        host = jax.device_get(m)
        if first is None:
            first = host
    assert np.isfinite(host["critic_loss"])
    assert host["qf1_loss"] < first["qf1_loss"]
    assert tr._n_train_steps_total == 40


@pytest.mark.slow
def test_cql_lagrange_dual_updates():
    """--with_lagrange: the dual variable alpha_prime moves (and only
    then), in both the per-step path and the state-RL scanned loop
    (reference: cql_trainer.py:387-395 optional Lagrange alpha')."""
    from s2p_tpu.data.env_replay_buffer import EnvReplayBuffer
    from s2p_tpu.envs import StubEnv

    batch = _batch(B=8)
    tr_off = _cql(policy_eval_start=0, seed=0)
    tr_on = _cql(policy_eval_start=0, with_lagrange=True,
                 lagrange_thresh=10.0, seed=0)
    for _ in range(3):
        tr_off.train(batch)
        tr_on.train(batch)
    assert float(tr_off.log_alpha_prime) == 0.0
    assert float(tr_on.log_alpha_prime) != 0.0

    env = StubEnv(obs_dim=OBS, action_dim=ACT)
    buf = EnvReplayBuffer(100, env)
    rs = np.random.RandomState(0)
    for _ in range(40):
        buf.add_sample(rs.randn(OBS), np.tanh(rs.randn(ACT)), rs.rand(), 0.0,
                       rs.randn(OBS))
    tr_scan = _cql(policy_eval_start=0, with_lagrange=True,
                   lagrange_thresh=10.0, seed=0)
    m = tr_scan.train_many(num_steps=5, batch_size=8, buffer=buf)
    assert np.isfinite(float(jax.device_get(m["critic_loss"])))
    assert float(tr_scan.log_alpha_prime) != 0.0


@pytest.mark.slow
def test_cql_lagrange_dual_direction():
    """The Lagrange dual responds in the correct DIRECTION to the
    action-gap threshold (reference: cql_trainer.py:387-395): with the
    threshold above the measured logsumexp gap, alpha' decays toward 0
    (the dual de-activates the conservative penalty — the mechanism that
    contains the dataset-Q drift of a fixed min_q_weight); with the
    threshold below the gap, alpha' grows to crank the penalty.

    This is the CPU-scale mechanism check behind the protocol-scale
    Lagrange A/B (docs/flagship2/run_cql_state_lagrange.sh): the drift
    itself only manifests over ~1e5 Bellman recursions of the penalty
    and is measured on-chip, not here."""
    from s2p_tpu.data.env_replay_buffer import EnvReplayBuffer
    from s2p_tpu.envs import StubEnv

    env = StubEnv(obs_dim=OBS, action_dim=ACT)
    buf = EnvReplayBuffer(400, env)
    rs = np.random.RandomState(0)
    for _ in range(200):
        buf.add_sample(rs.randn(OBS), np.tanh(rs.randn(ACT)), rs.rand(),
                       0.0, rs.randn(OBS))

    # measured gap at this scale is ~5 (logsumexp - dataset Q); bracket it
    hi = _cql(policy_eval_start=0, with_lagrange=True, lagrange_thresh=50.0,
              seed=0)
    lo = _cql(policy_eval_start=0, with_lagrange=True, lagrange_thresh=0.1,
              seed=0)
    for tr in (hi, lo):
        tr.train_many(num_steps=600, batch_size=32, buffer=buf)
    lap_hi = float(jax.device_get(hi.log_alpha_prime))
    lap_lo = float(jax.device_get(lo.log_alpha_prime))
    assert lap_hi < -0.05, lap_hi  # gap < thresh: dual shuts the penalty off
    assert lap_lo > 0.05, lap_lo   # gap > thresh: dual cranks the penalty
