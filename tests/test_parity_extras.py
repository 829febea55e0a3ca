"""Parity-sweep extras: GaussianMixture, VAE policy, simple offline loop,
extra env wrappers, path loaders, conv calculators."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2p_tpu.data.loaders import (
    batch_iterator,
    conv2d_output_size,
    conv_stack_output_shape,
    conv_transpose2d_output_size,
    infinite_random_sampler,
)
from s2p_tpu.envs import StubEnv
from s2p_tpu.envs.extra_wrappers import (
    DiscretizeEnv,
    HistoryEnv,
    RewardWrapperEnv,
    StackObservationEnv,
)
from s2p_tpu.nn.mixture import GaussianMixture


def test_gaussian_mixture_logprob_matches_manual():
    B, D, K = 3, 2, 4
    rs = np.random.RandomState(0)
    means = jnp.asarray(rs.randn(B, D, K), jnp.float32)
    stds = jnp.asarray(rs.rand(B, D, K) + 0.5, jnp.float32)
    w = rs.rand(B, K).astype(np.float32)
    w = jnp.asarray(w / w.sum(-1, keepdims=True))
    gm = GaussianMixture(means, stds, w)
    x = jnp.asarray(rs.randn(B, D), jnp.float32)
    lp = np.asarray(gm.log_prob(x))
    # manual: log sum_k w_k prod_d N(x_d; mu_dk, s_dk)
    from scipy.stats import norm

    manual = []
    for b in range(B):
        total = 0.0
        for k in range(K):
            p = np.prod(norm.pdf(np.asarray(x[b]), np.asarray(means[b, :, k]),
                                 np.asarray(stds[b, :, k])))
            total += float(w[b, k]) * p
        manual.append(np.log(total))
    np.testing.assert_allclose(lp, manual, rtol=1e-4)


def test_gaussian_mixture_sampling_and_mle():
    B, D, K = 2, 3, 2
    means = jnp.stack([jnp.zeros((B, D)), 10 * jnp.ones((B, D))], axis=-1)
    stds = jnp.full((B, D, K), 0.1)
    w = jnp.asarray([[0.99, 0.01], [0.01, 0.99]])
    gm = GaussianMixture(means, stds, w)
    np.testing.assert_allclose(
        np.asarray(gm.mle_estimate()),
        [[0, 0, 0], [10, 10, 10]], atol=1e-6,
    )
    s = np.asarray(gm.sample(jax.random.PRNGKey(0)))
    assert abs(s[0].mean()) < 2 and abs(s[1].mean() - 10) < 2


@pytest.mark.slow
def test_vae_policy_roundtrip_and_elbo_training():
    from s2p_tpu.rl.vae_policy import VAEPolicy, elbo_loss

    import optax

    OBS, ACT = 5, 3
    model = VAEPolicy(obs_dim=OBS, action_dim=ACT, latent_dim=2, hidden=32)
    rs = np.random.RandomState(0)
    s = jnp.asarray(rs.randn(16, OBS), jnp.float32)
    a = jnp.asarray(np.tanh(rs.randn(16, ACT)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), s, a, jax.random.PRNGKey(1))
    recon, mean, std = model.apply(params, s, a, jax.random.PRNGKey(1))
    assert recon.shape == (16, ACT) and (np.abs(np.asarray(recon)) <= 1).all()
    # prior decode
    out = model.apply(params, s, None, jax.random.PRNGKey(2),
                      method=VAEPolicy.decode)
    assert out.shape == (16, ACT)
    multi, raw = model.apply(params, s, jax.random.PRNGKey(3), 5,
                             method=VAEPolicy.decode_multiple)
    assert multi.shape == (16, 5, ACT)

    tx = optax.adam(1e-3)
    opt = tx.init(params)
    loss0 = None

    @jax.jit
    def step(params, opt, key):
        loss, g = jax.value_and_grad(
            lambda p: elbo_loss(model, p, s, a, key)
        )(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    key = jax.random.PRNGKey(4)
    for i in range(50):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, sub)
        if loss0 is None:
            loss0 = float(loss)
    assert float(loss) < loss0


def test_policy_from_q_picks_argmax():
    from s2p_tpu.rl import CriticSLAC, TanhGaussianPolicy
    from s2p_tpu.rl.vae_policy import PolicyFromQ

    OBS, ACT = 4, 2
    pol = TanhGaussianPolicy(hidden_sizes=(8,), action_dim=ACT)
    p_params = pol.init(jax.random.PRNGKey(0), jnp.zeros((1, OBS)))

    def qf_apply(params, obs, actions):  # favor large first-dim actions
        return actions[:, :1]

    agent = PolicyFromQ(qf_apply, None, pol, p_params, num_samples=16)
    a, _ = agent.get_action(np.zeros(OBS, np.float32))
    # chosen action should be among the highest of the 16 proposals
    assert a.shape == (ACT,)


def test_simple_offline_rl_algorithm(tmp_path):
    from s2p_tpu.core.simple_offline_rl_algorithm import SimpleOfflineRlAlgorithm
    from s2p_tpu.data.env_replay_buffer import EnvReplayBuffer
    from s2p_tpu.rl import CriticSLAC, IQLTrainer, TanhGaussianPolicy
    from s2p_tpu.utils.logging import Logger

    OBS, ACT = 4, 2
    env = StubEnv(obs_dim=OBS, action_dim=ACT)
    buf = EnvReplayBuffer(100, env)
    rs = np.random.RandomState(0)
    for _ in range(50):
        buf.add_sample(rs.randn(OBS), np.tanh(rs.randn(ACT)), rs.rand(), 0.0,
                       rs.randn(OBS))
    trainer = IQLTrainer(
        policy=TanhGaussianPolicy(hidden_sizes=(16,), action_dim=ACT),
        critic=CriticSLAC(hidden_sizes=(16,)),
        obs_dim=OBS, policy_input_dim=OBS, action_dim=ACT,
    )
    log = Logger()
    log.set_log_dir(str(tmp_path / "run"))
    log.set_print_tabular(False)
    algo = SimpleOfflineRlAlgorithm(
        trainer, buf, batch_size=8, num_epochs=2, num_batches_per_epoch=3,
        logger=log,
    )
    algo.train()
    assert trainer._n_train_steps_total == 6
    import os.path as osp

    assert osp.exists(osp.join(str(tmp_path / "run"), "progress.csv"))


def test_extra_wrappers():
    env = HistoryEnv(StubEnv(obs_dim=3, action_dim=2), 2)
    o = env.reset()
    assert o.shape == (6,)
    o2, *_ = env.step(np.zeros(2))
    assert o2.shape == (6,)

    denv = DiscretizeEnv(StubEnv(obs_dim=3, action_dim=2), num_bins=3)
    assert denv.action_space.n == 9
    denv.reset()
    denv.step(4)

    renv = RewardWrapperEnv(StubEnv(obs_dim=3, action_dim=2),
                            lambda r, info: 2 * r)
    renv.reset()
    _, r, _, _ = renv.step(np.zeros(2))
    assert r == 2.0

    senv = StackObservationEnv(StubEnv(obs_dim=3, action_dim=2), 2)
    assert senv.reset().shape == (6,)


def test_path_loaders():
    from s2p_tpu.data.env_replay_buffer import EnvReplayBuffer
    from s2p_tpu.data.path_loaders import DictToMDPPathLoader, HDF5PathLoader, load_hdf5

    env = StubEnv(obs_dim=3, action_dim=2)
    buf = EnvReplayBuffer(100, env)
    rs = np.random.RandomState(0)
    ds = dict(
        observations=rs.randn(10, 3).astype(np.float32),
        actions=rs.randn(10, 2).astype(np.float32),
        rewards=rs.rand(10).astype(np.float32),
        terminals=np.zeros(10, np.float32),
        next_observations=rs.randn(10, 3).astype(np.float32),
    )
    assert load_hdf5(ds, buf) == 10 and len(buf) == 10

    loader = HDF5PathLoader(None, buf, obs_preprocessor=lambda o: o * 2)
    loader.load_path(ds)
    assert len(buf) == 20

    buf2 = EnvReplayBuffer(100, env)
    path = dict(observations=ds["observations"], actions=ds["actions"],
                rewards=ds["rewards"])
    d = DictToMDPPathLoader(buf2, demo_paths=[path])
    assert d.load_demos() == 10


def test_conv_calculators_and_iterators():
    # torch conv: (100 + 2 − 3)//2 + 1 = 50
    assert conv2d_output_size(100, 3, 2, 1) == 50
    assert conv_transpose2d_output_size(4, 3, 2, 1, 1) == 8
    assert conv_stack_output_shape(100, [3, 3], [2, 2], [1, 1]) == 25

    it = infinite_random_sampler(10, 4, seed=0)
    idx = next(it)
    assert idx.shape == (4,)
    batches = batch_iterator({"x": np.arange(10)}, 4)
    b = next(batches)
    assert b["x"].shape == (4,)
