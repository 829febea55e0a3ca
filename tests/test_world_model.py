"""World-model tests: ensemble semantics vs a from-spec numpy oracle,
elite save/rollback, NLL training, augmented-dataset generation
(reference: gaussian_ensemble.py, state_transition_rollout.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2p_tpu.data.hdf5 import SENTINEL, make_synthetic_rl_dataset, save_dataset
from s2p_tpu.world_model import (
    EnsembleTransition,
    compute_normalization,
    convert_ensemble_state_dict,
    generate_augmented_dataset,
    make_ensemble_train_step,
    restore_members,
    save_members,
    soft_clamp,
)

OBS, ACT, E = 5, 3, 7


def _model_and_params(seed=0, **kw):
    model = EnsembleTransition(obs_dim=OBS, action_dim=ACT,
                               hidden_features=16, hidden_layers=2,
                               ensemble_size=E, **kw)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, OBS + ACT)))
    return model, params


def test_soft_clamp_bounds_and_gradient():
    lo, hi = jnp.asarray(-1.0), jnp.asarray(2.0)
    x = jnp.linspace(-10, 10, 21)
    y = soft_clamp(x, lo, hi)
    # soft bounds: overshoot decays as log(1+e^-Δ) (reference semantics)
    assert float(y.min()) > -1.1 and float(y.max()) < 2.1
    # in-range values pass through nearly unchanged
    assert float(soft_clamp(jnp.asarray(0.5), lo, hi)) == pytest.approx(0.5, abs=0.1)
    g = jax.grad(lambda v: soft_clamp(v, lo, hi))(0.5)
    assert float(g) > 0.5  # mid-range keeps gradient


@pytest.mark.slow
def test_forward_shapes_and_numpy_oracle():
    """Forward must equal the from-spec computation: einsum MLP + swish +
    soft-clamped logstd + residual obs mean (gaussian_ensemble.py:37-96)."""
    model, params = _model_and_params()
    x = np.random.RandomState(0).randn(4, OBS + ACT).astype(np.float32)
    mu, std = model.apply(params, jnp.asarray(x))
    assert mu.shape == (E, 4, OBS + 1) and std.shape == (E, 4, OBS + 1)

    p = jax.device_get(params)["params"]
    h = np.einsum("ij,bjk->bik", x, p["backbones_0"]["weight"]) + p["backbones_0"]["bias"]
    h = h / (1 + np.exp(-h)) * 1  # swish = x*sigmoid(x)

    def swish(v):
        return v * (1 / (1 + np.exp(-v)))

    h = np.einsum("ij,bjk->bik", x, p["backbones_0"]["weight"]) + p["backbones_0"]["bias"]
    h = swish(h)
    h = np.einsum("bij,bjk->bik", h, p["backbones_1"]["weight"]) + p["backbones_1"]["bias"]
    h = swish(h)
    out = np.einsum("bij,bjk->bik", h, p["output_layer"]["weight"]) + p["output_layer"]["bias"]
    mu_ref, logstd = np.split(out, 2, axis=-1)

    def softplus(v):
        return np.logaddexp(0, v)

    logstd = p["max_logstd"] - softplus(p["max_logstd"] - logstd)
    logstd = p["min_logstd"] + softplus(logstd - p["min_logstd"])
    mu_ref[..., :OBS] += x[None, :, :OBS]
    np.testing.assert_allclose(np.asarray(mu), mu_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(std), np.exp(logstd), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_local_mode_residual_zero_net():
    """With zeroed output weights the 'local' mean equals the input obs."""
    model, params = _model_and_params()
    params = jax.tree_util.tree_map(jnp.zeros_like, params)
    x = np.random.RandomState(1).randn(3, OBS + ACT).astype(np.float32)
    mu, _ = model.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(mu[..., :OBS]), np.broadcast_to(x[:, :OBS], (E, 3, OBS)),
        atol=1e-6,
    )


def test_save_restore_members():
    model, params = _model_and_params(seed=0)
    _, params2 = _model_and_params(seed=1)
    saved = jax.tree_util.tree_map(jnp.array, params)  # snapshot
    # clobber member 2 in params2, then restore it from saved
    restored = restore_members(params2, saved, [2])
    w_r = restored["params"]["backbones_0"]["weight"]
    w_s = saved["params"]["backbones_0"]["weight"]
    w_2 = params2["params"]["backbones_0"]["weight"]
    np.testing.assert_array_equal(np.asarray(w_r[2]), np.asarray(w_s[2]))
    np.testing.assert_array_equal(np.asarray(w_r[0]), np.asarray(w_2[0]))
    # logstd bounds are shared, not per-member: untouched
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["max_logstd"]),
        np.asarray(params2["params"]["max_logstd"]),
    )
    # update_save direction
    saved2 = save_members(saved, params2, [0])
    np.testing.assert_array_equal(
        np.asarray(saved2["params"]["backbones_0"]["weight"][0]),
        np.asarray(w_2[0]),
    )


def test_training_reduces_nll():
    model, _ = _model_and_params()
    init_state, step = make_ensemble_train_step(model, lr=1e-3)
    params, opt_state = init_state(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    x = rs.randn(256, OBS + ACT).astype(np.float32)
    A = rs.randn(OBS + ACT, OBS + 1).astype(np.float32) * 0.3
    y = x @ A
    first = None
    for i in range(60):
        params, opt_state, loss = step(params, opt_state, jnp.asarray(x), jnp.asarray(y))
        if first is None:
            first = float(loss)
    assert float(loss) < first


def test_convert_ensemble_state_dict_roundtrip():
    model, params = _model_and_params()
    p = jax.device_get(params)["params"]
    sd = {}
    for i in range(2):
        sd[f"backbones.{i}.weight"] = p[f"backbones_{i}"]["weight"]
        sd[f"backbones.{i}.bias"] = p[f"backbones_{i}"]["bias"]
        sd[f"backbones.{i}.saved_weight"] = p[f"backbones_{i}"]["weight"]
        sd[f"backbones.{i}.saved_bias"] = p[f"backbones_{i}"]["bias"]
    sd["output_layer.weight"] = p["output_layer"]["weight"]
    sd["output_layer.bias"] = p["output_layer"]["bias"]
    sd["max_logstd"] = p["max_logstd"]
    sd["min_logstd"] = p["min_logstd"]
    conv = convert_ensemble_state_dict(sd)
    x = jnp.asarray(np.random.RandomState(2).randn(2, OBS + ACT), jnp.float32)
    mu_a, _ = model.apply(params, x)
    mu_b, _ = model.apply({"params": conv["params"]}, x)
    np.testing.assert_allclose(np.asarray(mu_a), np.asarray(mu_b), atol=1e-6)
    assert "saved" in conv


def test_generate_augmented_dataset_schema(tmp_path):
    ds = make_synthetic_rl_dataset(n_episodes=2, episode_len=12, obs_dim=OBS,
                                   act_dim=ACT, img_hw=8)
    model, params = _model_and_params()
    norm = compute_normalization(ds)
    out = generate_augmented_dataset(
        ds, model, params, norm,
        action_low=np.full(ACT, -1.0), action_high=np.full(ACT, 1.0),
        num_sequences=4, seed=3,
    )
    n = len(ds["observations"])
    assert out["actions"].shape == (n, ACT)
    assert out["next_observations"].shape == (n, OBS)
    assert out["rewards"].shape == (n,)
    assert out["disagreement_uncertainty"].shape == (n, 1)
    assert out["aleatoric_uncertainty"].shape == (n, 1)
    assert out["slac_observation_indices"].shape == (n, 5)
    assert out["slac_action_indices"].shape == (n, 4)
    # sentinel on the first num_sequences rows of each trajectory
    assert (out["slac_observation_indices"][:4] == SENTINEL).all()
    assert (out["slac_observation_indices"][12:16] == SENTINEL).all()
    # second episode windows offset by trajectory start
    np.testing.assert_array_equal(
        out["slac_observation_indices"][16], np.arange(12, 17)
    )
    # originals preserved
    np.testing.assert_array_equal(out["original_actions"], ds["actions"])
    assert (out["actions"] != ds["actions"]).any()
    # uncertainties positive
    assert (out["aleatoric_uncertainty"] > 0).all()
    # round-trips through the writer
    save_dataset(str(tmp_path / "aug.hdf5"), out)
    from s2p_tpu.data.hdf5 import load_augment_dataset

    back = load_augment_dataset(str(tmp_path / "aug.hdf5"))
    assert "disagreement_uncertainty" in back


def test_generate_multistep_dataset():
    """random_state_5step rollout variant (reference slac/algo.py:212)."""
    from s2p_tpu.world_model import generate_multistep_dataset

    ds = make_synthetic_rl_dataset(n_episodes=2, episode_len=12, obs_dim=OBS,
                                   act_dim=ACT, img_hw=8)
    model, params = _model_and_params()
    norm = compute_normalization(ds)
    out = generate_multistep_dataset(
        ds, model, params, norm,
        action_low=np.full(ACT, -1.0), action_high=np.full(ACT, 1.0),
        horizon=5, n_starts=4, seed=0,
    )
    assert out["observations"].shape == (20, OBS)
    assert out["rewards"].shape == (20,)
    assert (out["timeouts"][4::5] == 1).all()
    assert (out["timeouts"][:4] == 0).all()
    # chained rollout: row t+1's obs equals row t's next within a rollout
    np.testing.assert_allclose(out["observations"][1], out["next_observations"][0],
                               rtol=1e-5)
    assert out["image_observations"].shape == (20, 8, 8, 3)
    # offRL-action variant takes actions from a policy fn
    out2 = generate_multistep_dataset(
        ds, model, params, norm,
        action_low=np.full(ACT, -1.0), action_high=np.full(ACT, 1.0),
        horizon=2, n_starts=3, action_fn=lambda obs: np.zeros((len(obs), ACT)),
    )
    np.testing.assert_array_equal(out2["actions"], 0.0)
