"""Network-library tests: MLP/CNN shapes+init, distributions correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2p_tpu.nn import (
    CNN,
    DCNN,
    ConcatMlp,
    Delta,
    LinearTransform,
    Mlp,
    Normal,
    TanhNormal,
)


class TestMlp:
    def test_shapes_and_init_ranges(self):
        m = Mlp(hidden_sizes=(32, 32), output_size=4, init_w=3e-3)
        params = m.init(jax.random.key(0), jnp.zeros((2, 7)))
        y = m.apply(params, jnp.ones((2, 7)))
        assert y.shape == (2, 4)
        # final layer init within +-init_w (reference mlp.py:56)
        w_last = params["params"]["last_fc"]["kernel"]
        assert float(jnp.max(jnp.abs(w_last))) <= 3e-3
        # fanin bound on hidden layer
        w0 = params["params"]["fc0"]["kernel"]
        assert float(jnp.max(jnp.abs(w0))) <= 1 / np.sqrt(7) + 1e-6

    def test_layer_norm_skips_final_hidden(self):
        m = Mlp(hidden_sizes=(8, 8, 8), output_size=2, layer_norm=True)
        params = m.init(jax.random.key(0), jnp.zeros((1, 3)))
        names = set(params["params"].keys())
        assert "layer_norm0" in names and "layer_norm1" in names
        assert "layer_norm2" not in names  # reference quirk (mlp.py:63-64)

    def test_preactivations(self):
        m = Mlp(hidden_sizes=(8,), output_size=2, output_activation=jnp.tanh)
        params = m.init(jax.random.key(0), jnp.zeros((1, 3)))
        out, pre = m.apply(params, jnp.ones((1, 3)), return_preactivations=True)
        np.testing.assert_allclose(np.asarray(out), np.tanh(np.asarray(pre)), rtol=1e-6)

    def test_concat_mlp(self):
        m = ConcatMlp(hidden_sizes=(16,), output_size=1)
        obs, act = jnp.ones((4, 10)), jnp.ones((4, 3))
        params = m.init(jax.random.key(0), obs, act)
        assert m.apply(params, obs, act).shape == (4, 1)


class TestCNN:
    def test_cnn_shapes(self):
        m = CNN(
            channels=(16, 32),
            kernel_sizes=(3, 3),
            strides=(2, 2),
            paddings=(1, 1),
            hidden_sizes=(64,),
            output_size=10,
        )
        x = jnp.zeros((2, 32, 32, 3))
        params = m.init(jax.random.key(0), x)
        assert m.apply(params, x).shape == (2, 10)

    def test_cnn_leading_dims(self):
        m = CNN(channels=(8,), kernel_sizes=(3,), strides=(2,), paddings=(1,))
        x = jnp.zeros((2, 5, 16, 16, 3))  # (B, T, H, W, C)
        params = m.init(jax.random.key(0), x)
        out = m.apply(params, x)
        assert out.shape[:2] == (2, 5)

    def test_dcnn_roundtrip_size(self):
        m = DCNN(
            fc_hidden_sizes=(32,),
            deconv_input_shape=(4, 4, 16),
            channels=(8, 3),
            kernel_sizes=(4, 4),
            strides=(2, 2),
            paddings=(1, 1),
            output_activation=jnp.tanh,
        )
        z = jnp.zeros((2, 6))
        params = m.init(jax.random.key(0), z)
        img = m.apply(params, z)
        assert img.shape == (2, 16, 16, 3)
        assert float(jnp.max(jnp.abs(img))) <= 1.0


class TestTorchParity:
    """Golden-tensor parity vs torch-cpu (the debug_util pattern, SURVEY §4)."""

    @pytest.mark.parametrize("k,s,p,op", [(4, 2, 1, 0), (3, 1, 1, 0), (5, 3, 2, 1)])
    def test_conv_transpose_matches_torch(self, k, s, p, op):
        import torch

        from s2p_tpu.nn.cnn import ConvTranspose2dTorch

        rng = np.random.RandomState(0)
        x = rng.randn(2, 7, 7, 5).astype(np.float32)
        w_torch = rng.randn(5, 6, k, k).astype(np.float32)  # (in, out, k, k)
        b = rng.randn(6).astype(np.float32)

        ref = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(w_torch),
            torch.from_numpy(b),
            stride=s,
            padding=p,
            output_padding=op,
        ).numpy().transpose(0, 2, 3, 1)

        m = ConvTranspose2dTorch(6, kernel_size=k, stride=s, padding=p, output_padding=op)
        params = {"params": {"kernel": jnp.asarray(w_torch.transpose(2, 3, 0, 1)),
                             "bias": jnp.asarray(b)}}
        out = np.asarray(m.apply(params, jnp.asarray(x)))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_conv_matches_torch(self):
        import torch

        rng = np.random.RandomState(1)
        x = rng.randn(2, 9, 9, 4).astype(np.float32)
        w_torch = rng.randn(8, 4, 3, 3).astype(np.float32)  # (out, in, k, k)

        ref = torch.nn.functional.conv2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(w_torch),
            stride=2,
            padding=1,
        ).numpy().transpose(0, 2, 3, 1)

        import flax.linen as fnn

        m = fnn.Conv(8, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], use_bias=False)
        params = {"params": {"kernel": jnp.asarray(w_torch.transpose(2, 3, 1, 0))}}
        out = np.asarray(m.apply(params, jnp.asarray(x)))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


class TestDistributions:
    def test_normal_log_prob_matches_scipy(self):
        from scipy.stats import norm

        d = Normal(loc=jnp.array([0.5, -1.0]), scale=jnp.array([0.3, 2.0]))
        x = jnp.array([0.1, 0.7])
        expected = norm.logpdf(np.asarray(x), [0.5, -1.0], [0.3, 2.0])
        np.testing.assert_allclose(np.asarray(d.log_prob(x)), expected, rtol=1e-5)

    def test_normal_kl_matches_closed_form_zero(self):
        d = Normal(jnp.array([1.0]), jnp.array([0.5]))
        np.testing.assert_allclose(np.asarray(d.kl_divergence(d)), 0.0, atol=1e-7)

    def test_tanh_normal_log_prob_consistency(self):
        d = TanhNormal(loc=jnp.zeros(3), scale=jnp.ones(3) * 0.5)
        a, u = d.sample_with_pre_tanh(jax.random.key(1))
        lp_with = d.log_prob(a, pre_tanh_value=u)
        lp_without = d.log_prob(a)
        np.testing.assert_allclose(np.asarray(lp_with), np.asarray(lp_without), atol=1e-4)

    def test_tanh_normal_log_prob_integrates_to_one(self):
        # 1-D: integrate density over a grid
        d = TanhNormal(loc=jnp.array([0.3]), scale=jnp.array([0.7]))
        xs = np.linspace(-0.999, 0.999, 20001)
        lp = jax.vmap(lambda x: d.log_prob(jnp.array([x])))(jnp.asarray(xs))
        total = np.trapezoid(np.exp(np.asarray(lp).ravel()), xs)
        assert abs(total - 1.0) < 1e-3

    def test_tanh_normal_sample_in_range_and_grad_flows(self):
        d = TanhNormal(loc=jnp.zeros(4), scale=jnp.ones(4))
        a = d.sample(jax.random.key(0))
        assert float(jnp.max(jnp.abs(a))) < 1.0

        def f(loc):
            dd = TanhNormal(loc=loc, scale=jnp.ones(4))
            a, lp = dd.sample_and_log_prob(jax.random.key(0))
            return jnp.sum(a) + jnp.sum(lp)

        g = jax.grad(f)(jnp.zeros(4))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_tanh_normal_extreme_pre_tanh_stable(self):
        d = TanhNormal(loc=jnp.zeros(1), scale=jnp.ones(1))
        lp = d.log_prob(jnp.array([0.999999]), pre_tanh_value=jnp.array([20.0]))
        assert np.isfinite(float(lp))

    def test_delta(self):
        d = Delta(jnp.array([1.0, 2.0]))
        np.testing.assert_array_equal(np.asarray(d.sample(jax.random.key(0))), [1.0, 2.0])

    def test_linear_transform(self):
        t = LinearTransform(m=2.0, b=-1.0)
        np.testing.assert_allclose(np.asarray(t(jnp.array([1.0, 3.0]))), [1.0, 5.0])
