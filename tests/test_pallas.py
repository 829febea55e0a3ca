"""Pallas kernel numerics (CPU fallback path; TPU lowering exercised by
bench/verify runs on the real chip)."""

import numpy as np

import jax

from s2p_tpu.gan.pallas_kernels import _plain, fused_mat_norm


def test_fused_mat_norm_matches_plain():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 64))
    g = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 64)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 64)) * 0.1
    out = np.asarray(fused_mat_norm(x, g, b))
    ref = np.asarray(_plain(x, g, b, 1e-5))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_generator_pallas_flag_matches_plain():
    from s2p_tpu.gan import S2PGenerator
    import jax.numpy as jnp

    s = jax.random.normal(jax.random.PRNGKey(1), (2, 17))
    img = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3), minval=-1)
    gen_a = S2PGenerator(image_size=64, ngf=8, state_embed_dim=16, mat_hidden=8)
    gen_b = S2PGenerator(image_size=64, ngf=8, state_embed_dim=16, mat_hidden=8,
                         use_pallas=True)
    params = gen_a.init(jax.random.PRNGKey(0), s, img)
    a = np.asarray(gen_a.apply(params, s, img))
    b = np.asarray(gen_b.apply(params, s, img))
    np.testing.assert_allclose(a, b, atol=1e-5)
