"""GAN eval metric tests (FID/LPIPS/PSNR/SSIM, rebuttal.md:49-50)."""

import numpy as np
import pytest

import jax.numpy as jnp

from s2p_tpu.gan.metrics import (
    PerceptualMetric,
    compute_fid,
    evaluate_pairs,
    feature_stats,
    frechet_distance,
    psnr,
    ssim,
    vgg_fid_extractor,
)


def _imgs(seed, n=4, hw=32):
    rs = np.random.RandomState(seed)
    return (rs.rand(n, hw, hw, 3).astype(np.float32) * 2) - 1


def test_psnr_identical_is_huge_and_ordering():
    a = _imgs(0)
    assert float(jnp.min(psnr(a, a))) > 100.0
    near = a + 0.01
    far = a + 0.3
    assert float(jnp.mean(psnr(a, near))) > float(jnp.mean(psnr(a, far)))


def test_psnr_matches_closed_form():
    a = np.zeros((1, 8, 8, 3), np.float32)
    b = np.full((1, 8, 8, 3), 0.2, np.float32)
    # mse = 0.04, range 2 → 10*log10(4/0.04) = 20
    assert float(psnr(jnp.asarray(a), jnp.asarray(b))[0]) == pytest.approx(20.0, abs=1e-4)


def test_ssim_bounds_and_ordering():
    a = _imgs(1)
    assert float(jnp.mean(ssim(a, a))) == pytest.approx(1.0, abs=1e-5)
    noisy = np.clip(a + _imgs(2) * 0.5, -1, 1)
    s = float(jnp.mean(ssim(a, noisy)))
    assert -1.0 <= s < 0.95


def test_ssim_matches_scipy_reference():
    skimage = pytest.importorskip("skimage.metrics")
    a = _imgs(3, n=1)
    b = np.clip(a + _imgs(4, n=1) * 0.2, -1, 1)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b))[0])
    ref = skimage.structural_similarity(
        a[0], b[0], channel_axis=-1, data_range=2.0,
        gaussian_weights=True, sigma=1.5, use_sample_covariance=False,
    )
    assert ours == pytest.approx(ref, abs=5e-3)


@pytest.mark.slow
def test_perceptual_metric_zero_and_positive():
    pm = PerceptualMetric(image_shape=(32, 32, 3))
    a = jnp.asarray(_imgs(5, n=2))
    b = jnp.asarray(_imgs(6, n=2))
    assert float(jnp.mean(pm(a, a))) == pytest.approx(0.0, abs=1e-6)
    assert float(jnp.mean(pm(a, b))) > 0.0


def test_frechet_distance_closed_form():
    # identical gaussians → 0; shifted mean → |Δμ|²
    mu = np.zeros(4)
    sigma = np.eye(4)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-8)
    mu2 = np.full(4, 2.0)
    assert frechet_distance(mu, sigma, mu2, sigma) == pytest.approx(16.0, abs=1e-6)


def test_feature_stats_shapes():
    mu, sig = feature_stats(np.random.RandomState(0).randn(10, 6))
    assert mu.shape == (6,) and sig.shape == (6, 6)


def test_compute_fid_discriminates():
    ex = vgg_fid_extractor(image_shape=(32, 32, 3))
    real = [_imgs(i, n=8) for i in range(2)]
    same = [_imgs(i, n=8) + 1e-3 for i in range(2)]
    other = [np.clip(_imgs(i + 10, n=8) * 0.2 - 0.5, -1, 1) for i in range(2)]
    fid_same = compute_fid(ex, real, same)
    fid_other = compute_fid(ex, real, other)
    assert fid_same < fid_other


def test_evaluate_pairs_keys():
    a, b = _imgs(7), _imgs(8)
    out = evaluate_pairs(a, b, PerceptualMetric(image_shape=(32, 32, 3)))
    assert set(out) == {"psnr", "ssim", "lpips_vgg"}
    assert all(np.isfinite(v) for v in out.values())
