"""InceptionV3-FID and LPIPS(VGG16) extractors + torchvision converters.

Spec: paper-comparable FID/LPIPS (reference rebuttal.md:49-50) need the
canonical extractors. Weights aren't bundled (zero egress), so these tests
validate the conversion path with synthetic torchvision-shaped state_dicts:
the moment real ``vgg16``/``inception_v3``/LPIPS-lin weights are supplied,
the same code path yields the standard metrics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2p_tpu.gan.inception import (
    InceptionV3Features,
    expected_torch_inception_keys,
    inception_fid_extractor,
    load_torch_inception_v3,
)
from s2p_tpu.gan.metrics import compute_fid
from s2p_tpu.gan.perceptual import (
    LPIPSMetric,
    VGG16Features,
    load_lpips_linear,
    load_torch_vgg16,
)


def _synthetic_inception_sd(template, rs):
    """torchvision-named random state_dict with the shapes the converter
    expects, derived from the flax template."""
    sd = {}

    def rec(node, path):
        if "conv" in node and "bn_scale" in node:
            kern = np.asarray(node["conv"]["kernel"])  # HWIO
            c_out = kern.shape[-1]
            sd[f"{path}.conv.weight"] = rs.randn(
                c_out, kern.shape[2], kern.shape[0], kern.shape[1]
            ).astype(np.float32) * 0.05
            sd[f"{path}.bn.weight"] = rs.rand(c_out).astype(np.float32) + 0.5
            sd[f"{path}.bn.bias"] = rs.randn(c_out).astype(np.float32) * 0.1
            sd[f"{path}.bn.running_mean"] = rs.randn(c_out).astype(np.float32) * 0.1
            sd[f"{path}.bn.running_var"] = rs.rand(c_out).astype(np.float32) + 0.5
            return
        for k, v in node.items():
            rec(v, f"{path}.{k}" if path else k)

    rec(template, "")
    return sd


@pytest.mark.slow
def test_inception_converter_and_fid():
    module = InceptionV3Features()
    template = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3))
    )["params"]

    rs = np.random.RandomState(0)
    sd = _synthetic_inception_sd(template, rs)
    # the published key list matches what the synthetic dict generates
    assert set(expected_torch_inception_keys()) == set(sd)
    # plus torchvision extras that must be ignored
    sd["fc.weight"] = rs.randn(1000, 2048).astype(np.float32)
    sd["AuxLogits.conv0.conv.weight"] = rs.randn(128, 768, 1, 1).astype(np.float32)
    sd["Conv2d_1a_3x3.bn.num_batches_tracked"] = np.int64(1)

    variables = load_torch_inception_v3(sd)
    assert (
        jax.tree_util.tree_structure(variables["params"])
        == jax.tree_util.tree_structure(dict(template))
    )

    # BN folding math: y = (conv(x) - mean)/sqrt(var+eps) * gamma + beta
    p = variables["params"]["Conv2d_1a_3x3"]
    gamma = sd["Conv2d_1a_3x3.bn.weight"]
    beta = sd["Conv2d_1a_3x3.bn.bias"]
    mean = sd["Conv2d_1a_3x3.bn.running_mean"]
    var = sd["Conv2d_1a_3x3.bn.running_var"]
    np.testing.assert_allclose(
        np.asarray(p["bn_scale"]), gamma / np.sqrt(var + 1e-3), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(p["bn_offset"]),
        beta - mean * gamma / np.sqrt(var + 1e-3), rtol=1e-5, atol=1e-6,
    )

    # the extractor produces 2048-dim pool3 features from any resolution,
    # and a self-FID of ~0
    extract = inception_fid_extractor(variables)
    imgs = rs.rand(4, 64, 64, 3).astype(np.float32) * 2 - 1
    feats = np.asarray(jax.device_get(extract(jnp.asarray(imgs))))
    assert feats.shape == (4, 2048)
    assert np.isfinite(feats).all()
    batch = rs.rand(8, 64, 64, 3).astype(np.float32) * 2 - 1
    fid_same = compute_fid(extract, [batch], [batch])
    assert abs(fid_same) < 1e-3


def test_vgg16_feature_pyramid_and_converter():
    rs = np.random.RandomState(0)
    sd = {}
    from s2p_tpu.gan.perceptual import _VGG16_CHANNELS

    c_in = 3
    for li in sorted(_VGG16_CHANNELS):
        c_out = _VGG16_CHANNELS[li]
        sd[f"features.{li}.weight"] = rs.randn(c_out, c_in, 3, 3).astype(np.float32) * 0.05
        sd[f"features.{li}.bias"] = rs.randn(c_out).astype(np.float32) * 0.1
        c_in = c_out
    variables = load_torch_vgg16(sd)
    module = VGG16Features()
    x = jnp.asarray(rs.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    feats = module.apply(variables, x)
    assert [f.shape for f in feats] == [
        (2, 64, 64, 64), (2, 32, 32, 128), (2, 16, 16, 256),
        (2, 8, 8, 512), (2, 4, 4, 512),
    ]


@pytest.mark.slow
def test_lpips_metric_with_linear_calibration():
    rs = np.random.RandomState(1)
    channels = [64, 128, 256, 512, 512]
    lin_sd = {
        f"lin{k}.model.1.weight": rs.rand(1, c, 1, 1).astype(np.float32)
        for k, c in enumerate(channels)
    }
    lin = load_lpips_linear(lin_sd)
    assert [w.shape for w in lin] == [(c,) for c in channels]

    m = LPIPSMetric(lin_weights=lin, image_shape=(32, 32, 3))
    assert m.calibrated
    a = jnp.asarray(rs.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    b = jnp.asarray(rs.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    d_ab = np.asarray(jax.device_get(m(a, b)))
    assert d_ab.shape == (2,) and (d_ab > 0).all()
    # identity → 0, symmetric
    np.testing.assert_allclose(np.asarray(jax.device_get(m(a, a))), 0.0, atol=1e-6)
    np.testing.assert_allclose(
        d_ab, np.asarray(jax.device_get(m(b, a))), rtol=1e-5
    )
    # uncalibrated fallback also works and differs (weights ≠ uniform)
    m0 = LPIPSMetric(image_shape=(32, 32, 3))
    assert not m0.calibrated
    d0 = np.asarray(jax.device_get(m0(a, b)))
    assert np.isfinite(d0).all()
