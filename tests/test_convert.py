"""Checkpoint conversion + torch↔JAX numeric parity (SURVEY §4 golden-tensor
strategy, BASELINE.json north-star parity discipline)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2p_tpu.gan import S2PGenerator
from s2p_tpu.gan.convert import (
    load_generator_checkpoint,
    load_pth,
    params_to_state_dict,
    state_dict_to_params,
)

torch = pytest.importorskip("torch")

from torch_twin import S2PGeneratorTorch  # noqa: E402

STATE_DIM = 17
GEN_KW = dict(ngf=8, state_freqs=2, state_embed_dim=16, mat_hidden=8)


def _pair(image_size=64):
    gen = S2PGenerator(image_size=image_size, **GEN_KW)
    twin = S2PGeneratorTorch(STATE_DIM, image_size=image_size, **GEN_KW)
    s = jnp.zeros((2, STATE_DIM))
    img = jnp.zeros((2, image_size, image_size, 3))
    template = gen.init(jax.random.PRNGKey(0), s, img)["params"]
    return gen, twin, template


def test_state_dict_covers_flax_template_exactly():
    _, twin, template = _pair()
    sd = {k: v.numpy() for k, v in twin.state_dict().items()}
    params = state_dict_to_params(sd, template)
    # same tree structure
    flat_a = jax.tree_util.tree_structure(params)
    flat_b = jax.tree_util.tree_structure(dict(template))
    assert flat_a == flat_b


@pytest.mark.parametrize("size", [64, 100])
def test_generator_pixel_parity_torch_vs_jax(size):
    """Identical weights → identical pixels, both the 64px demo config and
    the 100px RL config (non-integer upsample chain uses torch's exact
    nearest index rule)."""
    gen, twin, template = _pair(image_size=size)
    sd = {k: v.numpy() for k, v in twin.state_dict().items()}
    params = {"params": state_dict_to_params(sd, template)}

    rs = np.random.RandomState(0)
    s_np = rs.randn(2, STATE_DIM).astype(np.float32)
    img_np = (rs.rand(2, size, size, 3).astype(np.float32) * 2) - 1

    out_jax = gen.apply(params, jnp.asarray(s_np), jnp.asarray(img_np))
    with torch.no_grad():
        out_t = twin(
            torch.from_numpy(s_np),
            torch.from_numpy(img_np.transpose(0, 3, 1, 2)),
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out_jax), out_t, rtol=1e-4, atol=1e-4)


def test_round_trip_params_to_state_dict():
    gen, twin, template = _pair()
    sd = params_to_state_dict(template)
    back = state_dict_to_params(sd, template)
    for a, b in zip(jax.tree_util.tree_leaves(back), jax.tree_util.tree_leaves(dict(template))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the torch twin accepts the exported dict
    twin.load_state_dict({k: torch.from_numpy(np.array(v)) for k, v in sd.items()})


def test_load_generator_checkpoint_pth(tmp_path):
    """End-to-end .pth load path (the released cheetah_30.pth flow)."""
    gen, twin, _ = _pair()
    p = str(tmp_path / "cheetah_30.pth")
    torch.save(twin.state_dict(), p)
    s = jnp.zeros((1, STATE_DIM))
    img = jnp.zeros((1, 64, 64, 3))
    variables = load_generator_checkpoint(p, gen, s, img)
    out = gen.apply(variables, s, img)
    assert out.shape == (1, 64, 64, 3)


def test_load_pth_unwraps_nested_checkpoint(tmp_path):
    _, twin, template = _pair()
    p = str(tmp_path / "nested.pth")
    torch.save({"netG": twin.state_dict(), "epoch": 30}, p)
    sd = load_pth(p)
    params = state_dict_to_params(sd, template)
    assert "block_0" in params


def test_shape_mismatch_raises():
    _, twin, template = _pair()
    sd = {k: v.numpy() for k, v in twin.state_dict().items()}
    sd["conv_img.weight"] = sd["conv_img.weight"][:, :1]
    with pytest.raises(ValueError, match="shape mismatch"):
        state_dict_to_params(sd, template)


def test_missing_key_raises():
    _, twin, template = _pair()
    sd = {k: v.numpy() for k, v in twin.state_dict().items()}
    del sd["conv_img.bias"]
    with pytest.raises(KeyError, match="conv_img.bias"):
        state_dict_to_params(sd, template)
