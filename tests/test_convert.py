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


@pytest.mark.slow
def test_state_dict_covers_flax_template_exactly():
    _, twin, template = _pair()
    sd = {k: v.numpy() for k, v in twin.state_dict().items()}
    params = state_dict_to_params(sd, template)
    # same tree structure
    flat_a = jax.tree_util.tree_structure(params)
    flat_b = jax.tree_util.tree_structure(dict(template))
    assert flat_a == flat_b


@pytest.mark.parametrize("size", [64, 100])
@pytest.mark.slow
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


@pytest.mark.slow
def test_round_trip_params_to_state_dict():
    gen, twin, template = _pair()
    sd = params_to_state_dict(template)
    back = state_dict_to_params(sd, template)
    for a, b in zip(jax.tree_util.tree_leaves(back), jax.tree_util.tree_leaves(dict(template))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the torch twin accepts the exported dict
    twin.load_state_dict({k: torch.from_numpy(np.array(v)) for k, v in sd.items()})


@pytest.mark.slow
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


@pytest.mark.slow
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


# -- foreign-convention (SPADE) conversion + diff report ----------------------

from s2p_tpu.gan.convert import (  # noqa: E402
    diff_state_dict,
    format_diff,
    remap_state_dict,
    spade_block_name_map,
)


def _spadeify(sd):
    """Rename our-convention keys into SPADE's (the released checkpoints'
    lineage, README.md:72-75): block_i → head_0/G_middle_k/up_k, seed_fc →
    fc, SPADE's Sequential-wrapped shared conv → mlp_shared.0."""
    n_blocks = len({k.split(".")[0] for k in sd if k.startswith("block_")})
    inv = {v: k for k, v in spade_block_name_map(n_blocks).items()}
    out = {}
    for k, v in sd.items():
        head = k.split(".", 1)[0]
        nk = inv.get(head, head) + (("." + k.split(".", 1)[1]) if "." in k else "")
        nk = nk.replace(".mlp_shared.", ".mlp_shared.0.")
        out[nk] = v
    return out


@pytest.mark.slow
def test_load_spade_named_checkpoint(tmp_path):
    """A SPADE-convention state_dict (fc/head_0/G_middle_k/up_k,
    mlp_shared.0) loads through the name-mapping layer and reproduces the
    same pixels as the direct load."""
    gen, twin, template = _pair()
    sd_spade = _spadeify({k: v.numpy() for k, v in twin.state_dict().items()})
    assert any(k.startswith("G_middle_0.") for k in sd_spade)
    assert any(".mlp_shared.0." in k for k in sd_spade)
    p = str(tmp_path / "spade_30.pth")
    torch.save(sd_spade, p)

    rs = np.random.RandomState(3)
    s = jnp.asarray(rs.randn(1, STATE_DIM).astype(np.float32))
    img = jnp.asarray((rs.rand(1, 64, 64, 3).astype(np.float32) * 2) - 1)
    variables = load_generator_checkpoint(p, gen, s, img)
    out = gen.apply(variables, s, img)

    p2 = str(tmp_path / "ours_30.pth")
    torch.save(twin.state_dict(), p2)
    out_direct = gen.apply(load_generator_checkpoint(p2, gen, s, img), s, img)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_direct))


def test_diff_state_dict_report():
    _, twin, template = _pair()
    sd = {k: v.numpy() for k, v in twin.state_dict().items()}
    # a clean dict is ok
    assert diff_state_dict(sd, template)["ok"]
    # perturb: drop one key, rename another, break a shape
    del sd["conv_img.bias"]
    sd["blockX_0.conv_0.weight"] = sd.pop("block_0.conv_0.weight")
    sd["seed_fc.weight"] = sd["seed_fc.weight"][:, :4]
    rep = diff_state_dict(sd, template)
    assert not rep["ok"]
    assert "conv_img.bias" in rep["missing"]
    assert "block_0.conv_0.weight" in rep["missing"]
    assert "blockX_0.conv_0.weight" in rep["unexpected"]
    # similarity hint points at the renamed key
    assert rep["suggestions"]["block_0.conv_0.weight"][0] == "blockX_0.conv_0.weight"
    assert any(k == "seed_fc.weight" for k, _, _ in rep["shape_mismatch"])
    txt = format_diff(rep)
    assert "missing" in txt and "shape" in txt and "closest" in txt


@pytest.mark.slow
def test_load_mismatched_checkpoint_raises_with_report(tmp_path):
    gen, twin, _ = _pair()
    sd = {k: v.numpy() for k, v in twin.state_dict().items()}
    sd["totally_unknown.weight"] = sd.pop("block_0.conv_0.weight")
    p = str(tmp_path / "bad.pth")
    torch.save(sd, p)
    s = jnp.zeros((1, STATE_DIM))
    img = jnp.zeros((1, 64, 64, 3))
    with pytest.raises(ValueError, match="missing +block_0.conv_0.weight"):
        load_generator_checkpoint(p, gen, s, img)


def test_remap_state_dict_prefix_boundaries():
    sd = {"up_0.conv_0.weight": 1, "up_01.conv_0.weight": 2, "up_0": 3}
    out = remap_state_dict(sd, {"up_0": "block_3"}, substitutions=())
    assert out == {"block_3.conv_0.weight": 1, "up_01.conv_0.weight": 2,
                   "block_3": 3}
    # "" drops keys (e.g. running stats buffers)
    out = remap_state_dict(sd, {"up_01": ""}, substitutions=())
    assert "up_01.conv_0.weight" not in out
