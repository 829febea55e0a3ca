"""InceptionV3 feature extractor for paper-comparable FID.

Spec: the reference evaluates generation with FID
(/root/reference/rebuttal.md:49-50). Canonical FID uses InceptionV3 pool3
(2048-dim) features; the pretrained weights are NOT bundled in this image
(zero egress), so this module provides:

- ``InceptionV3Features`` — the torchvision ``inception_v3`` topology in
  flax (NHWC, inference-only: BatchNorm folded into per-channel affines),
  up to the global-average pool3 features.
- ``load_torch_inception_v3`` — converts a torchvision ``inception_v3``
  state_dict (``.pth``) into the flax param tree, folding each BatchNorm's
  running statistics into the affine (γ/√(σ²+eps), β − μ·γ/√(σ²+eps)).
- ``inception_fid_extractor`` — drop-in extractor for
  ``s2p_tpu.gan.metrics.compute_fid``; bilinear-resizes inputs to 299².

With converted weights, ``compute_fid(inception_fid_extractor(vars), ...)``
is the standard torchvision-weights FID. Without weights the extractor
falls back to fixed-seed random features (self-consistent FID only —
clearly not paper-comparable; use ``vgg_fid_extractor``'s documented
caveats likewise).

Module names mirror torchvision (``Mixed_5b.branch1x1`` etc.) so the
state_dict conversion is mechanical.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_BN_EPS = 1e-3  # torchvision BasicConv2d BatchNorm eps


class BasicConv2d(nn.Module):
    """conv(bias=False) + folded-BN affine + relu (torchvision BasicConv2d,
    inference form)."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=list(self.padding), use_bias=False, name="conv",
        )(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        offset = self.param("bn_offset", nn.initializers.zeros, (self.features,))
        return nn.relu(x * scale + offset)


def _pad(p: int | Tuple[int, int]):
    if isinstance(p, int):
        return ((p, p), (p, p))
    return ((p[0], p[0]), (p[1], p[1]))


def _avg_pool3(x: jax.Array) -> jax.Array:
    # count_include_pad=True (torch default for avg_pool2d in InceptionA/C/E)
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=_pad(2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool3(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=_pad((0, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad((3, 0)), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=_pad((3, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=_pad((0, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=_pad((3, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=_pad((0, 3)), name="branch7x7dbl_5")(bd)
        bp = _avg_pool3(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=_pad((0, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad((3, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=_pad((0, 1)), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=_pad((1, 0)), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=_pad((0, 1)), name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=_pad((1, 0)), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        bp = _avg_pool3(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """torchvision ``inception_v3`` stem + Mixed_5b..7c → pool3 features
    [B, 2048] over NHWC images already resized to 299×299, range [-1, 1]
    (the standard FID preprocessing; torchvision's ``transform_input`` is
    off, matching pytorch-fid's usage of torchvision weights)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=_pad(1), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # pool3: [B, 2048]


def load_torch_inception_v3(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """torchvision ``inception_v3`` state_dict → InceptionV3Features params.

    Per BasicConv2d module ``m``: ``m.conv.weight`` (OIHW → HWIO) and the
    BatchNorm folded into the affine using its running statistics. The
    classifier (``fc.*``) and aux head (``AuxLogits.*``) are ignored.
    """
    by_module: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in state_dict.items():
        if k.startswith(("fc.", "AuxLogits.")) or k.endswith("num_batches_tracked"):
            continue
        mod, leaf2 = k.rsplit(".", 2)[0], ".".join(k.rsplit(".", 2)[1:])
        by_module.setdefault(mod, {})[leaf2] = np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v
        )

    def convert_basic(m: Dict[str, np.ndarray]) -> Dict[str, Any]:
        gamma, beta = m["bn.weight"], m["bn.bias"]
        mean, var = m["bn.running_mean"], m["bn.running_var"]
        scale = gamma / np.sqrt(var + _BN_EPS)
        return {
            "conv": {"kernel": jnp.asarray(m["conv.weight"].transpose(2, 3, 1, 0))},
            "bn_scale": jnp.asarray(scale),
            "bn_offset": jnp.asarray(beta - mean * scale),
        }

    params: Dict[str, Any] = {}
    for mod, leaves in by_module.items():
        node = params
        parts = mod.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = convert_basic(leaves)
    return {"params": params}


def resize_bilinear(images: jax.Array, size: int = 299) -> jax.Array:
    """Bilinear resize (align_corners=False semantics match
    jax.image.resize 'bilinear') to the Inception input resolution."""
    B, _, _, C = images.shape
    return jax.image.resize(images, (B, size, size, C), method="bilinear")


def inception_fid_extractor(variables=None, seed: int = 0):
    """pool3 extractor for ``compute_fid`` (NHWC in [-1, 1], any resolution).

    Pass converted torchvision weights (``load_torch_inception_v3``) for
    the standard FID; without them a fixed-seed random network gives a
    self-consistent (NOT paper-comparable) distance."""
    module = InceptionV3Features()
    if variables is None:
        dummy = jnp.zeros((1, 299, 299, 3), jnp.float32)
        variables = module.init(jax.random.PRNGKey(seed), dummy)

    @jax.jit
    def extract(images: jax.Array) -> jax.Array:
        return module.apply(variables, resize_bilinear(images))

    return extract


def expected_torch_inception_keys() -> Sequence[str]:
    """Key names a torchvision inception_v3 state_dict must provide (for
    tests and for validating user-supplied weight files)."""
    module = InceptionV3Features()
    dummy = jnp.zeros((1, 299, 299, 3), jnp.float32)
    params = module.init(jax.random.PRNGKey(0), dummy)["params"]
    keys = []

    def rec(node, path):
        if "conv" in node and "bn_scale" in node:
            keys.extend([
                f"{path}.conv.weight", f"{path}.bn.weight", f"{path}.bn.bias",
                f"{path}.bn.running_mean", f"{path}.bn.running_var",
            ])
            return
        for k, v in node.items():
            rec(v, f"{path}.{k}" if path else k)

    rec(params, "")
    return keys
