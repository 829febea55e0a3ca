"""VGG19 perceptual loss (SPADE lineage).

Spec: the S2P losses include a VGG perceptual term
(/root/reference/rebuttal.md:71,130-138,187-190). Following the SPADE
convention the loss compares relu1_1..relu5_1 activations with weights
[1/32, 1/16, 1/8, 1/4, 1].

Weight provenance: torchvision's pretrained ``vgg19`` is not bundled in this
image (zero egress). ``load_torch_vgg19`` converts a torchvision
``vgg19`` state_dict (``.pth``) into the flax param tree when the user
provides one; otherwise ``VGG19Features.init`` gives a fixed-seed random
network — random VGG features are a known-usable perceptual metric and keep
the loss well-defined until real weights are supplied.

Images enter in [-1, 1] (generator output range) and are shifted to
ImageNet-normalized RGB inside the module.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg19.features conv layer indices, grouped by slice:
# slice k contains convs up to and including relu{k}_1.
_VGG19_SLICES: Sequence[Sequence[int]] = (
    (0,),  # conv1_1 -> relu1_1
    (2, 5),  # conv1_2, conv2_1 -> relu2_1
    (7, 10),  # conv2_2, conv3_1 -> relu3_1
    (12, 14, 16, 19),  # conv3_2..conv4_1 -> relu4_1
    (21, 23, 25, 28),  # conv4_2..conv5_1 -> relu5_1
)
_VGG19_CHANNELS: Dict[int, int] = {
    0: 64, 2: 64, 5: 128, 7: 128, 10: 256, 12: 256, 14: 256, 16: 256,
    19: 512, 21: 512, 23: 512, 25: 512, 28: 512,
}
# layers after which torchvision applies 2x2 max pooling
_POOL_BEFORE = {5: True, 10: True, 19: True, 28: True}

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

SLICE_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


class VGG19Features(nn.Module):
    """relu{1..5}_1 feature pyramid of VGG19 over NHWC images in [-1, 1]."""

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        x = (x + 1.0) * 0.5
        x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        feats = []
        h = x
        for slice_layers in _VGG19_SLICES:
            for li in slice_layers:
                if _POOL_BEFORE.get(li):
                    h = nn.max_pool(h, (2, 2), strides=(2, 2))
                h = nn.Conv(
                    _VGG19_CHANNELS[li], (3, 3), padding=[(1, 1), (1, 1)],
                    name=f"conv{li}",
                )(h)
                h = nn.relu(h)
            feats.append(h)
        return feats


def load_torch_vgg19(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """torchvision vgg19 ``state_dict`` → flax params for VGG19Features.

    torch conv weight (out, in, kh, kw) → flax kernel (kh, kw, in, out).
    Accepts tensors or numpy arrays; keys ``features.{i}.weight/bias``.
    """
    params: Dict[str, Any] = {}
    for li in _VGG19_CHANNELS:
        w = np.asarray(state_dict[f"features.{li}.weight"])
        b = np.asarray(state_dict[f"features.{li}.bias"])
        params[f"conv{li}"] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }
    return {"params": params}


# -- LPIPS (VGG16 backbone + learned linear calibration) ---------------------
#
# Paper-comparable LPIPS (Zhang et al. 2018, the metric the reference
# reports, rebuttal.md:49-50) uses VGG16 features at relu{1_2,2_2,3_3,4_3,
# 5_3} followed by learned 1×1 "lin" layers. Neither the VGG16 weights nor
# the lin calibration are bundled (zero egress); the topology + converters
# below make LPIPS paper-comparable the moment the user supplies
# torchvision's ``vgg16`` state_dict and the official ``vgg.pth`` lin
# weights (keys ``lin{k}.model.1.weight``).

# torchvision vgg16.features conv indices per LPIPS slice
_VGG16_SLICES: Sequence[Sequence[int]] = (
    (0, 2),            # → relu1_2
    (5, 7),            # → relu2_2
    (10, 12, 14),      # → relu3_3
    (17, 19, 21),      # → relu4_3
    (24, 26, 28),      # → relu5_3
)
_VGG16_CHANNELS: Dict[int, int] = {
    0: 64, 2: 64, 5: 128, 7: 128, 10: 256, 12: 256, 14: 256,
    17: 512, 19: 512, 21: 512, 24: 512, 26: 512, 28: 512,
}
_VGG16_POOL_BEFORE = {5: True, 10: True, 17: True, 24: True}

# official LPIPS ScalingLayer constants (inputs in [-1, 1])
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """LPIPS's VGG16 feature pyramid (relu1_2..relu5_3) over NHWC images in
    [-1, 1], pre-scaled by the official LPIPS ScalingLayer."""

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        x = (x - _LPIPS_SHIFT) / _LPIPS_SCALE
        feats = []
        h = x
        for slice_layers in _VGG16_SLICES:
            for li in slice_layers:
                if _VGG16_POOL_BEFORE.get(li):
                    h = nn.max_pool(h, (2, 2), strides=(2, 2))
                h = nn.Conv(
                    _VGG16_CHANNELS[li], (3, 3), padding=[(1, 1), (1, 1)],
                    name=f"conv{li}",
                )(h)
                h = nn.relu(h)
            feats.append(h)
        return feats


def load_torch_vgg16(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """torchvision vgg16 ``state_dict`` → flax params for VGG16Features."""
    params: Dict[str, Any] = {}
    for li in _VGG16_CHANNELS:
        w = np.asarray(state_dict[f"features.{li}.weight"])
        b = np.asarray(state_dict[f"features.{li}.bias"])
        params[f"conv{li}"] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }
    return {"params": params}


def load_lpips_linear(state_dict: Dict[str, Any]) -> List[np.ndarray]:
    """Official LPIPS lin-layer weights (``lin{k}.model.1.weight``,
    shape [1, C, 1, 1]) → list of per-layer channel weight vectors."""
    out: List[np.ndarray] = []
    for k in range(len(_VGG16_SLICES)):
        w = np.asarray(state_dict[f"lin{k}.model.1.weight"])
        out.append(w.reshape(-1).astype(np.float32))
    return out


class LPIPSMetric:
    """LPIPS(VGG16): d(x,y) = Σ_k mean_hw( w_k · (F̂_k(x) − F̂_k(y))² ) with
    unit-normalized features F̂ and learned channel weights w_k.

    With both converted VGG16 weights and lin weights this is the official
    metric; with ``lin_weights=None`` the channel weights are uniform 1/C
    (uncalibrated — a valid relative distance, not paper-comparable)."""

    def __init__(self, variables=None, lin_weights: List[np.ndarray] = None,
                 image_shape=(64, 64, 3), seed: int = 0):
        self.module = VGG16Features()
        if variables is None:
            dummy = jnp.zeros((1,) + tuple(image_shape), jnp.float32)
            variables = self.module.init(jax.random.PRNGKey(seed), dummy)
        self.variables = variables
        self.calibrated = lin_weights is not None
        self.lin_weights = (
            [jnp.asarray(w) for w in lin_weights] if lin_weights is not None
            else None
        )
        self._fn = jax.jit(self._distance)

    def _distance(self, a: jax.Array, b: jax.Array) -> jax.Array:
        fa = self.module.apply(self.variables, a)
        fb = self.module.apply(self.variables, b)
        total = 0.0
        for k, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa * jax.lax.rsqrt(jnp.sum(xa**2, -1, keepdims=True) + 1e-10)
            nb = xb * jax.lax.rsqrt(jnp.sum(xb**2, -1, keepdims=True) + 1e-10)
            d2 = (na - nb) ** 2
            if self.lin_weights is not None:
                lay = jnp.sum(d2 * self.lin_weights[k], axis=-1)
            else:
                lay = jnp.mean(d2, axis=-1)
            total = total + jnp.mean(lay, axis=(-2, -1))
        return total

    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        return self._fn(a, b)


class PerceptualLoss:
    """Callable VGG loss with bound params: L = Σ_k w_k ·|F_k(x) − F_k(y)|₁."""

    def __init__(self, variables: Any = None, image_shape=(64, 64, 3), seed: int = 0):
        self.module = VGG19Features()
        if variables is None:
            dummy = jnp.zeros((1,) + tuple(image_shape), jnp.float32)
            variables = self.module.init(jax.random.PRNGKey(seed), dummy)
        self.variables = variables

    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        fx = self.module.apply(self.variables, x)
        fy = self.module.apply(self.variables, jax.lax.stop_gradient(y))
        loss = 0.0
        for w, a, b in zip(SLICE_WEIGHTS, fx, fy):
            loss = loss + w * jnp.mean(jnp.abs(a - jax.lax.stop_gradient(b)))
        return loss
