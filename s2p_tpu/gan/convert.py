"""PyTorch checkpoint → JAX parameter conversion.

The reference ships released GAN checkpoints (``cheetah_30.pth`` /
``walker_30.pth``, /root/reference/README.md:22-25) and SLAC weights
(``latent.pth``). This module converts torch ``state_dict`` mappings into
flax param pytrees so those weights load for pixel-parity validation
(BASELINE.json north star).

The mapping is structural: flax param tree paths joined with '.' are the
torch module names, and layouts are inferred from leaf name + rank:

- ``kernel`` rank-4 (conv):        torch OIHW → flax HWIO
- ``kernel`` rank-4 + transposed:  torch IOHW → flax HWIO (ConvTranspose2d;
  our ConvTranspose2dTorch stores the un-flipped HWIO kernel)
- ``kernel`` rank-2 (dense):       torch (out,in) → flax (in,out)
- ``bias``/``scale``:              copied (scale ← torch ``weight`` of norms)

``import torch`` is deferred so the TPU compute path never depends on it.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Set

import jax.numpy as jnp
import numpy as np


def torch_to_flax_leaf(
    name: str, value: np.ndarray, transposed_conv: bool = False
) -> np.ndarray:
    v = np.asarray(value)
    if name == "kernel":
        if v.ndim == 4:
            if transposed_conv:
                # torch ConvTranspose2d: (in, out, kh, kw) → (kh, kw, in, out)
                return v.transpose(2, 3, 0, 1)
            # torch Conv2d: (out, in, kh, kw) → (kh, kw, in, out)
            return v.transpose(2, 3, 1, 0)
        if v.ndim == 2:
            return v.T
    return v


def flax_to_torch_leaf(
    name: str, value: np.ndarray, transposed_conv: bool = False
) -> np.ndarray:
    v = np.asarray(value)
    if name == "kernel":
        if v.ndim == 4:
            if transposed_conv:
                return v.transpose(2, 3, 0, 1)
            return v.transpose(3, 2, 0, 1)
        if v.ndim == 2:
            return v.T
    return v


_LEAF_TO_TORCH = {"kernel": "weight", "bias": "bias", "scale": "weight"}
_TORCH_TO_LEAF = {"weight": "kernel", "bias": "bias"}


def state_dict_to_params(
    state_dict: Mapping[str, Any],
    template: Mapping[str, Any],
    transposed_modules: Set[str] = frozenset(),
    prefix: str = "",
) -> Dict[str, Any]:
    """Fill a flax ``params`` template from a torch ``state_dict``.

    ``template`` is the (possibly nested) ``params`` tree from
    ``module.init`` — every leaf must have a matching
    ``{module.path}.{weight|bias}`` entry. Shapes are validated.
    ``transposed_modules`` lists module paths holding ConvTranspose2d
    weights (IOHW layout).
    """
    used: Set[str] = set()
    out = _fill(state_dict, template, prefix.rstrip("."), transposed_modules, used)
    return out


def _fill(
    sd: Mapping[str, Any],
    node: Mapping[str, Any],
    path: str,
    transposed: Set[str],
    used: Set[str],
) -> Dict[str, Any]:
    result: Dict[str, Any] = {}
    for k, v in node.items():
        sub = f"{path}.{k}" if path else k
        if isinstance(v, Mapping):
            result[k] = _fill(sd, v, sub, transposed, used)
        else:
            torch_key = f"{path}.{_LEAF_TO_TORCH.get(k, k)}" if path else k
            if torch_key not in sd:
                raise KeyError(
                    f"checkpoint is missing {torch_key!r} (for flax leaf {sub!r})"
                )
            used.add(torch_key)
            arr = torch_to_flax_leaf(
                k, _to_numpy(sd[torch_key]), transposed_conv=path in transposed
            )
            if tuple(arr.shape) != tuple(np.shape(v)):
                raise ValueError(
                    f"shape mismatch for {sub}: checkpoint {arr.shape} vs "
                    f"model {np.shape(v)}"
                )
            result[k] = jnp.asarray(arr)
    return result


def params_to_state_dict(
    params: Mapping[str, Any],
    transposed_modules: Set[str] = frozenset(),
    prefix: str = "",
) -> Dict[str, np.ndarray]:
    """Inverse direction (flax → torch naming), for round-trip tests and for
    exporting TPU-trained weights back to torch consumers."""
    out: Dict[str, np.ndarray] = {}

    def rec(node: Mapping[str, Any], path: str) -> None:
        for k, v in node.items():
            sub = f"{path}.{k}" if path else k
            if isinstance(v, Mapping):
                rec(v, sub)
            else:
                torch_key = f"{path}.{_LEAF_TO_TORCH.get(k, k)}"
                out[torch_key] = flax_to_torch_leaf(
                    k, np.asarray(v), transposed_conv=path in transposed_modules
                )

    rec(params, prefix.rstrip("."))
    return out


def load_pth(path: str) -> Dict[str, Any]:
    """Load a torch ``.pth`` file to a flat numpy state_dict (torch needed
    only here, at the conversion boundary)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    # released checkpoints may nest under a key like 'netG' / 'generator'
    if isinstance(obj, dict) and obj and not any(
        hasattr(v, "numpy") or isinstance(v, np.ndarray) for v in obj.values()
    ):
        for key in ("netG", "generator", "G", "model", "state_dict"):
            if key in obj:
                obj = obj[key]
                break
    return {k: _to_numpy(v) for k, v in obj.items()}


def load_generator_checkpoint(path: str, generator, example_state, example_image):
    """Load a generator checkpoint into ``generator``'s param tree.

    ``.pth`` = torch state_dict (converted); ``.pkl`` = pickled flax params
    as written by the train CLI. Returns ``{'params': ...}`` for ``apply``."""
    import jax

    if path.endswith(".pkl"):
        import pickle

        with open(path, "rb") as f:
            obj = pickle.load(f)
        params = obj["params"] if "params" in obj else obj
        return {"params": jax.tree_util.tree_map(jnp.asarray, params)}

    template = generator.init(
        jax.random.PRNGKey(0), example_state, example_image
    )["params"]
    sd = load_pth(path)
    params = state_dict_to_params(sd, template)
    return {"params": params}


def _to_numpy(v: Any) -> np.ndarray:
    if hasattr(v, "detach"):
        return v.detach().cpu().numpy()
    return np.asarray(v)
