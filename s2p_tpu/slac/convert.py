"""latent.pth (torch SLAC checkpoint) → flax LatentModel params.

The reference releases pretrained SLAC weights loaded at
finetune_rl.py:146-150 (``latent.pth`` produced by slac/algo.py:145-150).
Torch module naming (latent.py):

- Gaussian heads:   ``{name}.net.{0,2,4}.weight/bias``  (Linear at even idx)
- encoder convs:    ``encoder.net.{0,2,4,...}.weight``  (Conv2d OIHW)
- decoder deconvs:  ``decoder.net.{0,2,4,...}.weight``  (ConvTranspose2d IOHW)
- aliases: ``z2_posterior*`` are the same tensors as ``z2_prior*``
  (latent.py:210-219) — skipped here; sharing is structural in the flax
  model.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

_GAUSSIAN_HEADS = (
    "z2_prior_init", "z1_prior", "z2_prior", "z1_posterior_init",
    "z1_posterior", "reward",
)
_SKIP_PREFIXES = ("z2_posterior_init.", "z2_posterior.", "z1_prior_init.")


def convert_latent_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Returns flax variables ``{'params': ...}`` for LatentModel."""
    params: Dict[str, Dict[str, Dict[str, jnp.ndarray]]] = {}

    def put(module: str, layer: str, leaf: str, arr: np.ndarray) -> None:
        params.setdefault(module, {}).setdefault(layer, {})[leaf] = jnp.asarray(arr)

    for key, v in state_dict.items():
        if any(key.startswith(p) for p in _SKIP_PREFIXES):
            continue
        arr = np.asarray(v.detach().cpu() if hasattr(v, "detach") else v)
        parts = key.split(".")
        module, seq_idx, leaf = parts[0], int(parts[2]), parts[3]
        layer_n = seq_idx // 2  # activations occupy odd Sequential slots
        if module in _GAUSSIAN_HEADS:
            if leaf == "weight":
                put(module, f"fc{layer_n}", "kernel", arr.T)
            else:
                put(module, f"fc{layer_n}", "bias", arr)
        elif module == "encoder":
            if leaf == "weight":  # OIHW → HWIO
                put(module, f"conv{layer_n}", "kernel", arr.transpose(2, 3, 1, 0))
            else:
                put(module, f"conv{layer_n}", "bias", arr)
        elif module == "decoder":
            if leaf == "weight":  # ConvTranspose2d IOHW → HWIO (un-flipped)
                put(module, f"deconv{layer_n}", "kernel", arr.transpose(2, 3, 0, 1))
            else:
                put(module, f"deconv{layer_n}", "bias", arr)
        else:
            raise KeyError(f"unexpected latent.pth key {key!r}")
    return {"params": params}
