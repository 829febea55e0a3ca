"""Gaussian ensemble dynamics model.

Capability contract (reference: /root/reference/gaussian_ensemble.py:21-106):
a 7-member ensemble of Swish MLPs over ``[obs ‖ act]`` predicting a diagonal
Normal over ``[next_obs ‖ reward]`` with

- batched per-member linear layers (torch: einsum over an (E, in, out)
  weight; here: a single einsum the MXU eats directly — same layout so the
  torch checkpoint converts without transposition),
- residual ("local") mean on the observation part (gaussian_ensemble.py:89-95),
- learned, soft-clamped logstd bounds (``soft_clamp``, :13-19, bounds init
  +1 / −5, :80-81),
- saved-weight checkpoint/rollback used for elite selection during training
  (``set_select``/``update_save``, :50-58) — functional here:
  ``save_members``/``restore_members`` operate on param pytrees.

Training (the reference checkout ships only the pretrained .pkl, not the
trainer): standard bootstrapped Gaussian-NLL with a logstd-bound penalty,
compiled into one jitted step.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


def soft_clamp(x: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """Clamp with gradients (reference gaussian_ensemble.py:13-19)."""
    x = hi - jax.nn.softplus(hi - x)
    x = lo + jax.nn.softplus(x - lo)
    return x


class EnsembleLinear(nn.Module):
    """All-member linear: x [B, in] or [E, B, in] → [E, B, out].

    Weight layout (E, in, out) matches the reference so torch state_dicts
    convert 1:1 (gaussian_ensemble.py:27-28); init is truncated normal with
    std 1/(2√in) (:30)."""

    in_features: int
    out_features: int
    ensemble_size: int = 7

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        std = 1.0 / (2.0 * self.in_features**0.5)
        w = self.param(
            "weight",
            lambda k, s: std * jax.random.truncated_normal(k, -2.0, 2.0, s),
            (self.ensemble_size, self.in_features, self.out_features),
        )
        b = self.param(
            "bias", nn.initializers.zeros_init(),
            (self.ensemble_size, 1, self.out_features),
        )
        if x.ndim == 2:
            y = jnp.einsum("ij,bjk->bik", x, w)
        else:
            y = jnp.einsum("bij,bjk->bik", x, w)
        return y + b


class EnsembleTransition(nn.Module):
    """obs_action [..., obs+act] → (mean, std) each [E, B, obs(+1)]."""

    obs_dim: int
    action_dim: int
    hidden_features: int = 256
    hidden_layers: int = 3
    ensemble_size: int = 7
    mode: str = "local"
    with_reward: bool = True

    @nn.compact
    def __call__(self, obs_action: jax.Array) -> Tuple[jax.Array, jax.Array]:
        out_dim = self.obs_dim + int(self.with_reward)
        h = obs_action
        for i in range(self.hidden_layers):
            in_f = (self.obs_dim + self.action_dim) if i == 0 else self.hidden_features
            h = EnsembleLinear(
                in_f, self.hidden_features, self.ensemble_size,
                name=f"backbones_{i}",
            )(h)
            h = h * jax.nn.sigmoid(h)  # Swish (gaussian_ensemble.py:9-11)
        out = EnsembleLinear(
            self.hidden_features, 2 * out_dim, self.ensemble_size,
            name="output_layer",
        )(h)
        mu, logstd = jnp.split(out, 2, axis=-1)
        max_logstd = self.param(
            "max_logstd", lambda k, s: jnp.ones(s), (out_dim,)
        )
        min_logstd = self.param(
            "min_logstd", lambda k, s: -5.0 * jnp.ones(s), (out_dim,)
        )
        logstd = soft_clamp(logstd, min_logstd, max_logstd)
        if self.mode == "local":
            # residual mean on the obs part: predicts s' directly
            prev_obs = obs_action[..., : self.obs_dim]
            if self.with_reward:
                mu = jnp.concatenate(
                    [mu[..., : self.obs_dim] + prev_obs, mu[..., self.obs_dim :]],
                    axis=-1,
                )
            else:
                mu = mu + prev_obs
        return mu, jnp.exp(logstd)


# -- elite bookkeeping (functional set_select/update_save) -------------------

def _is_member_leaf(path: Tuple) -> bool:
    leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    return leaf in ("weight", "bias")


def save_members(saved: Any, params: Any, indexes: Sequence[int]) -> Any:
    """saved[idx] ← params[idx] for every ensemble leaf
    (reference update_save, gaussian_ensemble.py:56-58)."""
    idx = jnp.asarray(indexes)

    def upd(path, s, p):
        if _is_member_leaf(path):
            return s.at[idx].set(p[idx])
        return s

    return jax.tree_util.tree_map_with_path(upd, saved, params)


def restore_members(params: Any, saved: Any, indexes: Sequence[int]) -> Any:
    """params[idx] ← saved[idx] (reference set_select, :50-54)."""
    return save_members(params, saved, indexes)


# -- training ---------------------------------------------------------------

def ensemble_nll_loss(
    model: EnsembleTransition,
    params: Any,
    obs_action: jax.Array,  # [B, obs+act] (shared) or [E, B, obs+act] (bootstrapped)
    target: jax.Array,  # [B, obs+1] or [E, B, obs+1]
    bound_penalty: float = 0.01,
) -> jax.Array:
    mu, std = model.apply(params, obs_action)
    var = std**2
    nll = jnp.mean(((mu - target) ** 2) / var + jnp.log(var))
    p = params["params"]
    penalty = jnp.sum(p["max_logstd"]) - jnp.sum(p["min_logstd"])
    return nll + bound_penalty * penalty


def make_ensemble_train_step(model: EnsembleTransition, lr: float = 1e-3):
    """Returns (init_state, step). step(state, obs_action, target) → state,
    loss — one jitted Adam NLL update over all members at once."""
    tx = optax.adam(lr)

    def init_state(rng: jax.Array):
        dummy = jnp.zeros((1, model.obs_dim + model.action_dim))
        params = model.init(rng, dummy)
        return params, tx.init(params)

    @jax.jit
    def step(params, opt_state, obs_action, target):
        loss, grads = jax.value_and_grad(
            lambda p: ensemble_nll_loss(model, p, obs_action, target)
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return init_state, step


# -- torch checkpoint conversion -------------------------------------------

def convert_ensemble_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """torch EnsembleTransition state_dict → flax variables.

    Layouts already agree (E, in, out); only names map:
    ``backbones.{i}.weight`` → ``backbones_{i}/weight``. ``saved_weight``/
    ``saved_bias`` (the torch-side elite snapshot) are returned separately
    under 'saved' when present."""
    params: Dict[str, Any] = {}
    saved: Dict[str, Any] = {}
    for k, v in state_dict.items():
        arr = jnp.asarray(np.asarray(v.detach().cpu() if hasattr(v, "detach") else v))
        parts = k.split(".")
        if parts[0] in ("max_logstd", "min_logstd"):
            params[parts[0]] = arr
            continue
        mod = f"{parts[0]}_{parts[1]}" if parts[0] == "backbones" else parts[0]
        leaf = parts[-1]
        target = saved if leaf.startswith("saved_") else params
        leaf = leaf.replace("saved_", "")
        target.setdefault(mod, {})[leaf] = arr
    out = {"params": params}
    if saved:
        out["saved"] = saved
    return out
