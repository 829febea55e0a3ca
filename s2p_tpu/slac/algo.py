"""SLAC algorithm wrapper: latent model + sequence replay + compiled steps.

Capability contract (reference: rlkit/torch/slac/algo.py:12-416):

- owns the LatentModel, its Adam optimizer, and the sequence buffer(s)
  (optionally a separate generated-data buffer, ``use_seperate_buffer``);
- ``update_latent``   — one ELBO gradient step on a sampled window batch
  (algo.py:116-124), jit-compiled end-to-end incl. on-device sampling;
- ``prepare_batch``   — encode a window, sample the posterior, return
  (z, next_z, action, feature_action, next_feature_action) for the RL
  trainers (algo.py:127-141); no gradients flow (stop_gradient);
- ``preprocess``      — feature_action for acting from a SlacObservation
  window (algo.py:75-81);
- ``load_data_in_buffer`` — offline HDF5 ingestion incl. the uncertainty-
  penalized generated data path (algo.py:154-416), delegated to the
  vectorized SlacReplayBuffer ingesters;
- ``save_model``/``load_latent`` — params pickle + released latent.pth
  conversion (algo.py:145-150, finetune_rl.py:146-150).

The reference's ``explore``/``exploit``/``update_sac`` reference a
``self.actor`` that does not exist in the checkout (dead paths,
algo.py:83-93) — intentionally not reproduced.
"""

from __future__ import annotations

import os
import os.path as osp
import pickle
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from s2p_tpu.data.hdf5 import load_augment_dataset, load_rl_dataset
from s2p_tpu.data.replay import SlacReplayBuffer, _gather_windows
from s2p_tpu.slac.latent import LatentModel, create_feature_actions
from s2p_tpu.utils.seeding import RngStream


class SlacAlgorithm:
    def __init__(
        self,
        action_dim: int,
        num_sequences: int = 8,
        buffer_size: int = 10**5,
        batch_size_latent: int = 32,
        lr_latent: float = 1e-4,
        feature_dim: int = 256,
        z1_dim: int = 32,
        z2_dim: int = 256,
        hidden_units: Tuple[int, int] = (256, 256),
        image_size: int = 64,
        channels: int = 3,
        use_seperate_buffer: bool = False,
        seed: int = 0,
    ) -> None:
        self.action_dim = action_dim
        self.num_sequences = num_sequences
        self.batch_size_latent = batch_size_latent
        self.image_size = image_size
        self.z_dim = z1_dim + z2_dim
        self.feature_dim = feature_dim
        self.rng = RngStream(seed)

        self.latent = LatentModel(
            action_dim=action_dim, feature_dim=feature_dim, z1_dim=z1_dim,
            z2_dim=z2_dim, hidden_units=tuple(hidden_units),
            image_size=image_size, channels=channels,
        )
        dummy_obs = jnp.zeros(
            (1, num_sequences + 1, image_size, image_size, channels)
        )
        dummy_act = jnp.zeros((1, num_sequences, action_dim))
        dummy_rew = jnp.zeros((1, num_sequences, 1))
        self.params = self.latent.init(
            self.rng.next("latent_init"), dummy_obs, dummy_act, dummy_rew,
            dummy_rew, self.rng.next("latent_noise"),
        )
        self.tx = optax.adam(lr_latent)
        self.opt_state = self.tx.init(self.params)
        self.learning_steps_latent = 0

        frame_shape = (image_size, image_size, channels)
        self.buffer = SlacReplayBuffer(
            buffer_size, num_sequences, frame_shape, action_dim
        )
        self.use_seperate_buffer = use_seperate_buffer
        self.buffer_gen = (
            SlacReplayBuffer(buffer_size, num_sequences, frame_shape, action_dim)
            if use_seperate_buffer
            else None
        )

    # -- compiled steps ----------------------------------------------------
    @partial(jax.jit, static_argnums=(0, 3))
    def _latent_step(self, params, opt_state, batch_size, buf_state, key):
        k_idx, k_noise = jax.random.split(key)
        idx = jax.random.randint(k_idx, (batch_size,), 0, buf_state["n"])
        obs, act, rew, done = _gather_windows(
            buf_state["frames"], buf_state["windows"], buf_state["actions"],
            buf_state["rewards"], buf_state["dones"], idx,
        )

        def loss_fn(p):
            kld, img, r = self.latent.apply(p, obs, act, rew, done, k_noise)
            return kld + img + r, (kld, img, r)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, aux

    @partial(jax.jit, static_argnums=(0, 3, 6))
    def _latent_scan(self, params, opt_state, batch_size, buf_state, key,
                     num_steps):
        """``num_steps`` ELBO updates as ONE compiled lax.scan with
        on-device window sampling — the pretraining analog of the RL
        train_many path (kills the per-step host dispatch the reference
        pays at slac/trainer.py:313-318)."""

        def body(carry, k):
            params, opt_state = carry
            params, opt_state, aux = self._latent_step(
                params, opt_state, batch_size, buf_state, k
            )
            return (params, opt_state), aux

        keys = jax.random.split(key, num_steps)
        (params, opt_state), aux = jax.lax.scan(
            body, (params, opt_state), keys
        )
        last = jax.tree_util.tree_map(lambda m: m[-1], aux)
        return params, opt_state, last

    @partial(jax.jit, static_argnums=(0,))
    def _prepare(self, params, obs, act, key):
        feature_ = self.latent.apply(params, obs, method=LatentModel.encode)
        z_ = self.latent.apply(
            params, feature_, act, key, method=LatentModel.latent_z
        )
        z, next_z = z_[:, -2], z_[:, -1]
        action = act[:, -1]
        fa, n_fa = create_feature_actions(feature_, act)
        return tuple(
            jax.lax.stop_gradient(t) for t in (z, next_z, action, fa, n_fa)
        )

    @partial(jax.jit, static_argnums=(0,))
    def _encode_window(self, params, frames, actions):
        """frames [S, H, W, C] uint8, actions [S-1?, A] → feature_action [1, ·]
        (reference preprocess, algo.py:75-81)."""
        obs = frames.astype(jnp.float32)[None] / 255.0
        feat = self.latent.apply(params, obs, method=LatentModel.encode)
        feat = feat.reshape(1, -1)
        return jnp.concatenate([feat, actions.reshape(1, -1)], axis=1)

    # -- public API --------------------------------------------------------
    def update_latent(self, buffer: Optional[SlacReplayBuffer] = None):
        """One ELBO step; returns dict of losses (host floats)."""
        buf = buffer or self.buffer
        self.learning_steps_latent += 1
        self.params, self.opt_state, (kld, img, rew) = self._latent_step(
            self.params, self.opt_state, self.batch_size_latent,
            buf.device_state(), self.rng.next("latent_update"),
        )
        return {
            "loss_kld": kld, "loss_image": img, "loss_reward": rew,
        }

    def update_latent_many(self, num_steps: int,
                           buffer: Optional[SlacReplayBuffer] = None):
        """``num_steps`` ELBO steps in one device program; returns the last
        step's losses."""
        buf = buffer or self.buffer
        self.params, self.opt_state, (kld, img, rew) = self._latent_scan(
            self.params, self.opt_state, self.batch_size_latent,
            buf.device_state(), self.rng.next("latent_update"), num_steps,
        )
        self.learning_steps_latent += num_steps
        return {"loss_kld": kld, "loss_image": img, "loss_reward": rew}

    def prepare_batch(self, obs: jax.Array, act: jax.Array):
        """(z, next_z, action, feature_action, next_feature_action)
        (reference algo.py:127-141)."""
        return self._prepare(self.params, obs, act, self.rng.next("prepare"))

    def preprocess(self, frames: np.ndarray, actions: np.ndarray) -> jax.Array:
        return self._encode_window(
            self.params, jnp.asarray(frames), jnp.asarray(actions)
        )

    @property
    def feature_action_dim(self) -> int:
        return (
            self.num_sequences * self.feature_dim
            + (self.num_sequences - 1) * self.action_dim
        )

    # -- offline ingestion -------------------------------------------------
    def load_data_in_buffer(
        self,
        h5f_r_name: str,
        data_num: Optional[int] = None,
        uncertainty_type: Optional[str] = None,
        uncertainty_penalty_lambda: Optional[float] = None,
        generated_for_slac: bool = False,
        data_mix_type: Optional[str] = None,
        savedir: Optional[str] = None,
    ) -> int:
        if data_num == 0:
            return 0
        if generated_for_slac and data_mix_type == "all_state_1step_random_action":
            ds = load_augment_dataset(h5f_r_name, data_num)
            buf = self.buffer_gen if self.use_seperate_buffer else self.buffer
            added = buf.ingest_generated(
                ds, uncertainty_type, uncertainty_penalty_lambda
            )
        else:
            ds = load_rl_dataset(h5f_r_name, data_num)
            added = self.buffer.ingest_real(ds)
            self.buffer.mark_real()
        if savedir is not None:
            os.makedirs(savedir, exist_ok=True)
            with open(osp.join(savedir, "buffer_meta.pkl"), "wb") as f:
                pickle.dump(dict(n=len(self.buffer), path=h5f_r_name), f)
        return added

    # -- persistence -------------------------------------------------------
    def save_model(self, save_dir: str) -> None:
        os.makedirs(save_dir, exist_ok=True)
        host = jax.device_get(self.params)
        with open(osp.join(save_dir, "latent.pkl"), "wb") as f:
            pickle.dump(host, f)
        with open(osp.join(save_dir, "encoder.pkl"), "wb") as f:
            pickle.dump({"params": host["params"]["encoder"]}, f)

    def load_latent(self, path: str) -> None:
        """latent.pkl (ours) or latent.pth (released torch weights)."""
        if path.endswith(".pth") or path.endswith(".pt"):
            from s2p_tpu.gan.convert import load_pth
            from s2p_tpu.slac.convert import convert_latent_state_dict

            self.params = convert_latent_state_dict(load_pth(path))
        else:
            with open(path, "rb") as f:
                obj = pickle.load(f)
            self.params = jax.tree_util.tree_map(jnp.asarray, obj)
        self.opt_state = self.tx.init(self.params)

    # -- trainer-protocol compatibility ------------------------------------
    def get_snapshot(self) -> Dict[str, Any]:
        return {"latent_params": jax.device_get(self.params)}

    def get_diagnostics(self) -> Dict[str, float]:
        d = {"latent_steps": float(self.learning_steps_latent)}
        d.update({f"buffer/{k}": v for k, v in self.buffer.get_diagnostics().items()})
        return d
