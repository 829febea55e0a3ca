"""IQL trainer — expectile-regression offline RL, one compiled step.

Capability contract (reference: rlkit/torch/sac/iql_trainer.py:22-492, image
/SLAC path :209-371; defaults from examples/iql/mujoco_finetune.py:91-119):

- SLAC path: ``prepare_batch`` (no-grad) → fused critic (q1, q2, tq1, tq2,
  vf) over z; ``q_target = scale·r + (1−d)·γ·V(next_z)`` (:237-242);
  expectile VF loss with ``quantile`` (:254-257); AWR policy loss
  ``−log π(a)·min(exp(adv/β), clip_score)`` (:304-315); single fused critic
  Adam (:323-327); soft target updates every ``target_update_period``
  (:361-371); optional reward/terminal LinearTransform (:218-222).
- state path (:276-301): identical math over raw observations with the
  fused critic (disjoint param groups ⇒ per-net Adams ≡ one fused Adam).

TPU-first: prepare_batch + both loss computations + both optimizer updates +
the periodic soft target update compile into ONE XLA program — the
reference pays ~6 kernel-launch groups and a host sync per step.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from s2p_tpu.rl.critics import CriticSLAC, q_subtree, soft_update, with_q_params
from s2p_tpu.rl.policies import TanhGaussianPolicy


class TrainState(train_state.TrainState):
    pass


def _periodic(pred, new_tree, old_tree):
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(pred, a, b), new_tree, old_tree
    )


class IQLTrainer:
    def __init__(
        self,
        policy: TanhGaussianPolicy,
        critic: CriticSLAC,
        obs_dim: int,
        policy_input_dim: int,
        action_dim: int,
        discount: float = 0.99,
        reward_scale: float = 1.0,
        policy_lr: float = 1e-4,
        qf_lr: float = 3e-4,
        quantile: float = 0.7,
        beta: float = 0.1,
        clip_score: Optional[float] = 100.0,
        soft_target_tau: float = 0.005,
        target_update_period: int = 2,
        policy_update_period: int = 1,
        q_update_period: int = 1,
        reward_transform: Optional[Tuple[float, float]] = None,  # (m, b)
        terminal_transform: Optional[Tuple[float, float]] = None,
        slac_algo=None,
        slac_policy_input_type: str = "feature_action",
        slac_update_period: int = 1,
        freeze_slac: bool = False,
        seed: int = 0,
    ) -> None:
        self.policy_module = policy
        self.critic_module = critic
        self.discount = discount
        self.reward_scale = reward_scale
        self.quantile = quantile
        self.beta = beta
        self.clip_score = clip_score
        self.soft_target_tau = soft_target_tau
        self.target_update_period = target_update_period
        self.policy_update_period = policy_update_period
        self.q_update_period = q_update_period
        self.reward_transform = reward_transform
        self.terminal_transform = terminal_transform
        self.slac_algo = slac_algo
        self.slac_policy_input_type = slac_policy_input_type
        self.slac_update_period = slac_update_period
        self.freeze_slac = freeze_slac

        k_pi, k_q = jax.random.split(jax.random.PRNGKey(seed))
        p_params = policy.init(k_pi, jnp.zeros((1, policy_input_dim)))
        c_params = critic.init(
            k_q, jnp.zeros((1, obs_dim)), jnp.zeros((1, action_dim))
        )
        self.policy_state = TrainState.create(
            apply_fn=policy.apply, params=p_params, tx=optax.adam(policy_lr)
        )
        self.critic_state = TrainState.create(
            apply_fn=critic.apply, params=c_params, tx=optax.adam(qf_lr)
        )
        self.target_q = q_subtree(c_params)
        self._n_train_steps_total = 0
        self.eval_statistics: Dict[str, float] = {}
        self._need_stats = True
        self._rng = jax.random.PRNGKey(seed + 1)

    # -- compiled step -----------------------------------------------------
    @partial(jax.jit, static_argnums=(0, 6))
    def _step(self, policy_state, critic_state, target_q, batch, step, use_slac,
              slac_params=None, key=None):
        return self._step_body(policy_state, critic_state, target_q, batch,
                               step, use_slac, slac_params, key)

    def _step_body(self, policy_state, critic_state, target_q, batch, step,
                   use_slac, slac_params=None, key=None):
        rewards = batch["rewards"].reshape(-1, 1)
        terminals = batch["terminals"].reshape(-1, 1)
        actions = batch["actions"]
        if self.reward_transform is not None:
            m, b = self.reward_transform
            rewards = m * rewards + b
        if self.terminal_transform is not None:
            m, b = self.terminal_transform
            terminals = m * terminals + b

        if use_slac:
            z, next_z, actions, fa, n_fa = self.slac_algo._prepare(
                slac_params, batch["observations"], actions, key
            )
            policy_input = fa if self.slac_policy_input_type == "feature_action" else z
        else:
            z, next_z = batch["observations"], batch["next_observations"]
            policy_input = z

        def critic_loss_fn(c_params):
            q1, q2, vf = self.critic_module.apply(c_params, z, actions)
            next_vf = self.critic_module.apply(
                c_params, next_z, method=CriticSLAC.value
            )
            q_target = jax.lax.stop_gradient(
                self.reward_scale * rewards
                + (1.0 - terminals) * self.discount * next_vf
            )
            qf1_loss = jnp.mean((q1 - q_target) ** 2)
            qf2_loss = jnp.mean((q2 - q_target) ** 2)
            tq1, tq2 = self.critic_module.apply(
                with_q_params(c_params, target_q), z, actions,
                method=CriticSLAC.q_values,
            )
            q_pred = jax.lax.stop_gradient(jnp.minimum(tq1, tq2))
            vf_err = vf - q_pred
            vf_sign = (vf_err > 0).astype(jnp.float32)
            vf_weight = (1 - vf_sign) * self.quantile + vf_sign * (1 - self.quantile)
            vf_loss = jnp.mean(vf_weight * vf_err**2)
            loss = qf1_loss + qf2_loss + vf_loss
            aux = dict(
                qf1_loss=qf1_loss, qf2_loss=qf2_loss, vf_loss=vf_loss,
                q1_pred=jnp.mean(q1), q2_pred=jnp.mean(q2),
                q_target=jnp.mean(q_target), vf_pred=jnp.mean(vf),
                adv=q_pred - jax.lax.stop_gradient(vf),
            )
            return loss, aux

        (critic_loss, caux), c_grads = jax.value_and_grad(
            critic_loss_fn, has_aux=True
        )(critic_state.params)

        adv = caux.pop("adv")

        def policy_loss_fn(p_params):
            dist = self.policy_module.apply(p_params, policy_input)
            logpp = dist.log_prob(actions)  # [B], summed over action dim
            exp_adv = jnp.exp(adv / self.beta)
            if self.clip_score is not None:
                exp_adv = jnp.minimum(exp_adv, self.clip_score)
            weights = jax.lax.stop_gradient(exp_adv[:, 0])
            loss = jnp.mean(-logpp * weights)
            return loss, dict(policy_loss=loss, policy_logpp=jnp.mean(logpp),
                              awr_weights=jnp.mean(weights))

        (policy_loss, paux), p_grads = jax.value_and_grad(
            policy_loss_fn, has_aux=True
        )(policy_state.params)

        new_critic = critic_state.apply_gradients(grads=c_grads)
        critic_state = _periodic(
            step % self.q_update_period == 0, new_critic, critic_state
        )
        new_policy = policy_state.apply_gradients(grads=p_grads)
        policy_state = _periodic(
            step % self.policy_update_period == 0, new_policy, policy_state
        )
        new_target = soft_update(
            target_q, q_subtree(critic_state.params), self.soft_target_tau
        )
        target_q = _periodic(
            step % self.target_update_period == 0, new_target, target_q
        )
        metrics = dict(critic_loss=critic_loss, **caux, **paux)
        return policy_state, critic_state, target_q, metrics

    # -- scanned multi-step training ---------------------------------------
    @partial(jax.jit, static_argnums=(0, 5, 6, 7))
    def _train_scan(self, policy_state, critic_state, target_q, slac,
                    num_steps, batch_size, joint_latent, buf_state, step0, key,
                    buf_gen_state=None):
        """``num_steps`` IQL updates as ONE compiled lax.scan with on-device
        batch sampling (SURVEY §7: kill the per-step host dispatch; the
        reference pays a host round-trip per gradient step,
        slac/buffer.py:153-167). ``slac`` = (params, opt_state) carried so
        the joint latent update (iql_trainer.py:348-350) runs in-scan; with
        ``buf_gen_state`` batches are 50/50 real/generated."""
        from s2p_tpu.rl.scan_utils import make_window_sampler

        sample = make_window_sampler(buf_state, batch_size, buf_gen_state)

        def body(carry, inp):
            policy_state, critic_state, target_q, slac_params, slac_opt = carry
            i, key = inp
            k_batch, k_prep, k_lat = jax.random.split(key, 3)
            batch = sample(k_batch)
            policy_state, critic_state, target_q, metrics = self._step_body(
                policy_state, critic_state, target_q, batch, step0 + i,
                True, slac_params, k_prep,
            )
            if joint_latent:
                slac_params, slac_opt, lat_aux = self.slac_algo._latent_step(
                    slac_params, slac_opt, self.slac_algo.batch_size_latent,
                    buf_state, k_lat,
                )
                metrics = dict(metrics, loss_kld=lat_aux[0],
                               loss_image=lat_aux[1], loss_reward=lat_aux[2])
            return (policy_state, critic_state, target_q, slac_params,
                    slac_opt), metrics

        slac_params, slac_opt = slac
        keys = jax.random.split(key, num_steps)
        steps = jnp.arange(num_steps, dtype=jnp.uint32)
        carry, metrics = jax.lax.scan(
            body, (policy_state, critic_state, target_q, slac_params, slac_opt),
            (steps, keys),
        )
        last_metrics = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        return carry, last_metrics

    @partial(jax.jit, static_argnums=(0, 4, 5))
    def _train_scan_state(self, policy_state, critic_state, target_q,
                          num_steps, batch_size, buf_state, step0, key):
        """State-RL scanned loop: flat transition batches sampled on device
        from a SimpleReplayBuffer state."""
        from s2p_tpu.rl.scan_utils import make_flat_sampler

        sample = make_flat_sampler(buf_state, batch_size)

        def body(carry, inp):
            policy_state, critic_state, target_q = carry
            i, key = inp
            batch = sample(key)
            policy_state, critic_state, target_q, metrics = self._step_body(
                policy_state, critic_state, target_q, batch, step0 + i, False,
            )
            return (policy_state, critic_state, target_q), metrics

        keys = jax.random.split(key, num_steps)
        steps = jnp.arange(num_steps, dtype=jnp.uint32)
        carry, metrics = jax.lax.scan(
            body, (policy_state, critic_state, target_q), (steps, keys)
        )
        return carry, jax.tree_util.tree_map(lambda m: m[-1], metrics)

    def train_many(self, num_steps: int, batch_size: int,
                   buffer=None, buffer_gen=None) -> Dict[str, float]:
        """Run ``num_steps`` updates in one device program. SLAC path:
        window sampling (+ optional 50/50 generated buffer, in-scan latent
        updates). State path (no slac_algo): flat sampling from a
        SimpleReplayBuffer ``device_state()``."""
        if self.slac_algo is None:
            assert buffer is not None and buffer_gen is None
            self._rng, key = jax.random.split(self._rng)
            carry, metrics = self._train_scan_state(
                self.policy_state, self.critic_state, self.target_q,
                num_steps, batch_size, buffer.device_state(),
                jnp.uint32(self._n_train_steps_total), key,
            )
            self.policy_state, self.critic_state, self.target_q = carry
            self._n_train_steps_total += num_steps
            if self._need_stats:
                self._need_stats = False
                self.eval_statistics = {
                    k: float(v) for k, v in jax.device_get(metrics).items()
                }
            return metrics
        buf = buffer or self.slac_algo.buffer
        self._rng, key = jax.random.split(self._rng)
        joint_latent = not self.freeze_slac and self.slac_update_period == 1
        carry, metrics = self._train_scan(
            self.policy_state, self.critic_state, self.target_q,
            (self.slac_algo.params, self.slac_algo.opt_state),
            num_steps, batch_size, joint_latent, buf.device_state(),
            jnp.uint32(self._n_train_steps_total), key,
            buffer_gen.device_state() if buffer_gen is not None else None,
        )
        (self.policy_state, self.critic_state, self.target_q,
         self.slac_algo.params, self.slac_algo.opt_state) = carry
        self._n_train_steps_total += num_steps
        self.slac_algo.learning_steps_latent += num_steps if joint_latent else 0
        if self._need_stats:
            self._need_stats = False
            self.eval_statistics = {
                k: float(v) for k, v in jax.device_get(metrics).items()
            }
        return metrics

    # -- trainer protocol --------------------------------------------------
    def train(self, batch: Dict[str, Any]) -> Dict[str, float]:
        use_slac = self.slac_algo is not None
        key = None
        slac_params = None
        if use_slac:
            self._rng, key = jax.random.split(self._rng)
            slac_params = self.slac_algo.params
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        (self.policy_state, self.critic_state, self.target_q, metrics) = self._step(
            self.policy_state, self.critic_state, self.target_q, batch,
            jnp.uint32(self._n_train_steps_total), use_slac, slac_params, key,
        )
        if (
            use_slac
            and not self.freeze_slac
            and self._n_train_steps_total % self.slac_update_period == 0
        ):
            latent_losses = self.slac_algo.update_latent()
            metrics.update(latent_losses)
        self._n_train_steps_total += 1
        if self._need_stats:
            self._need_stats = False
            self.eval_statistics = {
                k: float(v) for k, v in jax.device_get(metrics).items()
            }
        return metrics

    def end_epoch(self, epoch: int) -> None:
        self._need_stats = True

    def get_diagnostics(self) -> Dict[str, float]:
        d = dict(self.eval_statistics)
        d["num train calls"] = float(self._n_train_steps_total)
        return d

    def get_snapshot(self) -> Dict[str, Any]:
        snap = dict(
            policy_params=jax.device_get(self.policy_state.params),
            critic_params=jax.device_get(self.critic_state.params),
            target_q=jax.device_get(self.target_q),
        )
        if self.slac_algo is not None:
            snap["latent_params"] = jax.device_get(self.slac_algo.params)
        return snap

    # -- crash-recovery state (full optimizer state, unlike get_snapshot;
    # consumed by the --resume_dir orbax checkpoints, SURVEY §5.3) ---------
    def full_state(self) -> Dict[str, Any]:
        s = dict(
            policy_params=self.policy_state.params,
            policy_opt=self.policy_state.opt_state,
            policy_step=self.policy_state.step,
            critic_params=self.critic_state.params,
            critic_opt=self.critic_state.opt_state,
            critic_step=self.critic_state.step,
            target_q=self.target_q,
            rng=self._rng,
            n_train_steps=jnp.int32(self._n_train_steps_total),
        )
        if self.slac_algo is not None:
            s["slac_params"] = self.slac_algo.params
            s["slac_opt"] = self.slac_algo.opt_state
        return s

    def load_full_state(self, s: Dict[str, Any]) -> None:
        self.policy_state = self.policy_state.replace(
            params=s["policy_params"], opt_state=s["policy_opt"],
            step=s["policy_step"],
        )
        self.critic_state = self.critic_state.replace(
            params=s["critic_params"], opt_state=s["critic_opt"],
            step=s["critic_step"],
        )
        self.target_q = s["target_q"]
        self._rng = jnp.asarray(s["rng"])
        self._n_train_steps_total = int(s["n_train_steps"])
        if self.slac_algo is not None and "slac_params" in s:
            self.slac_algo.params = s["slac_params"]
            self.slac_algo.opt_state = s["slac_opt"]

    @property
    def networks(self):
        return [self.policy_module, self.critic_module]
