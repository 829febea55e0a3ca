"""SAC trainer — one compiled step.

Capability contract (reference: rlkit/torch/sac/sac.py:21-264): twin-Q soft
actor-critic with automatic entropy tuning (target entropy −|A|), losses
computed from one forward (α, policy, qf1, qf2 all updated per step), soft
target updates every ``target_update_period``. This is the trainer used to
build the original S2P datasets (SURVEY §2.2); online use pairs it with
OnlineRLAlgorithm/MdpStepCollector."""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from s2p_tpu.rl.critics import CriticSLAC, q_subtree, soft_update, with_q_params
from s2p_tpu.rl.policies import TanhGaussianPolicy


class TrainState(train_state.TrainState):
    pass


class SACTrainer:
    def __init__(
        self,
        policy: TanhGaussianPolicy,
        critic: CriticSLAC,
        obs_dim: int,
        action_dim: int,
        discount: float = 0.99,
        reward_scale: float = 1.0,
        policy_lr: float = 3e-4,
        qf_lr: float = 3e-4,
        soft_target_tau: float = 5e-3,
        target_update_period: int = 1,
        use_automatic_entropy_tuning: bool = True,
        target_entropy: Optional[float] = None,
        seed: int = 0,
    ) -> None:
        self.policy_module = policy
        self.critic_module = critic
        self.discount = discount
        self.reward_scale = reward_scale
        self.soft_target_tau = soft_target_tau
        self.target_update_period = target_update_period
        self.use_automatic_entropy_tuning = use_automatic_entropy_tuning
        self.target_entropy = (
            target_entropy if target_entropy is not None else -float(action_dim)
        )

        k_pi, k_q = jax.random.split(jax.random.PRNGKey(seed))
        p_params = policy.init(k_pi, jnp.zeros((1, obs_dim)))
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
        self.log_alpha = jnp.zeros(())
        self.alpha_tx = optax.adam(policy_lr)
        self.alpha_opt_state = self.alpha_tx.init(self.log_alpha)
        self._n_train_steps_total = 0
        self.eval_statistics: Dict[str, float] = {}
        self._need_stats = True
        self._rng = jax.random.PRNGKey(seed + 1)

    @partial(jax.jit, static_argnums=(0,))
    def _step(self, policy_state, critic_state, target_q, log_alpha,
              alpha_opt_state, batch, step, key):
        rewards = batch["rewards"].reshape(-1, 1)
        terminals = batch["terminals"].reshape(-1, 1)
        obs = batch["observations"]
        actions = batch["actions"]
        next_obs = batch["next_observations"]
        k1, k2 = jax.random.split(key)

        def sample(p_params, o, k):
            dist = self.policy_module.apply(p_params, o)
            a, lp = dist.sample_and_log_prob(k)
            return a, lp.reshape(-1, 1)

        _, log_pi_d = sample(policy_state.params, obs, k1)
        if self.use_automatic_entropy_tuning:
            def alpha_loss_fn(la):
                return -jnp.mean(
                    la * jax.lax.stop_gradient(log_pi_d + self.target_entropy)
                )

            alpha_loss, a_grad = jax.value_and_grad(alpha_loss_fn)(log_alpha)
            upd, alpha_opt_state = self.alpha_tx.update(
                a_grad, alpha_opt_state, log_alpha
            )
            log_alpha = optax.apply_updates(log_alpha, upd)
            alpha = jnp.exp(log_alpha)
        else:
            alpha_loss, alpha = jnp.float32(0.0), jnp.float32(1.0)

        def policy_loss_fn(p_params):
            new_a, log_pi = sample(p_params, obs, k1)
            q1, q2 = self.critic_module.apply(
                critic_state.params, obs, new_a, method=CriticSLAC.q_values
            )
            loss = jnp.mean(alpha * log_pi - jnp.minimum(q1, q2))
            return loss, log_pi

        (policy_loss, log_pi), p_grads = jax.value_and_grad(
            policy_loss_fn, has_aux=True
        )(policy_state.params)
        policy_state = policy_state.apply_gradients(grads=p_grads)

        new_next_a, new_log_pi = sample(policy_state.params, next_obs, k2)
        tq1, tq2 = self.critic_module.apply(
            with_q_params(critic_state.params, target_q), next_obs, new_next_a,
            method=CriticSLAC.q_values,
        )
        target_q_values = jnp.minimum(tq1, tq2) - alpha * new_log_pi
        q_target = jax.lax.stop_gradient(
            self.reward_scale * rewards
            + (1.0 - terminals) * self.discount * target_q_values
        )

        def critic_loss_fn(c_params):
            q1, q2 = self.critic_module.apply(
                c_params, obs, actions, method=CriticSLAC.q_values
            )
            qf1_loss = jnp.mean((q1 - q_target) ** 2)
            qf2_loss = jnp.mean((q2 - q_target) ** 2)
            return qf1_loss + qf2_loss, dict(
                qf1_loss=qf1_loss, qf2_loss=qf2_loss,
                q1_pred=jnp.mean(q1), q2_pred=jnp.mean(q2),
            )

        (critic_loss, caux), c_grads = jax.value_and_grad(
            critic_loss_fn, has_aux=True
        )(critic_state.params)
        critic_state = critic_state.apply_gradients(grads=c_grads)

        new_target = soft_update(
            target_q, q_subtree(critic_state.params), self.soft_target_tau
        )
        target_q = jax.tree_util.tree_map(
            lambda a, b: jnp.where(step % self.target_update_period == 0, a, b),
            new_target, target_q,
        )
        metrics = dict(
            policy_loss=policy_loss, alpha=alpha, alpha_loss=alpha_loss,
            log_pi=jnp.mean(log_pi), critic_loss=critic_loss, **caux,
        )
        return (policy_state, critic_state, target_q, log_alpha,
                alpha_opt_state, metrics)

    def train(self, batch: Dict[str, Any]) -> Dict[str, float]:
        self._rng, key = jax.random.split(self._rng)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        (self.policy_state, self.critic_state, self.target_q, self.log_alpha,
         self.alpha_opt_state, metrics) = self._step(
            self.policy_state, self.critic_state, self.target_q,
            self.log_alpha, self.alpha_opt_state, batch,
            jnp.uint32(self._n_train_steps_total), key,
        )
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
        return dict(
            policy_params=jax.device_get(self.policy_state.params),
            critic_params=jax.device_get(self.critic_state.params),
            target_q=jax.device_get(self.target_q),
            log_alpha=float(self.log_alpha),
        )

    @property
    def networks(self):
        return [self.policy_module, self.critic_module]
