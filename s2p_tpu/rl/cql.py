"""CQL trainer — SAC actor + conservative Q, one compiled step.

Capability contract (reference: rlkit/torch/sac/cql_trainer.py:14-746, image
/SLAC path :248-423; defaults from examples/iql/mujoco_finetune.py:120-159):

- SAC policy loss with automatic entropy α (:263-298); optional BC warmup
  for the first ``policy_eval_start`` steps (:283-292);
- twin-Q bellman target from policy next-actions, entropy-corrected unless
  ``deterministic_backup`` (:303-335);
- CQL penalty (:350-398): ``num_random`` uniform + current-policy +
  next-policy action Q evaluations; min_q_version==3 subtracts the
  importance densities; ``logsumexp/temp`` scaled by ``min_q_weight``,
  minus the dataset Q mean; optional Lagrange α′ (:387-395);
- reference update ORDER kept: α → policy → (critic with post-update
  policy's next actions) → soft target update.

The 30+1 extra critic evaluations batch into two fused (B·(3N+1)) matmuls —
the reference's most FLOP-heavy RL op rides the MXU in one call.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from s2p_tpu.rl.critics import CriticSLAC, q_subtree, soft_update, with_q_params
from s2p_tpu.rl.policies import TanhGaussianPolicy


class TrainState(train_state.TrainState):
    pass


class CQLTrainer:
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
        soft_target_tau: float = 5e-3,
        target_update_period: int = 1,
        use_automatic_entropy_tuning: bool = True,
        target_entropy: Optional[float] = None,
        policy_eval_start: int = 40_000,
        temp: float = 1.0,
        min_q_version: int = 3,
        min_q_weight: float = 5.0,
        with_lagrange: bool = False,
        lagrange_thresh: float = -1.0,
        num_random: int = 10,
        deterministic_backup: bool = False,
        slac_algo=None,
        slac_policy_input_type: str = "feature_action",
        slac_update_period: int = 1,
        freeze_slac: bool = False,
        seed: int = 0,
    ) -> None:
        self.policy_module = policy
        self.critic_module = critic
        self.action_dim = action_dim
        self.discount = discount
        self.reward_scale = reward_scale
        self.soft_target_tau = soft_target_tau
        self.target_update_period = target_update_period
        self.use_automatic_entropy_tuning = use_automatic_entropy_tuning
        self.target_entropy = (
            target_entropy if target_entropy is not None else -float(action_dim)
        )
        self.policy_eval_start = policy_eval_start
        self.temp = temp
        self.min_q_version = min_q_version
        self.min_q_weight = min_q_weight
        self.with_lagrange = with_lagrange
        self.target_action_gap = lagrange_thresh
        self.num_random = num_random
        self.deterministic_backup = deterministic_backup
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
        # α and α′ as scalar log-params with their own Adams
        self.log_alpha = jnp.zeros(())
        self.alpha_tx = optax.adam(policy_lr)
        self.alpha_opt_state = self.alpha_tx.init(self.log_alpha)
        self.log_alpha_prime = jnp.zeros(())
        self.alpha_prime_tx = optax.adam(qf_lr)
        self.alpha_prime_opt_state = self.alpha_prime_tx.init(self.log_alpha_prime)

        self._n_train_steps_total = 0
        self.eval_statistics: Dict[str, float] = {}
        self._need_stats = True
        self._rng = jax.random.PRNGKey(seed + 1)

    # -- helpers -----------------------------------------------------------
    def _policy_actions(self, p_params, obs, num_actions, key):
        """Tile obs, sample N actions + log π each (reference
        _get_policy_actions, cql_trainer.py:214-233)."""
        B, D = obs.shape
        tiled = jnp.repeat(obs[:, None, :], num_actions, axis=1).reshape(-1, D)
        dist = self.policy_module.apply(p_params, tiled)
        actions, log_pi = dist.sample_and_log_prob(key)
        return actions, log_pi.reshape(B, num_actions, 1)

    def _q_tiled(self, c_params, z, actions, num_repeat):
        """Q over tiled obs (reference _get_tensor_values, :193-212)."""
        B, D = z.shape
        tiled = jnp.repeat(z[:, None, :], num_repeat, axis=1).reshape(-1, D)
        q1, q2 = self.critic_module.apply(
            c_params, tiled, actions, method=CriticSLAC.q_values
        )
        return q1.reshape(B, num_repeat, 1), q2.reshape(B, num_repeat, 1)

    # -- compiled step -----------------------------------------------------
    @partial(jax.jit, static_argnums=(0, 9))
    def _step(self, policy_state, critic_state, target_q, log_alpha,
              alpha_opt_state, log_alpha_prime, alpha_prime_opt_state,
              batch, use_slac, step, key, slac_params=None):
        return self._step_body(
            policy_state, critic_state, target_q, log_alpha, alpha_opt_state,
            log_alpha_prime, alpha_prime_opt_state, batch, use_slac, step,
            key, slac_params,
        )

    def _step_body(self, policy_state, critic_state, target_q, log_alpha,
                   alpha_opt_state, log_alpha_prime, alpha_prime_opt_state,
                   batch, use_slac, step, key, slac_params=None):
        N = self.num_random
        rewards = batch["rewards"].reshape(-1, 1)
        terminals = batch["terminals"].reshape(-1, 1)
        actions = batch["actions"]
        keys = jax.random.split(key, 8)

        if use_slac:
            z, next_z, actions, fa, n_fa = self.slac_algo._prepare(
                slac_params, batch["observations"], actions, keys[0]
            )
            if self.slac_policy_input_type == "feature_action":
                policy_input, policy_next_input = fa, n_fa
            else:
                policy_input, policy_next_input = z, next_z
        else:
            z, next_z = batch["observations"], batch["next_observations"]
            policy_input, policy_next_input = z, next_z
        B = z.shape[0]

        # --- α and policy (reference order: α first, then policy) ---------
        def sample_current(p_params, k):
            dist = self.policy_module.apply(p_params, policy_input)
            a, lp = dist.sample_and_log_prob(k)
            return dist, a, lp.reshape(-1, 1)

        _, _, log_pi_for_alpha = sample_current(policy_state.params, keys[1])
        if self.use_automatic_entropy_tuning:
            def alpha_loss_fn(la):
                return -jnp.mean(
                    la * jax.lax.stop_gradient(
                        log_pi_for_alpha + self.target_entropy
                    )
                )

            alpha_loss, a_grad = jax.value_and_grad(alpha_loss_fn)(log_alpha)
            a_updates, alpha_opt_state = self.alpha_tx.update(
                a_grad, alpha_opt_state, log_alpha
            )
            log_alpha = optax.apply_updates(log_alpha, a_updates)
            alpha = jnp.exp(log_alpha)
        else:
            alpha_loss = jnp.float32(0.0)
            alpha = jnp.float32(1.0)

        def policy_loss_fn(p_params):
            dist, new_actions, log_pi = sample_current(p_params, keys[1])
            q1n, q2n = self.critic_module.apply(
                critic_state.params, z, new_actions, method=CriticSLAC.q_values
            )
            q_new = jnp.minimum(q1n, q2n)
            sac_loss = jnp.mean(alpha * log_pi - q_new)
            # BC warmup (reference :283-292)
            bc_logpp = dist.log_prob(actions).reshape(-1, 1)
            bc_loss = jnp.mean(alpha * log_pi - bc_logpp)
            loss = jnp.where(step < self.policy_eval_start, bc_loss, sac_loss)
            return loss, dict(policy_loss=loss, log_pi=jnp.mean(log_pi),
                              alpha=alpha, alpha_loss=alpha_loss)

        (policy_loss, paux), p_grads = jax.value_and_grad(
            policy_loss_fn, has_aux=True
        )(policy_state.params)
        policy_state = policy_state.apply_gradients(grads=p_grads)

        # --- critic (post-update policy for next actions, reference :303) --
        new_next_actions, new_log_pi = self._sample(
            policy_state.params, policy_next_input, keys[2]
        )
        tq1, tq2 = self.critic_module.apply(
            with_q_params(critic_state.params, target_q), next_z,
            new_next_actions, method=CriticSLAC.q_values,
        )
        target_q_values = jnp.minimum(tq1, tq2)
        if not self.deterministic_backup:
            target_q_values = target_q_values - alpha * new_log_pi
        q_target = jax.lax.stop_gradient(
            self.reward_scale * rewards
            + (1.0 - terminals) * self.discount * target_q_values
        )

        rand_actions = jax.random.uniform(
            keys[3], (B * N, self.action_dim), minval=-1.0, maxval=1.0
        )
        curr_actions, curr_log_pis = self._policy_actions(
            policy_state.params, policy_input, N, keys[4]
        )
        next_actions_t, next_log_pis = self._policy_actions(
            policy_state.params, policy_next_input, N, keys[5]
        )

        def critic_loss_fn(c_params, log_alpha_prime):
            q1_pred, q2_pred = self.critic_module.apply(
                c_params, z, actions, method=CriticSLAC.q_values
            )
            qf1_loss = jnp.mean((q1_pred - q_target) ** 2)
            qf2_loss = jnp.mean((q2_pred - q_target) ** 2)

            q1_rand, q2_rand = self._q_tiled(c_params, z, rand_actions, N)
            q1_curr, q2_curr = self._q_tiled(c_params, z, curr_actions, N)
            q1_next, q2_next = self._q_tiled(c_params, z, next_actions_t, N)

            if self.min_q_version == 3:
                random_density = np.log(0.5**self.action_dim)
                cat_q1 = jnp.concatenate([
                    q1_rand - random_density,
                    q1_next - jax.lax.stop_gradient(next_log_pis),
                    q1_curr - jax.lax.stop_gradient(curr_log_pis),
                ], axis=1)
                cat_q2 = jnp.concatenate([
                    q2_rand - random_density,
                    q2_next - jax.lax.stop_gradient(next_log_pis),
                    q2_curr - jax.lax.stop_gradient(curr_log_pis),
                ], axis=1)
            else:
                cat_q1 = jnp.concatenate(
                    [q1_rand, q1_pred[:, None], q1_next, q1_curr], axis=1
                )
                cat_q2 = jnp.concatenate(
                    [q2_rand, q2_pred[:, None], q2_next, q2_curr], axis=1
                )

            min_qf1 = (
                jax.scipy.special.logsumexp(cat_q1 / self.temp, axis=1).mean()
                * self.min_q_weight * self.temp
                - q1_pred.mean() * self.min_q_weight
            )
            min_qf2 = (
                jax.scipy.special.logsumexp(cat_q2 / self.temp, axis=1).mean()
                * self.min_q_weight * self.temp
                - q2_pred.mean() * self.min_q_weight
            )
            if self.with_lagrange:
                alpha_prime = jnp.clip(jnp.exp(log_alpha_prime), 0.0, 1e6)
                min_qf1 = alpha_prime * (min_qf1 - self.target_action_gap)
                min_qf2 = alpha_prime * (min_qf2 - self.target_action_gap)
            loss = qf1_loss + qf2_loss + min_qf1 + min_qf2
            aux = dict(
                qf1_loss=qf1_loss, qf2_loss=qf2_loss,
                min_qf1_loss=min_qf1, min_qf2_loss=min_qf2,
                q1_pred=jnp.mean(q1_pred), q2_pred=jnp.mean(q2_pred),
                q_target=jnp.mean(q_target),
                std_q1=jnp.mean(jnp.std(cat_q1, axis=1)),
            )
            return loss, aux

        (critic_loss, caux), (c_grads, ap_grad) = jax.value_and_grad(
            critic_loss_fn, argnums=(0, 1), has_aux=True
        )(critic_state.params, log_alpha_prime)
        critic_state = critic_state.apply_gradients(grads=c_grads)

        if self.with_lagrange:
            # α′ maximizes the (thresholded) penalty: ascend = negate grads
            ap_updates, alpha_prime_opt_state = self.alpha_prime_tx.update(
                jax.tree_util.tree_map(lambda g: -0.5 * g, ap_grad),
                alpha_prime_opt_state, log_alpha_prime,
            )
            log_alpha_prime = optax.apply_updates(log_alpha_prime, ap_updates)

        new_target = soft_update(
            target_q, q_subtree(critic_state.params), self.soft_target_tau
        )
        target_q = jax.tree_util.tree_map(
            lambda a, b: jnp.where(step % self.target_update_period == 0, a, b),
            new_target, target_q,
        )
        metrics = dict(critic_loss=critic_loss, **caux, **paux)
        if self.with_lagrange:
            # reference logs the dual under --with_lagrange
            # (cql_trainer.py:681 'Alpha_prime'): its trajectory is the
            # A/B evidence that the dual contains the dataset-Q drift
            metrics["alpha_prime"] = jnp.clip(
                jnp.exp(log_alpha_prime), 0.0, 1e6
            )
        return (policy_state, critic_state, target_q, log_alpha,
                alpha_opt_state, log_alpha_prime, alpha_prime_opt_state, metrics)

    def _sample(self, p_params, obs, key):
        dist = self.policy_module.apply(p_params, obs)
        a, lp = dist.sample_and_log_prob(key)
        return a, lp.reshape(-1, 1)

    # -- scanned multi-step training ---------------------------------------
    @partial(jax.jit, static_argnums=(0, 3, 4, 5))
    def _train_scan(self, carry0, slac, num_steps, batch_size, joint_latent,
                    buf_state, step0, key, buf_gen_state=None):
        """``num_steps`` CQL updates as ONE compiled lax.scan with on-device
        (optionally 50/50 real/generated) batch sampling."""
        from s2p_tpu.rl.scan_utils import make_window_sampler

        sample = make_window_sampler(buf_state, batch_size, buf_gen_state)

        def body(carry, inp):
            (policy_state, critic_state, target_q, log_alpha, alpha_opt,
             log_alpha_prime, alpha_prime_opt, slac_params, slac_opt) = carry
            i, key = inp
            k_batch, k_step, k_lat = jax.random.split(key, 3)
            batch = sample(k_batch)
            (policy_state, critic_state, target_q, log_alpha, alpha_opt,
             log_alpha_prime, alpha_prime_opt, metrics) = self._step_body(
                policy_state, critic_state, target_q, log_alpha, alpha_opt,
                log_alpha_prime, alpha_prime_opt, batch, True, step0 + i,
                k_step, slac_params,
            )
            if joint_latent:
                slac_params, slac_opt, lat_aux = self.slac_algo._latent_step(
                    slac_params, slac_opt, self.slac_algo.batch_size_latent,
                    buf_state, k_lat,
                )
                metrics = dict(metrics, loss_kld=lat_aux[0],
                               loss_image=lat_aux[1], loss_reward=lat_aux[2])
            return (policy_state, critic_state, target_q, log_alpha,
                    alpha_opt, log_alpha_prime, alpha_prime_opt, slac_params,
                    slac_opt), metrics

        slac_params, slac_opt = slac
        keys = jax.random.split(key, num_steps)
        steps = jnp.arange(num_steps, dtype=jnp.uint32)
        carry, metrics = jax.lax.scan(
            body, carry0 + (slac_params, slac_opt), (steps, keys)
        )
        last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        return carry, last

    @partial(jax.jit, static_argnums=(0, 2, 3))
    def _train_scan_state(self, carry0, num_steps, batch_size, buf_state,
                          step0, key):
        """State-RL scanned loop (reference cql_trainer.py:425-573 math via
        ``_step_body(use_slac=False)``): flat transition batches sampled on
        device from a SimpleReplayBuffer ``device_state()``."""
        from s2p_tpu.rl.scan_utils import make_flat_sampler

        sample = make_flat_sampler(buf_state, batch_size)

        def body(carry, inp):
            (policy_state, critic_state, target_q, log_alpha, alpha_opt,
             log_alpha_prime, alpha_prime_opt) = carry
            i, key = inp
            k_batch, k_step = jax.random.split(key)
            batch = sample(k_batch)
            (policy_state, critic_state, target_q, log_alpha, alpha_opt,
             log_alpha_prime, alpha_prime_opt, metrics) = self._step_body(
                policy_state, critic_state, target_q, log_alpha, alpha_opt,
                log_alpha_prime, alpha_prime_opt, batch, False, step0 + i,
                k_step,
            )
            return (policy_state, critic_state, target_q, log_alpha,
                    alpha_opt, log_alpha_prime, alpha_prime_opt), metrics

        keys = jax.random.split(key, num_steps)
        steps = jnp.arange(num_steps, dtype=jnp.uint32)
        carry, metrics = jax.lax.scan(body, carry0, (steps, keys))
        return carry, jax.tree_util.tree_map(lambda m: m[-1], metrics)

    def train_many(self, num_steps: int, batch_size: int,
                   buffer=None, buffer_gen=None) -> Dict[str, float]:
        if self.slac_algo is None:
            assert buffer is not None and buffer_gen is None
            self._rng, key = jax.random.split(self._rng)
            carry0 = (self.policy_state, self.critic_state, self.target_q,
                      self.log_alpha, self.alpha_opt_state,
                      self.log_alpha_prime, self.alpha_prime_opt_state)
            carry, metrics = self._train_scan_state(
                carry0, num_steps, batch_size, buffer.device_state(),
                jnp.uint32(self._n_train_steps_total), key,
            )
            (self.policy_state, self.critic_state, self.target_q,
             self.log_alpha, self.alpha_opt_state, self.log_alpha_prime,
             self.alpha_prime_opt_state) = carry
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
        carry0 = (self.policy_state, self.critic_state, self.target_q,
                  self.log_alpha, self.alpha_opt_state, self.log_alpha_prime,
                  self.alpha_prime_opt_state)
        carry, metrics = self._train_scan(
            carry0, (self.slac_algo.params, self.slac_algo.opt_state),
            num_steps, batch_size, joint_latent, buf.device_state(),
            jnp.uint32(self._n_train_steps_total), key,
            buffer_gen.device_state() if buffer_gen is not None else None,
        )
        (self.policy_state, self.critic_state, self.target_q, self.log_alpha,
         self.alpha_opt_state, self.log_alpha_prime, self.alpha_prime_opt_state,
         self.slac_algo.params, self.slac_algo.opt_state) = carry
        self._n_train_steps_total += num_steps
        if joint_latent:
            self.slac_algo.learning_steps_latent += num_steps
        if self._need_stats:
            self._need_stats = False
            self.eval_statistics = {
                k: float(v) for k, v in jax.device_get(metrics).items()
            }
        return metrics

    # -- trainer protocol --------------------------------------------------
    def train(self, batch: Dict[str, Any]) -> Dict[str, float]:
        use_slac = self.slac_algo is not None
        self._rng, key = jax.random.split(self._rng)
        slac_params = self.slac_algo.params if use_slac else None
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        (self.policy_state, self.critic_state, self.target_q, self.log_alpha,
         self.alpha_opt_state, self.log_alpha_prime,
         self.alpha_prime_opt_state, metrics) = self._step(
            self.policy_state, self.critic_state, self.target_q,
            self.log_alpha, self.alpha_opt_state, self.log_alpha_prime,
            self.alpha_prime_opt_state, batch, use_slac,
            jnp.uint32(self._n_train_steps_total), key, slac_params,
        )
        if (
            use_slac and not self.freeze_slac
            and self._n_train_steps_total % self.slac_update_period == 0
        ):
            metrics.update(self.slac_algo.update_latent())
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
            log_alpha=float(self.log_alpha),
        )
        if self.slac_algo is not None:
            snap["latent_params"] = jax.device_get(self.slac_algo.params)
        return snap

    # -- crash-recovery state (full optimizer + entropy-temperature state;
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
            log_alpha=self.log_alpha,
            alpha_opt=self.alpha_opt_state,
            log_alpha_prime=self.log_alpha_prime,
            alpha_prime_opt=self.alpha_prime_opt_state,
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
        self.log_alpha = jnp.asarray(s["log_alpha"])
        self.alpha_opt_state = s["alpha_opt"]
        self.log_alpha_prime = jnp.asarray(s["log_alpha_prime"])
        self.alpha_prime_opt_state = s["alpha_prime_opt"]
        self._rng = jnp.asarray(s["rng"])
        self._n_train_steps_total = int(s["n_train_steps"])
        if self.slac_algo is not None and "slac_params" in s:
            self.slac_algo.params = s["slac_params"]
            self.slac_algo.opt_state = s["slac_opt"]

    @property
    def networks(self):
        return [self.policy_module, self.critic_module]
