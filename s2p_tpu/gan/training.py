"""S2P GAN training — alternating G/D updates in one compiled step.

Reference surface: ``train.py --dataroot=./datasets/cheetah.hdf5
--env_type=cheetah --netG=s2p --batchSize=16`` (/root/reference/README.md:59).
Losses per rebuttal.md:71,130-138 + BASELINE.json: hinge adversarial +
feature matching + L1 + VGG perceptual.

TPU-first: the D update and the G update are a single jitted function —
the generator forward is computed once for the D step and once (with
gradients) for the G step, and XLA schedules both on-device with no host
sync between them. Batches enter as uint8 and are normalized to [-1, 1]
inside the step (keeps host→device traffic at 1 byte/pixel). Data
parallelism = shard the batch dim over the mesh 'data' axis; gradient
psums are inserted by XLA from the shardings (SURVEY §5.8).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from s2p_tpu.gan.discriminator import MultiscaleDiscriminator
from s2p_tpu.gan.generator import S2PGenerator
from s2p_tpu.gan.losses import (
    GANLossConfig,
    feature_matching_loss,
    hinge_d_loss,
    hinge_g_loss,
    l1_loss,
    logits_of,
    r1_penalty,
)
from s2p_tpu.gan.perceptual import PerceptualLoss


class TrainState(train_state.TrainState):
    pass


@dataclasses.dataclass(frozen=True)
class GANOptConfig:
    """SPADE-style TTUR defaults (G slower than D)."""

    g_lr: float = 1e-4
    d_lr: float = 4e-4
    beta1: float = 0.0
    beta2: float = 0.999


@dataclasses.dataclass(eq=False)  # identity hash so jit can treat self static
class GANTrainer:
    """Owns G/D modules + states and the compiled train step."""

    generator: S2PGenerator
    discriminator: MultiscaleDiscriminator
    g_state: TrainState
    d_state: TrainState
    perceptual: Optional[PerceptualLoss]
    loss_cfg: GANLossConfig
    # mixed precision: params stay fp32 (optimizer state too); forwards/
    # backwards run in compute_dtype (bf16 rides the MXU at 2x); losses and
    # grads accumulate in fp32 — bf16 needs no loss scaling.
    compute_dtype: Any = jnp.float32
    # adaptive D cadence: update D only every k-th step (G updates every
    # step). 1 = reference behavior. >1 starves a dominant discriminator.
    d_every: int = 1

    @classmethod
    def create(
        cls,
        rng: jax.Array,
        state_dim: int,
        image_size: int = 64,
        channels: int = 3,
        generator_kwargs: Optional[Dict[str, Any]] = None,
        discriminator_kwargs: Optional[Dict[str, Any]] = None,
        opt_cfg: GANOptConfig = GANOptConfig(),
        loss_cfg: GANLossConfig = GANLossConfig(),
        use_perceptual: bool = True,
        vgg_variables: Any = None,
        compute_dtype: Any = jnp.float32,
        d_every: int = 1,
    ) -> "GANTrainer":
        gen = S2PGenerator(image_size=image_size, out_channels=channels,
                           **(generator_kwargs or {}))
        disc = MultiscaleDiscriminator(**(discriminator_kwargs or {}))
        g_rng, d_rng, v_rng = jax.random.split(rng, 3)
        s = jnp.zeros((1, state_dim), jnp.float32)
        img = jnp.zeros((1, image_size, image_size, channels), jnp.float32)
        g_params = gen.init(g_rng, s, img)
        d_params = disc.init(d_rng, s, img, img)
        g_state = TrainState.create(
            apply_fn=gen.apply, params=g_params,
            tx=optax.adam(opt_cfg.g_lr, b1=opt_cfg.beta1, b2=opt_cfg.beta2),
        )
        d_state = TrainState.create(
            apply_fn=disc.apply, params=d_params,
            tx=optax.adam(opt_cfg.d_lr, b1=opt_cfg.beta1, b2=opt_cfg.beta2),
        )
        perceptual = None
        if use_perceptual:
            perceptual = PerceptualLoss(
                vgg_variables, image_shape=(image_size, image_size, channels),
                seed=int(jax.random.randint(v_rng, (), 0, 2**31 - 1)),
            )
        return cls(gen, disc, g_state, d_state, perceptual, loss_cfg,
                   compute_dtype, d_every=max(int(d_every), 1))

    # -- compiled step ----------------------------------------------------
    def _update(
        self,
        g_state: TrainState,
        d_state: TrainState,
        batch: Dict[str, jax.Array],
        axis_name: Optional[str] = None,
    ) -> Tuple[TrainState, TrainState, Dict[str, jax.Array]]:
        """One D+G update (traceable body shared by _step and _many).

        ``axis_name``: when running per-device under shard_map, gradients
        (and metrics) are pmean'd over that mesh axis before the optimizer
        applies them — the scanned-data-parallel path (train_many_dp)."""
        dt = self.compute_dtype
        if axis_name is not None:
            sync = lambda t: jax.lax.pmean(t, axis_name)
            # constants in cond branches must match the data-dependent
            # branch's varying-axes type under shard_map
            vary = lambda t: jax.lax.pvary(t, (axis_name,))
        else:
            sync = vary = lambda t: t
        prev = _to_signed(batch["prev_image"]).astype(dt)
        real = _to_signed(batch["target_image"]).astype(dt)
        state = batch["state"].astype(dt)
        cfg = self.loss_cfg
        cast = lambda p: jax.tree_util.tree_map(lambda x: x.astype(dt), p)

        # --- D update (G frozen) ---
        fake = jax.lax.stop_gradient(
            self.generator.apply(cast(g_state.params), state, prev)
        )
        # lazy-R1 schedule keys off the D step counter, which increments
        # only on actual D updates — so with d_every > 1 the penalty still
        # fires every r1_interval-th PERFORMED update and the StyleGAN2
        # interval scaling below stays exact (gating on g_state.step would
        # fire only every lcm(r1_interval, d_every) G-steps while still
        # scaling by r1_interval, silently weakening effective R1)
        r1_interval = max(int(cfg.r1_interval), 1)
        do_r1 = (d_state.step % r1_interval) == 0

        def d_loss_fn(d_params):
            d_params = cast(d_params)
            rf = self.discriminator.apply(d_params, state, prev, real)
            ff = self.discriminator.apply(d_params, state, prev, fake)
            f32 = lambda t: t.astype(jnp.float32)
            loss = hinge_d_loss(
                [f32(x) for x in logits_of(rf)], [f32(x) for x in logits_of(ff)]
            )
            r1 = jnp.float32(0.0)
            if cfg.r1_gamma > 0.0:
                # per-sample MEAN over patch logits (matching hinge_d_loss's
                # mean normalization), batch-summed so grad(img) carries each
                # sample's own logit gradient. Summing raw patch logits
                # instead scales the penalty by the patch count (~180x at
                # 100px/2 scales) and crushes D to a constant function.
                def real_logit_mean(img):
                    feats = logits_of(
                        self.discriminator.apply(d_params, state, prev, img)
                    )
                    per_sample = sum(
                        jnp.mean(x.astype(jnp.float32),
                                 axis=tuple(range(1, x.ndim)))
                        for x in feats
                    ) / len(feats)  # [B]
                    return jnp.sum(per_sample)

                def compute_r1():
                    return r1_penalty(jax.grad(real_logit_mean)(real))

                # cond so the double-backprop FLOPs are only paid on the
                # lazy steps; grads flow through cond to d_params
                r1 = jax.lax.cond(do_r1, compute_r1,
                                  lambda: vary(jnp.float32(0.0)))
                loss = loss + (0.5 * cfg.r1_gamma * r1_interval) * r1
            return loss, (r1,)

        def d_update(d_st):
            (d_l, (r1,)), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(d_st.params)
            return d_st.apply_gradients(grads=sync(d_grads)), d_l, r1

        if self.d_every > 1:
            do_d = (g_state.step % self.d_every) == 0
            d_state, d_loss, d_r1 = jax.lax.cond(
                do_d, d_update,
                lambda d_st: (d_st, vary(jnp.float32(0.0)),
                              vary(jnp.float32(0.0))),
                d_state,
            )
        else:
            d_state, d_loss, d_r1 = d_update(d_state)

        # --- G update (D frozen, post-update D params) ---
        def g_loss_fn(g_params):
            fake = self.generator.apply(cast(g_params), state, prev)
            d_cast = cast(d_state.params)
            ff = self.discriminator.apply(d_cast, state, prev, fake)
            rf = self.discriminator.apply(d_cast, state, prev, real)
            f32 = lambda t: t.astype(jnp.float32)
            adv = hinge_g_loss([f32(x) for x in logits_of(ff)])
            fm = feature_matching_loss(
                [[f32(x) for x in fs] for fs in rf],
                [[f32(x) for x in fs] for fs in ff],
            )
            l1 = l1_loss(f32(fake), f32(real))
            loss = cfg.lambda_gan * adv + cfg.lambda_feat * fm + cfg.lambda_l1 * l1
            vgg = jnp.float32(0.0)
            if self.perceptual is not None:
                vgg = self.perceptual(f32(fake), f32(real))
                loss = loss + cfg.lambda_vgg * vgg
            aux = dict(g_adv=adv, g_fm=fm, g_l1=l1, g_vgg=vgg)
            return loss, aux

        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            g_state.params
        )
        g_state = g_state.apply_gradients(grads=sync(g_grads))

        metrics = dict(d_loss=d_loss, g_loss=g_loss, **aux)
        if self.loss_cfg.r1_gamma > 0.0:
            metrics["d_r1"] = d_r1
        return g_state, d_state, sync(metrics)

    @partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
    def _step(
        self,
        g_state: TrainState,
        d_state: TrainState,
        batch: Dict[str, jax.Array],
    ) -> Tuple[TrainState, TrainState, Dict[str, jax.Array]]:
        return self._update(g_state, d_state, batch)

    def train_step(self, batch: Dict[str, Any]) -> Dict[str, jax.Array]:
        self.g_state, self.d_state, metrics = self._step(
            self.g_state, self.d_state, batch
        )
        return metrics

    # -- scanned multi-step path -------------------------------------------
    # The per-step path pays one host→device dispatch per update — through a
    # remote/tunneled runtime that dominates wall-clock (round-1 measured
    # ~55x for the analogous RL loops). Here the FULL dataset lives on
    # device (uint8 frames; 50k 100px pairs ≈ 3 GB) and K D+G updates with
    # in-scan uniform batch sampling compile into ONE lax.scan dispatch.
    # Sampling is with-replacement uniform (identical in expectation to the
    # reference's epoch shuffle over a 50k-pair epoch).
    @partial(jax.jit, static_argnums=(0, 5, 6), donate_argnums=(1, 2))
    def _many(
        self,
        g_state: TrainState,
        d_state: TrainState,
        data: Dict[str, jax.Array],
        key: jax.Array,
        num_steps: int,
        batch_size: int,
    ) -> Tuple[TrainState, TrainState, Dict[str, jax.Array]]:
        n = data["state"].shape[0]

        def body(carry, k):
            g, d = carry
            idx = jax.random.randint(k, (batch_size,), 0, n)
            batch = {name: jnp.take(arr, idx, axis=0)
                     for name, arr in data.items()}
            g, d, m = self._update(g, d, batch)
            return (g, d), m

        keys = jax.random.split(key, num_steps)
        (g_state, d_state), ms = jax.lax.scan(body, (g_state, d_state), keys)
        # mean over the chunk (host reads one scalar per metric per chunk)
        metrics = jax.tree_util.tree_map(lambda x: x.mean(), ms)
        return g_state, d_state, metrics

    def train_many(
        self,
        data: Dict[str, Any],
        key: jax.Array,
        num_steps: int,
        batch_size: int,
    ) -> Dict[str, jax.Array]:
        """Run ``num_steps`` D+G updates in one compiled call, sampling
        batches on-device from ``data`` (device-resident uint8 arrays with
        the same keys as ``train_step`` batches)."""
        self.g_state, self.d_state, metrics = self._many(
            self.g_state, self.d_state, data, key, num_steps, batch_size
        )
        return metrics

    # -- scanned data-parallel path ---------------------------------------
    # shard_map instead of pjit sharding annotations: NamedSharding-
    # annotated scan carries trip XLA's SPMD partitioner into pathological
    # compiles for conv bodies (measured round 2). shard_map writes the
    # per-device program explicitly — dataset rows live sharded over the
    # 'data' axis, each device samples its own sub-batch per scan step,
    # and the in-scan grad pmean rides ICI. Params stay replicated.
    def train_many_dp(
        self,
        mesh,
        data: Dict[str, jax.Array],
        key: jax.Array,
        num_steps: int,
        batch_size: int,
    ) -> Dict[str, jax.Array]:
        """``num_steps`` D+G updates in one compiled call, data-parallel
        over ``mesh``'s 'data' axis. ``data`` rows must divide over the
        axis; ``batch_size`` is the GLOBAL batch (split across devices)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = mesh.shape["data"]
        assert batch_size % n_dev == 0, (batch_size, n_dev)
        per_dev = batch_size // n_dev
        sharded = NamedSharding(mesh, P("data"))
        data = {k: jax.device_put(v, sharded) for k, v in data.items()}

        # stable mesh descriptor, NOT id(mesh): a GC'd mesh's id can be
        # reused by a new Mesh object, which would return a shard_map
        # closure bound to the dead mesh
        mesh_desc = (tuple(sorted(mesh.shape.items())),
                     tuple(d.id for d in mesh.devices.flat))
        cache_key = (mesh_desc, num_steps, per_dev)
        cached = getattr(self, "_dp_fns", None)
        if cached is None:
            cached = self._dp_fns = {}
        if cache_key in cached:
            self.g_state, self.d_state, metrics = cached[cache_key](
                self.g_state, self.d_state, data, key
            )
            return metrics

        def local_run(g_state, d_state, shard, key):
            key = jax.random.fold_in(key, jax.lax.axis_index("data"))
            n_local = shard["state"].shape[0]

            def body(carry, k):
                g, d = carry
                idx = jax.random.randint(k, (per_dev,), 0, n_local)
                batch = {name: jnp.take(arr, idx, axis=0)
                         for name, arr in shard.items()}
                g, d, m = self._update(g, d, batch, axis_name="data")
                return (g, d), m

            keys = jax.random.split(key, num_steps)
            (g_state, d_state), ms = jax.lax.scan(
                body, (g_state, d_state), keys
            )
            return g_state, d_state, jax.tree_util.tree_map(
                lambda x: x.mean(), ms
            )

        fn = jax.jit(jax.shard_map(
            local_run, mesh=mesh,
            in_specs=(P(), P(), P("data"), P()),
            out_specs=(P(), P(), P()),
        ))
        cached[cache_key] = fn
        self.g_state, self.d_state, metrics = fn(
            self.g_state, self.d_state, data, key
        )
        return metrics

    # -- inference --------------------------------------------------------
    def generate(self, state: jax.Array, prev_image: jax.Array) -> jax.Array:
        return self.generator.apply(self.g_state.params, state, prev_image)


def _to_signed(img: jax.Array) -> jax.Array:
    """uint8 [0,255] or float [-1,1] → float32 [-1,1]."""
    if img.dtype == jnp.uint8:
        return img.astype(jnp.float32) / 127.5 - 1.0
    return img.astype(jnp.float32)
