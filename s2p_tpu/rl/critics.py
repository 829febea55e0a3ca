"""Q/V critic networks.

Capability contract (reference: examples/iql/custom_networks.py): ``Qfunction``
/ ``Vfunction`` are Mlps over (pre-encoded) features (:21-50); ``CriticSLAC``
(:100-120) packs qf1/qf2/vf into one module evaluated over the SLAC latent z.

TPU design: target networks are not modules but a second param pytree for
the same module — the soft update is a ``tree_map`` lerp
(reference soft_update_from_to, rlkit/torch/pytorch_util.py:25-29), and
target evaluation is ``apply(target_params, ...)``. Fusing qf1+qf2+vf into
one param tree gives the reference's single fused critic optimizer
(iql_trainer.py:323-327) for free.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax

from s2p_tpu.nn.mlp import ConcatMlp, Mlp


class Qfunction(ConcatMlp):
    """Q(features, action) (reference custom_networks.py:21-33)."""


class Vfunction(Mlp):
    """V(features) (reference custom_networks.py:35-50)."""


class CriticSLAC(nn.Module):
    """Fused qf1/qf2/vf over pre-encoded z (reference :100-120).

    ``__call__(z, a)`` → (q1, q2, vf); ``value(z)`` → vf;
    ``q_values(z, a)`` → (q1, q2). Target q evaluation = apply the same
    module with the target param subtree.
    """

    hidden_sizes: Sequence[int] = (1024, 1024)
    hidden_activation: Callable = nn.relu

    def setup(self) -> None:
        kw = dict(hidden_sizes=self.hidden_sizes, output_size=1,
                  hidden_activation=self.hidden_activation)
        self.qf1 = Qfunction(**kw)
        self.qf2 = Qfunction(**kw)
        self.vf = Vfunction(**kw)

    def __call__(self, z: jax.Array, action: jax.Array):
        return self.qf1(z, action), self.qf2(z, action), self.vf(z)

    def q_values(self, z: jax.Array, action: jax.Array):
        return self.qf1(z, action), self.qf2(z, action)

    def value(self, z: jax.Array):
        return self.vf(z)


def soft_update(target_params: Any, online_params: Any, tau: float) -> Any:
    """target ← (1−τ)·target + τ·online (reference pytorch_util.py:25-29)."""
    return jax.tree_util.tree_map(
        lambda t, s: (1.0 - tau) * t + tau * s, target_params, online_params
    )


def q_subtree(critic_params: Any) -> Any:
    """The (qf1, qf2) subtree used for target networks."""
    p = critic_params["params"]
    return {"qf1": p["qf1"], "qf2": p["qf2"]}


def with_q_params(critic_params: Any, q_tree: Any) -> Any:
    """Rebuild full critic variables using target q params (vf irrelevant
    for target evaluation but must be present for apply)."""
    p = dict(critic_params["params"])
    p["qf1"] = q_tree["qf1"]
    p["qf2"] = q_tree["qf2"]
    return {"params": p}
