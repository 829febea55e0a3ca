"""SLAC actor-critic nets, trainer protocols, Serializable, profiling."""

import numpy as np

import jax
import jax.numpy as jnp

from s2p_tpu.core.trainer import LossFunction, Serializable, Trainer
from s2p_tpu.slac.networks import SlacGaussianPolicy, TwinnedQNetwork
from s2p_tpu.utils.profiling import annotate, time_compiled_fn


def test_slac_gaussian_policy():
    pol = SlacGaussianPolicy(action_dim=3, hidden_units=(16,))
    fa = jnp.asarray(np.random.RandomState(0).randn(4, 20), jnp.float32)
    params = pol.init(jax.random.PRNGKey(0), fa)
    det = pol.apply(params, fa)
    assert det.shape == (4, 3) and (np.abs(np.asarray(det)) < 1).all()
    a, log_pi = pol.apply(params, fa, jax.random.PRNGKey(1),
                          method=SlacGaussianPolicy.sample)
    assert a.shape == (4, 3) and log_pi.shape == (4, 1)
    dist = pol.apply(params, fa, method=SlacGaussianPolicy.dist)
    lp = dist.log_prob(a)
    assert np.isfinite(np.asarray(lp)).all()


def test_twinned_q_network():
    q = TwinnedQNetwork(hidden_units=(16,))
    z = jnp.zeros((4, 12))
    a = jnp.zeros((4, 3))
    params = q.init(jax.random.PRNGKey(0), z, a)
    q1, q2 = q.apply(params, z, a)
    assert q1.shape == q2.shape == (4, 1)
    # two independent towers
    assert "net1_fc0" in params["params"] and "net2_fc0" in params["params"]


class _Obj(Serializable):  # module level: pickle needs an importable class
    def __init__(self, a, b=2):
        self.quick_init(locals())
        self.a, self.b = a, b


def test_trainer_protocol_and_serializable():
    class T(Trainer, LossFunction):
        def train(self, data):
            return self.compute_loss(data)

        def compute_loss(self, batch, skip_statistics=False):
            return sum(batch)

    t = T()
    assert t.train([1, 2]) == 3
    assert t.get_snapshot() == {} and t.get_diagnostics() == {}

    o = _Obj(1, b=5)
    import pickle

    o2 = pickle.loads(pickle.dumps(o))
    assert o2.a == 1 and o2.b == 5
    o3 = _Obj.clone(o, b=9)
    assert o3.a == 1 and o3.b == 9


def test_time_compiled_fn():
    @jax.jit
    def f(x):
        return x * 2.0

    stats = time_compiled_fn(f, jnp.ones(8), iters=3)
    assert stats["compile_s"] > 0 and stats["calls_per_s"] > 0
    with annotate("region"):
        pass
