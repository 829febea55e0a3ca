"""Test bootstrap: run everything on a simulated 8-device CPU mesh.

This is the TPU-native analog of the reference's "test without a cluster"
story (SURVEY §4): multi-chip sharding is validated on
``--xla_force_host_platform_device_count=8`` CPU devices, so CI needs no TPU.
Must run before jax initializes its backends, hence module-level in conftest.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin registers itself via sitecustomize before conftest
# runs, so the env var alone is not enough — force the platform through
# jax.config (must happen before any backend is initialized).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    The suite compiles hundreds of distinct XLA programs in one process;
    letting them all stay live grew the process to the point where a
    late compile (test_slac, ~87% in) segfaulted inside
    backend_compile_and_load on the CPU backend (observed twice, round
    4). Executables are never reused across modules, so freeing them
    costs nothing and bounds the accumulation."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def mesh8():
    from s2p_tpu.parallel import MeshSpec, make_mesh

    return make_mesh(MeshSpec(data=4, model=2))


@pytest.fixture()
def tmp_logdir(tmp_path):
    return str(tmp_path / "log")
