"""Worker for the multi-process jax.distributed test (tests/test_parallel.py).

Launched N times by the test with a shared coordinator address. Executes the
REAL multi-host branch of s2p_tpu.parallel.distributed — the
``jax.distributed.initialize`` call, ``global_mesh`` across processes, a
cross-process collective, and ``host_local_batch_slice`` — on the CPU
backend with 4 virtual devices per process (the TPU-native analog of
"test multi-node without a cluster", SURVEY §4).

Prints one line: ``OK <pid> <local_devices> <global_devices> <sum> <lo> <hi>``.
"""

import os
import sys

import jax

# CPU platform + per-process virtual devices + gloo cross-process
# collectives. Must precede first backend use; the axon TPU plugin
# self-registers via sitecustomize, so the config call is required.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s2p_tpu.parallel.distributed import (  # noqa: E402
    global_mesh,
    host_local_batch_slice,
    initialize_distributed,
)


def main() -> None:
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    created = initialize_distributed(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert created is True, "multi-process branch must report True"
    assert jax.process_count() == nproc
    assert jax.process_index() == pid

    mesh = global_mesh(data=-1, model=1)
    assert mesh.shape["data"] == nproc * 4, mesh.shape

    # cross-process collective: each host contributes its process_index+1
    # over its local devices; the jitted global sum runs a real
    # cross-process psum under the hood and must see every host's data.
    from jax.sharding import NamedSharding, PartitionSpec as P

    global_batch = nproc * 4 * 2  # 2 rows per device
    sl = host_local_batch_slice(global_batch)
    per_host = global_batch // nproc
    assert sl == slice(pid * per_host, (pid + 1) * per_host), sl

    local = np.full((per_host, 3), float(pid + 1), np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", None)), local,
        global_shape=(global_batch, 3),
    )

    @jax.jit
    def total(x):
        return x.sum()

    got = float(total(arr))
    want = sum((i + 1) * per_host * 3 for i in range(nproc))
    assert got == want, (got, want)

    print(f"OK {pid} {jax.local_device_count()} {jax.device_count()} "
          f"{got} {sl.start} {sl.stop}", flush=True)


if __name__ == "__main__":
    main()
