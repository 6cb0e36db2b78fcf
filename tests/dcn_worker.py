"""Worker process for the multi-process (DCN) smoke test.

Run as: python tests/dcn_worker.py COORD_ADDR NUM_PROCS PROC_ID

Exercises the pod-entry code path (`parallel.mesh.init_distributed`) that a
real multi-host slice would use: 2 processes x 4 CPU devices = one 8-device
global mesh, with a psum all-reduce (EM sufficient statistics pattern) and a
ppermute halo exchange (overlap-save pattern) crossing the process boundary.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()


def main(coord: str, num_procs: int, proc_id: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from jeicyboodsp_tpu.parallel.mesh import init_distributed

    init_distributed(coordinator=coord, num_processes=num_procs, process_id=proc_id)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from jeicyboodsp_tpu.parallel.halo import left_halo
    from jeicyboodsp_tpu.parallel.mesh import make_mesh

    n_global = len(jax.devices())
    assert n_global == 4 * num_procs, (n_global, num_procs)
    assert len(jax.local_devices()) == 4
    mesh = make_mesh((n_global,), ("time",))

    # global array: each process contributes its local shard
    T, W = n_global * 4, 8
    global_np = np.arange(T * W, dtype=np.float64).reshape(T, W)
    sharding = NamedSharding(mesh, P("time", None))
    x = jax.make_array_from_process_local_data(sharding, global_np[
        proc_id * (T // num_procs) : (proc_id + 1) * (T // num_procs)
    ])

    import functools

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=P("time", None),
                       out_specs=(P("time", None), P()))
    def run(local):
        halo = left_halo(local, 2, "time")  # ppermute across the DCN boundary
        total = jax.lax.psum(jnp.sum(local), "time")  # cross-process all-reduce
        return jnp.concatenate([halo, local], axis=0)[: local.shape[0]], total

    shifted, total = run(x)
    total_v = float(np.asarray(jax.device_get(total.addressable_data(0))))
    want_total = float(global_np.sum())
    assert abs(total_v - want_total) < 1e-9, (total_v, want_total)

    # halo correctness: row t of `shifted` is global row t-2 (0-fill at start)
    for s in shifted.addressable_shards:
        start = s.index[0].start or 0
        rows = np.asarray(s.data)
        for i, srow in enumerate(rows):
            g = start + i
            want = global_np[g - 2] if g >= 2 else np.zeros(W)
            np.testing.assert_array_equal(srow, want)

    print(f"DCN_OK proc={proc_id} devices={n_global} total={total_v}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
