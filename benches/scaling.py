"""Distributed SpMM scaling harness: nnz/s at 1/2/4/8 row shards.

The harness BASELINE.json's ">=80% SpMV scaling efficiency on v5p-16"
target needs: strong-scaling throughput of the halo-exchange
row-partitioned SpMM (primme_tpu.distributed.HaloELLOperator) across a
1-D device mesh, reported as one JSON line per shard count with
efficiency vs the 1-shard run.

On a host with real multi-chip hardware (jax.devices() >= 2 on an
accelerator platform) the mesh rides ICI and the numbers are real; on a
single-chip or CPU host it falls back to the virtual 8-device CPU mesh
(--xla_force_host_platform_device_count), which validates the partition,
the halo contract and the harness itself — not ICI bandwidth.

Usage: python benches/scaling.py [n_grid_points_per_dim] [block_k]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    # The platform pin must precede any backend use (TPU plugins override
    # the JAX_PLATFORMS env var). Default: virtual 8-device CPU mesh;
    # set PTPU_SCALING_TPU=1 on a host with real multi-chip hardware.
    import jax
    if os.environ.get("PTPU_SCALING_TPU") != "1":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8")
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from benches.formats import build_27pt
    from primme_tpu.distributed import HaloELLOperator

    devs = jax.devices()
    A = build_27pt(m)
    n, nnz = A.shape[0], A.nnz
    rng = np.random.default_rng(0)
    X = rng.normal(size=(n, k)).astype(np.float32)

    base = None
    shard_counts = [p for p in (1, 2, 4, 8) if p <= len(devs)]
    for p in shard_counts:
        mesh = Mesh(np.array(devs[:p]), ("rows",))
        packed = HaloELLOperator.from_scipy(
            A.astype(np.float32), mesh, try_rcm=False)
        if packed is None:
            print(json.dumps({"metric": "spmm_scaling", "shards": p,
                              "error": "pack failed"}))
            continue
        op, _ = packed
        Xd = jax.device_put(X, NamedSharding(mesh, P("rows", None)))
        with mesh:
            f = jax.jit(op.matmat)
            f(Xd).block_until_ready()          # compile
            # sync per step: queueing many 8-participant programs can
            # starve the CPU backend's collective rendezvous when
            # devices > cores (virtual mesh); on real hardware the sync
            # costs ~us and the collective itself dominates anyway
            iters = 50
            t0 = time.perf_counter()
            Y = Xd
            for _ in range(iters):
                Y = f(Y)
                Y.block_until_ready()
            dt = (time.perf_counter() - t0) / iters
        gnnz = nnz * k / dt / 1e9
        if base is None:
            base = gnnz
        eff = gnnz / base
        print(json.dumps({
            "metric": "spmm_scaling", "shards": p, "n": n, "nnz": nnz,
            "halo": op.halo, "block_k": k, "ms_per_spmm": round(dt * 1e3, 4),
            "gnnz_s": round(gnnz, 4), "efficiency_vs_1shard": round(eff, 4),
            "platform": devs[0].platform}))


if __name__ == "__main__":
    main()
