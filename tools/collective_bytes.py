"""Collective-payload table: allgather vs routed exchange, n = 1..16.

Prints the per-shard interconnect bytes per train step for the
benchmark shape (global B=8192, F=26 sparse fields, D=16) — the
BASELINE.md stand-in for the unmeasurable real 1->N scaling curve —
plus a measured per-step wall time on the virtual CPU mesh for n=1..8.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python tools/collective_bytes.py [--measure]
"""
import argparse
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"   # virtual-mesh tool: never the tunnel
if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()

B_GLOBAL, F, D, V = 8192, 26, 16, 26 * 100_000


def fmt(n):
    if n >= 1 << 20:
        return f"{n / (1 << 20):.1f} MiB"
    if n >= 1 << 10:
        return f"{n / (1 << 10):.1f} KiB"
    return f"{n} B"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true",
                    help="also time lookup+update on the virtual mesh")
    ap.add_argument("--bench-shape", action="store_true",
                    help="measure at the production shape (global "
                         f"B={B_GLOBAL}, {B_GLOBAL * F} flat ids/step) "
                         "instead of the tiny 6,656-id probe")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from rec_now_tpu.embedding import ShardedEmbeddingTable
    from rec_now_tpu.parallel import make_mesh

    print(f"# shape: global B={B_GLOBAL}, F={F}, D={D} "
          f"(flat ids/step = {B_GLOBAL * F})")
    print("| n | flat/shard | allgather B/step/shard | routed B/step/shard "
          "| ratio |")
    print("|---|---|---|---|---|")
    rows = []
    for n in (1, 2, 4, 8, 16):
        if len(jax.devices()) < n:
            mesh = make_mesh(len(jax.devices()))
            t = ShardedEmbeddingTable(V, D, mesh)
            t.num_shards = n      # analytic only
        else:
            t = ShardedEmbeddingTable(V, D, make_mesh(n))
        bx = t.exchange_bytes(B_GLOBAL * F // n)
        ag, rt = bx["allgather"]["total"], bx["routed"]["total"]
        ratio = ag / rt if rt else float("inf")
        rows.append((n, bx))
        print(f"| {n} | {bx['flat_per_shard']} | {fmt(ag)} | {fmt(rt)} "
              f"| {ratio:.2f}x |")

    if not args.measure:
        return
    print("\n# measured virtual-mesh step times (CPU, compute-noisy; "
          "payload model above is the scaling evidence)")
    rng = np.random.default_rng(0)
    for n in (1, 2, 4, 8, 16):
        if len(jax.devices()) < n:
            break
        mesh = make_mesh(n)
        b_rows = B_GLOBAL if args.bench_shape else max(n * 8, 256)
        ids = jnp.asarray(rng.integers(
            0, V, size=(b_rows, F)).astype(np.int32))
        g = jnp.asarray(rng.normal(
            size=ids.shape + (D,)).astype(np.float32))
        for mode in ("allgather", "routed"):
            t = ShardedEmbeddingTable(V, D, mesh, route_mode=mode,
                                      update_mode="sparse")
            s = t.init(jax.random.PRNGKey(0))

            @jax.jit
            def step(s):
                rows_ = t.lookup(s, ids)
                return t.apply_grads(s, ids, rows_ * 0 + g, lr=0.05)

            s = step(s)
            jax.block_until_ready(s.table)
            t0 = time.perf_counter()
            for _ in range(5):
                s = step(s)
            jax.block_until_ready(s.table)
            dt = (time.perf_counter() - t0) / 5
            print(f"n={n} {mode:9s} lookup+update {dt * 1e3:7.2f} ms")


if __name__ == "__main__":
    sys.exit(main())
