"""A/B: XLA one-hot expand vs Pallas expand feeding the grad scatter.

VERDICT r4 next #5 / the r4 "layout copies" finding: the composed
scatter+pass costs ~1.5 ms more than its parts because XLA relayouts
the expand product before the scatter.  If a Pallas-materialized
operand (row-major, ops/pallas/expand_kernel.py) removes the
copy/transpose pairs, the composed time should drop toward
scatter(1.5) + pass(2.7) ~= 4.2 ms from the current ~5.7 ms.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_expand_scatter.py
"""
import json
import sys
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/tools")
from bench_util import scan_timeit

B, F, D = 8192, 26, 16
V = 26 * 100_000
STEPS = 20
REPS = 3




def main():
    from rec_now_tpu.embedding.sharded import ShardedEmbeddingTable
    from rec_now_tpu.ops.pallas.expand_kernel import expand_lines
    from rec_now_tpu.ops.pallas.table_update_kernel import (
        adagrad_dense_pass)
    from rec_now_tpu.parallel import make_mesh

    mesh = make_mesh(len(jax.devices()))
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, V, size=(B * F,)).astype(np.int32))
    grads = jnp.asarray(rng.randn(B * F, D).astype(np.float32) * 1e-3)

    table = ShardedEmbeddingTable(vocab_size=V, dim=D, mesh=mesh)
    st = table.init(jax.random.PRNGKey(0))
    pack = table.pack
    vp = V // pack

    # correctness: pallas expand == XLA expand
    pr_ref, lines_ref = table._expand(ids[:4096], grads[:4096])
    lines_pl = expand_lines(grads[:4096], ids[:4096] % pack, pack=pack,
                            dim=D, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(lines_pl),
                               np.asarray(lines_ref), rtol=1e-6)
    print("expand correctness: OK", flush=True)

    def composed_xla(c):
        t, a, s = c
        g_i = grads + s * 1e-30
        dense_g = table._scatter_dense_grads(t, ids, g_i)
        t2, a2 = adagrad_dense_pass(t, a, dense_g, lr=0.05, pack=pack,
                                    dim=D)
        return (t2, a2, s + jnp.sum(t2[:1]))

    def composed_pallas(c):
        t, a, s = c
        g_i = grads + s * 1e-30
        lines = expand_lines(g_i, ids % pack, pack=pack, dim=D,
                             out_dtype=jnp.bfloat16)
        pr = ids // pack
        dense_g = jnp.zeros((vp, pack * D), jnp.bfloat16).at[pr].add(
            lines)
        t2, a2 = adagrad_dense_pass(t, a, dense_g, lr=0.05, pack=pack,
                                    dim=D)
        return (t2, a2, s + jnp.sum(t2[:1]))

    results = {}
    for rep in range(REPS):
        results.setdefault("xla_expand", []).append(scan_timeit(
            f"[rep {rep}] XLA expand -> scatter -> pass",
            composed_xla, (st.table, st.accumulator, jnp.zeros(()))))
        results.setdefault("pallas_expand", []).append(scan_timeit(
            f"[rep {rep}] Pallas expand -> scatter -> pass",
            composed_pallas, (st.table, st.accumulator, jnp.zeros(()))))
    print(json.dumps({k: round(min(v), 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
