"""A/B the Pallas DMA gather vs jnp.take at the bench shape.

VERDICT r4 next #3.  Scan-amortized, carry-dependent probe bodies
(same harness discipline as tools/roofline.py).  Interleaved A/B reps
per the measurement memory: tunnel weather swings 2-4x between
sessions, so only same-session alternating runs compare.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_gather_pallas.py
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
    from rec_now_tpu.ops.pallas.gather_kernel import packed_gather
    from rec_now_tpu.parallel import make_mesh

    mesh = make_mesh(len(jax.devices()))
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, V, size=(B * F,)).astype(np.int32))

    table = ShardedEmbeddingTable(vocab_size=V, dim=D, mesh=mesh)
    st = table.init(jax.random.PRNGKey(0))
    pack = table.pack
    print(f"pack={pack} lines={st.table.shape} ids={ids.shape[0]}")

    # correctness first
    ref = table._fetch_rows(st.table, ids[:4096])
    got = packed_gather(st.table, ids[:4096], pack=pack, dim=D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6)
    print("correctness vs _fetch_rows: OK", flush=True)

    def take_probe(c):
        s = c
        ids_i = ids + jnp.minimum(s.astype(jnp.int32), 0)
        return s + jnp.sum(table._fetch_rows(st.table, ids_i)) * 1e-20

    def make_pallas_probe(chunk):
        def pallas_probe(c):
            s = c
            ids_i = ids + jnp.minimum(s.astype(jnp.int32), 0)
            out = packed_gather(st.table, ids_i, pack=pack, dim=D,
                                chunk=chunk)
            return s + jnp.sum(out) * 1e-20
        return pallas_probe

    results = {}
    for rep in range(REPS):
        results.setdefault("take", []).append(
            scan_timeit(f"[rep {rep}] jnp.take + one-hot select",
                   take_probe, jnp.zeros(())))
        for chunk in (1024, 2048):
            results.setdefault(f"pallas{chunk}", []).append(
                scan_timeit(f"[rep {rep}] pallas DMA gather chunk={chunk}",
                       make_pallas_probe(chunk), jnp.zeros(())))
    print(json.dumps({k: round(min(v), 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
