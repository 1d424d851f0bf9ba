"""Probe: can the dense_g round trip be cut from the table update?

VERDICT r3 #2 names the grad-scatter -> optimizer-pass fusion as the
largest attackable engine term.  Before building a kernel, measure the
actual ceilings (everything scan-amortized, carry-dependent inputs so
XLA cannot hoist — see tools/roofline.py):

  1. baseline: dense-apply adagrad update end-to-end (current engine);
  2. per-occurrence sparse path (update_mode=sparse, dedup=False):
     narrow acc scatter + acc gather + direct table line scatter —
     no dense_g buffer at all (different-but-defensible semantics);
  3. synthetic 5-stream pallas pass at the adagrad pass's exact shape
     (3 wide reads + 2 writes): the REAL multi-stream HBM ceiling —
     if the current pass is at this ceiling, only byte cuts help;
  4. pass with dense_g read removed (hypothetical fused floor);
  5. adam variants of 1-2.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_fused_update.py
"""
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, F, D = 8192, 26, 16
V = 26 * 100_000
STEPS = 20

RESULTS = []


def timeit(name, step_fn, carry0, bytes_moved=None):
    @jax.jit
    def run(c0):
        def body(c, _):
            return step_fn(c), ()
        c, _ = jax.lax.scan(body, c0, None, length=STEPS)
        return jnp.sum(jax.tree_util.tree_leaves(c)[0])
    float(jax.device_get(run(carry0)))          # compile
    t0 = time.perf_counter()
    float(jax.device_get(run(carry0)))
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    entry = {"component": name, "ms": round(dt, 3)}
    extra = ""
    if bytes_moved:
        gbps = bytes_moved / (dt * 1e-3) / 1e9
        entry["bytes_mb"] = round(bytes_moved / 1e6, 1)
        entry["gbps"] = round(gbps, 1)
        extra = f"  {bytes_moved/1e6:8.1f} MB  {gbps:6.1f} GB/s"
    print(f"{name:52s} {dt:8.3f} ms{extra}", flush=True)
    RESULTS.append(entry)
    return dt


def _stream_kernel(a_ref, b_ref, c_ref, o1_ref, o2_ref):
    a = a_ref[...]
    b = b_ref[...]
    c = c_ref[...]
    o1_ref[...] = a - 0.05 * c * b
    o2_ref[...] = b + c * c


def synth_pass(t, a, g, tile):
    vp, w = t.shape
    spec = pl.BlockSpec((tile, w), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _stream_kernel, grid=(pl.cdiv(vp, tile),),
        in_specs=[spec, spec, spec], out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((vp, w), t.dtype),) * 2,
        input_output_aliases={0: 0, 1: 1},
    )(t, a, g)


def _stream2_kernel(a_ref, b_ref, o1_ref):
    o1_ref[...] = a_ref[...] - 0.05 * b_ref[...]


def synth_pass2(t, g, tile):
    """2 reads + 1 write (the fused-floor stream pattern)."""
    vp, w = t.shape
    spec = pl.BlockSpec((tile, w), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _stream2_kernel, grid=(pl.cdiv(vp, tile),),
        in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((vp, w), t.dtype),
        input_output_aliases={0: 0},
    )(t, g)


def main():
    from rec_now_tpu.embedding.sharded import ShardedEmbeddingTable
    from rec_now_tpu.parallel import make_mesh

    mesh = make_mesh(len(jax.devices()))
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, V, size=(B, F)).astype(np.int32))
    grads = jnp.asarray(rng.randn(B, F, D).astype(np.float32) * 1e-3)
    n_ids = B * F

    def dep(c):
        # non-foldable carry dependence (ADVICE r3)
        return jnp.minimum(c.astype(jnp.int32), 0)

    # 1/2: engine paths, adagrad
    for mode, dedup, tag in (("dense", True, "dense-apply (baseline)"),
                             ("sparse", False,
                              "sparse per-occurrence (no dense_g)"),
                             ("sparse", True,
                              "sparse exact (argsort dedup)")):
        table = ShardedEmbeddingTable(vocab_size=V, dim=D, mesh=mesh,
                                      update_mode=mode)
        st = table.init(jax.random.PRNGKey(0))

        def upd(c, table=table, dedup=dedup):
            s, tick = c
            ids_i = ids + dep(tick)
            s2 = table.apply_grads(s, ids_i, grads, lr=0.05, dedup=dedup)
            return (s2, tick + jnp.sum(s2.table[0, :1]) * 1e-30)
        timeit(f"adagrad update e2e: {tag}", upd,
               (st, jnp.zeros(())))
        del st

    # 3: synthetic stream ceilings at the pass shape
    table = ShardedEmbeddingTable(vocab_size=V, dim=D, mesh=mesh)
    pack = table.pack
    vp = table.vocab_size // pack
    w = pack * D
    t0_ = jnp.asarray(rng.randn(vp, w).astype(np.float32))
    a0 = jnp.abs(jnp.asarray(rng.randn(vp, w).astype(np.float32)))
    g0 = jnp.asarray(rng.randn(vp, w).astype(np.float32) * 1e-3)
    gb = g0.astype(jnp.bfloat16)
    for tile in (1024, 2048):
        def syn(c, tile=tile):
            t, a, s = c
            t2, a2 = synth_pass(t, a, g0 + s * 1e-30, tile)
            return (t2, a2, s + t2[0, 0] * 1e-30)
        timeit(f"synthetic 3r+2w f32 pass (tile {tile})", syn,
               (t0_, a0, jnp.zeros(())),
               bytes_moved=5 * vp * w * 4)

    def syn_bf(c):
        t, a, s = c
        t2, a2 = synth_pass(t, a, (gb + s.astype(jnp.bfloat16)
                                   * jnp.bfloat16(1e-8)), 1024)
        return (t2, a2, s + t2[0, 0].astype(jnp.float32) * 1e-30)
    timeit("synthetic 2rf32+1rbf16+2w pass (tile 1024)", syn_bf,
           (t0_, a0, jnp.zeros(())),
           bytes_moved=4 * vp * w * 4 + vp * w * 2)

    def syn2(c):
        t, s = c
        t2 = synth_pass2(t, g0 + s * 1e-30, 1024)
        return (t2, s + t2[0, 0] * 1e-30)
    timeit("synthetic 2r+1w f32 pass (fused floor shape)", syn2,
           (t0_, jnp.zeros(())), bytes_moved=3 * vp * w * 4)

    # 4: the real adagrad pass with / without the dense_g read
    from rec_now_tpu.ops.pallas.table_update_kernel import (
        adagrad_dense_pass)
    acc0 = jnp.abs(jnp.asarray(rng.randn(vp, pack).astype(np.float32)))

    def pass_with_g(c):
        t, a, s = c
        t2, a2 = adagrad_dense_pass(t, a, gb + s.astype(jnp.bfloat16)
                                    * jnp.bfloat16(1e-8),
                                    lr=0.05, pack=pack, dim=D)
        return (t2, a2, s + t2[0, 0] * 1e-30)
    timeit("adagrad pass (reads dense_g bf16)", pass_with_g,
           (t0_, acc0, jnp.zeros(())),
           bytes_moved=2 * vp * w * 4 + 2 * vp * pack * 4 + vp * w * 2)

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
