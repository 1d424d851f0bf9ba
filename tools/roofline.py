"""Per-component roofline at the bench shape (B=8192, F=26, D=16).

Decomposes the shared embedding-engine floor (VERDICT r2 #2: every
config pays ~19 ms/step; config #1's FM compute is trivial, so nearly
all of its step is lookup + table update + wire) into scan-amortized
component times, and compares each against this rig's measured ceilings:

* HBM stream:   ~344 GB/s (measured at 256-512 MB working sets,
  tools/micro_hbm.py — the r1 108 GB/s figure was dispatch-dominated;
  BASELINE.md "HBM ceiling correction")
* host->device: ~87 MB/s axon tunnel

Each component runs as a STEPS-long on-device ``lax.scan`` so per-call
dispatch (~1-1.5 ms over the tunnel) is amortized — unlike
micro_config3.py, whose per-call numbers carry that overhead.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/roofline.py
"""
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

B, F, D = 8192, 26, 16
V = 26 * 100_000
STEPS = 20
HBM_GBPS = 344.0
WIRE_MBPS = 87.0

RESULTS = []


def timeit(name, step_fn, carry0, bytes_moved=None):
    """Scan-amortized ms/step; prints vs the HBM ceiling."""
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
    sol = ""
    entry = {"component": name, "ms": round(dt, 3)}
    if bytes_moved is not None:
        floor_ms = bytes_moved / (HBM_GBPS * 1e9) * 1e3
        entry["bytes_mb"] = round(bytes_moved / 1e6, 1)
        entry["hbm_floor_ms"] = round(floor_ms, 3)
        entry["pct_of_sol"] = round(100 * floor_ms / dt, 1)
        sol = (f"  {bytes_moved/1e6:8.1f} MB  floor {floor_ms:6.2f} ms"
               f"  ({entry['pct_of_sol']:5.1f}% of s-o-l)")
    print(f"{name:44s} {dt:8.3f} ms{sol}", flush=True)
    RESULTS.append(entry)
    return dt


def main():
    from rec_now_tpu.embedding.sharded import ShardedEmbeddingTable
    from rec_now_tpu.parallel import make_mesh

    mesh = make_mesh(len(jax.devices()))
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, V, size=(B, F)).astype(np.int32))
    grads = jnp.asarray(rng.randn(B, F, D).astype(np.float32) * 1e-3)

    table = ShardedEmbeddingTable(vocab_size=V, dim=D, mesh=mesh)
    st = table.init(jax.random.PRNGKey(0))
    pack = table.pack
    vp = table.vocab_size // pack
    n_ids = B * F                                   # 212,992 flat ids
    table_mb = vp * pack * D * 4
    acc_mb = vp * pack * 4

    # --- lookup: N random 512 B packed-line gathers + select ------------
    # NOTE on probe validity: every probe must (a) make its inputs
    # depend on the scan carry and (b) feed its outputs back into the
    # carry — otherwise the body is loop-invariant and XLA's while-loop
    # LICM hoists the whole computation out of the scan, measuring
    # nothing (symptom: "faster than the HBM floor").  The carried
    # scalar `s` provides the data dependence; its runtime value is
    # irrelevant, but the dependence must be one XLA cannot fold away
    # statically: `s % 1` simplifies to constant 0 in the algebraic
    # simplifier (ADVICE r3), re-hoisting the gather.  min(s, 0) == 0
    # at runtime (s >= 0) yet is unprovable at compile time — same
    # trick as the float `+ s * 1e-30` used below.
    def lookup_probe(c):
        s = c[1]
        ids_i = ids + jnp.minimum(s.astype(jnp.int32), 0)
        return (c[0], s + jnp.sum(table.lookup(c[0], ids_i)) * 1e-20)
    timeit("lookup (gather 213k packed lines)",
           lookup_probe, (st, jnp.zeros(())),
           bytes_moved=n_ids * pack * D * 4)

    # --- update decomposition -------------------------------------------
    flat_rows = (ids.reshape(-1) // table.num_shards)

    def scatter_only(c):
        buf, s = c
        g_i = (grads + s * 1e-30).reshape(-1, D).astype(jnp.bfloat16)
        pr, lines = table._expand(flat_rows, g_i)
        out = jnp.zeros((vp, pack * D), jnp.bfloat16).at[pr].add(lines)
        return (buf, s + jnp.sum(out[:1].astype(jnp.float32)))
    timeit("grad scatter (zero-fill + 213k line RMW)",
           scatter_only, (jnp.zeros(()), jnp.zeros(())),
           bytes_moved=(vp * pack * D * 2          # zero-fill write
                        + n_ids * pack * D * 2 * 2))  # RMW r+w bf16

    dense_g = jnp.zeros((vp, pack * D), jnp.bfloat16).at[
        table._expand(flat_rows, grads.reshape(-1, D)
                      .astype(jnp.bfloat16))[0]].add(
        table._expand(flat_rows,
                      grads.reshape(-1, D).astype(jnp.bfloat16))[1])

    def pass_only(c):
        t, a = c
        from rec_now_tpu.ops.pallas.table_update_kernel import (
            adagrad_dense_pass)
        return adagrad_dense_pass(t, a, dense_g, lr=0.05, pack=pack, dim=D)
    timeit("adagrad dense pass (table+acc r/w, g read)",
           pass_only, (st.table, st.accumulator),
           bytes_moved=(2 * table_mb + 2 * acc_mb
                        + vp * pack * D * 2))

    def update_full(c):
        s2 = table.apply_grads(c, ids, grads, lr=0.05)
        return s2
    timeit("table update end-to-end",
           update_full, st,
           bytes_moved=(vp * pack * D * 2 + n_ids * pack * D * 2 * 2
                        + 2 * table_mb + 2 * acc_mb + vp * pack * D * 2))

    def lookup_update(c):
        emb = table.lookup(c, ids)
        return table.apply_grads(c, ids, emb * 1e-6, lr=0.05)
    timeit("lookup + update chained", lookup_update, st)

    # --- wire (analytic) --------------------------------------------------
    wire_bytes = B * 88                      # compressed wire B/example
    wire_ms = wire_bytes / (WIRE_MBPS * 1e6) * 1e3
    print(f"{'wire (88 B/ex @ 87 MB/s, overlapped)':44s} "
          f"{wire_ms:8.3f} ms  (analytic; hidden by pipelining when "
          f"< compute)")
    RESULTS.append({"component": "wire (analytic, overlapped)",
                    "ms": round(wire_ms, 3)})

    # --- per-config towers + losses fwd+bwd (no embedding engine) -------
    from rec_now_tpu.models import (FMModel, DCNv2Model, XDeepFMModel,
                                    MultiTaskModel, FeatureConfig)
    from rec_now_tpu.training import Trainer, TrainerConfig

    fc = FeatureConfig(num_dense=13, num_sparse=F, rows_per_field=100_000,
                       embedding_dim=D)
    dense_x = jnp.asarray(rng.randn(B, 13).astype(np.float32))
    emb = jnp.asarray(rng.randn(B, F, D).astype(np.float32) * 0.1)
    labels = jnp.asarray((rng.rand(B) < 0.3).astype(np.float32))
    groups = jnp.asarray(rng.randint(0, 2000, B).astype(np.int32))
    cvr = jnp.asarray((rng.rand(B) < 0.1).astype(np.float32))
    domain = jnp.zeros((B,), jnp.int32)

    from rec_now_tpu.models import CANDCNModel
    configs = [
        ("1 FM towers+losses", FMModel(),
         TrainerConfig(pointwise_weight=1.0)),
        ("2 DCNv2+SENET towers+losses", DCNv2Model(),
         TrainerConfig(pointwise_weight=1.0)),
        ("3 xDeepFM towers+losses", XDeepFMModel(),
         TrainerConfig(pointwise_weight=1.0, pairwise_weight=1.0,
                       click_occurance_power=-0.5)),
        ("4 MMoE+PLE+STAR towers+losses", MultiTaskModel(num_task=2),
         TrainerConfig(pointwise_weight=1.0, listwise_weight=0.5,
                       num_tasks=2)),
        ("5 CAN+DCNv2 towers+losses", CANDCNModel(),
         TrainerConfig(pointwise_weight=1.0, pairwise_weight=0.5,
                       can_param_field=8, can_dnn_dims=(16,))),
    ]
    for name, model, cfg in configs:
        tr = Trainer(model, fc, cfg, mesh=mesh)
        if tr.can_table is not None:
            can_emb = jnp.asarray(rng.randn(
                B, tr.can_table.dim).astype(np.float32) * 0.1)
            params = model.init(jax.random.PRNGKey(1), dense_x, emb,
                                can_emb)
        else:
            can_emb = None
            params = model.init(jax.random.PRNGKey(1), dense_x, emb)

        def fwdbwd(c, params=params, tr=tr, can_emb=can_emb):
            p, s = c
            # carry-dependent inputs so the scan body cannot be hoisted
            emb_i = emb + s * 1e-30
            can_i = None if can_emb is None else can_emb + s * 1e-30
            (_, _), (gp, ge) = jax.value_and_grad(
                tr._loss_fn, argnums=(0, 1), has_aux=True)(
                params, emb_i, can_i, dense_x, labels, groups, cvr,
                domain)
            return (p, s + jnp.sum(ge) + sum(
                jnp.sum(x) for x in jax.tree_util.tree_leaves(gp)))
        timeit(name, fwdbwd, (jnp.zeros(()), jnp.zeros(())))

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
