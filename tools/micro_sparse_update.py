"""Primitive timings for table-update redesign (VERDICT r2 #2).

The dense Adagrad pass costs ~9.4 ms/step at the bench shape: it
streams the whole 166 MB table + accumulator and materializes a dense
(vp, pack*D) grad buffer via one-hot expanded (B, pack*D) lines.  The
sparse path pays argsort(B) + the same expand.  This tool times each
primitive on the real chip so the replacement design is chosen on
numbers, not guesses:

  a. argsort of 213k int32            (dedup prerequisite)
  b. segment_sum (213k, D) -> (213k, D)
  c. one-hot expand + line scatter    (current sparse scatter)
  d. (1, D)-window scatter at (line, slot) -- no expand
  e. packed-line gather (lookup analogue, for reference)
  f. current dense update end-to-end
  g. current sparse update end-to-end
  h. candidate: dedup + window-scatter adagrad end-to-end

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/micro_sparse_update.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

B, F, D = 8192, 26, 16
V = 26 * 100_000
PACK = 128 // D
VP = V // PACK
N = B * F
STEPS = 20


def timeit(name, fn, *args):
    out = jax.jit(fn)
    r = jax.device_get(out(*args))      # compile + run
    t0 = time.perf_counter()
    for _ in range(STEPS):
        r = out(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
    # fetch forces completion over the tunnel (BASELINE.md caveat)
    jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{name:52s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    raw = (rng.zipf(1.3, size=(B, F)) % 100_000).astype(np.int64)
    gids = jnp.asarray(
        (raw + np.arange(F)[None, :] * 100_000).reshape(-1).astype(
            np.int32))
    grads = jnp.asarray(rng.randn(N, D).astype(np.float32) * 1e-3)
    table = jnp.asarray(rng.randn(VP, PACK * D).astype(np.float32) * 0.1)
    acc = jnp.ones((VP, PACK), jnp.float32)

    # --- a: argsort -----------------------------------------------------
    timeit("a argsort 213k i32", lambda x: jnp.argsort(x), gids)

    # --- b: sort+dedup+segment_sum (the full dedup) ---------------------
    def dedup(ids, g):
        order = jnp.argsort(ids)
        sid = ids[order]
        sg = g[order]
        first = jnp.concatenate([jnp.ones((1,), bool),
                                 sid[1:] != sid[:-1]])
        seg = jnp.cumsum(first.astype(jnp.int32)) - 1
        row_grad = jax.ops.segment_sum(sg, seg, num_segments=ids.shape[0])
        rep = jnp.full((ids.shape[0],), V, sid.dtype).at[seg].set(sid)
        return rep, row_grad
    timeit("b sort+dedup+segsum", dedup, gids, grads)

    # --- c: one-hot expand + line scatter (current form) ----------------
    def expand_scatter(ids, g):
        line = ids // PACK
        slot = ids % PACK
        onehot = (jax.nn.one_hot(slot, PACK, dtype=g.dtype)
                  [:, :, None] * g[:, None, :]).reshape(N, PACK * D)
        return jnp.zeros((VP, PACK * D), g.dtype).at[line].add(onehot)
    timeit("c one-hot expand + line scatter (f32)", expand_scatter,
           gids, grads)

    def expand_scatter_bf16(ids, g):
        g = g.astype(jnp.bfloat16)
        line = ids // PACK
        slot = ids % PACK
        onehot = (jax.nn.one_hot(slot, PACK, dtype=g.dtype)
                  [:, :, None] * g[:, None, :]).reshape(N, PACK * D)
        return jnp.zeros((VP, PACK * D), g.dtype).at[line].add(onehot)
    timeit("c' one-hot expand + line scatter (bf16)",
           expand_scatter_bf16, gids, grads)

    # --- d: (1, D)-window scatter at (line, slot*D) ---------------------
    def window_scatter(ids, g):
        line = ids // PACK
        col = (ids % PACK) * D
        idx = jnp.stack([line, col], axis=1)           # (N, 2)
        dn = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1,),
            inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0, 1))
        return jax.lax.scatter_add(
            jnp.zeros((VP, PACK * D), g.dtype), idx, g, dn)
    timeit("d (1,D)-window scatter_add (f32, dup ids)", window_scatter,
           gids, grads)

    # --- d2: window scatter on DEDUP'd rows -----------------------------
    rep, row_grad = jax.jit(dedup)(gids, grads)
    def window_scatter_clip(ids, g):
        valid = ids < V
        line = jnp.where(valid, ids // PACK, VP)       # OOB -> dropped
        col = (ids % PACK) * D
        idx = jnp.stack([line, col], axis=1)
        dn = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1,),
            inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0, 1))
        return jax.lax.scatter_add(
            jnp.zeros((VP, PACK * D), g.dtype), idx, g, dn)
    timeit("d2 window scatter_add (dedup'd ~37k live)",
           window_scatter_clip, rep, row_grad)

    # --- e: packed-line gather (reference) ------------------------------
    timeit("e gather 213k packed lines",
           lambda t, ids: t[ids // PACK], table, gids)
    uline = jnp.asarray(
        np.unique((np.asarray(rep)[np.asarray(rep) < V]) // PACK))
    uline_pad = jnp.concatenate(
        [uline, jnp.zeros((N - uline.shape[0],), uline.dtype)])
    print(f"   (unique lines: {uline.shape[0]})")
    def gather_unique(t, ul):
        return t[ul]
    timeit("e2 gather 213k-padded unique lines", gather_unique,
           table, uline_pad)
    uline_small = uline_pad[:49152]
    timeit("e3 gather 48k unique lines", gather_unique, table,
           uline_small)

    # --- f: current dense update end-to-end -----------------------------
    from rec_now_tpu.embedding.sharded import ShardedEmbeddingTable
    from rec_now_tpu.parallel import make_mesh
    mesh = make_mesh(len(jax.devices()))
    ids2d = jnp.asarray(
        (raw + np.arange(F)[None, :] * 100_000).astype(np.int32))
    g3 = jnp.asarray(rng.randn(B, F, D).astype(np.float32) * 1e-3)

    t_dense = ShardedEmbeddingTable(V, D, mesh, update_mode="dense")
    s = t_dense.init(jax.random.PRNGKey(0))
    def upd_dense(st):
        return t_dense.apply_grads(st, ids2d, g3, lr=0.05)
    timeit("f dense update end-to-end", upd_dense, s)

    t_sparse = ShardedEmbeddingTable(V, D, mesh, update_mode="sparse")
    s2 = t_sparse.init(jax.random.PRNGKey(0))
    def upd_sparse(st):
        return t_sparse.apply_grads(st, ids2d, g3, lr=0.05)
    timeit("g sparse update end-to-end", upd_sparse, s2)

    # --- h: candidate -- dedup + window-scatter adagrad -----------------
    def candidate(t, a, ids, g):
        rep, row_grad = dedup(ids, g)
        valid = rep < V
        line = jnp.where(valid, rep // PACK, VP)
        slotcol = (rep % PACK)
        # acc update: (1,1)-window scatter of mean-square
        sq = jnp.mean(jnp.square(row_grad), axis=1) \
            * valid.astype(row_grad.dtype)
        dn1 = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(),
            inserted_window_dims=(0, 1),
            scatter_dims_to_operand_dims=(0, 1))
        a2 = jax.lax.scatter_add(
            a, jnp.stack([line, slotcol], axis=1), sq, dn1)
        # fetch updated acc rows (gather)
        acc_rows = a2[jnp.minimum(line, VP - 1), slotcol]
        scale = (0.05 / jnp.sqrt(jnp.clip(acc_rows, 1e-12)))[:, None] \
            * valid[:, None].astype(row_grad.dtype)
        dn = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1,),
            inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0, 1))
        t2 = jax.lax.scatter_add(
            t, jnp.stack([line, slotcol * D], axis=1),
            -scale * row_grad, dn)
        return t2, a2
    timeit("h candidate dedup+window-scatter adagrad", candidate,
           table, acc, gids, grads)


if __name__ == "__main__":
    main()
