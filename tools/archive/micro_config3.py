"""Cheap per-component timing for benchmark config #3 (xDeepFM
CIN+iPNN pairwise) at the bench shape: B=8192, F=26, D=16.

Times each suspect in isolation with tiny separate compiles (the full
bisect in profile_config3.py re-compiles a 20-step scan per variant and
does not finish on this 2-vCPU rig).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/micro_config3.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, F, D = 8192, 26, 16
KS = (64, 64)
STEPS = 10


def scalarize(out):
    return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out)
               if x is not None and jnp.issubdtype(x.dtype, jnp.floating))


def timeit(name, fn, *args):
    # reduce outputs to one scalar INSIDE jit so the tunnel transfer
    # (87 MB/s) never pollutes the timing
    jfn = jax.jit(lambda *a: scalarize(fn(*a)))
    out = jfn(*args)                       # compile
    float(jax.device_get(out))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = jfn(*args)
    float(jax.device_get(out))
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{name:42s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    emb = jnp.asarray(rng.randn(B, F, D).astype(np.float32) * 0.1)
    x0 = jnp.transpose(emb, (0, 2, 1))     # (B, D, F)
    weights = tuple(
        jnp.asarray(rng.randn(k, F, h).astype(np.float32) * 0.05)
        for k, h in zip(KS, (F,) + KS[:-1]))
    logits = jnp.asarray(rng.randn(B).astype(np.float32))
    labels = jnp.asarray((rng.rand(B) < 0.3).astype(np.float32))
    groups = jnp.asarray(rng.randint(0, 2000, size=B).astype(np.int32))

    from rec_now_tpu.ops.pallas.pairwise_kernel import pairwise_loss_pallas

    def pw_fwdbwd(logits):
        def f(lg):
            return pairwise_loss_pallas(lg, labels, groups, factor=1.0,
                                        click_occurance_power=-0.5)
        return jax.grad(f)(logits)
    timeit("pairwise pallas fwd+bwd", pw_fwdbwd, logits)

    def ipnn_fwdbwd(emb):
        def f(e):
            g = jnp.einsum("bfd,bgd->bfg", e, e,
                           preferred_element_type=jnp.float32)
            r, c = np.triu_indices(F, k=1)
            return jnp.sum(g[:, r, c])
        return jax.grad(f)(emb)
    timeit("iPNN fwd+bwd", ipnn_fwdbwd, emb)

    # deep tower (429 -> 256 -> 128 -> 1) fwd+bwd
    w1 = jnp.asarray(rng.randn(429, 256).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.randn(256, 128).astype(np.float32) * 0.05)
    flat = jnp.asarray(rng.randn(B, 429).astype(np.float32))

    def deep_fwdbwd(flat, w1, w2):
        def f(x, w1, w2):
            return jnp.sum(jax.nn.relu(jax.nn.relu(x @ w1) @ w2))
        return jax.grad(f, argnums=(0, 1, 2))(flat, w1, w2)
    timeit("deep tower fwd+bwd", deep_fwdbwd, flat, w1, w2)

    # embedding lookup + sparse update at the bench table size
    from rec_now_tpu.embedding.sharded import ShardedEmbeddingTable
    from rec_now_tpu.parallel import make_mesh
    mesh = make_mesh(len(jax.devices()))
    table = ShardedEmbeddingTable(vocab_size=26 * 100_000, dim=D,
                                  mesh=mesh)
    st = table.init(jax.random.PRNGKey(0))
    ids = jnp.asarray(rng.randint(0, 26 * 100_000, size=(B, F))
                      .astype(np.int32))

    def lookup_only(st, ids):
        return jnp.sum(table.lookup(st, ids))
    timeit("table lookup fwd", lookup_only, st, ids)

    emb_grad = jnp.ones((B, F, D), jnp.float32)

    def lookup_update(st, ids):
        return table.apply_grads(st, ids, emb_grad, lr=0.05)
    timeit("table update (ones grad)", lookup_update, st, ids)


if __name__ == "__main__":
    main()
