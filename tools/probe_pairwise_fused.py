"""A/B the fused pairwise kernel (r5) vs the split fwd/bwd (r4).

VERDICT r4 next #6: config #3 pays 4 O(B^2) sweeps per step (counts,
matvec, loss fwd, loss bwd).  Round 5 fuses fwd+bwd into one sweep and
collapses counts+matvec to a closed form for binary labels.  This
probe loads the r4 kernel module from git HEAD~ (or a given rev) and
interleaves scan-amortized value_and_grad measurements at the bench
shape in the same session.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_pairwise_fused.py [old_rev]
"""
import importlib.util
import json
import subprocess
import sys
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/tools")
from bench_util import scan_timeit

B = 8192
STEPS = 20
REPS = 3


def load_rev_module(rev, path, name):
    src = subprocess.run(["git", "show", f"{rev}:{path}"],
                         capture_output=True, text=True, check=True,
                         cwd="/root/repo").stdout
    fn = f"/tmp/{name}.py"
    with open(fn, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location(name, fn)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod




def main():
    old_rev = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    import rec_now_tpu.ops.pallas.pairwise_kernel as new_mod
    old_mod = load_rev_module(
        old_rev, "rec_now_tpu/ops/pallas/pairwise_kernel.py",
        "pairwise_kernel_r4")

    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(B).astype(np.float32))
    labels = jnp.asarray((rng.rand(B) > 0.7).astype(np.float32))
    groups = jnp.asarray(rng.randint(0, 2000, B).astype(np.int32))

    def make_probe(mod, binary):
        kw = {}
        if binary:
            kw["binary_labels"] = True

        def f(x):
            loss, n = mod.pairwise_loss_pallas(
                x, labels, groups, click_occurance_power=-0.5,
                return_num_pair=True, reduce_mean=False, **kw)
            return loss / (n + 1e-10)

        def probe(c):
            x = logits + c * 1e-30
            val, g = jax.value_and_grad(f)(x)
            return c + val * 1e-20 + jnp.sum(g) * 1e-20
        return probe

    # numeric agreement first
    f_old = make_probe(old_mod, False)
    f_new = make_probe(new_mod, True)
    v_old = float(jax.device_get(f_old(jnp.zeros(()))))
    v_new = float(jax.device_get(f_new(jnp.zeros(()))))
    print(f"value agreement: old={v_old:.9e} new={v_new:.9e}")
    assert abs(v_old - v_new) < 1e-6 * max(1, abs(v_old)), "MISMATCH"

    results = {}
    for rep in range(REPS):
        results.setdefault("r4_split", []).append(scan_timeit(
            f"[rep {rep}] r4 split fwd/bwd + counts/matvec",
            make_probe(old_mod, False), jnp.zeros(())))
        results.setdefault("r5_fused", []).append(scan_timeit(
            f"[rep {rep}] r5 fused fwd+bwd + binary closed form",
            make_probe(new_mod, True), jnp.zeros(())))
        results.setdefault("r5_fused_general", []).append(scan_timeit(
            f"[rep {rep}] r5 fused fwd+bwd, general counts path",
            make_probe(new_mod, False), jnp.zeros(())))
    print(json.dumps({k: round(min(v), 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
