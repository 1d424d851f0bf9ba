"""Separate the pipelined loop into compute-only and wire-only costs.

probe_pipeline.py showed (serial mode): pack ~4 ms/step, putwait
~45 ms/window (3.7 MB -> ~80 ms/MB, i.e. dominated by per-device_put
fixed overhead: 6 puts/window), compwait ~15 ms/step; the overlapped
loop lands at ~21 ms/step.  Hypothesis: over the axon tunnel transfers
serialize with execution, so steady state = compute + wire, and the
wire cost is mostly per-put fixed overhead.  This probe measures:

  A. compute-only: train_many_packed repeatedly on a RESIDENT window
     (no transfers at all) -> true device ms/step;
  B. wire-only: put_packed_window + block, no compute -> ms/window;
  C. wire-only, single-buffer: same bytes as ONE uint32 device_put;
  D. pipelined loop (reference).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_pipeline2.py
"""
import time

import numpy as np
import jax


def main():
    from rec_now_tpu.models import DCNv2Model, FeatureConfig
    from rec_now_tpu.parallel import make_mesh
    from rec_now_tpu.training import SyntheticCriteo, Trainer, TrainerConfig

    B, WINDOW, ROUNDS = 8192, 5, 8
    mesh = make_mesh(len(jax.devices()))
    fc = FeatureConfig(num_dense=13, num_sparse=26,
                       rows_per_field=100_000, embedding_dim=16)
    trainer = Trainer(
        DCNv2Model(deep_dims=(256, 128), dcn_sub_dim=16, dcn_layers=2,
                   dcn_experts=2),
        fc,
        TrainerConfig(pointwise_weight=1.0, pairwise_weight=0.5,
                      click_occurance_power=-0.5),
        mesh=mesh)
    data = SyntheticCriteo(rows_per_field=100_000, num_users=50_000)
    state = trainer.init(jax.random.PRNGKey(0),
                         data.sample(B, np.random.RandomState(0)))

    batches = list(data.batches(B, WINDOW * (ROUNDS + 2), seed=3))
    windows = [batches[i:i + WINDOW]
               for i in range(0, len(batches), WINDOW)]

    dev = trainer.put_packed_window(windows[0])
    state, m = trainer.train_many_packed(state, dev)
    float(m["loss"][-1])
    print("warmup done", flush=True)

    # A: compute-only on the resident window
    t0 = time.perf_counter()
    for _ in range(ROUNDS):
        state, m = trainer.train_many_packed(state, dev)
    float(m["loss"][-1])
    dt = (time.perf_counter() - t0) / (ROUNDS * WINDOW)
    print(f"A compute-only resident window: {1e3*dt:7.2f} ms/step",
          flush=True)

    # B: wire-only, current 6-leaf format
    packs = [trainer.wire.pack_window(w) for w in windows[:ROUNDS]]
    t0 = time.perf_counter()
    for p in packs:
        from rec_now_tpu.training.wire import PackedBatch
        from jax.sharding import NamedSharding, PartitionSpec as P
        from rec_now_tpu.parallel.mesh import DATA_AXIS

        def shard(x):
            spec = P(None, DATA_AXIS, *([None] * (x.ndim - 2)))
            return jax.device_put(jax.numpy.asarray(x),
                                  NamedSharding(mesh, spec))
        d = PackedBatch(*[shard(x) for x in p])
        jax.block_until_ready(d)
    dt = (time.perf_counter() - t0) / ROUNDS
    nbytes = sum(x.nbytes for x in packs[0])
    print(f"B wire 6-leaf: {1e3*dt:7.2f} ms/window "
          f"({nbytes/1e6:.2f} MB -> {nbytes/dt/1e6:6.1f} MB/s)",
          flush=True)

    # C: wire-only, one flat uint32 buffer of the same total bytes
    flat = [np.frombuffer(
        b"".join(np.ascontiguousarray(x).tobytes() for x in p),
        np.uint8) for p in packs]
    flat = [np.pad(f, (0, (-len(f)) % 4)).view(np.uint32) for f in flat]
    t0 = time.perf_counter()
    for f in flat:
        d = jax.device_put(f, jax.devices()[0])
        jax.block_until_ready(d)
    dt = (time.perf_counter() - t0) / ROUNDS
    print(f"C wire 1-buffer: {1e3*dt:7.2f} ms/window "
          f"({flat[0].nbytes/1e6:.2f} MB -> "
          f"{flat[0].nbytes/dt/1e6:6.1f} MB/s)", flush=True)

    # C2: one buffer, half the bytes (does time scale with bytes?)
    t0 = time.perf_counter()
    for f in flat:
        d = jax.device_put(f[: len(f) // 2], jax.devices()[0])
        jax.block_until_ready(d)
    dt = (time.perf_counter() - t0) / ROUNDS
    print(f"C2 wire 1-buffer half bytes: {1e3*dt:7.2f} ms/window",
          flush=True)

    # C3: tiny put (fixed overhead floor)
    tiny = np.zeros(64, np.uint32)
    t0 = time.perf_counter()
    for _ in range(ROUNDS):
        jax.block_until_ready(jax.device_put(tiny, jax.devices()[0]))
    dt = (time.perf_counter() - t0) / ROUNDS
    print(f"C3 tiny put (256 B): {1e3*dt:7.2f} ms/put", flush=True)

    # D: the pipelined loop as shipped
    t0 = time.perf_counter()
    state, m = trainer.train_pipelined(
        state, batches[: WINDOW * ROUNDS], window=WINDOW)
    float(m["loss"][-1])
    dt = (time.perf_counter() - t0) / (ROUNDS * WINDOW)
    print(f"D train_pipelined: {1e3*dt:7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
