"""Dissect the pipelined bench loop: where do 20 ms/step go?

Roofline (tools/roofline.py) puts device compute at ~9 ms/step for the
flagship config, yet bench.py measures ~20 ms/step.  This probe times
each stage of train_pipelined separately:

  pack     host-side numpy wire packing (pack_window)
  putdisp  jnp.asarray + device_put dispatch (should be ~0 if async)
  putwait  time until the transferred buffers are actually ready
  compdisp train_many_packed dispatch (should be ~0 if async)
  compwait fetch of the final scalar (actual device compute + anything
           serialized behind it)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_pipeline.py
"""
import faulthandler
import time

import numpy as np
import jax

faulthandler.dump_traceback_later(240, repeat=True)


def main():
    from rec_now_tpu.models import DCNv2Model, FeatureConfig
    from rec_now_tpu.parallel import make_mesh
    from rec_now_tpu.training import SyntheticCriteo, Trainer, TrainerConfig

    B, WINDOW, ROUNDS = 8192, 5, 6
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
    print("building batches...", flush=True)
    state = trainer.init(jax.random.PRNGKey(0),
                         data.sample(B, np.random.RandomState(0)))
    print("init done", flush=True)

    batches = list(data.batches(B, WINDOW * (ROUNDS + 2), seed=3))
    windows = [batches[i:i + WINDOW]
               for i in range(0, len(batches), WINDOW)]

    # warm up (compile scan + transfer path)
    print("warmup put...", flush=True)
    dev = trainer.put_packed_window(windows[0])
    print("warmup compute...", flush=True)
    state, m = trainer.train_many_packed(state, dev)
    float(m["loss"][-1])
    print("warmup done", flush=True)

    from jax.sharding import NamedSharding, PartitionSpec as P
    from rec_now_tpu.training.trainer import DATA_AXIS
    from rec_now_tpu.training.wire import PackedBatch

    def shard(x):
        spec = P(None, DATA_AXIS, *([None] * (x.ndim - 2)))
        return jax.device_put(jax.numpy.asarray(x),
                              NamedSharding(mesh, spec))

    for r in range(ROUNDS):
        w = windows[r + 1]
        t0 = time.perf_counter()
        packed = trainer.wire.pack_window(w)
        t1 = time.perf_counter()
        dev = PackedBatch(*[shard(x) for x in packed])
        t2 = time.perf_counter()
        for leaf in dev:
            leaf.block_until_ready()
        t3 = time.perf_counter()
        state, m = trainer.train_many_packed(state, dev)
        t4 = time.perf_counter()
        val = float(m["loss"][-1])
        t5 = time.perf_counter()
        n = WINDOW
        print(f"round {r}: pack {1e3*(t0 and (t1-t0))/n:6.2f}  "
              f"putdisp {1e3*(t2-t1)/n:6.2f}  putwait {1e3*(t3-t2)/n:6.2f}  "
              f"compdisp {1e3*(t4-t3)/n:6.2f}  compwait {1e3*(t5-t4)/n:6.2f}"
              f"   total {1e3*(t5-t0)/n:6.2f} ms/step  loss {val:.4f}",
              flush=True)

    # now the real overlapped loop for comparison
    t0 = time.perf_counter()
    state, m = trainer.train_pipelined(state, batches[:WINDOW * ROUNDS],
                                       window=WINDOW)
    float(m["loss"][-1])
    dt = (time.perf_counter() - t0) / (WINDOW * ROUNDS)
    print(f"train_pipelined: {1e3*dt:6.2f} ms/step")


if __name__ == "__main__":
    main()
