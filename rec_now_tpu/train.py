"""CLI training entry point.

New scope relative to the reference (no CLI — SURVEY.md §2.4).

Usage:
    python -m rec_now_tpu.train --model dcnv2 --steps 1000 \
        --batch-size 8192 --pairwise-weight 0.5 --eval-batches 8 \
        --checkpoint-dir /tmp/ckpt

Models: fm | dcnv2 | xdeepfm | multitask (the four benchmark families).
"""
from __future__ import annotations

import argparse
import functools
import json
import sys
import time


def build_model(name: str):
    from rec_now_tpu.models import (FMModel, DCNv2Model, XDeepFMModel,
                                    MultiTaskModel)
    if name == "fm":
        return FMModel(), 1
    if name == "dcnv2":
        return DCNv2Model(), 1
    if name == "xdeepfm":
        return XDeepFMModel(), 1
    if name == "multitask":
        return MultiTaskModel(num_task=2), 2
    raise SystemExit(f"unknown model {name!r}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="dcnv2",
                   choices=["fm", "dcnv2", "xdeepfm", "multitask"])
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch-size", type=int, default=4096)
    p.add_argument("--rows-per-field", type=int, default=100_000)
    p.add_argument("--embedding-dim", type=int, default=16)
    p.add_argument("--dense-lr", type=float, default=1e-3)
    p.add_argument("--sparse-lr", type=float, default=0.05)
    p.add_argument("--sparse-optimizer", default="adagrad",
                   choices=["adagrad", "adam"])
    p.add_argument("--sparse-update-mode", default="auto",
                   choices=["auto", "sparse", "dense"],
                   help="embedding optimizer apply strategy: sparse = "
                        "rows-touched-only scatter, dense = whole-shard "
                        "streaming passes, auto = by local shard size")
    p.add_argument("--sparse-route-mode", default="auto",
                   choices=["auto", "allgather", "routed"],
                   help="sharded-table exchange: allgather = gather all "
                        "global ids everywhere (small meshes), routed = "
                        "dedup + owner-bucketed all_to_all (payload "
                        "O(b) not O(n*b)), auto = routed when >=4 shards")
    p.add_argument("--route-strict", action="store_true",
                   help="raise (at log cadence) when the routed "
                        "exchange drops ids to double overflow instead "
                        "of silently losing their gradient update; the "
                        "sparse_dropped counter appears in every "
                        "periodic log line either way")
    p.add_argument("--route-cap-factor", type=float, default=2.0,
                   help="routed exchange per-owner bucket = this factor "
                        "x the uniform share (raise for skewed id "
                        "distributions)")
    p.add_argument("--route-ov-cap", type=int, default=0,
                   help="routed exchange overflow-lane length (ids "
                        "spilling past the per-owner buckets); 0 = "
                        "b//16 heuristic")
    p.add_argument("--scan-window", type=int, default=0,
                   help="run this many steps per on-device lax.scan "
                        "dispatch (0 = one dispatch per step)")
    p.add_argument("--pointwise-weight", type=float, default=1.0)
    p.add_argument("--pairwise-weight", type=float, default=0.0)
    p.add_argument("--listwise-weight", type=float, default=0.0)
    p.add_argument("--occurance-power", type=float, default=0.0)
    p.add_argument("--wire-dense-mode", choices=("f16", "u8"),
                   default="f16",
                   help="dense-feature wire encoding: f16 (lossless to "
                        "~1e-3) or u8 (per-window affine quantization, "
                        "72 vs 85 B/example)")
    p.add_argument("--wire-id-mode", choices=("packed", "hot8"),
                   default="packed",
                   help="sparse-id wire encoding: packed (bit-packed "
                        "words) or hot8 (lossless hot-id byte codes + "
                        "escape stream; ~15% fewer wire bytes on "
                        "skewed id distributions, single-process only)")
    p.add_argument("--eval-batches", type=int, default=4)
    p.add_argument("--eval-every", type=int, default=0,
                   help="eval cadence in steps (0 = only at the end)")
    p.add_argument("--eval-mode", choices=("exact", "device"),
                   default="exact",
                   help="exact: host-side sorted AUC + corpus GAUC "
                        "(the oracle); device: scanned on-device "
                        "bucketed AUC + corpus GAUC from per-group "
                        "score histograms -- no per-example host "
                        "traffic, use for wide held-out sweeps")
    p.add_argument("--eval-group-slots", type=int, default=0,
                   help="device-eval corpus-GAUC group slots; grouping "
                        "is exact while distinct eval groups < "
                        "slots - slots/8.  0 (default) auto-sizes "
                        "from --num-groups (capped at 65536)")
    p.add_argument("--eval-group-buckets", type=int, default=512,
                   help="device-eval per-group score buckets (GAUC "
                        "tie error ~ O(1/buckets))")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data-file", default=None,
                   help="Criteo-format TSV to train from (native "
                        "multi-threaded parser); default: synthetic "
                        "planted-model stream")
    p.add_argument("--eval-file", default=None,
                   help="Criteo-format TSV to evaluate on; default with "
                        "--data-file: held-out rows past the training "
                        "range of the same file")
    p.add_argument("--num-groups", type=int, default=50_000,
                   help="group-id hash space for --data-file (in-batch "
                        "pairwise/listwise grouping key)")
    p.add_argument("--multihost", action="store_true",
                   help="pod-slice mode: initialize jax.distributed "
                        "before any backend touch and feed each "
                        "process's local slice of the (global) "
                        "--batch-size via Trainer.put_local")
    args = p.parse_args(argv)

    if args.multihost:
        # MUST precede any backend-touching jax call (multihost.py)
        from rec_now_tpu.parallel.multihost import initialize_multihost
        initialize_multihost()

    import jax
    from rec_now_tpu.models import FeatureConfig
    from rec_now_tpu.parallel import make_mesh
    from rec_now_tpu.training import (SyntheticCriteo, Trainer,
                                      TrainerConfig)

    model, num_tasks = build_model(args.model)
    local_batch = args.batch_size
    if args.multihost:
        nproc = jax.process_count()
        if args.batch_size % nproc:
            raise SystemExit(f"--batch-size {args.batch_size} must divide "
                             f"by the process count {nproc}")
        local_batch = args.batch_size // nproc
    fc = FeatureConfig(rows_per_field=args.rows_per_field,
                       embedding_dim=args.embedding_dim)
    cfg = TrainerConfig(
        pointwise_weight=args.pointwise_weight,
        pairwise_weight=args.pairwise_weight,
        listwise_weight=args.listwise_weight,
        click_occurance_power=args.occurance_power,
        dense_lr=args.dense_lr, sparse_lr=args.sparse_lr,
        sparse_optimizer=args.sparse_optimizer,
        sparse_update_mode=args.sparse_update_mode,
        sparse_route_mode=args.sparse_route_mode,
        route_strict=args.route_strict,
        route_cap_factor=args.route_cap_factor,
        route_ov_cap=args.route_ov_cap or None,
        wire_dense_mode=args.wire_dense_mode,
        wire_id_mode=args.wire_id_mode,
        num_tasks=num_tasks)
    mesh = make_mesh()
    trainer = Trainer(model, fc, cfg, mesh=mesh)
    put_fn = trainer.put_local if args.multihost else trainer.put
    # each process synthesizes (or reads) distinct local rows; the seed
    # shift keeps the per-host synthetic streams disjoint
    proc_seed = (jax.process_index() * 7919) if args.multihost else 0
    eval_on_train = False
    if args.data_file:
        from rec_now_tpu.io import CriteoTSV
        ds = CriteoTSV(args.data_file,
                       rows_per_field=args.rows_per_field,
                       num_groups=args.num_groups)

        def make_batches(n, seed):
            return ds.batches(local_batch, n)

        if args.eval_file:
            eval_ds = CriteoTSV(args.eval_file,
                                rows_per_field=args.rows_per_field,
                                num_groups=args.num_groups)

            def make_eval_batches(n, seed):
                return eval_ds.batches(local_batch, n)
        else:
            # hold out rows past the training range so eval is
            # out-of-sample; fall back (with an explicit marker) when
            # the file is too short to hold any out
            held_out = list(ds.batches(local_batch,
                                       args.eval_batches,
                                       skip=args.steps))
            if not held_out:
                print(json.dumps({
                    "warning": "data file has no rows past the training "
                               "range; eval scores TRAINING data "
                               "(eval_on_train=true)"}), flush=True)
                eval_on_train = True
                held_out = list(ds.batches(local_batch,
                                           args.eval_batches))

            def make_eval_batches(n, seed):
                return iter(held_out[:n])
    else:
        data = SyntheticCriteo(rows_per_field=args.rows_per_field,
                               seed=args.seed)

        def make_batches(n, seed):
            return data.batches(local_batch, n, seed=seed + proc_seed)

        def make_eval_batches(n, seed):
            return data.batches(local_batch, n, seed=seed + proc_seed)

    ckpt = None
    if args.checkpoint_dir:
        from rec_now_tpu.training.checkpoint import CheckpointManager
        ckpt = CheckpointManager(args.checkpoint_dir)

    batches = make_batches(args.steps, args.seed + 1)
    first = next(make_batches(1, args.seed + 1))
    state = trainer.init(jax.random.PRNGKey(args.seed), first)

    if args.eval_mode == "device":
        slots = args.eval_group_slots
        if not slots:
            # exact dict mapping needs distinct groups < slots - slots/8;
            # --num-groups bounds the group-id space for the file path
            # and the synthetic stream's user count is its analogue
            import math
            want = max(args.num_groups, 1024) * 8 // 7 + 1
            slots = min(0x10000, 1 << math.ceil(math.log2(want)))
        eval_fn = functools.partial(
            trainer.evaluate_device,
            num_group_slots=slots,
            group_buckets=args.eval_group_buckets)
    else:
        eval_fn = trainer.evaluate

    def run_eval(step):
        res = eval_fn(
            state, make_eval_batches(args.eval_batches, args.seed + 999))
        line = {"step": step, "eval": res,
                "eval_mode": args.eval_mode}
        if eval_on_train:
            line["eval_on_train"] = True
        print(json.dumps(line), flush=True)

    t0 = time.perf_counter()
    if args.scan_window > 1:
        # production inner loop (the one bench.py times): each window
        # runs as ONE on-device lax.scan over the compressed wire format
        # (training/wire.py) while the next window's packed transfer is
        # in flight; host parsing/packing of window k+1 overlaps the
        # device computing window k.  Eval/ckpt fire at window
        # granularity whenever the step counter crosses a boundary.
        window, buf, step = args.scan_window, [], 0

        def after_window(prev, mseq, n_steps):
            nonlocal step
            step = prev + n_steps
            metrics = {k: v[-1] for k, v in mseq.items()}
            if args.log_every and (step // args.log_every
                                   > prev // args.log_every):
                eps = (args.batch_size * step
                       / (time.perf_counter() - t0))
                line = {k: round(float(v), 5) for k, v in metrics.items()}
                line.update(step=step, examples_per_sec=round(eps, 1))
                print(json.dumps(line), flush=True)
                trainer.check_dropped(metrics)
            if args.eval_every and (step // args.eval_every
                                    > prev // args.eval_every):
                run_eval(step)
            if ckpt and args.checkpoint_every \
                    and (step // args.checkpoint_every
                         > prev // args.checkpoint_every):
                ckpt.save(step, state)

        # parse + pack + device_put run on the prefetch worker thread;
        # the loop thread only dispatches scans — steady state is
        # max(host ingest, device window), not their sum.  put_packed_auto
        # assembles per-process local windows on a pod slice, so the
        # SAME production inner loop runs under --multihost.
        from rec_now_tpu.training.prefetch import WindowPrefetcher
        with WindowPrefetcher(batches, trainer.put_packed_auto,
                              window) as wins:
            for dev_win, n_steps in wins:
                state, mseq = trainer.train_many_packed(state, dev_win)
                after_window(step, mseq, n_steps)
        batches = []
    from rec_now_tpu.training.prefetch import DevicePrefetcher
    with DevicePrefetcher(batches, put_fn) as prefetched:
        for i, dev_batch in enumerate(prefetched):
            state, metrics = trainer.train_step(state, *dev_batch)
            step = i + 1
            if args.log_every and step % args.log_every == 0:
                jax.block_until_ready(metrics["loss"])
                eps = args.batch_size * step / (time.perf_counter() - t0)
                line = {k: round(float(v), 5) for k, v in metrics.items()}
                line.update(step=step, examples_per_sec=round(eps, 1))
                print(json.dumps(line), flush=True)
                trainer.check_dropped(metrics)
            if args.eval_every and step % args.eval_every == 0:
                run_eval(step)
            if ckpt and args.checkpoint_every \
                    and step % args.checkpoint_every == 0:
                ckpt.save(step, state)

    res = eval_fn(
        state, make_eval_batches(args.eval_batches, args.seed + 999))
    final = {"final_eval": res, "steps": args.steps, "model": args.model,
             "eval_mode": args.eval_mode}
    if eval_on_train:
        final["eval_on_train"] = True
    print(json.dumps(final), flush=True)
    if ckpt:
        ckpt.save(args.steps, state)
        ckpt.wait()
        ckpt.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
