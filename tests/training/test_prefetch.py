"""Tests for the async device prefetcher."""
import threading
import time

import numpy as np
import pytest

from rec_now_tpu.training.prefetch import DevicePrefetcher


class TestDevicePrefetcher:
    def test_yields_all_in_order(self):
        items = list(range(20))
        got = list(DevicePrefetcher(iter(items), lambda x: x * 10,
                                    depth=3))
        assert got == [x * 10 for x in items]

    def test_put_runs_on_worker_thread(self):
        main = threading.current_thread().name
        seen = []

        def put(x):
            seen.append(threading.current_thread().name)
            return x

        list(DevicePrefetcher([1, 2, 3], put))
        assert all(n != main for n in seen)

    def test_bounded_queue_backpressure(self):
        produced = []

        def gen():
            for i in range(100):
                produced.append(i)
                yield i

        pf = DevicePrefetcher(gen(), lambda x: x, depth=2)
        time.sleep(0.2)
        # producer is blocked well before 100 (queue holds depth + the
        # one item waiting in put())
        assert len(produced) <= 5
        assert list(pf) == list(range(100))

    def test_producer_exception_reraised(self):
        def gen():
            yield 1
            raise ValueError("bad row")

        it = iter(DevicePrefetcher(gen(), lambda x: x))
        assert next(it) == 1
        with pytest.raises(ValueError, match="bad row"):
            list(it)

    def test_close_early(self):
        def gen():
            for i in range(10_000):
                yield i

        pf = DevicePrefetcher(gen(), lambda x: x, depth=2)
        it = iter(pf)
        assert next(it) == 0
        pf.close()  # must not hang

    def test_close_bounded_when_worker_wedged(self):
        """A put() that never returns (dead tunnel) must not turn
        close() — or the atexit hook that calls it — into a hang."""
        import threading
        never = threading.Event()

        def wedged_put(x):
            never.wait()      # blocks forever

        pf = DevicePrefetcher(iter([1, 2, 3]), wedged_put, depth=1)
        t0 = time.perf_counter()
        pf.close(timeout=0.5)
        assert time.perf_counter() - t0 < 3.0
        never.set()           # let the daemon thread die

    def test_close_leaves_end_sentinel_for_other_consumers(self):
        """Closing must wake a consumer blocked in get() on the same
        queue (WindowPrefetcher's inner worker reading a closed parse
        stage) instead of deadlocking on the stolen sentinel."""
        import threading
        pf = DevicePrefetcher(iter(range(3)), lambda x: x, depth=2)
        got = []

        def consumer():
            got.extend(list(pf))

        time.sleep(0.1)       # let the producer finish
        pf.close()
        t = threading.Thread(target=consumer, daemon=True)
        t.start()
        t.join(timeout=2.0)
        assert not t.is_alive()   # consumer saw _END and returned

    def test_overlap_actually_happens(self):
        """Producer makes progress while the consumer sleeps."""
        stamps = []

        def put(x):
            stamps.append(time.perf_counter())
            return x

        pf = DevicePrefetcher(range(3), put, depth=2)
        it = iter(pf)
        next(it)
        time.sleep(0.15)  # "compute"
        # by now the worker has staged the remaining items
        assert len(stamps) == 3
        assert list(it) == [1, 2]

    def test_with_trainer_put(self):
        """End-to-end with the real Trainer.put on the CPU mesh."""
        import jax
        from rec_now_tpu.models import FeatureConfig
        from rec_now_tpu.models.fm_model import FMModel
        from rec_now_tpu.training import (SyntheticCriteo, Trainer,
                                          TrainerConfig)

        fc = FeatureConfig(rows_per_field=512, embedding_dim=4)
        tr = Trainer(FMModel(), fc, TrainerConfig())
        data = SyntheticCriteo(rows_per_field=512, num_users=64)
        batch = next(data.batches(64, 1))
        state = tr.init(jax.random.PRNGKey(0), batch)
        losses = []
        with DevicePrefetcher(data.batches(64, 4), tr.put) as pf:
            for dev in pf:
                state, metrics = tr.train_step(state, *dev)
                losses.append(float(metrics["loss"]))
        assert len(losses) == 4 and np.all(np.isfinite(losses))


class TestWindowPrefetcher:
    def test_windows_and_ragged_tail(self):
        from rec_now_tpu.training.prefetch import WindowPrefetcher
        got = list(WindowPrefetcher(range(13), lambda ws: list(ws),
                                    window=5))
        assert [(w, n) for w, n in got] == [
            ([0, 1, 2, 3, 4], 5), ([5, 6, 7, 8, 9], 5),
            ([10, 11, 12], 3)]

    def test_pack_runs_on_worker_thread(self):
        import threading
        from rec_now_tpu.training.prefetch import WindowPrefetcher
        main = threading.current_thread().name
        seen = []

        def put_window(ws):
            seen.append(threading.current_thread().name)
            return tuple(ws)

        out = list(WindowPrefetcher(range(6), put_window, window=3))
        assert len(out) == 2 and all(n != main for n in seen)

    def test_matches_direct_scan_loop(self):
        """CLI window path == direct train_many_packed on same windows."""
        import jax
        import jax.numpy as jnp
        from rec_now_tpu.models import FeatureConfig
        from rec_now_tpu.models.fm_model import FMModel
        from rec_now_tpu.training import (SyntheticCriteo, Trainer,
                                          TrainerConfig)
        from rec_now_tpu.training.prefetch import WindowPrefetcher

        fc = FeatureConfig(rows_per_field=512, embedding_dim=4)
        data = SyntheticCriteo(rows_per_field=512, num_users=64)
        batch = next(data.batches(64, 1))

        def run(prefetched: bool):
            tr = Trainer(FMModel(), fc, TrainerConfig())
            state = tr.init(jax.random.PRNGKey(0), batch)
            batches = list(data.batches(64, 7, seed=3))
            if prefetched:
                with WindowPrefetcher(iter(batches),
                                      tr.put_packed_window, 3) as wins:
                    for dev_win, n in wins:
                        state, _ = tr.train_many_packed(state, dev_win)
            else:
                for lo in range(0, 7, 3):
                    win = batches[lo:lo + 3]
                    state, _ = tr.train_many_packed(
                        state, tr.put_packed_window(win))
            return state

        s1, s2 = run(True), run(False)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            assert jnp.array_equal(a, b)
