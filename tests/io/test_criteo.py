"""Tests for the native Criteo-TSV loader (rec_now_tpu/io/).

The C++ parser and the pure-Python fallback must agree bit-for-bit on
ids/labels/groups and to float tolerance on dense.
"""
import ctypes

import numpy as np
import pytest

from rec_now_tpu.io import (CriteoTSV, fnv1a_mod, parse_chunk,
                            write_synthetic_tsv)
from rec_now_tpu.io import build as iobuild

NATIVE = iobuild.load() is not None


def _mk_lines():
    return (b"1\t3\t\t-2\t0\ta1b2c3\t\tffee\n"
            b"0\t\t7\t1\t100\tdeadbeef\tcafe\tffee\n"
            b"1\t0\t1\t2\t3\txyz\txyz\txyz\n")


PARAMS = dict(num_dense=4, num_sparse=3, rows_per_field=1000,
              group_field=0, num_groups=17)


class TestParseChunk:
    def test_python_semantics(self):
        d, i, l, g, n = parse_chunk(_mk_lines(), force_python=True,
                                    **PARAMS)
        assert n == 3
        np.testing.assert_array_equal(l, [1.0, 0.0, 1.0])
        # dense: log1p of positive ints, 0 for missing/<=0
        assert d[0, 0] == pytest.approx(np.log1p(3.0))
        assert d[0, 1] == 0.0 and d[0, 2] == 0.0 and d[0, 3] == 0.0
        assert d[1, 3] == pytest.approx(np.log1p(100.0))
        # sparse: fnv of token; missing -> 0
        assert i[0, 0] == fnv1a_mod(b"a1b2c3", 1000)
        assert i[0, 1] == 0
        assert i[0, 2] == fnv1a_mod(b"ffee", 1000)
        # same token, same hash across rows/fields
        assert i[1, 2] == i[0, 2]
        assert i[2, 0] == i[2, 1] == i[2, 2]
        # group = hash of field-0 token mod num_groups
        assert g[0] == fnv1a_mod(b"a1b2c3", 17)
        assert g[1] == fnv1a_mod(b"deadbeef", 17)

    @pytest.mark.skipif(not NATIVE, reason="no C++ toolchain")
    def test_native_matches_python(self):
        buf = _mk_lines()
        dp, ip, lp, gp, np_ = parse_chunk(buf, force_python=True,
                                          **PARAMS)
        dn, in_, ln, gn, nn = parse_chunk(buf, force_python=False,
                                          **PARAMS)
        assert np_ == nn == 3
        np.testing.assert_array_equal(ip, in_)
        np.testing.assert_array_equal(lp, ln)
        np.testing.assert_array_equal(gp, gn)
        np.testing.assert_allclose(dp, dn, rtol=1e-6)

    @pytest.mark.skipif(not NATIVE, reason="no C++ toolchain")
    def test_native_matches_python_large_multithreaded(self):
        rng = np.random.RandomState(0)
        rows = []
        for _ in range(5000):
            parts = [str(rng.randint(0, 2))]
            for _ in range(4):
                parts.append("" if rng.rand() < 0.2
                             else str(rng.randint(-5, 2000)))
            for _ in range(3):
                parts.append("" if rng.rand() < 0.2
                             else format(rng.randint(0, 1 << 32), "x"))
            rows.append("\t".join(parts))
        buf = ("\n".join(rows) + "\n").encode()
        a = parse_chunk(buf, force_python=True, **PARAMS)
        b = parse_chunk(buf, force_python=False, num_threads=7,
                        **PARAMS)
        assert a[4] == b[4] == 5000
        np.testing.assert_array_equal(a[1], b[1])
        np.testing.assert_array_equal(a[2], b[2])
        np.testing.assert_array_equal(a[3], b[3])
        np.testing.assert_allclose(a[0], b[0], rtol=1e-6)

    def test_partial_tail_not_consumed(self):
        buf = b"1\t1\t2\t3\t4\ta\tb\tc\n0\t1\t2\t3\t4\ta\tb"  # no \n
        _, _, l, _, n = parse_chunk(buf, **PARAMS)
        assert n == 1 and l[0] == 1.0

    @pytest.mark.skipif(not NATIVE, reason="no C++ toolchain")
    def test_fnv_c_abi_matches_python(self):
        lib = iobuild.load()
        for tok in [b"", b"a", b"deadbeef", b"u0001f2e",
                    bytes(range(256))]:
            assert (lib.rn_fnv1a_mod(tok, len(tok), 99991)
                    == fnv1a_mod(tok, 99991))


class TestCriteoTSV:
    @pytest.fixture(scope="class")
    def tsv(self, tmp_path_factory):
        path = tmp_path_factory.mktemp("data") / "criteo.tsv"
        write_synthetic_tsv(str(path), 3000, rows_per_field=5000,
                            num_users=200, seed=3)
        return str(path)

    def test_batches_shapes_and_determinism(self, tsv):
        ds = CriteoTSV(tsv, rows_per_field=5000, num_groups=200,
                       chunk_bytes=1 << 14)  # tiny chunks: carry logic
        bs = list(ds.batches(256, 4))
        assert len(bs) == 4
        b = bs[0]
        assert b.dense.shape == (256, 13)
        assert b.sparse_ids.shape == (256, 26)
        assert b.labels.shape == (256,)
        assert set(np.unique(b.labels)) <= {0.0, 1.0}
        assert b.sparse_ids.min() >= 0
        assert b.sparse_ids.max() < 5000
        assert b.group_ids.max() < 200
        # second pass over the file is identical (deterministic stream)
        bs2 = list(CriteoTSV(tsv, rows_per_field=5000, num_groups=200
                             ).batches(256, 4))
        np.testing.assert_array_equal(bs[1].sparse_ids,
                                      bs2[1].sparse_ids)
        np.testing.assert_array_equal(bs[1].labels, bs2[1].labels)

    def test_batches_skip_is_offset(self, tsv):
        """skip=k yields exactly the batches after the first k (the
        train/eval holdout split)."""
        ds = CriteoTSV(tsv, rows_per_field=5000, num_groups=200)
        full = list(ds.batches(256, 6))
        skipped = list(ds.batches(256, 4, skip=2))
        assert len(skipped) == 4
        for a, b in zip(full[2:], skipped):
            np.testing.assert_array_equal(a.sparse_ids, b.sparse_ids)
            np.testing.assert_array_equal(a.labels, b.labels)
        # skipping past the whole file yields nothing
        assert list(ds.batches(256, 2, skip=1000)) == []

    def test_chunk_size_invariance(self, tsv):
        """Carry-over across chunk boundaries loses/garbles no rows."""
        big = list(CriteoTSV(tsv, rows_per_field=5000, num_groups=200,
                             chunk_bytes=1 << 24).batches(512, 3))
        tiny = list(CriteoTSV(tsv, rows_per_field=5000, num_groups=200,
                              chunk_bytes=1 << 12).batches(512, 3))
        for a, b in zip(big, tiny):
            np.testing.assert_array_equal(a.sparse_ids, b.sparse_ids)
            np.testing.assert_allclose(a.dense, b.dense, rtol=1e-6)

    def test_drop_remainder_and_padding(self, tsv):
        ds = CriteoTSV(tsv, rows_per_field=5000, num_groups=200)
        n_full = len(list(ds.batches(1024)))
        assert n_full == 2  # 3000 rows
        padded = list(ds.batches(1024, drop_remainder=False))
        assert len(padded) == 3
        last = padded[-1]
        assert last.dense.shape == (1024, 13)
        # padded rows are zeros
        assert np.all(last.sparse_ids[3000 - 2048:] == 0)

    def test_groups_repeat_within_stream(self, tsv):
        """Zipf user keys give multi-sample groups (pairwise needs them)."""
        b = next(CriteoTSV(tsv, rows_per_field=5000, num_groups=200
                           ).batches(1024, 1))
        _, counts = np.unique(b.group_ids, return_counts=True)
        assert counts.max() >= 2

    @pytest.mark.slow
    def test_trains_with_trainer(self, tsv):
        """End-to-end: file -> parser -> jitted train step."""
        import jax
        from rec_now_tpu.models import FeatureConfig
        from rec_now_tpu.models.fm_model import FMModel
        from rec_now_tpu.training import Trainer, TrainerConfig

        fc = FeatureConfig(rows_per_field=5000, embedding_dim=8)
        tr = Trainer(FMModel(), fc,
                     TrainerConfig(pairwise_weight=0.2))
        ds = CriteoTSV(tsv, rows_per_field=5000, num_groups=200)
        it = ds.batches(512, 3)
        first = next(it)
        state = tr.init(jax.random.PRNGKey(0), first)
        losses = []
        for batch in [first] + list(it):
            state, metrics = tr.train_step(state, *tr.put(batch))
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
