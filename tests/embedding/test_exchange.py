"""Unit tests for the static-shape dedup + owner-routing primitives.

These are pure per-shard helpers (no mesh/collectives); the end-to-end
routed exchange is covered by tests/embedding/test_routed.py.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from rec_now_tpu.embedding import exchange
from rec_now_tpu.embedding.exchange import (BIG, gather_planned, plan_route,
                                            scatter_planned, sort_dedup)

RNG = np.random.default_rng(7)


class TestSortDedup:
    def test_matches_numpy_unique(self):
        flat = jnp.asarray(RNG.integers(0, 40, size=64).astype(np.int32))
        uid, slot = sort_dedup(flat)
        uid, slot = np.asarray(uid), np.asarray(slot)
        expect = np.unique(np.asarray(flat))
        k = len(expect)
        np.testing.assert_array_equal(uid[:k], expect)
        assert (uid[k:] == int(BIG)).all()
        # un-dedup round trip: uid[slot] reconstructs the input
        np.testing.assert_array_equal(uid[slot], np.asarray(flat))

    def test_all_identical(self):
        uid, slot = sort_dedup(jnp.full((16,), 5, jnp.int32))
        assert int(uid[0]) == 5 and (np.asarray(uid[1:]) == int(BIG)).all()
        assert (np.asarray(slot) == 0).all()

    def test_all_distinct(self):
        flat = jnp.arange(16, dtype=jnp.int32)[::-1]
        uid, slot = sort_dedup(flat)
        np.testing.assert_array_equal(np.asarray(uid), np.arange(16))
        np.testing.assert_array_equal(np.asarray(uid)[np.asarray(slot)],
                                      np.asarray(flat))


class TestPlanRoute:
    def _ids(self, b=64, lo=0, hi=200):
        flat = jnp.asarray(RNG.integers(lo, hi, size=b).astype(np.int32))
        uid, slot = sort_dedup(flat)
        return flat, uid, slot

    def test_every_unique_id_lands_exactly_once(self):
        flat, uid, slot = self._ids()
        n, cap, ov = 4, 16, 8
        plan = plan_route(uid, n, cap, ov)
        sent = np.asarray(plan.send_ids)
        ovs = np.asarray(plan.ov_ids)
        expect = np.unique(np.asarray(flat))
        got = np.sort(np.concatenate([sent[sent < int(BIG)],
                                      ovs[ovs < int(BIG)]]))
        np.testing.assert_array_equal(got, expect)
        assert int(plan.dropped) == 0

    def test_owner_blocks_hold_only_owned_ids(self):
        _, uid, _ = self._ids()
        n, cap, ov = 4, 16, 8
        plan = plan_route(uid, n, cap, ov)
        sent = np.asarray(plan.send_ids).reshape(n, cap)
        for s in range(n):
            blk = sent[s][sent[s] < int(BIG)]
            assert (blk % n == s).all()

    def test_overflow_spills_and_drops_count(self):
        # 20 distinct ids all owned by shard 0 (multiples of n)
        n = 4
        uid = jnp.concatenate([
            jnp.arange(20, dtype=jnp.int32) * n,
            jnp.full((12,), BIG, jnp.int32)])
        plan = plan_route(uid, n, cap=8, ov_cap=8)
        sent = np.asarray(plan.send_ids)
        assert (sent[:8] < int(BIG)).sum() == 8      # bucket 0 full
        ovs = np.asarray(plan.ov_ids)
        assert (ovs < int(BIG)).sum() == 8           # overflow full
        assert int(plan.dropped) == 4                # 20 - 8 - 8

    def test_slot_maps_are_consistent(self):
        flat, uid, slot = self._ids()
        plan = plan_route(uid, 4, 16, 8)
        ret, ovp = np.asarray(plan.ret_slot), np.asarray(plan.ov_slot)
        uid_np = np.asarray(uid)
        for k in range(len(uid_np)):
            if uid_np[k] >= int(BIG):
                assert ret[k] == -1 and ovp[k] == -1
                continue
            assert (ret[k] >= 0) != (ovp[k] >= 0)    # exactly one buffer
            if ret[k] >= 0:
                assert np.asarray(plan.send_ids)[ret[k]] == uid_np[k]
            else:
                assert np.asarray(plan.ov_ids)[ovp[k]] == uid_np[k]


class TestGatherScatterRoundTrip:
    def test_round_trip(self):
        b, n, cap, ov, d = 64, 4, 16, 8, 5
        flat = jnp.asarray(RNG.integers(0, 50, size=b).astype(np.int32))
        uid, slot = sort_dedup(flat)
        plan = plan_route(uid, n, cap, ov)
        # pretend the table maps id -> [id, id+1, ...): fill the recv
        # buffers as the owners would
        def rows_for(ids):
            base = np.asarray(ids, np.float32)[:, None]
            rows = base + np.arange(d, dtype=np.float32)[None, :]
            return jnp.asarray(np.where(base < float(BIG), rows, 0.0))
        out = gather_planned(plan, rows_for(plan.send_ids),
                             rows_for(plan.ov_ids), slot)
        expect = (np.asarray(flat, np.float32)[:, None]
                  + np.arange(d, dtype=np.float32)[None, :])
        np.testing.assert_allclose(np.asarray(out), expect)

    def test_scatter_places_values_at_planned_slots(self):
        b, n, cap, ov = 32, 4, 8, 8
        flat = jnp.asarray(RNG.integers(0, 30, size=b).astype(np.int32))
        uid, slot = sort_dedup(flat)
        plan = plan_route(uid, n, cap, ov)
        vals = jnp.asarray(
            np.asarray(uid, np.float32)[:, None] * np.ones((1, 3), np.float32))
        send, ovb = scatter_planned(plan, vals)
        send, ovb = np.asarray(send), np.asarray(ovb)
        sent = np.asarray(plan.send_ids)
        ovs = np.asarray(plan.ov_ids)
        valid = sent < int(BIG)
        np.testing.assert_allclose(send[valid, 0], sent[valid])
        np.testing.assert_allclose(send[~valid], 0.0)
        ovv = ovs < int(BIG)
        np.testing.assert_allclose(ovb[ovv, 0], ovs[ovv])
        np.testing.assert_allclose(ovb[~ovv], 0.0)


def test_big_sentinel_is_int32_safe():
    assert int(exchange.BIG) < 2 ** 31 - 1
