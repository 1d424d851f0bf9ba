"""Tests for the CLI entry point and profiling utilities."""
import pytest
import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from rec_now_tpu.core.profiling import (annotate, guard_finite,
                                        device_memory_stats)


@pytest.mark.slow
class TestCLI:
    def test_fm_smoke(self, tmp_path):
        """The CLI trains a few steps and prints final eval JSON.

        Note: jit compilation in the subprocess takes ~5 min on the
        2-vCPU box; under heavy concurrent load this can brush the
        timeout (load flake, not a product failure).
        """
        out = subprocess.run(
            [sys.executable, "-m", "rec_now_tpu.train",
             "--model", "fm", "--steps", "4", "--batch-size", "64",
             "--rows-per-field", "512", "--embedding-dim", "4",
             "--log-every", "2", "--eval-batches", "1",
             "--checkpoint-dir", str(tmp_path / "ckpt"),
             "--checkpoint-every", "4"],
            capture_output=True, text=True, timeout=900,
            env={**__import__("os").environ,
                 "JAX_PLATFORMS": "cpu",
                 "PYTHONPATH": "/root/repo:/root/.axon_site"},
            cwd="/root/repo")
        assert out.returncode == 0, out.stderr[-2000:]
        lines = [json.loads(ln) for ln in out.stdout.strip().splitlines()
                 if ln.startswith("{")]
        final = [ln for ln in lines if "final_eval" in ln]
        assert final, out.stdout
        assert np.isfinite(final[0]["final_eval"]["auc"])
        assert (tmp_path / "ckpt").exists()


class TestCLIInProcess:
    @pytest.mark.slow
    def test_scan_window_honors_eval_every(self, capsys):
        """--eval-every fires inside the --scan-window loop (VERDICT #7)."""
        from rec_now_tpu import train as train_mod
        rc = train_mod.main([
            "--model", "fm", "--steps", "16", "--batch-size", "32",
            "--rows-per-field", "256", "--embedding-dim", "4",
            "--scan-window", "4", "--eval-every", "8",
            "--eval-batches", "1", "--log-every", "0"])
        assert rc == 0
        out = capsys.readouterr().out
        lines = [json.loads(ln) for ln in out.splitlines()
                 if ln.startswith("{")]
        evals = [ln for ln in lines if "eval" in ln]
        assert [e["step"] for e in evals] == [8, 16], out

    @pytest.mark.slow
    def test_data_file_eval_is_held_out(self, capsys, tmp_path):
        """--data-file eval reads rows past the training range; a file
        too short to hold any out is explicitly marked eval_on_train."""
        from rec_now_tpu import train as train_mod
        from rec_now_tpu.io.criteo import write_synthetic_tsv
        path = str(tmp_path / "train.tsv")
        write_synthetic_tsv(path, 32 * 6, rows_per_field=256,
                            num_users=16)
        common = ["--model", "fm", "--batch-size", "32",
                  "--rows-per-field", "256", "--embedding-dim", "4",
                  "--eval-batches", "2", "--log-every", "0",
                  "--data-file", path]
        rc = train_mod.main(common + ["--steps", "4"])
        assert rc == 0
        lines = [json.loads(ln) for ln in
                 capsys.readouterr().out.splitlines()
                 if ln.startswith("{")]
        final = [ln for ln in lines if "final_eval" in ln][0]
        assert "eval_on_train" not in final

        rc = train_mod.main(common + ["--steps", "6"])  # eats the file
        assert rc == 0
        lines = [json.loads(ln) for ln in
                 capsys.readouterr().out.splitlines()
                 if ln.startswith("{")]
        final = [ln for ln in lines if "final_eval" in ln][0]
        assert final.get("eval_on_train") is True


    @pytest.mark.slow
    def test_eval_mode_device(self, capsys):
        """--eval-mode device reports the on-device bucketed sweep."""
        from rec_now_tpu import train as train_mod
        rc = train_mod.main([
            "--model", "fm", "--steps", "2", "--batch-size", "32",
            "--rows-per-field", "256", "--embedding-dim", "4",
            "--eval-batches", "2", "--log-every", "0",
            "--eval-mode", "device",
            "--eval-group-slots", "128", "--eval-group-buckets", "64"])
        assert rc == 0
        out = capsys.readouterr().out
        lines = [json.loads(ln) for ln in out.splitlines()
                 if ln.startswith("{")]
        final = [ln for ln in lines if "final_eval" in ln][0]
        assert final["eval_mode"] == "device"
        assert np.isfinite(final["final_eval"]["auc"])
        assert "num_pos" in final["final_eval"]

    @pytest.mark.slow
    def test_route_strict_flag_wires_through(self, capsys):
        """--route-strict / --route-cap-factor reach TrainerConfig and
        the log line carries the drop counter (VERDICT r4 #7)."""
        from rec_now_tpu import train as train_mod
        from rec_now_tpu.training import trainer as trainer_mod
        seen = {}
        orig = trainer_mod.Trainer.__init__

        def spy(self, model, fc, cfg, mesh=None):
            seen["cfg"] = cfg
            orig(self, model, fc, cfg, mesh=mesh)

        trainer_mod.Trainer.__init__ = spy
        try:
            rc = train_mod.main([
                "--model", "fm", "--steps", "2", "--batch-size", "32",
                "--rows-per-field", "256", "--embedding-dim", "4",
                "--eval-batches", "1", "--log-every", "1",
                "--route-strict", "--route-cap-factor", "3.0",
                "--route-ov-cap", "64"])
        finally:
            trainer_mod.Trainer.__init__ = orig
        assert rc == 0
        cfg = seen["cfg"]
        assert cfg.route_strict is True
        assert cfg.route_cap_factor == 3.0
        assert cfg.route_ov_cap == 64
        out = capsys.readouterr().out
        logs = [json.loads(ln) for ln in out.splitlines()
                if ln.startswith("{") and "sparse_dropped" in ln]
        assert logs, out  # drop counter surfaces in the periodic line


class TestProfiling:
    def test_annotate_passthrough(self):
        @annotate("my_block")
        def f(x):
            return x * 2
        assert float(f(jnp.array(3.0))) == 6.0

    def test_guard_finite_passthrough(self):
        x = jnp.array([1.0, 2.0])
        y = guard_finite(x, "x")
        np.testing.assert_allclose(np.asarray(y), np.asarray(x))
        # under jit with bad values it must not crash (prints and flows)
        z = jax.jit(lambda t: guard_finite(t, "t"))(
            jnp.array([jnp.nan, 1.0]))
        assert z.shape == (2,)

    def test_guard_disabled(self):
        x = jnp.array([jnp.inf])
        assert guard_finite(x, enabled=False) is x

    def test_memory_stats_shape(self):
        stats = device_memory_stats()
        assert set(stats) == {"bytes_in_use", "peak_bytes_in_use",
                              "bytes_limit"}
