"""Test configuration: force an 8-device virtual CPU mesh.

Must run before JAX initializes its backends, which is why the env vars
are set at conftest import time.  This is the standard TPU-less way to
exercise ``jax.sharding`` / collective code paths.
"""
import os

# The session environment may pin JAX_PLATFORMS to the TPU tunnel; unit
# tests always run on the virtual CPU mesh (fast, deterministic), so
# override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
# keep XLA's CPU threadpool small; CI machines are tiny.
os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

# jax may already be imported by a sitecustomize hook, in which case it
# captured JAX_PLATFORMS at interpreter startup; override via config
# (safe while backends are uninitialized).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the fast loop on a 2-vCPU box is
# dominated by jit compiles (~1.9 s median per test); with the cache
# warm, re-runs skip every unchanged compile.  Keyed by HLO, so code
# edits invalidate exactly the programs they change.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
