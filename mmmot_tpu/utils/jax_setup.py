"""Process-level JAX setup shared by CLIs, tests and benchmarks.

Call :func:`setup_jax` before any computation.  On this class of host
(single CPU core driving a remote TPU) two things matter enormously:

* the persistent compilation cache (first-compile of the VGG branch is
  tens of seconds; cached reloads are milliseconds);
* forcing the CPU backend (plus a virtual device count) for tests, because
  the TPU plugin otherwise grabs the backend even when ``JAX_PLATFORMS=cpu``
  is set in the *shell* environment — it must be set before jax import,
  which :func:`force_cpu` documents and tests' conftest does.
"""

from __future__ import annotations

import os

# Must be set before XLA's C++ logging initialises (first jax import wins).
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")


def setup_jax(cache_dir: str | None = None) -> None:
    # Silence XLA C++ AOT-loader warnings (cache entries record machine
    # features of the writing process; reloads fall back safely but log
    # pages of noise).
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("MMMOT_XLA_CACHE")
    if cache_dir is None:
        # Per-platform cache: entries written under the TPU-tunnel process
        # carry different host-feature stamps than pure-CPU processes and
        # cross-loading only produces warnings + recompiles.
        backend = jax.default_backend()
        cache_dir = os.path.expanduser(f"~/.cache/jax_comp_{backend}")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    try:
        # Keep the jit-executable cache but skip the XLA AOT sub-caches,
        # whose machine-feature stamps mismatch across the axon-tunnel and
        # pure-CPU processes on this host (pages of loader warnings).
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:
        pass


def force_cpu(num_devices: int = 1) -> None:
    """Force the CPU backend (with a virtual device count).

    Must run BEFORE the JAX backend initialises (i.e. before any
    computation).  NOTE: on hosts with the ``axon`` TPU plugin, the
    ``JAX_PLATFORMS`` environment variable alone is IGNORED — only
    ``jax.config.update("jax_platforms", "cpu")`` reliably wins, so we do
    both.  ``XLA_FLAGS`` is read at backend init, so setting it here (before
    the first computation) still applies even if jax is already imported.
    """
    os.environ["JAX_PLATFORMS"] = "cpu"
    if num_devices > 1:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count="
                f"{num_devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")
