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


def setup_jax(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.path.expanduser("~/.cache/jax_comp")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


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
