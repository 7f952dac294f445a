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
    """Must run BEFORE importing jax anywhere in the process."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    if num_devices > 1:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={num_devices}")
