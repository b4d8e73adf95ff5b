"""JAX runtime setup shared by all entry points.

The remote-TPU compile path in some environments takes minutes per program
and is re-paid by every fresh process; the persistent compilation cache makes
compiles durable across processes (and harmless elsewhere).
"""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Enable JAX's persistent compilation cache (idempotent)."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/overlapnet_tpu/jax"),
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Remote-compile backends report near-zero client-side compile times (the
    # real compile happens lazily server-side), so cache everything.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir


def maybe_initialize_distributed() -> bool:
    """Env-gated multi-process (multi-host) bootstrap.

    Called by every CLI entry point. When the coordinator env vars are set,
    initializes jax.distributed so ``jax.devices()`` spans all hosts and
    meshes/collectives ride ICI/DCN; without them this is a no-op (the
    single-process path is unchanged). Variables:

      OVERLAPNET_COORDINATOR   host:port of process 0 (presence gates init)
      OVERLAPNET_NUM_PROCESSES total process count
      OVERLAPNET_PROCESS_ID    this process's rank

    On TPU pods with the standard cluster environment, setting only
    OVERLAPNET_COORDINATOR=auto defers to JAX's cluster autodetection.
    Returns True iff distributed mode was initialized.
    """
    coord = os.environ.get("OVERLAPNET_COORDINATOR")
    if not coord:
        return False
    import jax

    if coord == "auto":
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["OVERLAPNET_NUM_PROCESSES"]),
            process_id=int(os.environ["OVERLAPNET_PROCESS_ID"]),
        )
    return True


def enable_debug_nans(on: bool = True) -> None:
    """Turn on jax_debug_nans: every jitted computation re-runs op-by-op when
    a NaN appears and raises at the producing primitive — the framework's
    NaN sanitizer (SURVEY.md §5 'race detection / sanitizers'; the reference
    has no equivalent). Expensive; debug runs only."""
    import jax

    jax.config.update("jax_debug_nans", bool(on))
