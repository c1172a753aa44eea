"""gpudrive_lab_tpu — a TPU-native, JAX/XLA re-implementation of the
GPUDrive multi-agent driving simulator and training stack.

The Madrona ECS megakernel of the reference (CILAB-MA/gpudrive_lab) is
replaced by fused jit-compiled step programs over padded struct-of-arrays
world batches; see SURVEY.md for the complete component mapping.
"""

import os

__version__ = "0.1.0"


def enable_compile_cache(tag: str | None = None) -> None:
    """Persist XLA executables across processes (the fused step/observation
    programs are large).  ``tag`` should distinguish incompatible targets
    (e.g. 'cpu' vs 'tpu') — AOT results compiled for another machine can
    SIGILL if shared."""
    if os.environ.get("GPUDRIVE_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    tag = tag or jax.default_backend()
    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser(f"~/.cache/gpudrive_lab_tpu/xla-{tag}"),
    )
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover — cache is best-effort
        pass
