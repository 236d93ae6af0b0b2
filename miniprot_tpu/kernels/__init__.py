"""Pallas TPU kernels + the one shared backend predicate."""


def on_tpu_backend() -> bool:
    """True when the active JAX backend is real TPU hardware (including
    relay-attached platforms that register as tpu, e.g. axon).  The
    single source of truth for "compile the kernel" vs "interpret":
    every kernel's interpret default and every test gate uses this."""
    try:
        import jax
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
