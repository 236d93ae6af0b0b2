"""Pallas TPU kernels + the one shared backend predicate.

Backend initialization on relay-attached devices (axon) can wedge
indefinitely when the relay is degraded — even `jax.default_backend()`
blocks inside the PJRT client handshake.  Every probe in the package
therefore goes through probe_backend_guarded(): a daemon-thread probe
with a timeout whose verdict is cached for the life of the process, so
a wedged relay costs one bounded stall instead of a hang per caller.
"""

import os as _os
import threading as _threading

_probe_lock = _threading.Lock()
_probe_result: bool | None = None  # cached on_tpu verdict


def probe_backend_guarded(timeout: float | None = None) -> bool:
    """Initialize the JAX backend in a daemon thread with a timeout and
    report whether it is a real TPU (incl. relay platforms like axon).

    On timeout the verdict is False, the device module is marked WEDGED
    (the probe thread stays marooned inside backend init, so process
    exit must be a hard exit), and the answer is cached: a degraded
    relay does not recover mid-run, and re-probing would maroon another
    thread each time.  MINIPROT_TPU_PROBE_TIMEOUT overrides the default
    60 s (0 disables the guard)."""
    global _probe_result
    with _probe_lock:
        if _probe_result is not None:
            return _probe_result
        if timeout is None:
            timeout = float(_os.environ.get("MINIPROT_TPU_PROBE_TIMEOUT", "60"))

        def probe() -> bool:
            import jax
            jax.devices()  # forces backend init; the step that wedges
            return jax.default_backend() in ("tpu", "axon")

        if timeout <= 0:
            try:
                _probe_result = bool(probe())
            except Exception:
                _probe_result = False
            return _probe_result

        import queue as _q
        box: _q.Queue = _q.Queue(1)

        def run() -> None:
            try:
                box.put(bool(probe()))
            except BaseException:
                box.put(False)

        # daemon thread, NOT ThreadPoolExecutor: executor workers are
        # joined at interpreter exit, so a probe wedged in the relay
        # would hang process shutdown after a host-engine run completed
        _threading.Thread(target=run, daemon=True, name="tpu-probe").start()
        try:
            _probe_result = box.get(timeout=timeout)
        except _q.Empty:
            from .. import device
            device.WEDGED = True
            import sys
            sys.stderr.write(
                f"WARNING: backend probe exceeded {timeout:.0f}s "
                "(wedged relay?); running on the host engine\n")
            _probe_result = False
        return _probe_result


def on_tpu_backend() -> bool:
    """True when the active JAX backend is real TPU hardware (including
    relay-attached platforms that register as tpu, e.g. axon).  The
    single source of truth for "compile the kernel" vs "interpret":
    every kernel's interpret default and every test gate uses this.
    Guarded + cached — safe to call even when the relay is wedged."""
    return probe_backend_guarded()
