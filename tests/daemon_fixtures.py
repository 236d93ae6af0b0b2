"""Importable fixtures for the daemon tests.

The daemon unpickles batch objects by reference, so classes shipped to
a daemon subprocess must live in a module importable on its side (the
test file itself is not; this helper is, via PYTHONPATH=tests)."""

import numpy as np


class FakeBatch:
    """Minimal stand-in exercising the daemon's launch/collect path:
    launch returns a tagged handle tuple like the CIGAR batches do,
    collect decodes it.  No device work — protocol-only tests."""

    def __init__(self, vals):
        self.vals = np.asarray(vals, np.int32)
        self.n = len(vals)
        self.nl = self.al = 1

    def launch(self, interpret=None):
        import jax.numpy as jnp
        return ("fake", jnp.asarray(self.vals * 2))

    def collect(self, handles):
        tag, doubled = handles
        assert tag == "fake"
        return [int(v) + 1 for v in np.asarray(doubled)]


class BoomBatch:
    """launch() raises — error propagation test."""

    n = nl = al = 1

    def launch(self, interpret=None):
        raise RuntimeError("boom-batch")

    def collect(self, handles):  # pragma: no cover
        raise AssertionError("never collected")
