"""Unit tests of TpuExtEngine._prefetch's wave-fetch packing: one
device_get covers every pending batch's outputs (each separate fetch
costs a full relay round trip), preserving the tag + arity of each
batch's handle tuple so the per-batch collect decodes them unchanged."""

import numpy as np


def _engine():
    from miniprot_tpu.device import TpuExtEngine
    eng = TpuExtEngine.__new__(TpuExtEngine)
    eng.interpret = False
    eng.broken = False
    return eng


def test_prefetch_preserves_tags_and_arity():
    eng = _engine()
    a = np.arange(6).reshape(2, 3)
    b = np.ones(4, np.int32)
    sc = np.zeros((1, 8), np.int32)
    pending = [
        ([0], None, ("dtb", a, b, b, sc)),   # device-walk CIGAR handle
        ([1], None, ("tb", a, sc)),          # resident-tb CIGAR handle
        ([2], None, sc),                     # ext handle: bare array
    ]
    pre = eng._prefetch(pending)
    assert pre is not None and len(pre) == 3
    assert pre[0][0] == "dtb" and len(pre[0]) == 5
    np.testing.assert_array_equal(pre[0][1], a)
    assert pre[1][0] == "tb" and len(pre[1]) == 3
    np.testing.assert_array_equal(pre[2], sc)


def test_prefetch_skips_single_batch_and_broken():
    eng = _engine()
    one = [([0], None, np.zeros(3))]
    assert eng._prefetch(one) is None          # nothing to amortize
    eng.broken = True
    assert eng._prefetch(one * 2) is None      # device already given up
    eng.broken = False
    eng.interpret = True
    assert eng._prefetch(one * 2) is None      # interpret mode: no relay


def test_prefetch_failure_marks_engine_broken(monkeypatch):
    import miniprot_tpu.device as dev

    eng = _engine()
    eng.opt = None

    def boom(fn):
        raise TimeoutError("device collect exceeded 1s")

    monkeypatch.setattr(eng, "_guarded", boom)
    # _device_failed sets the module-global WEDGED on TimeoutError; the
    # CLI hard-exits the process when it sees it — restore it so later
    # in-process cli.main() tests are unaffected
    monkeypatch.setattr(dev, "WEDGED", dev.WEDGED)
    pending = [([0], None, np.zeros(3)), ([1], None, np.zeros(3))]
    assert eng._prefetch(pending) is None
    assert eng.broken
