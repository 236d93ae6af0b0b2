"""Scan-based CIGAR kernel (nasw_cigar_scan) parity vs the reference.

The scan kernel claims BYTE-IDENTICAL traceback to the striped kernel
(and hence the reference's ns_global_gs16b NS_F_CIGAR, nasw-sse.c:
340-541) for go >= 1.  These tests pin that against the host C engine
(mx_dp16, itself byte-parity-tested against the reference) and against
the striped kernel across mixed shapes, splice tracks, and saturating
score regimes.  They run compiled on a TPU backend or interpreted on
CPU — same assertions either way.
"""
import numpy as np
import pytest

from miniprot_tpu import native, tables
from miniprot_tpu.kernels.nasw_pallas import prep_problem
from miniprot_tpu.native import DPF_CIGAR

OPT = (11, 1, 23, 29, 100, 5, 0.5)      # go ge fs io xdrop endb ie_coef


def _interp():
    from miniprot_tpu.kernels import on_tpu_backend
    return not on_tpu_backend()


def _setup(go=11, ge=1, fs=23):
    T = tables.get_tables(1)
    mat = tables.BLOSUM62.copy()
    tables.set_stop_sc(mat, fs)
    sp = tables.splice_model_scores(1)
    kw = dict(mat=mat, nt4=T.nt4, aa20=T.aa20, codon=T.codon, sp=sp,
              sp_null_bonus=-7, go=go, ge=ge, io=29, fs=fs, xdrop=100,
              end_bonus=5, ie_coef=0.5)
    return T, mat, sp, kw


@pytest.mark.parametrize("al_pad,nl_pad,n,seed", [
    (8, 64, 16, 3),       # slen 1: fully wrap-driven I chains
    (32, 256, 24, 4),     # the mapper's small class
    (128, 256, 12, 5),    # the mapper's big class
])
def test_scan_cigar_matches_reference(al_pad, nl_pad, n, seed):
    from miniprot_tpu.kernels.nasw_cigar_scan import ScanCigarBatch
    T, mat, sp, kw = _setup()
    rng = np.random.default_rng(seed)
    batch = ScanCigarBatch(al_pad=al_pad, nl_pad=nl_pad, mat=mat,
                           opt_scalars=OPT)
    cases = []
    for _ in range(n):
        nl = int(rng.integers(3, nl_pad))
        al = int(rng.integers(1, al_pad + 1))
        ns = rng.choice(list(b"ACGTN"), nl,
                        p=[.24, .24, .24, .24, .04]).astype(np.uint8)
        aa = rng.choice(list(b"ARNDCQEGHILKMFPSTWYVX*"), al).astype(np.uint8)
        cases.append((ns, aa))
        nas, aas, d, a = prep_problem(ns, aa, sp=sp, sp_null_bonus=-7,
                                      io=29, ext_left=False)
        batch.add(nas, aas, d, a)
    for (ns, aa), (sc, cig) in zip(cases, batch.run(interpret=_interp())):
        rsc, _, _, rcig = native.dp16(ns, aa, flag=DPF_CIGAR, **kw)
        assert sc == rsc
        assert np.array_equal(cig, rcig)


def test_scan_cigar_wide_class_matches_reference():
    """The al<=512 class runs the reduced ROW_CHUNK=64 grid (VMEM: two
    (chunk, 512, 128) int16 out blocks, double-buffered)."""
    from miniprot_tpu.kernels.nasw_cigar_scan import RawScanCigarBatch
    T, mat, sp, kw = _setup()
    rng = np.random.default_rng(77)
    nl_pad = 512 if _interp() else 2048   # interpret mode is ~10^4x slower
    batch = RawScanCigarBatch(al_pad=512, nl_pad=nl_pad, mat=mat,
                              opt_scalars=OPT, sp=sp, trans_code=1)
    cases = []
    for _ in range(6):
        nl = int(rng.integers(300, nl_pad))
        al = int(rng.integers(120, 513))
        ns = rng.choice(list(b"ACGTN"), nl,
                        p=[.24, .24, .24, .24, .04]).astype(np.uint8)
        aa = rng.choice(list(b"ARNDCQEGHILKMFPSTWYVX*"), al).astype(np.uint8)
        cases.append((ns, aa))
        batch.add_raw(T.nt4[ns], T.aa20[aa], io=29)
    for (ns, aa), (sc, cig) in zip(cases, batch.run(interpret=_interp())):
        rsc, _, _, rcig = native.dp16(ns, aa, flag=DPF_CIGAR, **kw)
        assert sc == rsc
        assert np.array_equal(cig, rcig)


def test_stacked_small_class_matches_reference():
    """Raw4ScanCigarBatch: 4 interleaved problems per lane column, up
    to 512 per launch.  Mixed shapes across all 4 sub-blocks must be
    byte-identical to the reference DP."""
    from miniprot_tpu.kernels.nasw_cigar_scan import Raw4ScanCigarBatch
    T, mat, sp, kw = _setup()
    rng = np.random.default_rng(56)
    interp = _interp()
    n = 140 if interp else 400      # spread into sub-blocks 1-3
    nl_pad = 256 if interp else 1024
    batch = Raw4ScanCigarBatch(32, nl_pad, mat, opt_scalars=OPT, sp=sp,
                               trans_code=1)
    cases = []
    for _ in range(n):
        nl = int(rng.integers(3, nl_pad - 24))
        al = int(rng.integers(1, 33))
        ns = rng.choice(list(b"ACGTN"), nl,
                        p=[.24, .24, .24, .24, .04]).astype(np.uint8)
        aa = rng.choice(list(b"ARNDCQEGHILKMFPSTWYVX*"), al).astype(np.uint8)
        cases.append((ns, aa))
        batch.add_raw(T.nt4[ns], T.aa20[aa], io=29)
    for (ns, aa), r in zip(cases, batch.run(interpret=interp)):
        rsc, _, _, rcig = native.dp16(ns, aa, flag=DPF_CIGAR, **kw)
        assert r is not None
        sc, cig = r
        assert sc == rsc
        assert np.array_equal(cig, rcig)


def test_scan_cigar_raw_matches_reference():
    from miniprot_tpu.kernels.nasw_cigar_scan import RawScanCigarBatch
    T, mat, sp, kw = _setup()
    rng = np.random.default_rng(17)
    batch = RawScanCigarBatch(al_pad=32, nl_pad=256, mat=mat,
                              opt_scalars=OPT, sp=sp, trans_code=1)
    cases = []
    for _ in range(20):
        nl = int(rng.integers(3, 250))
        al = int(rng.integers(1, 33))
        ns = rng.choice(list(b"ACGTN"), nl,
                        p=[.24, .24, .24, .24, .04]).astype(np.uint8)
        aa = rng.choice(list(b"ARNDCQEGHILKMFPSTWYVX*"), al).astype(np.uint8)
        cases.append((ns, aa))
        batch.add_raw(T.nt4[ns], T.aa20[aa], io=29)
    for (ns, aa), (sc, cig) in zip(cases, batch.run(interpret=_interp())):
        rsc, _, _, rcig = native.dp16(ns, aa, flag=DPF_CIGAR, **kw)
        assert sc == rsc
        assert np.array_equal(cig, rcig)


def test_scan_cigar_spsc_track_matches_reference():
    """External --spsc tracks ride the host-prep ScanCigarBatch path."""
    from miniprot_tpu.kernels.nasw_cigar_scan import ScanCigarBatch
    T, mat, sp, kw = _setup()
    rng = np.random.default_rng(23)
    batch = ScanCigarBatch(al_pad=32, nl_pad=256, mat=mat, opt_scalars=OPT)
    cases = []
    for _ in range(12):
        nl = int(rng.integers(9, 250))
        al = int(rng.integers(1, 33))
        ns = rng.choice(list(b"ACGTN"), nl,
                        p=[.24, .24, .24, .24, .04]).astype(np.uint8)
        aa = rng.choice(list(b"ARNDCQEGHILKMFPSTWYV"), al).astype(np.uint8)
        ss = np.full(nl, 0xFF, np.uint8)
        k = int(rng.integers(1, max(nl // 4, 2)))
        ss[rng.integers(0, nl, k)] = rng.integers(0, 256, k).astype(np.uint8)
        nas, aas, d, a = prep_problem(ns, aa, sp=sp, sp_null_bonus=-7,
                                      io=29, ext_left=False, ss=ss)
        if int(d.min()) + 29 < 0:
            continue    # folded donor would go negative: host-only job
        cases.append((ns, aa, ss))
        batch.add(nas, aas, d, a)
    assert batch.n >= 6
    for (ns, aa, ss), (sc, cig) in zip(cases, batch.run(interpret=_interp())):
        rsc, _, _, rcig = native.dp16(ns, aa, flag=DPF_CIGAR, ss=ss, **kw)
        assert sc == rsc
        assert np.array_equal(cig, rcig)


def test_scan_cigar_saturating_regime_matches_reference():
    """Inflated scores drive H to the int16 ceiling and deep floor; the
    scan kernel's clipped arithmetic must track the striped reference
    exactly (the ceiling can only engage at candidate time, never
    mid-chain — asserted here end-to-end)."""
    from miniprot_tpu.kernels.nasw_cigar_scan import ScanCigarBatch
    T, mat, sp, kw = _setup()
    mat_hot = mat.reshape(22, 22).copy()
    mat_hot[mat_hot > 0] = 125                 # int8 storage bound
    kw = dict(kw, mat=mat_hot)
    rng = np.random.default_rng(29)
    batch = ScanCigarBatch(al_pad=32, nl_pad=512, mat=mat_hot,
                           opt_scalars=(11, 1, 23, 29, 100, 5, 0.5))
    cases = []
    for _ in range(10):
        nl = int(rng.integers(100, 500))
        al = int(rng.integers(8, 33))
        # high-identity: amino acids translated back from genome codons
        ns = rng.choice(list(b"ACGT"), nl).astype(np.uint8)
        aa = rng.choice(list(b"ARNDCQEGHILKMFPSTWYV"), al).astype(np.uint8)
        cases.append((ns, aa))
        nas, aas, d, a = prep_problem(ns, aa, sp=sp, sp_null_bonus=-7,
                                      io=29, ext_left=False)
        batch.add(nas, aas, d, a)
    for (ns, aa), (sc, cig) in zip(cases, batch.run(interpret=_interp())):
        rsc, _, _, rcig = native.dp16(ns, aa, flag=DPF_CIGAR, **kw)
        assert sc == rsc
        assert np.array_equal(cig, rcig)


def test_scan_walk_round_cap_flags_unfinished(monkeypatch):
    """A tiny round budget leaves long paths unfinished; collect must
    surface those lanes as None (device._decode_cig_one then redoes
    them on the host engine) and still decode the lanes that fit."""
    from miniprot_tpu.kernels import nasw_cigar_scan as sk
    monkeypatch.setattr(sk, "_rounds_cap", lambda: 3)
    for f in (sk._compiled_scan_dtb, sk._compiled_scan_raw_dtb,
              sk._compiled_scan_raw_dtb_packed):
        f.cache_clear()
    try:
        T, mat, sp, kw = _setup()
        rng = np.random.default_rng(41)
        batch = sk.ScanCigarBatch(al_pad=32, nl_pad=256, mat=mat,
                                  opt_scalars=OPT)
        cases = []
        for _ in range(8):
            nl = int(rng.integers(150, 250))
            al = int(rng.integers(20, 33))
            ns = rng.choice(list(b"ACGT"), nl).astype(np.uint8)
            aa = rng.choice(list(b"ARNDCQEGHILKMFPSTWYV"), al).astype(np.uint8)
            cases.append((ns, aa))
            nas, aas, d, a = prep_problem(ns, aa, sp=sp, sp_null_bonus=-7,
                                          io=29, ext_left=False)
            batch.add(nas, aas, d, a)
        res = batch.run(interpret=_interp())
        assert any(r is None for r in res), \
            "3 rounds cannot finish 150+-row noisy paths"
        for (ns, aa), r in zip(cases, res):
            if r is None:
                continue
            sc, cig = r
            rsc, _, _, rcig = native.dp16(ns, aa, flag=DPF_CIGAR, **kw)
            assert sc == rsc and np.array_equal(cig, rcig)
    finally:
        for f in (sk._compiled_scan_dtb, sk._compiled_scan_raw_dtb,
                  sk._compiled_scan_raw_dtb_packed):
            f.cache_clear()


def test_scan_cigar_rejects_go0():
    """go==0 breaks scan/striped equivalence (the reference's lazy-F
    break truncates at exact ties); the batch must refuse the job so
    routing can fall back to the striped kernel."""
    from miniprot_tpu.kernels.nasw_cigar_scan import ScanCigarBatch
    T, mat, sp, _ = _setup()
    batch = ScanCigarBatch(al_pad=32, nl_pad=256, mat=mat,
                           opt_scalars=(0, 1, 23, 29, 100, 5, 0.5))
    nas, aas, d, a = prep_problem(
        np.frombuffer(b"ACGTACGTACGT", np.uint8),
        np.frombuffer(b"MKT", np.uint8), sp=sp, sp_null_bonus=-7, io=29,
        ext_left=False)
    with pytest.raises(AssertionError):
        batch.add(nas, aas, d, a)
