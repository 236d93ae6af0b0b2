"""TPU kernel tests: prep parity always; Pallas kernels on TPU backends."""
import numpy as np
import pytest

from miniprot_tpu import native, tables
from miniprot_tpu.kernels.nasw_pallas import prep_problem


def _on_tpu():
    from miniprot_tpu.kernels import on_tpu_backend
    return on_tpu_backend()


def test_prep_matches_reference_exact():
    T = tables.get_tables(1)
    rng = np.random.default_rng(31)
    for _ in range(100):
        nl = int(rng.integers(1, 400))
        ext_left = bool(rng.integers(0, 2))
        sp = tables.splice_model_scores(int(rng.choice([0, 1, 2])))
        ns = rng.choice(list(b"ACGTN"), nl, p=[.24, .24, .24, .24, .04]).astype(np.uint8)
        ss = None
        if rng.integers(0, 2):
            ss = np.full(nl, 0xFF, np.uint8)
            k = int(rng.integers(0, max(nl // 5, 2)))
            ss[rng.integers(0, nl, k)] = rng.integers(0, 256, k).astype(np.uint8)
        c_nas, c_d, c_a = native.prep(ns, nt4=T.nt4, codon=T.codon, sp=sp,
                                      sp_null_bonus=-7, io=29,
                                      ext_left=ext_left, ss=ss)
        nas, _, d, a = prep_problem(ns, np.frombuffer(b"M", np.uint8), sp=sp,
                                    sp_null_bonus=-7, io=29,
                                    ext_left=ext_left, ss=ss)
        assert np.array_equal(c_nas, nas)
        assert np.array_equal(c_d.astype(np.int32), d)
        assert np.array_equal(c_a.astype(np.int32), a)


@pytest.mark.skipif(not _on_tpu(), reason="needs a TPU backend")
def test_ext_kernel_matches_host_dp():
    from miniprot_tpu.kernels.nasw_pallas import ExtBatch
    from miniprot_tpu.native import DPF_EXT_LEFT, DPF_EXT_RIGHT

    T = tables.get_tables(1)
    mat = tables.BLOSUM62.copy()
    tables.set_stop_sc(mat, 23)
    sp = tables.splice_model_scores(1)
    kw = dict(mat=mat, nt4=T.nt4, aa20=T.aa20, codon=T.codon, sp=sp,
              sp_null_bonus=-7, go=11, ge=1, io=29, fs=23, xdrop=100,
              end_bonus=5, ie_coef=0.5)
    rng = np.random.default_rng(9)
    batch = ExtBatch(al_pad=128, nl_pad=256, mat=mat,
                     opt_scalars=(11, 1, 23, 29, 100, 5, 0.5))
    cases = []
    for _ in range(12):
        nl = int(rng.integers(10, 250))
        al = int(rng.integers(1, 120))
        ext_left = bool(rng.integers(0, 2))
        ns = rng.choice(list(b"ACGT"), nl).astype(np.uint8)
        aa = rng.choice(list(b"ARNDCQEGHILKMFPSTWYV"), al).astype(np.uint8)
        cases.append((ns, aa, ext_left))
        nas, aas, d, a = prep_problem(ns, aa, sp=sp, sp_null_bonus=-7, io=29,
                                      ext_left=ext_left)
        batch.add(nas, aas, d, a)
    for (ns, aa, ext_left), got in zip(cases, batch.run(interpret=False)):
        rsc, rntl, raal, _ = native.dp16(
            ns, aa, flag=DPF_EXT_LEFT if ext_left else DPF_EXT_RIGHT, **kw)
        assert got == (rsc, rntl, raal)


@pytest.mark.skipif(not _on_tpu(), reason="needs a TPU backend")
def test_cigar_kernel_bit_exact_traceback():
    from miniprot_tpu.kernels.nasw_cigar_pallas import CigarBatch
    from miniprot_tpu.native import DPF_CIGAR

    T = tables.get_tables(1)
    mat = tables.BLOSUM62.copy()
    tables.set_stop_sc(mat, 23)
    sp = tables.splice_model_scores(1)
    kw = dict(mat=mat, nt4=T.nt4, aa20=T.aa20, codon=T.codon, sp=sp,
              sp_null_bonus=-7, go=11, ge=1, io=29, fs=23, xdrop=100,
              end_bonus=5, ie_coef=0.5)
    rng = np.random.default_rng(12)
    batch = CigarBatch(al_pad=16, nl_pad=256, mat=mat,
                       opt_scalars=(11, 1, 23, 29, 100, 5, 0.5))
    cases = []
    for _ in range(12):
        nl = int(rng.integers(9, 250))
        al = int(rng.integers(9, 17))  # ceil(al/8)==2 == batch slen
        ns = rng.choice(list(b"ACGTN"), nl, p=[.24, .24, .24, .24, .04]).astype(np.uint8)
        aa = rng.choice(list(b"ARNDCQEGHILKMFPSTWYVX*"), al).astype(np.uint8)
        cases.append((ns, aa))
        nas, aas, d, a = prep_problem(ns, aa, sp=sp, sp_null_bonus=-7, io=29,
                                      ext_left=False)
        batch.add(nas, aas, d, a)
    for (ns, aa), (sc, cig) in zip(cases, batch.run(interpret=False)):
        rsc, _, _, rcig = native.dp16(ns, aa, flag=DPF_CIGAR, **kw)
        assert sc == rsc
        assert np.array_equal(cig, rcig)


def test_device_sketch_matches_host():
    if not _on_tpu():
        pytest.skip("needs a TPU backend")
    from miniprot_tpu.sketch import sketch_nt4
    from miniprot_tpu.kernels.sketch_jax import sketch_nt4_device
    rng = np.random.default_rng(4)
    for _ in range(3):
        n = int(rng.integers(1000, 60000))
        seq = rng.choice(np.arange(5, dtype=np.uint8), n,
                         p=[.24, .24, .24, .24, .04])
        a = np.sort(sketch_nt4(seq, 30, 6, 1, 8, 77))
        b = np.sort(sketch_nt4_device(seq, 30, 6, 1, 8, 77))
        assert np.array_equal(a, b)


def test_device_prep_matches_host_prep():
    """_prep_tracks_device (raw-path XLA prep) is bit-identical to the
    host prep_problem + ExtBatch.add track semantics, mixed left/right
    lanes and per-lane io/al/nl (runs on any backend: plain jnp ops)."""
    import jax
    import jax.numpy as jnp
    from miniprot_tpu.kernels import nasw_pallas as nk

    rng = np.random.default_rng(33)
    T = tables.get_tables(1)
    for sp_model in (1, 2):
        sp = tables.splice_model_scores(sp_model)
        R, AL, B = nk.ROW_CHUNK, 64, nk.B_LANES
        nt8 = np.zeros((R + 8, B), np.int8)
        leftb = np.zeros((1, B), np.int8)
        iov = np.zeros((1, B), np.int32)
        als = np.ones((1, B), np.int32)
        nlv1 = np.zeros((1, B), np.int32)
        jobs = []
        for b in range(B):
            nl = int(rng.integers(5, R))
            al = int(rng.integers(2, AL))
            nsq = rng.choice(list(b"ACGTNacgtn"), nl).astype(np.uint8)
            asq = rng.choice(list(b"ARNDCQEGHILKMFPSTWYVX*"), al).astype(np.uint8)
            left = bool(rng.integers(0, 2))
            io = int(rng.integers(5, 60))
            jobs.append((nsq, asq, left, io, nl, al))
            nt = T.nt4[nsq]
            nt8[:nl, b] = nt[::-1] if left else nt
            leftb[0, b] = left
            iov[0, b] = io
            als[0, b] = al
            nlv1[0, b] = nl
        thr = nk._logpen_thresholds(0.5, R)
        f = jax.jit(lambda *a: nk._prep_tracks_device(
            *a, sp=sp, codon=T.codon, thr=thr, n_rows=R, al=AL))
        nas_d, D_d, A_d, pen_d, _, em_d, qp_d = [
            np.asarray(x) for x in f(nt8, jnp.asarray(leftb),
                                     jnp.asarray(iov), jnp.asarray(als),
                                     jnp.asarray(nlv1))]
        for b, (nsq, asq, left, io, nl, al) in enumerate(jobs):
            nas, _, donor, acceptor = prep_problem(
                nsq, asq, sp=sp, sp_null_bonus=-7, io=io, ext_left=left)
            D_h = np.zeros(R + 8, np.int32)
            D_h[:nl + 1] = donor.astype(np.int32)[:nl + 1] + io
            A_h = np.zeros(R + 8, np.int32)
            A_h[:nl + 1] = acceptor.astype(np.int32)[:nl + 1]
            x = np.arange(R) - 3 * al
            pen_h = np.where(x < 2, 0,
                             (np.float32(0.5) * tables.mp_log2_f32(np.maximum(x, 2))
                              + np.float32(0.5)).astype(np.int32))
            assert np.array_equal(nas_d[:nl, b], nas), (sp_model, b)
            assert np.array_equal(D_d[:, b], D_h), (sp_model, b)
            assert np.array_equal(A_d[:, b], A_h), (sp_model, b)
            assert np.array_equal(pen_d[:, b], pen_h), (sp_model, b)
            assert np.array_equal(qp_d[:, b], (np.arange(AL) >= al)), b
            assert np.array_equal(em_d[:, b], (np.arange(AL) == al - 1)), b


@pytest.mark.skipif(not _on_tpu(), reason="needs a TPU backend")
def test_raw_ext_batch_matches_host_dp():
    """RawExtBatch (raw nt upload + device prep) reproduces the host
    striped DP exactly, mixed left/right lanes with per-lane io."""
    from miniprot_tpu.kernels.nasw_pallas import RawExtBatch
    from miniprot_tpu.native import DPF_EXT_LEFT, DPF_EXT_RIGHT

    T = tables.get_tables(1)
    mat = tables.BLOSUM62.copy()
    tables.set_stop_sc(mat, 23)
    sp = tables.splice_model_scores(1)
    rng = np.random.default_rng(11)
    batch = RawExtBatch(al_pad=128, nl_pad=256, mat=mat,
                        opt_scalars=(11, 1, 23, 29, 100, 5, 0.5), sp=sp,
                        trans_code=1)
    cases = []
    for _ in range(16):
        nl = int(rng.integers(10, 250))
        al = int(rng.integers(1, 120))
        ext_left = bool(rng.integers(0, 2))
        io = int(rng.choice([19, 29]))
        ns = rng.choice(list(b"ACGT"), nl).astype(np.uint8)
        aa = rng.choice(list(b"ARNDCQEGHILKMFPSTWYV"), al).astype(np.uint8)
        cases.append((ns, aa, ext_left, io))
        nt4 = T.nt4[ns]
        aas = T.aa20[aa]
        if ext_left:
            nt4 = nt4[::-1]
            aas = aas[::-1]
        batch.add_raw(nt4, aas, io=io, ext_left=ext_left)
    for (ns, aa, ext_left, io), got in zip(cases, batch.run(interpret=False)):
        kw = dict(mat=mat, nt4=T.nt4, aa20=T.aa20, codon=T.codon, sp=sp,
                  sp_null_bonus=-7, go=11, ge=1, io=io, fs=23, xdrop=100,
                  end_bonus=5, ie_coef=0.5)
        rsc, rntl, raal, _ = native.dp16(
            ns, aa, flag=DPF_EXT_LEFT if ext_left else DPF_EXT_RIGHT, **kw)
        assert got == (rsc, rntl, raal)


@pytest.mark.skipif(not _on_tpu(), reason="needs a TPU backend")
def test_raw_cigar_batch_bit_exact_traceback():
    """RawCigarBatch (raw nt upload + device prep + tb row clip) yields
    bit-identical scores and CIGARs to the host striped DP."""
    from miniprot_tpu.kernels.nasw_cigar_pallas import RawCigarBatch
    from miniprot_tpu.native import DPF_CIGAR

    T = tables.get_tables(1)
    mat = tables.BLOSUM62.copy()
    tables.set_stop_sc(mat, 23)
    sp = tables.splice_model_scores(1)
    kw = dict(mat=mat, nt4=T.nt4, aa20=T.aa20, codon=T.codon, sp=sp,
              sp_null_bonus=-7, go=11, ge=1, io=29, fs=23, xdrop=100,
              end_bonus=5, ie_coef=0.5)
    rng = np.random.default_rng(13)
    batch = RawCigarBatch(al_pad=16, nl_pad=256, mat=mat,
                          opt_scalars=(11, 1, 23, 29, 100, 5, 0.5), sp=sp,
                          trans_code=1)
    cases = []
    for _ in range(12):
        nl = int(rng.integers(9, 250))
        al = int(rng.integers(9, 17))  # ceil(al/8)==2 == batch slen
        ns = rng.choice(list(b"ACGTN"), nl, p=[.24, .24, .24, .24, .04]).astype(np.uint8)
        aa = rng.choice(list(b"ARNDCQEGHILKMFPSTWYVX*"), al).astype(np.uint8)
        cases.append((ns, aa))
        batch.add_raw(T.nt4[ns], T.aa20[aa], io=29)
    for (ns, aa), (sc, cig) in zip(cases, batch.run(interpret=False)):
        rsc, _, _, rcig = native.dp16(ns, aa, flag=DPF_CIGAR, **kw)
        assert sc == rsc
        assert np.array_equal(cig, rcig)


@pytest.mark.skipif(not _on_tpu(), reason="needs a TPU backend")
def test_cigar_kernel_mixed_stripes_bit_exact():
    """One batch mixing per-problem stripe counts (al 2..128) must give
    bit-exact scores + tracebacks vs the host striped DP, which derives
    striping from each problem's own al."""
    from miniprot_tpu.kernels.nasw_cigar_pallas import CigarBatch
    from miniprot_tpu.native import DPF_CIGAR

    T = tables.get_tables(1)
    mat = tables.BLOSUM62.copy()
    tables.set_stop_sc(mat, 23)
    sp = tables.splice_model_scores(1)
    kw = dict(mat=mat, nt4=T.nt4, aa20=T.aa20, codon=T.codon, sp=sp,
              sp_null_bonus=-7, go=11, ge=1, io=29, fs=23, xdrop=100,
              end_bonus=5, ie_coef=0.5)
    rng = np.random.default_rng(77)
    batch = CigarBatch(al_pad=128, nl_pad=2048, mat=mat,
                       opt_scalars=(11, 1, 23, 29, 100, 5, 0.5))
    cases = []
    for _ in range(24):
        nl = int(rng.integers(9, 1800))
        al = int(rng.integers(2, 129))
        ns = rng.choice(list(b"ACGTN"), nl, p=[.24, .24, .24, .24, .04]).astype(np.uint8)
        aa = rng.choice(list(b"ARNDCQEGHILKMFPSTWYVX*"), al).astype(np.uint8)
        cases.append((ns, aa))
        nas, aas, d, a = prep_problem(ns, aa, sp=sp, sp_null_bonus=-7, io=29,
                                      ext_left=False)
        batch.add(nas, aas, d, a)
    for (ns, aa), (sc, cig) in zip(cases, batch.run(interpret=False)):
        rsc, _, _, rcig = native.dp16(ns, aa, flag=DPF_CIGAR, **kw)
        assert sc == rsc, (len(ns), len(aa))
        assert np.array_equal(cig, rcig), (len(ns), len(aa))


@pytest.mark.skipif(not _on_tpu(), reason="needs a TPU backend")
def test_cigar_kernel_wide_stripes_bit_exact():
    """slen_max = 64 class (al up to 512): the post-extension CIGAR
    re-runs of whole proteins land here."""
    from miniprot_tpu.kernels.nasw_cigar_pallas import RawCigarBatch
    from miniprot_tpu.native import DPF_CIGAR

    T = tables.get_tables(1)
    mat = tables.BLOSUM62.copy()
    tables.set_stop_sc(mat, 23)
    sp = tables.splice_model_scores(1)
    kw = dict(mat=mat, nt4=T.nt4, aa20=T.aa20, codon=T.codon, sp=sp,
              sp_null_bonus=-7, go=11, ge=1, io=29, fs=23, xdrop=100,
              end_bonus=5, ie_coef=0.5)
    rng = np.random.default_rng(99)
    batch = RawCigarBatch(al_pad=512, nl_pad=2048, mat=mat,
                          opt_scalars=(11, 1, 23, 29, 100, 5, 0.5),
                          sp=sp, trans_code=1)
    cases = []
    for _ in range(8):
        nl = int(rng.integers(600, 2048))
        al = int(rng.integers(130, 513))
        ns = rng.choice(list(b"ACGTN"), nl, p=[.24, .24, .24, .24, .04]).astype(np.uint8)
        aa = rng.choice(list(b"ARNDCQEGHILKMFPSTWYVX"), al).astype(np.uint8)
        cases.append((ns, aa))
        batch.add_raw(T.nt4[ns], T.aa20[aa], io=29)
    for (ns, aa), (sc, cig) in zip(cases, batch.run(interpret=False)):
        rsc, _, _, rcig = native.dp16(ns, aa, flag=DPF_CIGAR, **kw)
        assert sc == rsc, (len(ns), len(aa))
        assert np.array_equal(cig, rcig), (len(ns), len(aa))


@pytest.mark.skipif(not _on_tpu(), reason="needs a TPU backend")
def test_dp32_kernel_bit_exact():
    """32-bit Pallas variant (gs32b: 4 int32 lanes, non-saturating)
    matches the host mx_dp32 scores + tracebacks bit-for-bit, including
    score regimes beyond int16 (long high-identity matches)."""
    from miniprot_tpu.kernels.nasw_cigar_pallas import Dp32Batch
    from miniprot_tpu.native import DPF_CIGAR, dp32

    T = tables.get_tables(1)
    mat = tables.BLOSUM62.copy()
    tables.set_stop_sc(mat, 23)
    sp = tables.splice_model_scores(1)
    kw = dict(mat=mat, nt4=T.nt4, aa20=T.aa20, codon=T.codon, sp=sp,
              sp_null_bonus=-7, go=11, ge=1, io=29, fs=23)
    rng = np.random.default_rng(314)
    batch = Dp32Batch(al_pad=128, nl_pad=2048, mat=mat,
                      opt_scalars=(11, 1, 23, 29, 100, 5, 0.5))
    cases = []
    for k in range(16):
        al = int(rng.integers(2, 129))
        if k < 4:
            # exact translated match: per-aa score ~5-11, al*11 can
            # push multi-kilo-aa... here just a high-scoring diagonal
            aa = rng.choice(list(b"ARNDCQEGHILKMFPSTWYV"), al).astype(np.uint8)
            from miniprot_tpu.testgen import _aa2codons
            codons = _aa2codons()
            nt_str = "".join(codons[chr(c)][0] for c in aa)
            ns = np.frombuffer(nt_str.encode(), np.uint8)
        else:
            nl = int(rng.integers(9, 1800))
            ns = rng.choice(list(b"ACGTN"), nl, p=[.24, .24, .24, .24, .04]).astype(np.uint8)
            aa = rng.choice(list(b"ARNDCQEGHILKMFPSTWYVX*"), al).astype(np.uint8)
        cases.append((ns, aa))
        nas, aas, d, a = prep_problem(ns, aa, sp=sp, sp_null_bonus=-7, io=29,
                                      ext_left=False)
        batch.add(nas, aas, d, a)
    for (ns, aa), (sc, cig) in zip(cases, batch.run(interpret=False)):
        rsc, rcig = dp32(ns, aa, flag=DPF_CIGAR, **kw)
        assert sc == rsc, (len(ns), len(aa), sc, rsc)
        assert np.array_equal(cig, rcig), (len(ns), len(aa))


def test_index_build_device_sketch_matches_host(dpp3_files):
    """Index.build(use_tpu=True) (device six-frame sketching) produces
    identical ki/kb tables to the host fork-pool build."""
    from miniprot_tpu.index import Index
    from miniprot_tpu.options import IdxOpt
    genome, _ = dpp3_files
    a = Index.build(genome, IdxOpt())
    b = Index.build(genome, IdxOpt(), use_tpu=True)
    assert np.array_equal(a.ki, b.ki)
    assert np.array_equal(a.kb, b.kb)


@pytest.mark.skipif(not _on_tpu(), reason="needs a TPU backend")
def test_big_ext_bucket_100kb_window_bit_exact():
    """The 101376-row extension bucket (one full default max_intron/2 =
    100kb window, device.py NL_BUCKETS[-1]) matches the host striped DP
    exactly — the genome axis streams through the grid, so correctness
    must hold far beyond the VMEM-resident row count."""
    from miniprot_tpu.kernels.nasw_pallas import RawExtBatch
    from miniprot_tpu.native import DPF_EXT_LEFT, DPF_EXT_RIGHT

    T = tables.get_tables(1)
    mat = tables.BLOSUM62.copy()
    tables.set_stop_sc(mat, 23)
    sp = tables.splice_model_scores(1)
    rng = np.random.default_rng(1003)
    batch = RawExtBatch(al_pad=512, nl_pad=101376, mat=mat,
                        opt_scalars=(11, 1, 23, 29, 100, 5, 0.5), sp=sp,
                        trans_code=1)
    cases = []
    for _ in range(4):
        nl = int(rng.integers(70_000, 101_376))
        al = int(rng.integers(200, 512))
        ext_left = bool(rng.integers(0, 2))
        ns = rng.choice(list(b"ACGT"), nl).astype(np.uint8)
        aa = rng.choice(list(b"ARNDCQEGHILKMFPSTWYV"), al).astype(np.uint8)
        cases.append((ns, aa, ext_left))
        nt4, aas = T.nt4[ns], T.aa20[aa]
        if ext_left:
            nt4, aas = nt4[::-1], aas[::-1]
        batch.add_raw(nt4, aas, io=29, ext_left=ext_left)
    for (ns, aa, ext_left), got in zip(cases, batch.run(interpret=False)):
        kw = dict(mat=mat, nt4=T.nt4, aa20=T.aa20, codon=T.codon, sp=sp,
                  sp_null_bonus=-7, go=11, ge=1, io=29, fs=23, xdrop=100,
                  end_bonus=5, ie_coef=0.5)
        rsc, rntl, raal, _ = native.dp16(
            ns, aa, flag=DPF_EXT_LEFT if ext_left else DPF_EXT_RIGHT, **kw)
        assert got == (rsc, rntl, raal), (len(ns), len(aa), ext_left)


@pytest.mark.skipif(not _on_tpu(), reason="needs a TPU backend")
def test_big_cigar_bucket_64k_rows_bit_exact():
    """The 65536-row CIGAR bucket (slen class 4, traceback ~537MB HBM)
    produces bit-exact tracebacks vs the host striped DP."""
    from miniprot_tpu.kernels.nasw_cigar_pallas import RawCigarBatch
    from miniprot_tpu.native import DPF_CIGAR

    T = tables.get_tables(1)
    mat = tables.BLOSUM62.copy()
    tables.set_stop_sc(mat, 23)
    sp = tables.splice_model_scores(1)
    kw = dict(mat=mat, nt4=T.nt4, aa20=T.aa20, codon=T.codon, sp=sp,
              sp_null_bonus=-7, go=11, ge=1, io=29, fs=23, xdrop=100,
              end_bonus=5, ie_coef=0.5)
    rng = np.random.default_rng(1004)
    batch = RawCigarBatch(al_pad=32, nl_pad=65536, mat=mat,
                          opt_scalars=(11, 1, 23, 29, 100, 5, 0.5),
                          sp=sp, trans_code=1)
    cases = []
    for _ in range(4):
        nl = int(rng.integers(40_000, 65_536))
        al = int(rng.integers(8, 33))
        ns = rng.choice(list(b"ACGTN"), nl, p=[.24, .24, .24, .24, .04]).astype(np.uint8)
        aa = rng.choice(list(b"ARNDCQEGHILKMFPSTWYVX"), al).astype(np.uint8)
        cases.append((ns, aa))
        batch.add_raw(T.nt4[ns], T.aa20[aa], io=29)
    for (ns, aa), (sc, cig) in zip(cases, batch.run(interpret=False)):
        rsc, _, _, rcig = native.dp16(ns, aa, flag=DPF_CIGAR, **kw)
        assert sc == rsc, (len(ns), len(aa))
        assert np.array_equal(cig, rcig), (len(ns), len(aa))


def test_device_traceback_walk_interpret_parity():
    """The on-device traceback walk (state stream + mx_cigar_from_states
    replay) matches the host striped DP bit-for-bit.  Runs the Pallas
    kernel in interpret mode, so this covers the walk on CPU-only CI;
    the on-TPU big-bucket tests above cover it on hardware."""
    from miniprot_tpu.kernels.nasw_cigar_pallas import RawCigarBatch
    from miniprot_tpu.native import DPF_CIGAR

    T = tables.get_tables(1)
    mat = tables.BLOSUM62.copy()
    tables.set_stop_sc(mat, 23)
    sp = tables.splice_model_scores(1)
    kw = dict(mat=mat, nt4=T.nt4, aa20=T.aa20, codon=T.codon, sp=sp,
              sp_null_bonus=-7, go=11, ge=1, io=29, fs=23, xdrop=100,
              end_bonus=5, ie_coef=0.5)
    rng = np.random.default_rng(1005)
    batch = RawCigarBatch(al_pad=32, nl_pad=256, mat=mat,
                          opt_scalars=(11, 1, 23, 29, 100, 5, 0.5),
                          sp=sp, trans_code=1)
    cases = []
    for _ in range(4):
        nl = int(rng.integers(40, 250))
        al = int(rng.integers(2, 32))
        ns = rng.choice(list(b"ACGTN"), nl, p=[.24, .24, .24, .24, .04]).astype(np.uint8)
        aa = rng.choice(list(b"ARNDCQEGHILKMFPSTWYVX"), al).astype(np.uint8)
        cases.append((ns, aa))
        batch.add_raw(T.nt4[ns], T.aa20[aa], io=29)
    handles = batch.launch(interpret=True)
    assert handles[0] == "dtb", "device-walk path should be the default"
    for (ns, aa), (sc, cig) in zip(cases, batch.collect(handles)):
        rsc, _, _, rcig = native.dp16(ns, aa, flag=DPF_CIGAR, **kw)
        assert sc == rsc, (len(ns), len(aa))
        assert np.array_equal(cig, rcig), (len(ns), len(aa))
