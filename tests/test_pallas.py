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


# ---------------------------------------------------------------------------
# Saturation equivalence (VERDICT r2 item 3): the ext kernel is int32
# and non-saturating; the reference saturates every add/sub at int16
# (nasw-sse.c:342-402).  device.ext_fits_int16 documents and enforces
# the equivalence bound al*max(mat)+end_bonus <= 32767; these tests
# drive the extension path to the +-32767 edges and bit-compare against
# the saturating host engine (mx_dp16).
# ---------------------------------------------------------------------------


def _perfect_codons(aa_codes, T):
    """nt4 genome spelling each aa code as one codon (perfect match)."""
    rev = np.full(22, -1, np.int64)
    for c in range(63, -1, -1):
        rev[T.codon[c]] = c
    cod = rev[aa_codes]
    assert (cod >= 0).all()
    return np.stack([(cod >> 4) & 3, (cod >> 2) & 3, cod & 3],
                    axis=1).reshape(-1).astype(np.uint8)


def _hot_matrix(diag, off):
    mat = np.full((22, 22), off, np.int32)
    np.fill_diagonal(mat, diag)
    mat[21, :] = mat[:, 21] = off          # X row stays punitive
    return mat


def test_ext_fits_int16_bound():
    from miniprot_tpu.device import ext_fits_int16
    assert ext_fits_int16(512, 11, 5)          # BLOSUM62 worst case
    assert ext_fits_int16(512, 63, 5)          # 32261 <= 32767
    assert not ext_fits_int16(512, 64, 5)      # 32773 > 32767
    assert not ext_fits_int16(300, 127, 5)
    assert ext_fits_int16(512, -4, 0)          # all-penalty matrix


@pytest.mark.skipif(not _on_tpu(), reason="needs a TPU backend")
def test_ext_saturation_edge_bit_exact():
    """Extension scores driven to the int16 edge (true max 32261 with a
    512-aa perfect match at diag=63): the int32 kernel must bit-match
    the saturating host engine right up to the bound."""
    from miniprot_tpu.kernels.nasw_pallas import RawExtBatch
    from miniprot_tpu.native import DPF_EXT_LEFT, DPF_EXT_RIGHT

    T = tables.get_tables(1)
    mat = _hot_matrix(63, -3)
    sp = tables.splice_model_scores(1)
    rng = np.random.default_rng(77)
    batch = RawExtBatch(al_pad=512, nl_pad=2640, mat=mat,
                        opt_scalars=(11, 1, 23, 29, 100, 5, 0.5), sp=sp,
                        trans_code=1)
    aa_pool = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", np.uint8)
    cases = []
    for k in range(12):
        al = 512 if k < 4 else int(rng.integers(64, 512))
        aa = rng.choice(aa_pool, al).astype(np.uint8)
        nt4 = _perfect_codons(T.aa20[aa], T)
        if k % 2:  # mutate a few codons so mismatch penalties engage
            pos = rng.integers(0, len(nt4), max(2, len(nt4) // 50))
            nt4 = nt4.copy()
            nt4[pos] = (nt4[pos] + 1) % 4
        tail = rng.integers(0, 4, int(rng.integers(0, 800))).astype(np.uint8)
        nt4 = np.concatenate([nt4, tail])
        ext_left = bool(rng.integers(0, 2))
        ns = np.frombuffer(b"ACGT", np.uint8)[nt4]
        cases.append((ns, aa, ext_left))
        if ext_left:
            batch.add_raw(nt4[::-1], T.aa20[aa][::-1], io=29, ext_left=True)
        else:
            batch.add_raw(nt4, T.aa20[aa], io=29)
    kw = dict(mat=mat, nt4=T.nt4, aa20=T.aa20, codon=T.codon, sp=sp,
              sp_null_bonus=-7, go=11, ge=1, io=29, fs=23, xdrop=100,
              end_bonus=5, ie_coef=0.5)
    hit_edge = 0
    for (ns, aa, ext_left), got in zip(cases, batch.run(interpret=False)):
        rsc, rntl, raal, _ = native.dp16(
            ns, aa, flag=DPF_EXT_LEFT if ext_left else DPF_EXT_RIGHT, **kw)
        assert got == (rsc, rntl, raal), (len(ns), len(aa), ext_left)
        if rsc > 30000:
            hit_edge += 1
    assert hit_edge >= 2, "test must actually reach the int16 edge"


@pytest.mark.skipif(not _on_tpu(), reason="needs a TPU backend")
def test_ext_saturation_deep_negative_bit_exact():
    """Adversarial penalties (go=120, ge=60, fs=125) push intermediate
    chain values far below -32768 in int32 terms; the reference clamps
    them at the floor.  Outputs must still agree (the floor provably
    cannot bind the tracked row maxima)."""
    from miniprot_tpu.kernels.nasw_pallas import RawExtBatch
    from miniprot_tpu.native import DPF_EXT_LEFT, DPF_EXT_RIGHT

    T = tables.get_tables(1)
    mat = _hot_matrix(63, -120)
    sp = tables.splice_model_scores(1)
    rng = np.random.default_rng(78)
    batch = RawExtBatch(al_pad=512, nl_pad=2112, mat=mat,
                        opt_scalars=(120, 60, 125, 29, 1 << 28, 5, 0.5),
                        sp=sp, trans_code=1)
    aa_pool = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", np.uint8)
    cases = []
    for _ in range(12):
        al = int(rng.integers(200, 512))
        nl = int(rng.integers(1100, 2100))
        aa = rng.choice(aa_pool, al).astype(np.uint8)
        nt4 = rng.integers(0, 4, nl).astype(np.uint8)
        ext_left = bool(rng.integers(0, 2))
        ns = np.frombuffer(b"ACGT", np.uint8)[nt4]
        cases.append((ns, aa, ext_left))
        if ext_left:
            batch.add_raw(nt4[::-1], T.aa20[aa][::-1], io=29, ext_left=True)
        else:
            batch.add_raw(nt4, T.aa20[aa], io=29)
    kw = dict(mat=mat, nt4=T.nt4, aa20=T.aa20, codon=T.codon, sp=sp,
              sp_null_bonus=-7, go=120, ge=60, io=29, fs=125,
              xdrop=1 << 28, end_bonus=5, ie_coef=0.5)
    for (ns, aa, ext_left), got in zip(cases, batch.run(interpret=False)):
        rsc, rntl, raal, _ = native.dp16(
            ns, aa, flag=DPF_EXT_LEFT if ext_left else DPF_EXT_RIGHT, **kw)
        assert got == (rsc, rntl, raal), (len(ns), len(aa), ext_left)


@pytest.mark.skipif(not _on_tpu(), reason="needs a TPU backend")
def test_ext_saturation_beyond_bound_routes_to_host():
    """A matrix whose attainable extension score exceeds int16 (diag=127,
    al=300 -> true 38105) must (a) actually saturate the reference path
    and (b) be routed to the host engine by ext_fits_int16, keeping the
    engine's output identical to the saturating semantics."""
    from miniprot_tpu.device import TpuExtEngine
    from miniprot_tpu.native import DPF_EXT_RIGHT
    from miniprot_tpu.options import MapOpt

    T = tables.get_tables(1)
    opt = MapOpt()
    opt.mat = _hot_matrix(127, -3)
    rng = np.random.default_rng(79)
    aa_pool = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", np.uint8)
    aa = rng.choice(aa_pool, 300).astype(np.uint8)
    nt4 = _perfect_codons(T.aa20[aa], T)
    nt4 = np.concatenate([nt4, rng.integers(0, 4, 1200).astype(np.uint8)])
    ns = np.frombuffer(b"ACGT", np.uint8)[nt4]
    sp = tables.splice_model_scores(1)
    kw = dict(mat=opt.mat, nt4=T.nt4, aa20=T.aa20, codon=T.codon, sp=sp,
              sp_null_bonus=-7, go=opt.go, ge=opt.ge, io=opt.io, fs=opt.fs,
              xdrop=opt.xdrop, end_bonus=opt.end_bonus, ie_coef=opt.ie_coef)
    rsc, rntl, raal, _ = native.dp16(ns, aa, flag=DPF_EXT_RIGHT, **kw)
    # the vector DP saturates at 32767; the reference then adds the end
    # bonus as unsaturated scalar int (nasw-sse.c:423-433 bookkeeping)
    assert rsc == 32767 + opt.end_bonus, \
        "reference semantics must saturate here"
    engine = TpuExtEngine(opt)
    engine.submit(("ext", ns, aa, None, opt.io, False))
    (res,) = engine.flush()
    assert engine.n_host == 1 and engine.n_tpu == 0
    assert res == (rsc, rntl, raal)
