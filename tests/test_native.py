import numpy as np
import pytest

from miniprot_tpu import native, tables
from miniprot_tpu.native import DPF_CIGAR, DPF_EXT_LEFT, DPF_EXT_RIGHT


def dp_kwargs(io=29, fs=23, sp_model=1):
    T = tables.get_tables(1)
    mat = tables.BLOSUM62.copy()
    tables.set_stop_sc(mat, fs)
    return dict(mat=mat, nt4=T.nt4, aa20=T.aa20, codon=T.codon,
                sp=tables.splice_model_scores(sp_model), sp_null_bonus=-7,
                go=11, ge=1, io=io, fs=fs, xdrop=100, end_bonus=5, ie_coef=0.5)


def test_sort_u64_sorts():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2**63, 5000).astype(np.uint64)
    native.sort_u64(a)
    assert (np.diff(a.astype(object)) >= 0).all()


def test_sort_pair_keyed_on_x():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 50, 3000).astype(np.uint64)
    xy = np.stack([x, np.arange(3000, dtype=np.uint64)], axis=1)
    native.sort_pair(xy)
    assert (np.diff(xy[:, 0].astype(np.int64)) >= 0).all()
    # same multiset of payloads
    assert set(xy[:, 1].tolist()) == set(range(3000))


def test_dp_exact_match():
    # genome encodes MKLV exactly
    ns = np.frombuffer(b"ATGAAACTTGTT", np.uint8)
    aa = np.frombuffer(b"MKLV", np.uint8)
    sc, ntl, aal, cig = native.dp16(ns, aa, flag=DPF_CIGAR, **dp_kwargs())
    assert cig.tolist() == [4 << 4 | 0]  # 4M
    m = dp_kwargs()["mat"]
    T = tables.get_tables(1)
    exp = sum(int(m[T.aa20[c], T.aa20[c]]) for c in b"MKLV")
    assert sc == exp


def test_dp_intron():
    # MK <GT..intron..AG> LV with a phase-0 intron
    exon1, exon2 = b"ATGAAA", b"CTTGTT"
    intron = b"GTAAGT" + b"T" * 100 + b"TTTCAG"
    ns = np.frombuffer(exon1 + intron + exon2, np.uint8)
    aa = np.frombuffer(b"MKLV", np.uint8)
    sc, _, _, cig = native.dp16(ns, aa, flag=DPF_CIGAR, **dp_kwargs())
    ops = [(c >> 4, "MIDNSHP=XBFGUVE"[c & 0xF]) for c in cig]
    assert (112, "N") in ops, ops  # recognized the intron


def test_dp_frameshift():
    # single-base deletion inside a codon run -> frameshift op
    ns = np.frombuffer(b"ATGAAACTGTTCGT", np.uint8)  # MKL + broken
    aa = np.frombuffer(b"MKLV", np.uint8)
    sc, _, _, cig = native.dp16(ns, aa, flag=DPF_CIGAR, **dp_kwargs())
    assert any((c & 0xF) in (10, 11) for c in cig)  # has F or G


def test_dp_extension_stops_early():
    ns = np.frombuffer(b"ATGAAACTTGTT" + b"CCCCCC" * 30, np.uint8)
    aa = np.frombuffer(b"MKLV", np.uint8)
    sc, ntl, aal, _ = native.dp16(ns, aa, flag=DPF_EXT_RIGHT, **dp_kwargs())
    assert aal == 4 and ntl == 12


def test_dp_ext_left_reversed():
    ns = np.frombuffer(b"ATGAAACTTGTT", np.uint8)
    aa = np.frombuffer(b"MKLV", np.uint8)
    sc, ntl, aal, _ = native.dp16(ns, aa, flag=DPF_EXT_LEFT, **dp_kwargs())
    assert aal == 4 and ntl == 12


def test_cigar_consumption_property():
    """CIGAR must consume exactly (nl-ish, al) as align.c:194-200 asserts."""
    rng = np.random.default_rng(5)
    for _ in range(50):
        nl = int(rng.integers(9, 200))
        al = int(rng.integers(1, 60))
        ns = rng.choice(list(b"ACGT"), nl).astype(np.uint8)
        aa = rng.choice(list(b"ARNDCQEGHILKMFPSTWYV"), al).astype(np.uint8)
        _, _, _, cig = native.dp16(ns, aa, flag=DPF_CIGAR, **dp_kwargs())
        n_nt = n_aa = 0
        for c in cig:
            op, ln = c & 0xF, int(c) >> 4
            if op == 0:
                n_nt += 3 * ln
                n_aa += ln
            elif op == 1:
                n_aa += ln
            elif op == 2:
                n_nt += 3 * ln
            elif op == 3:
                n_nt += ln
            elif op in (12, 13):
                n_nt += ln
                n_aa += 1
            elif op == 10:
                n_nt += ln
            elif op == 11:
                n_nt += ln
                n_aa += 1
        assert n_nt == nl and n_aa == al, (nl, al, n_nt, n_aa)


def test_chain_simple_diagonal():
    # anchors on one diagonal chain together
    a = np.sort(np.array([(int(p) << 32) | q for p, q in
                          [(100, 10), (101, 11), (102, 12), (103, 13)]], dtype=np.uint64))
    out_a, u = native.chain(a, max_dist_x=256, max_dist_y=256, bw=256,
                            max_skip=25, max_iter=10**6, min_cnt=3, min_sc=0,
                            chn_coef_log=0.75, is_spliced=True, kmer=6, bbit=8)
    assert len(u) == 1
    assert int(u[0] & 0xFFFFFFFF) == 4


def test_dp32_matches_dp16_in_range():
    """The 32-bit library DP agrees with the 16-bit kernel wherever scores
    are in int16 range (and matches an SSE4.1 build of the reference
    exactly; the reference's own SSE2 emulation of _mm_insert_epi32 has a
    high-half bug, nasw-sse.c:314-327)."""
    rng = np.random.default_rng(3)
    kw = dp_kwargs()
    kw32 = {k: v for k, v in kw.items() if k not in ("xdrop", "end_bonus", "ie_coef")}
    for _ in range(30):
        nl = int(rng.integers(9, 300))
        al = int(rng.integers(1, 80))
        ns = rng.choice(list(b"ACGT"), nl).astype(np.uint8)
        aa = rng.choice(list(b"ARNDCQEGHILKMFPSTWYV"), al).astype(np.uint8)
        s16, _, _, c16 = native.dp16(ns, aa, flag=DPF_CIGAR, **kw)
        s32, c32 = native.dp32(ns, aa, flag=DPF_CIGAR, **kw32)
        # scores agree exactly; CIGARs may differ on ties because the two
        # variants stripe with 8 vs 4 lanes (true of the reference's own
        # gs16b/gs32b pair as well)
        assert s16 == s32
        def consumed(c):
            nt = aa_ = 0
            for x in c:
                op, ln = x & 0xF, int(x) >> 4
                nt += ln * (3 if op in (0, 2) else 1 if op in (3, 10, 11, 12, 13) else 0)
                aa_ += ln * (1 if op in (0, 1) else 0) + (1 if op in (11, 12, 13) else 0)
            return nt, aa_
        assert consumed(c16) == consumed(c32) == (len(ns), len(aa))


def test_native_sketch_nt4_matches_numpy_golden():
    """Multiset parity of the C six-frame ORF sketcher vs the NumPy golden
    model (which itself is parity-tested against the reference binary's
    index contents)."""
    from miniprot_tpu.sketch import sketch_nt4, sketch_nt4_numpy
    rng = np.random.default_rng(17)
    for trial in range(25):
        n = int(rng.integers(0, 4000))
        seq = rng.integers(0, 4, n).astype(np.uint8)
        seq[rng.random(n) < 0.01] = 4  # ambiguous bases split ORFs
        for (mal, k, mb, bb, bo) in [(30, 6, 1, 8, 77), (5, 5, 0, 0, 0),
                                     (1, 3, 2, 4, 123)]:
            a = np.sort(sketch_nt4(seq, mal, k, mb, bb, bo))
            b = np.sort(sketch_nt4_numpy(seq, mal, k, mb, bb, bo))
            assert np.array_equal(a, b), (trial, n, (mal, k, mb, bb, bo))


def test_score_ungapped_many_matches_single():
    from miniprot_tpu import native
    from miniprot_tpu.options import MapOpt
    from miniprot_tpu import tables
    opt = MapOpt()
    T = tables.get_tables(1)
    env_kw = dict(mat=opt.mat, nt4=T.nt4, aa20=T.aa20, codon=T.codon,
                  sp=np.zeros(6, np.int32), sp_null_bonus=0, go=11, ge=1,
                  fs=23, xdrop=100, end_bonus=5, ie_coef=0.5)
    ctx = native.Dp16Ctx(**env_kw)
    rng = np.random.default_rng(5)
    nt = rng.integers(0, 5, 500).astype(np.uint8)
    aa = rng.choice(list(b"ARNDCQEGHILKMFPSTWYVX"), 200).astype(np.uint8)
    triv = []
    for _ in range(40):
        alen = int(rng.integers(1, 6))
        nt_off = int(rng.integers(0, 500 - 3 * alen))
        aa_off = int(rng.integers(0, 200 - alen))
        triv.append((nt_off, aa_off, alen))
    got = ctx.score_ungapped_many(nt, aa, triv)
    for (no, ao, al), g in zip(triv, got):
        assert g == ctx.score_ungapped(nt[no:no + 3 * al].copy(),
                                       aa[ao:ao + al].copy())


def test_native_write_cs_matches_python_golden(dpp3_files):
    """C cs-string writer vs the pure-Python golden on real mappings."""
    import io as _io
    import miniprot_tpu.format as fm
    from miniprot_tpu.index import Index
    from miniprot_tpu.options import IdxOpt, MapOpt
    from miniprot_tpu.pipeline import map_file
    genome, query = dpp3_files
    calls = []
    orig = fm.write_cs

    def check(mi, aa, r):
        got = orig(mi, aa, r)
        want = fm.write_cs_python(mi, aa, r)
        assert got == want
        calls.append(1)
        return got

    fm.write_cs = check
    try:
        mi = Index.build(genome, IdxOpt())
        buf = _io.StringIO()
        map_file(mi, query, MapOpt(), 1, out=buf)
    finally:
        fm.write_cs = orig
    assert calls


def test_wide_ext_path_matches_8lane():
    """The AVX-512BW 32-lane extension path must equal the 8-lane path
    exactly (scores, end positions); skipped off-x86/AVX512 hosts."""
    import ctypes as ct
    from miniprot_tpu import native, tables
    from miniprot_tpu.options import MapOpt
    try:
        flag_ptr = ct.c_int32.in_dll(native._lib, "mx_no_wide_ext")
    except ValueError:
        pytest.skip("non-x86 build")
    opt = MapOpt()
    T = tables.get_tables(1)
    sp = (tables.splice_model_scores(1).astype(np.float32)
          + np.float32(0.499)).astype(np.int32)
    kw = dict(mat=opt.mat, nt4=T.nt4, aa20=T.aa20, codon=T.codon, sp=sp,
              sp_null_bonus=opt.sp_null_bonus, go=11, ge=1, fs=23,
              xdrop=100, end_bonus=5, ie_coef=0.5)
    rng = np.random.default_rng(44)
    for trial in range(60):
        nl = int(rng.integers(10, 3000))
        al = int(rng.integers(9, 400))
        io = int(rng.integers(5, 45))
        ns = rng.choice(list(b"ACGTN"), nl,
                        p=[.24, .24, .24, .24, .04]).astype(np.uint8)
        aa = rng.choice(list(b"ARNDCQEGHILKMFPSTWYVX*"), al).astype(np.uint8)
        fl = native.DPF_EXT_LEFT if trial % 2 else native.DPF_EXT_RIGHT
        ss = rng.integers(0, 256, nl).astype(np.uint8) if trial % 5 == 0 else None
        try:
            flag_ptr.value = 1
            a = native.dp16(ns, aa, flag=fl, io=io, ss=ss, **kw)[:3]
            flag_ptr.value = 0
            b = native.dp16(ns, aa, flag=fl, io=io, ss=ss, **kw)[:3]
        finally:
            flag_ptr.value = 0
        assert a == b, (trial, nl, al, io, fl, a, b)


def test_x4_cigar_batch_matches_singles():
    """The 4-problem AVX-512 CIGAR batch (mx_dp16x4) must produce the
    exact per-problem scores and traceback CIGARs of mx_dp16, including
    the --spsc track path and odd chunk sizes."""
    from miniprot_tpu import native
    from miniprot_tpu.align import DpEnv
    from miniprot_tpu.options import MapOpt

    env = DpEnv(MapOpt())
    rng = np.random.default_rng(77)
    old = native._X4_PAYS
    native._X4_PAYS = True   # force the batched path regardless of probe
    try:
        for trial in range(40):
            jobs = []
            for _ in range(int(rng.integers(1, 11))):
                nl = int(rng.integers(3, 900))
                al = int(rng.integers(1, 250))
                ss = (rng.integers(0, 256, nl).astype(np.uint8)
                      if rng.random() < 0.25 else None)
                nsq = rng.choice(list(b"ACGTN"), nl,
                                 p=[.24, .24, .24, .24, .04]).astype(np.uint8)
                asq = rng.choice(list(b"ARNDCQEGHILKMFPSTWYVX*"), al).astype(np.uint8)
                jobs.append((nsq, asq, ss))
            batched = env.dp_cigars(jobs)
            for (nsq, asq, ss), (bsc, bcig) in zip(jobs, batched):
                sc, _, _, c = env.dp(nsq, asq, native.DPF_CIGAR, ss=ss)
                assert sc == bsc and np.array_equal(c, bcig), (len(nsq), len(asq))
    finally:
        native._X4_PAYS = old


def test_idx_stat_matches_numpy():
    from miniprot_tpu import native
    rng = np.random.default_rng(3)
    for _ in range(20):
        n = int(rng.integers(2, 5000))
        counts = rng.integers(0, 30, n)
        counts[rng.random(n) < 0.6] = 0
        ki = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)[:n]
        max_occ = int(rng.integers(1, 25))
        occ, nl, tot, sl = native.idx_stat(ki, max_occ)
        c = np.diff(ki)
        assert occ == int((c > 0).sum())
        assert nl == int((c > max_occ).sum())
        assert sl == int(c[c > max_occ].sum())
        assert tot == int(c[c <= max_occ].sum())


def test_bucket_prep_matches_numpy():
    from miniprot_tpu import native
    rng = np.random.default_rng(4)
    counts = rng.integers(0, 7, 100000)
    ki, cursors = native.bucket_prep(counts)
    want = np.concatenate([[0], np.cumsum(counts[:-1])])
    assert np.array_equal(ki, want) and np.array_equal(cursors, want)


def test_bucket_scan_shift_roundtrip():
    """The in-place counts->offsets->cursors->offsets cycle used by
    Index.build (one array instead of counts/ki/cursors)."""
    from miniprot_tpu import native
    rng = np.random.default_rng(5)
    counts = rng.integers(0, 7, 100000).astype(np.int64)
    want = np.concatenate([[0], np.cumsum(counts[:-1])])
    ki = counts.copy()
    native.bucket_scan(ki)
    assert np.array_equal(ki, want)
    # a full scatter advances each cursor by its bucket's count,
    # leaving end offsets; shift restores start offsets
    end = ki + counts
    native.bucket_shift(end)
    assert np.array_equal(end, want)


def test_sketch_prot_c_matches_numpy():
    from miniprot_tpu.sketch import sketch_prot, sketch_prot_numpy
    rng = np.random.default_rng(6)
    for _ in range(60):
        n = int(rng.integers(0, 2000))
        seq = rng.choice(list(b"ARNDCQEGHILKMFPSTWYVXBZ*U"), n).astype(np.uint8)
        k = int(rng.integers(3, 8))
        m = int(rng.integers(0, 3))
        a = sketch_prot(seq, k, m)
        b = sketch_prot_numpy(seq, k, m)
        assert np.array_equal(a, b), (n, k, m)


def test_bb_streaming_build_matches_sorted_merge():
    """The streaming fused bucket build (mx_bb_reset/add/finish) equals
    the sorted-parts counting merge (the fork path) on randomized part
    sets, including empty parts, duplicate entries, skewed buckets and
    small n_bucket (the single-partition branch)."""
    from miniprot_tpu import native
    rng = np.random.default_rng(77)
    for trial in range(25):
        bucket_bits = int(rng.integers(3, 19))
        n_bucket = 1 << bucket_bits
        n_parts = int(rng.integers(1, 7))
        # disjoint ascending block ranges per part (the invariant the
        # real sketch parts satisfy: bo[] offsets increase in part order)
        parts, base = [], 0
        for _ in range(n_parts):
            n = int(rng.integers(0, 5000))
            if rng.random() < 0.15:
                n = 0
            span = int(rng.integers(1, 4000)) + 1
            h = rng.integers(0, n_bucket, n).astype(np.uint64)
            if rng.random() < 0.4 and n > 0:  # skew into few buckets
                h = (h % max(1, n_bucket // 64)).astype(np.uint64)
            b = (base + rng.integers(0, span, n)).astype(np.uint64)
            part = (h << np.uint64(32)) | b
            part[rng.random(n) < 0.3] = part[0] if n else 0  # duplicates
            parts.append(part)
            base += span
        total = sum(len(p) for p in parts)

        # golden: per-part sort+dedup, then counting merge
        sparts = [native.sort_dedup_u64(p.copy()).copy() for p in parts]
        ki_g = np.zeros(n_bucket, np.int64)
        for p in sparts:
            native.count_bucket(p, ki_g)
        native.bucket_scan(ki_g)
        kb_g = np.empty(sum(len(p) for p in sparts), np.uint32)
        for p in sparts:
            native.scatter_bucket(p, ki_g, kb_g)
        native.bucket_shift(ki_g)

        # streaming build on the RAW (unsorted, duplicated) parts
        native.bb_reset(n_bucket, int(rng.integers(0, total + 1)))
        for p in parts:
            native.bb_add(p)
        ki_s = np.empty(n_bucket, np.int64)
        kb_s = np.empty(total, np.uint32)
        n_final = native.bb_finish(ki_s, kb_s)

        assert n_final == len(kb_g), (trial, bucket_bits)
        assert np.array_equal(kb_s[:n_final], kb_g), trial
        assert np.array_equal(ki_s, ki_g), trial


def test_align_region_native_matches_generator(tmp_path):
    """The one-call native region driver (mx_align_region) is
    bit-identical to driving the device path's DP-step generator
    (align.align_region_steps + run_steps_host) — same Extra records,
    same emitted bytes — across a randomized multi-gene workload with
    frameshifts, reverse strands and both --dbg-aflt modes."""
    import io

    from miniprot_tpu import align as al
    from miniprot_tpu.index import Index
    from miniprot_tpu.bseq import read_fastx
    from miniprot_tpu.options import IdxOpt, MapOpt
    from miniprot_tpu.pipeline import _emit_query
    from miniprot_tpu.mapper import map_query
    from miniprot_tpu.testgen import make_workload

    fa, faa = str(tmp_path / "g.fa"), str(tmp_path / "q.faa")
    make_workload(fa, faa, genome_len=300_000, n_genes=10, seed=23, n_ctg=2,
                  max_exons=6, max_intron=3000, mut_rate=0.06, rev_frac=0.5,
                  fs_frac=0.3)
    mi = Index.build(fa, IdxOpt())
    recs = list(read_fastx(faa))

    def run(use_native, more_dp):
        saved = al.align_region
        if not use_native:
            def gen_driver(env, opt, mi_, qlen, aa, r, extl0, extr0,
                           dbg_more_dp=False):
                al.run_steps_host(
                    al.align_region_steps(env, opt, mi_, qlen, aa, r,
                                          extl0, extr0, dbg_more_dp), env)
            al.align_region = gen_driver
        import miniprot_tpu.mapper as mp
        mp.align_region = al.align_region
        try:
            buf = io.StringIO()
            idc = [0]
            opt = MapOpt()
            dbg = {"more_dp": True} if more_dp else None
            for rec in recs:
                seq = np.frombuffer(rec.seq, np.uint8)
                regs = map_query(mi, seq, opt, dbg=dbg)
                _emit_query(mi, opt, rec.name, seq, regs, idc, buf)
            return buf.getvalue()
        finally:
            al.align_region = saved
            mp.align_region = saved

    for more_dp in (False, True):
        got = run(True, more_dp)
        want = run(False, more_dp)
        assert got == want, f"native driver diverged (more_dp={more_dp})"
        assert got.count("\n") >= 10


def test_refine_region_native_matches_python(tmp_path):
    """mx_refine_region (one-call refinement) produces the same region
    state as the Python plan it replaced, across a randomized workload:
    same anchors, chain scores, and coordinates."""
    import copy

    from miniprot_tpu import mapper
    from miniprot_tpu.hits import cal_max_ext, reg_gen_from_block, sort_reg
    from miniprot_tpu.index import Index
    from miniprot_tpu.bseq import read_fastx
    from miniprot_tpu.options import IdxOpt, MapOpt
    from miniprot_tpu.testgen import make_workload

    fa, faa = str(tmp_path / "g.fa"), str(tmp_path / "q.faa")
    make_workload(fa, faa, genome_len=250_000, n_genes=8, seed=41, n_ctg=2,
                  max_exons=5, max_intron=2500, mut_rate=0.07, rev_frac=0.5,
                  fs_frac=0.25)
    mi = Index.build(fa, IdxOpt())
    opt = MapOpt()
    n_checked = 0
    for rec in read_fastx(faa):
        seq = np.frombuffer(rec.seq, np.uint8)
        a = mapper.seed_anchors(mi, seq, opt)
        native.sort_u64(a)
        a, u = native.chain(a, max_dist_x=opt.max_intron,
                            max_dist_y=opt.max_gap, bw=opt.bw,
                            max_skip=opt.max_chn_max_skip,
                            max_iter=opt.max_chn_iter,
                            min_cnt=opt.min_chn_cnt, min_sc=opt.min_chn_sc,
                            chn_coef_log=opt.chn_coef_log, is_spliced=True,
                            kmer=mi.opt.kmer, bbit=mi.opt.bbit)
        regs = sort_reg(reg_gen_from_block(mi, u, a))
        ext = cal_max_ext(None, regs, 100, opt.max_ext)
        for r, (el, er) in zip(regs, ext):
            r2 = copy.deepcopy(r)
            mapper.refine_region(mi, opt, seq, r, el, er)
            mapper.refine_region_py(mi, opt, seq, r2, el, er)
            assert np.array_equal(r.a, r2.a), rec.name
            assert (r.chn_sc, r.qs, r.qe, r.vs, r.ve) == \
                   (r2.chn_sc, r2.qs, r2.qe, r2.vs, r2.ve), rec.name
            if len(r.a):
                assert r.chn_sc_ungap == r2.chn_sc_ungap, rec.name
            n_checked += 1
    assert n_checked >= 8


def test_seed_anchors_native_matches_python(tmp_path):
    """mx_seed_anchors (one-call seed gather incl. the boxplot
    occurrence cap) returns exactly the anchors of the Python plan."""
    from miniprot_tpu import mapper
    from miniprot_tpu.index import Index
    from miniprot_tpu.bseq import read_fastx
    from miniprot_tpu.options import IdxOpt, MapOpt
    from miniprot_tpu.testgen import make_workload

    fa, faa = str(tmp_path / "g.fa"), str(tmp_path / "q.faa")
    make_workload(fa, faa, genome_len=200_000, n_genes=8, seed=57, n_ctg=3,
                  max_exons=4, max_intron=2000, mut_rate=0.05, rev_frac=0.5)
    mi = Index.build(fa, IdxOpt())
    opt = MapOpt()
    n_nonempty = 0
    for rec in read_fastx(faa):
        seq = np.frombuffer(rec.seq, np.uint8)
        got = mapper.seed_anchors(mi, seq, opt)
        want = mapper.seed_anchors_py(mi, seq, opt)
        assert np.array_equal(got, want), rec.name
        n_nonempty += len(got) > 0
    # tiny queries (< 8 seeds, no boxplot) too
    for q in (b"M", b"MKVLLPQ", b"MKVLLPQRSTAVILXX*QQ"):
        seq = np.frombuffer(q, np.uint8)
        assert np.array_equal(mapper.seed_anchors(mi, seq, opt),
                              mapper.seed_anchors_py(mi, seq, opt))
    assert n_nonempty >= 6
