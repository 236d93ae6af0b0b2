"""Scalar golden model of the splice/frameshift DP (SURVEY §4 item 2).

A direct NumPy transcription of the published recurrence
(nasw-sse.c:15-22 / paper Eq. 5):

    I(i,j) = max{ H(i,j-1) - q, I(i,j-1) } - e
    D(i,j) = max{ H(i-3,j) - q, D(i-3,j) } - e'   (e' = f at stop codons)
    A(i,j) = max{ H(i-1,j)   - r - d(i-1), A(i-1,j) }
    B(i,j) = max{ H(i-1,j-1) - r - d(i),   B(i-1,j) }
    C(i,j) = max{ H(i-1,j-1) - r - d(i+1), C(i-1,j) }
    H(i,j) = max{ H(i-3,j-1) + s(i,j), I, D,
                  H(i-1,j-1)-f, H(i-2,j-1)-f, H(i-1,j)-f, H(i-2,j)-f,
                  A - a(i), B - a(i-2), C - a(i-1) }

with saturating int16 arithmetic, boundary H(-1,-1)=0 and
H(0,-1)=H(1,-1)=-f, everything else -32768, and the global score read
at H(nl-1, al-1).  This is the reference's own intended verification
pattern (the declared-but-absent ns_splice_s1 scalar model,
nasw.h:136-137): an implementation of the equations with no striping,
no lazy-F, no lane packing — cross-checked here against the host
engine, which is itself fuzz-pinned byte-exact to the reference
binary.  A bug in the striped kernel's vector plumbing cannot hide in
a model that has none.
"""

import numpy as np
import pytest

NEG = -32768


def _sat(x):
    return np.clip(x, -32768, 32767)


def scalar_global_dp(nas, aas, donor, acceptor, mat, *, go, ge, io, fs):
    """Score of the global splice/frameshift alignment, int16-exact."""
    nl, al = len(nas), len(aas)
    # H rows i-3..i rotate through a (4, al+1) window; column 0 is j=-1
    Hrows = np.full((4, al + 1), NEG, np.int32)  # [i%4] = row i
    Drows = np.full((4, al + 1), NEG, np.int32)
    A = np.full(al + 1, NEG, np.int32)
    B = np.full(al + 1, NEG, np.int32)
    C = np.full(al + 1, NEG, np.int32)
    # boundary: virtual rows -1, 0, 1 (loop starts at i=2)
    Hrows[(-1) % 4, 0] = 0        # H(-1,-1) = 0
    Hrows[0, 0] = -fs             # H(0,-1)
    Hrows[1, 0] = -fs             # H(1,-1)
    sc = np.asarray(mat, np.int32).reshape(22, 22)
    for i in range(2, nl):
        Hm3 = Hrows[(i - 3) % 4]
        Hm2 = Hrows[(i - 2) % 4]
        Hm1 = Hrows[(i - 1) % 4]
        Dm3 = Drows[(i - 3) % 4]
        H = np.full(al + 1, NEG, np.int32)
        D = np.full(al + 1, NEG, np.int32)
        gei = fs if nas[i] == 20 else ge
        # A/B/C update first (they read only previous rows), in place
        A[1:] = np.maximum(_sat(_sat(Hm1[1:] - io) - donor[i - 1]), A[1:])
        B[1:] = np.maximum(_sat(_sat(Hm1[:-1] - io) - donor[i]), B[1:])
        C[1:] = np.maximum(_sat(_sat(Hm1[:-1] - io) - donor[i + 1]), C[1:])
        D[1:] = _sat(np.maximum(_sat(Hm3[1:] - go), Dm3[1:]) - gei)
        s_row = sc[nas[i]][aas].astype(np.int32)
        base = np.maximum.reduce([
            _sat(Hm3[:-1] + s_row),                 # match
            D[1:],
            _sat(Hm1[:-1] - fs), _sat(Hm2[:-1] - fs),
            _sat(Hm1[1:] - fs), _sat(Hm2[1:] - fs),
            _sat(A[1:] - acceptor[i]),
            _sat(B[1:] - acceptor[i - 2]),
            _sat(C[1:] - acceptor[i - 1]),
        ])
        # I runs left-to-right within the row
        I = NEG
        for j in range(al):
            I = _sat(max(_sat(H[j] - go), I) - ge)
            H[j + 1] = max(base[j], I)
        Hrows[i % 4] = H
        Drows[i % 4] = D
    return int(Hrows[(nl - 1) % 4, al])


def scalar_ext_dp(nas, aas, donor, acceptor, mat, *, go, ge, io, fs,
                  xdrop, end_bonus, ie_coef):
    """Extension-mode scalar model: per-row best with the terminal
    log-length penalty (ie_coef * mp_log2_f32), end_bonus at the last
    column, and the x-drop stop (nasw-sse.c:349-443 end logic)."""
    from miniprot_tpu.tables import mp_log2_f32

    nl, al = len(nas), len(aas)
    Hrows = np.full((4, al + 1), NEG, np.int32)
    Drows = np.full((4, al + 1), NEG, np.int32)
    A = np.full(al + 1, NEG, np.int32)
    B = np.full(al + 1, NEG, np.int32)
    C = np.full(al + 1, NEG, np.int32)
    Hrows[(-1) % 4, 0] = 0
    Hrows[0, 0] = -fs
    Hrows[1, 0] = -fs
    sc = np.asarray(mat, np.int32).reshape(22, 22)
    NEG_INF = -0x80000000
    max_sc = max_sc_log = NEG_INF
    max_i = -1
    hmax_row = None
    pen_len = al * 3
    for i in range(2, nl):
        Hm3 = Hrows[(i - 3) % 4]
        Hm2 = Hrows[(i - 2) % 4]
        Hm1 = Hrows[(i - 1) % 4]
        Dm3 = Drows[(i - 3) % 4]
        H = np.full(al + 1, NEG, np.int32)
        D = np.full(al + 1, NEG, np.int32)
        gei = fs if nas[i] == 20 else ge
        A[1:] = np.maximum(_sat(_sat(Hm1[1:] - io) - donor[i - 1]), A[1:])
        B[1:] = np.maximum(_sat(_sat(Hm1[:-1] - io) - donor[i]), B[1:])
        C[1:] = np.maximum(_sat(_sat(Hm1[:-1] - io) - donor[i + 1]), C[1:])
        D[1:] = _sat(np.maximum(_sat(Hm3[1:] - go), Dm3[1:]) - gei)
        s_row = sc[nas[i]][aas].astype(np.int32)
        base = np.maximum.reduce([
            _sat(Hm3[:-1] + s_row),
            D[1:],
            _sat(Hm1[:-1] - fs), _sat(Hm2[:-1] - fs),
            _sat(Hm1[1:] - fs), _sat(Hm2[1:] - fs),
            _sat(A[1:] - acceptor[i]),
            _sat(B[1:] - acceptor[i - 2]),
            _sat(C[1:] - acceptor[i - 1]),
        ])
        I = NEG
        for j in range(al):
            I = _sat(max(_sat(H[j] - go), I) - ge)
            H[j + 1] = max(base[j], I)
        Hrows[i % 4] = H
        Drows[i % 4] = D
        tmp_sc = int(H[1:].max())
        end_sc = int(H[al]) + end_bonus
        tmp_sc = max(tmp_sc, end_sc)
        x = i - pen_len
        pen = 0 if x < 2 else int(np.float32(ie_coef) * mp_log2_f32(
            np.float32(x)) + np.float32(0.5))
        tmp_sc_log = tmp_sc - pen
        if tmp_sc_log > max_sc_log:
            max_sc, max_sc_log, max_i = tmp_sc, tmp_sc_log, i
            hmax_row = H.copy()
        if max_sc_log - tmp_sc_log > xdrop:
            break
    for j in range(al):
        s = int(hmax_row[j + 1]) + (end_bonus if j == al - 1 else 0)
        if s == max_sc:
            break
    return max_sc, max_i + 1, j + 1


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("ext_left", [False, True])
def test_scalar_ext_model_matches_host_engine(seed, ext_left):
    from miniprot_tpu.align import DpEnv
    from miniprot_tpu.kernels.nasw_pallas import prep_problem
    from miniprot_tpu.options import MapOpt

    rng = np.random.default_rng(100 + seed)
    nl = int(rng.integers(60, 900))
    al = int(rng.integers(5, 64))
    NT = np.frombuffer(b"ACGT", np.uint8)
    AA = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", np.uint8)
    nsq = NT[rng.integers(0, 4, nl)].copy()
    asq = AA[rng.integers(0, 20, al)].copy()

    opt = MapOpt()
    env = DpEnv(opt)
    flag = 0x2 if ext_left else 0x4   # DPF_EXT_LEFT / DPF_EXT_RIGHT
    got = env.dp(nsq, asq, flag, ss=None, io=opt.io)[:3]

    nas, aas, donor, acceptor = prep_problem(
        nsq, asq, sp=env.sp, sp_null_bonus=opt.sp_null_bonus,
        io=opt.io, ext_left=ext_left)
    want = scalar_ext_dp(nas, aas, donor.astype(np.int32),
                         acceptor.astype(np.int32), opt.mat,
                         go=opt.go, ge=opt.ge, io=opt.io, fs=opt.fs,
                         xdrop=opt.xdrop, end_bonus=opt.end_bonus,
                         ie_coef=opt.ie_coef)
    assert got == want, (f"seed={seed} ext_left={ext_left} nl={nl} al={al}: "
                         f"host {got} vs scalar {want}")


@pytest.mark.parametrize("seed", range(6))
def test_scalar_model_matches_host_engine(seed):
    from miniprot_tpu.align import DpEnv
    from miniprot_tpu.kernels.nasw_pallas import prep_problem
    from miniprot_tpu.options import MapOpt

    rng = np.random.default_rng(seed)
    nl = int(rng.integers(60, 900))
    al = int(rng.integers(5, 64))
    NT = np.frombuffer(b"ACGT", np.uint8)
    AA = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", np.uint8)
    nsq = NT[rng.integers(0, 4, nl)].copy()
    asq = AA[rng.integers(0, 20, al)].copy()

    opt = MapOpt()
    env = DpEnv(opt)
    got, _, _, _ = env.dp(nsq, asq, 0x1, ss=None, io=opt.io)  # DPF_CIGAR

    nas, aas, donor, acceptor = prep_problem(
        nsq, asq, sp=env.sp, sp_null_bonus=opt.sp_null_bonus,
        io=opt.io, ext_left=False)
    want = scalar_global_dp(nas, aas, donor.astype(np.int32),
                            acceptor.astype(np.int32), opt.mat,
                            go=opt.go, ge=opt.ge, io=opt.io, fs=opt.fs)
    assert got == want, f"seed={seed} nl={nl} al={al}: host {got} vs scalar {want}"
