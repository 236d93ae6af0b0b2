"""Pallas TPU kernel: batched splice/frameshift-aware DP (score-only).

This is the TPU-native formulation of the reference's striped SSE DP
(nasw-sse.c:340-443).  Layout: one (genome-window x protein) problem per
*lane*, protein positions along *sublanes*:

    state arrays are (AL, B) int32 tiles, B = 128 problems per batch,
    AL = padded protein length (multiple of 8 sublanes)

so every VPU op advances all 128 problems by one genome row across their
whole protein.  The genome axis is sequential (ring buffers of 3 rows,
exactly the reference's H1/H2/H3 + D1..D3 rotation) and is streamed
through VMEM in row chunks by the Pallas grid.

Instead of the SSE lazy-F loop, the within-row I-state recurrence
    I(i,j) = max{ H(i,j-1) - go, I(i,j-1) } - e
is solved exactly with a prefix max-scan along the protein axis:
    I(i,j) = max_{k<j}(Hni(i,k) + k*e) - go - j*e
(where Hni is H without the I option; opening from an I cell is
dominated because go >= 0), which is value-equivalent to the reference's
lazy-F fixpoint.  Scores are int32 without saturation; equivalent to the
reference's saturating int16 whenever true path scores stay within
int16 range (always, for real proteins the reference itself handles).

The extension bookkeeping (per-row max, end bonus, log-length-adjusted
best row, x-drop deactivation) mirrors nasw-sse.c:349-443; per-problem
termination is handled with an active mask so a batch runs until its
slowest member x-drops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import tables

NEG = -(1 << 29)
B_LANES = 128
ROW_CHUNK = 256


def _roll_down1(x, fill_row):
    """Shift +1 along sublanes: out[q] = x[q-1]; out[0] = fill_row."""
    al = x.shape[0]
    rolled = pltpu.roll(x, shift=1, axis=0)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row_ids == 0, fill_row, rolled)


def _cummax_sublanes(x):
    """Inclusive running max along axis 0 via log-step shifts."""
    al = x.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = 1
    while s < al:
        sh = pltpu.roll(x, shift=s, axis=0)
        x = jnp.where(row_ids >= s, jnp.maximum(x, sh), x)
        s <<= 1
    return x


def _ext_kernel(al, n_rows, go, ge, fs, io, xdrop, end_bonus,
                # streamed per-row inputs (ROW_CHUNK, B):
                nas_ref, dm1_ref, d0_ref, dp1_ref, a0_ref, am1_ref, am2_ref,
                logpen_ref, nl_ref, prof_ref, endmask_ref,
                # outputs:
                max_sc_ref, max_i_ref, hmax_ref,
                # scratch:
                Hst, Dst, Aa, Bb, Cc, hmaxv, msc, mscl, mi, act):
    """One grid step = ROW_CHUNK genome rows for all B problems."""
    chunk = pl.program_id(0)
    qge = jax.lax.broadcasted_iota(jnp.int32, (al, B_LANES), 0) * ge

    @pl.when(chunk == 0)
    def _init():
        Hst[:] = jnp.full_like(Hst, NEG)
        Dst[:] = jnp.full_like(Dst, NEG)
        Aa[:] = jnp.full_like(Aa, NEG)
        Bb[:] = jnp.full_like(Bb, NEG)
        Cc[:] = jnp.full_like(Cc, NEG)
        hmaxv[:] = jnp.full_like(hmaxv, NEG)
        msc[:] = jnp.full_like(msc, NEG)
        mscl[:] = jnp.full_like(mscl, NEG)
        mi[:] = jnp.full_like(mi, -1)
        act[:] = jnp.ones_like(act)

    def row_body(ii, _):
        i = chunk * ROW_CHUNK + ii  # global genome row; DP starts at i=2
        valid_row = i >= 2

        @pl.when(valid_row)
        def _():
            slot = jax.lax.rem(i, 3)
            s1 = jax.lax.rem(i + 2, 3)   # (i-1) % 3
            s2 = jax.lax.rem(i + 1, 3)   # (i-2) % 3
            H3 = Hst[slot]
            H1 = Hst[s1]
            H2 = Hst[s2]
            D3 = Dst[slot]
            # boundary column H(i-k, -1): the reference's -1-column
            # initials exist only at i==2; for i>2 the striped shift
            # overwrites them with neg_inf (nasw-sse.c:267-271)
            hc3 = jnp.where(i == 2, 0, NEG)
            hc1 = jnp.where(i == 2, -fs, NEG)
            hc2 = jnp.where(i == 2, -fs, NEG)
            H3m1 = _roll_down1(H3, hc3)
            H1m1 = _roll_down1(H1, hc1)
            H2m1 = _roll_down1(H2, hc2)

            nas_i = nas_ref[ii, :][None, :]      # (1,B)
            # profile select: S[q,b] = mat[nas_i[b], aas[q,b]]
            S = jnp.full((al, B_LANES), NEG, jnp.int32)
            for a in range(22):
                S = jnp.where(nas_i == a, prof_ref[a], S)
            gei = jnp.where(nas_i == 20, fs, ge)

            h = H3m1 + S
            # D (ring slot i%3 currently holds D(i-3))
            Dn = jnp.maximum(H3 - go, D3) - gei
            Dst[slot] = Dn
            h = jnp.maximum(h, Dn)
            # A/B/C intron states
            An = jnp.maximum(H1 - io - dm1_ref[ii, :][None, :], Aa[0])
            Aa[0] = An
            h = jnp.maximum(h, An - a0_ref[ii, :][None, :])
            u = H1m1 - io
            Bn = jnp.maximum(u - d0_ref[ii, :][None, :], Bb[0])
            Bb[0] = Bn
            h = jnp.maximum(h, Bn - am2_ref[ii, :][None, :])
            Cn = jnp.maximum(u - dp1_ref[ii, :][None, :], Cc[0])
            Cc[0] = Cn
            h = jnp.maximum(h, Cn - am1_ref[ii, :][None, :])
            # frameshift transitions
            h = jnp.maximum(h, H1 - fs)
            h = jnp.maximum(h, H2 - fs)
            h = jnp.maximum(h, H1m1 - fs)
            h = jnp.maximum(h, H2m1 - fs)
            # I via prefix scan (exact lazy-F fixpoint)
            M = _cummax_sublanes(h + qge)
            I = _roll_down1(M, jnp.full((1, B_LANES), NEG, jnp.int32)) - go - qge
            h = jnp.maximum(h, I)
            Hst[slot] = h

            # extension bookkeeping
            em = endmask_ref[:]
            cand = jnp.maximum(h, jnp.where(em != 0, h + end_bonus, NEG))
            tmp_sc = jnp.max(cand, axis=0, keepdims=True)          # (1,B)
            tmp_log = tmp_sc - logpen_ref[ii, :][None, :]
            in_range = (i < nl_ref[ii, :][None, :]) & (act[0] != 0)
            improved = (tmp_log > mscl[0]) & in_range
            msc[0] = jnp.where(improved, tmp_sc, msc[0])
            mscl[0] = jnp.where(improved, tmp_log, mscl[0])
            mi[0] = jnp.where(improved, i, mi[0])
            hmaxv[:] = jnp.where(improved, h, hmaxv[:])
            # x-drop: deactivate once the row best falls too far behind
            dropped = (mscl[0] - tmp_log > xdrop) & in_range
            act[0] = jnp.where(dropped | (i + 1 >= nl_ref[ii, :][None, :]),
                               0, act[0])

        return 0

    jax.lax.fori_loop(0, ROW_CHUNK, row_body, 0)

    max_sc_ref[:] = msc[0]
    max_i_ref[:] = mi[0]
    hmax_ref[:] = hmaxv[:]


def _make_ext_call(al, n_rows, go, ge, fs, io, xdrop, end_bonus, interpret):
    n_chunks = (n_rows + ROW_CHUNK - 1) // ROW_CHUNK
    kernel = functools.partial(_ext_kernel, al, n_rows, go, ge, fs, io,
                               xdrop, end_bonus)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks,),
        in_specs=[
            *[pl.BlockSpec((ROW_CHUNK, B_LANES), lambda g: (g, 0),
                           memory_space=pltpu.VMEM) for _ in range(9)],
            pl.BlockSpec((22, al, B_LANES), lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((al, B_LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B_LANES), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B_LANES), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((al, B_LANES), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, al, B_LANES), jnp.int32),   # H ring
            pltpu.VMEM((3, al, B_LANES), jnp.int32),   # D ring
            pltpu.VMEM((1, al, B_LANES), jnp.int32),   # A
            pltpu.VMEM((1, al, B_LANES), jnp.int32),   # B
            pltpu.VMEM((1, al, B_LANES), jnp.int32),   # C
            pltpu.VMEM((al, B_LANES), jnp.int32),      # Hmax
            pltpu.VMEM((1, 1, B_LANES), jnp.int32),    # max_sc
            pltpu.VMEM((1, 1, B_LANES), jnp.int32),    # max_sc_log
            pltpu.VMEM((1, 1, B_LANES), jnp.int32),    # max_i
            pltpu.VMEM((1, 1, B_LANES), jnp.int32),    # active
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, B_LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, B_LANES), jnp.int32),
            jax.ShapeDtypeStruct((al, B_LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=64)
def _compiled_ext(al, n_rows, go, ge, fs, io, xdrop, end_bonus, interpret):
    call = _make_ext_call(al, n_rows, go, ge, fs, io, xdrop, end_bonus, interpret)
    return jax.jit(call)


def prep_problem(nsq: np.ndarray, asq: np.ndarray, *, sp, sp_null_bonus, io,
                 ext_left: bool, ss=None, trans_code: int = 1):
    """Host-side prep: nas/donor/acceptor tracks for one problem.

    Mirrors ns_prep_seq / ns_prep_seq_left (nasw-sse.c:106-210); returns
    (nas, aas, donor, acceptor) as int arrays (donor/acceptor len nl+1).
    """
    T = tables.get_tables(trans_code)
    nl = len(nsq)
    nt = T.nt4[nsq]
    aas = T.aa20[asq]
    if ext_left:
        aas = aas[::-1].copy()
        ntr = nt[::-1].copy()
        donor = np.full(nl + 1, sp[3], np.int32)
        acceptor = np.full(nl + 1, sp[3], np.int32)
        for i in range(nl - 3):  # reversed acceptor in donor role
            t = 3
            penY = 0
            if ntr[i + 1] == 2 and ntr[i + 2] == 0:
                t = -1 if (i + 3 < nl and ntr[i + 3] in (1, 3)) else 0
                for j in range(i + 5, min(nl, i + 8)):
                    if ntr[j] != 1 and ntr[j] != 3:
                        penY += sp[5]
            elif ntr[i + 1] == 1 and ntr[i + 2] == 0:
                t = 2
            donor[i] = 0 if t < 0 else sp[t]
            if t in (-1, 0):
                donor[i] += penY
        for i in range(1, nl):
            t = 3
            if ntr[i - 1] == 3 and ntr[i] == 2:
                t = (-1 if (i + 1 < nl and ntr[i + 1] == 2) else 4) \
                    if (i >= 2 and ntr[i - 2] in (0, 2)) else 0
            elif ntr[i - 1] == 1 and ntr[i] == 2 and i + 1 < nl and ntr[i + 1] == 1:
                t = 1
            elif ntr[i - 1] == 3 and ntr[i] == 0:
                t = 2
            acceptor[i] = 0 if t < 0 else sp[t]
        if ss is not None:
            max_spsc = (io + 1) // 2 - 1
            for i in range(nl):
                spsc = min(int(np.int8(ss[i] >> 1)) - 64, max_spsc)
                if ss[i] == 0xFF:
                    donor[nl - i - 1] -= sp_null_bonus
                    acceptor[nl - i - 1] -= sp_null_bonus
                elif ss[i] & 1:
                    donor[nl - i - 1] -= spsc
                else:
                    acceptor[nl - i - 1] -= spsc
        nas = _translate(nt, T)
        nas = nas[::-1].copy()
        nas = np.concatenate([[21, 21], nas[:-2]]).astype(np.uint8)
    else:
        donor = np.full(nl + 1, sp[3], np.int32)
        acceptor = np.full(nl + 1, sp[3], np.int32)
        for i in range(nl - 3):
            t = 3
            if nt[i + 1] == 2 and nt[i + 2] == 3:
                t = ((-1 if nt[i] == 2 else 4)
                     if (i + 3 < nl and nt[i + 3] in (0, 2)) else 0)
            elif nt[i + 1] == 2 and nt[i + 2] == 1 and nt[i] == 2:
                t = 1
            elif nt[i + 1] == 0 and nt[i + 2] == 3:
                t = 2
            donor[i] = 0 if t < 0 else sp[t]
        for i in range(1, nl):
            t = 3
            penY = 0
            if nt[i - 1] == 0 and nt[i] == 2:
                t = -1 if (i >= 2 and nt[i - 2] in (1, 3)) else 0
                for j in range(i - 4, max(-1, i - 7), -1):
                    if nt[j] != 1 and nt[j] != 3:
                        penY += sp[5]
            elif nt[i - 1] == 0 and nt[i] == 1:
                t = 2
            acceptor[i] = 0 if t < 0 else sp[t]
            if t in (-1, 0):
                acceptor[i] += penY
        if ss is not None:
            max_spsc = (io + 1) // 2 - 1
            for i in range(1, nl):
                spsc = min(int(np.int8(ss[i] >> 1)) - 64, max_spsc)
                if ss[i] == 0xFF:
                    donor[i - 1] -= sp_null_bonus
                    acceptor[i - 1] -= sp_null_bonus
                elif ss[i] & 1:
                    acceptor[i - 1] -= spsc
                else:
                    donor[i - 1] -= spsc
        nas = _translate(nt, T)
    return nas, aas, donor, acceptor


def _translate(nt: np.ndarray, T) -> np.ndarray:
    """nas[i] = aa of codon ending at i, X where incomplete/ambiguous."""
    nl = len(nt)
    nas = np.full(nl, 21, np.uint8)
    if nl >= 3:
        ok = (nt[:-2] < 4) & (nt[1:-1] < 4) & (nt[2:] < 4)
        cod = ((nt[:-2].astype(np.int32) << 4)
               | (nt[1:-1].astype(np.int32) << 2) | nt[2:]).astype(np.uint8)
        nas[2:] = np.where(ok, T.codon[cod], 21)
    return nas


class ExtBatch:
    """A padded batch of extension problems for the Pallas kernel."""

    def __init__(self, al_pad: int, nl_pad: int, mat: np.ndarray, opt_scalars):
        self.al = al_pad
        self.nl = ((nl_pad + ROW_CHUNK - 1) // ROW_CHUNK) * ROW_CHUNK
        self.go, self.ge, self.fs, self.io, self.xdrop, self.end_bonus, self.ie_coef = opt_scalars
        self.mat = mat.reshape(22, 22)
        self.nas = np.zeros((self.nl, B_LANES), np.int32)
        self.dm1 = np.zeros((self.nl, B_LANES), np.int32)
        self.d0 = np.zeros((self.nl, B_LANES), np.int32)
        self.dp1 = np.zeros((self.nl, B_LANES), np.int32)
        self.a0 = np.zeros((self.nl, B_LANES), np.int32)
        self.am1 = np.zeros((self.nl, B_LANES), np.int32)
        self.am2 = np.zeros((self.nl, B_LANES), np.int32)
        self.logpen = np.zeros((self.nl, B_LANES), np.int32)
        self.nlv = np.zeros((self.nl, B_LANES), np.int32)
        self.prof = np.full((22, self.al, B_LANES), NEG, np.int32)
        self.endmask = np.zeros((self.al, B_LANES), np.int32)
        self.als = np.zeros(B_LANES, np.int32)
        self.n = 0

    def add(self, nas, aas, donor, acceptor):
        b = self.n
        nl, al = len(nas), len(aas)
        assert nl <= self.nl and al <= self.al and b < B_LANES
        self.nas[:nl, b] = nas
        d = donor.astype(np.int32)
        a = acceptor.astype(np.int32)
        self.dm1[1:nl, b] = d[:nl - 1]
        self.d0[:nl, b] = d[:nl]
        self.dp1[:nl, b] = d[1:nl + 1]
        self.a0[:nl, b] = a[:nl]
        self.am1[1:nl, b] = a[:nl - 1]
        self.am2[2:nl, b] = a[:nl - 2]
        rows = np.arange(self.nl)
        x = rows - 3 * al
        pen = np.where(x < 2, 0,
                       (self.ie_coef * tables.mp_log2_f32(np.maximum(x, 2))
                        + np.float32(0.5)).astype(np.int32))
        self.logpen[:, b] = pen
        self.nlv[:, b] = nl
        self.prof[:, :al, b] = self.mat[:, aas].astype(np.int32)
        self.endmask[al - 1, b] = 1
        self.als[b] = al
        self.n += 1
        return b

    def run(self, interpret=None):
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        call = _compiled_ext(self.al, self.nl, self.go, self.ge, self.fs,
                             self.io, self.xdrop, self.end_bonus, interpret)
        max_sc, max_i, hmax = call(
            jnp.asarray(self.nas), jnp.asarray(self.dm1), jnp.asarray(self.d0),
            jnp.asarray(self.dp1), jnp.asarray(self.a0), jnp.asarray(self.am1),
            jnp.asarray(self.am2), jnp.asarray(self.logpen), jnp.asarray(self.nlv),
            jnp.asarray(self.prof), jnp.asarray(self.endmask))
        max_sc = np.asarray(max_sc)[0]
        max_i = np.asarray(max_i)[0]
        hmax = np.asarray(hmax)
        # final aa_len scan (nasw-sse.c:435-443): first j with
        # Hmax[j] (+ end_bonus at j=al-1) == max_sc
        out = []
        for b in range(self.n):
            al = int(self.als[b])
            col = hmax[:al, b].copy()
            col[al - 1] += self.end_bonus
            js = np.flatnonzero(col == max_sc[b])
            j = int(js[0]) if len(js) else al - 1
            out.append((int(max_sc[b]), int(max_i[b]) + 1, j + 1))
        return out
