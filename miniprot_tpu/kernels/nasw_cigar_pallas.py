"""Pallas TPU kernel: batched splice/frameshift DP with traceback.

Computes the full-CIGAR variant of the nasw DP for a batch of up to 128
(genome-window x protein) rectangles — the anchored gap-patching DPs of
the alignment stage (mp_align_seq, align.c:62-80) and the post-extension
CIGAR re-runs (align.c:288/331).

Byte-parity constraint: the reference's traceback bits depend on the
exact striped (Farrar, 8 x int16) evaluation order *including* the
lazy-F fixup loop (nasw-sse.c:444-541), so this kernel emulates that
striping literally:

  lane dim (128)    = problems
  sublane dim       = the 8 SSE lanes of one stripe vector
  stripe loop j     = sequential within each genome row
  lazy-F            = a while_loop running the reference's (k, j)
                      iteration with a per-problem active mask that
                      freezes a problem once its `all(I <= H - goe)`
                      break fires

Mixed stripe counts: each problem carries its OWN stripe count
slen_p = ceil(al_p / 8) (the reference derives striping from the real
protein length, so padding a problem into a wider striping would change
its traceback bits).  The kernel runs the stripe loop to the batch's
slen_max with per-lane (j < slen_p) masks; per-problem last-stripe
values are captured on the fly for the next row's boundary column, and
the lazy-F (k, j) schedule masks the same way — each problem sees
exactly its own reference schedule, merely interleaved in time with the
others.  One compiled kernel therefore serves every al <= 8*slen_max.

State per problem mirrors the reference exactly: H ring of 4 rows with
a [-1] stripe slot, D ring of 3, A/B/C carries.  The traceback word per
cell (state nibble + extension bits 4..9) is streamed to HBM; the host
backtracks each problem with the same C routine used by the host DP
(strided for mixed batches).

Scores are int32 with the reference's saturating-int16 arithmetic
emulated (clip after every add/sub), so traceback bits agree even in
saturating regimes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -32768          # int16 saturation floor (16-bit mode)
NEG32 = -0x40000000   # gs32b init value (32-bit mode)
B = 128


def _sadd16(a, b):
    return jnp.clip(a + b, -32768, 32767)


def _ssub16(a, b):
    return jnp.clip(a - b, -32768, 32767)
VL = 8           # SSE lanes per stripe
ROW_CHUNK = 256


def _shift_lanes_up(v, fill, is_row0):
    """SSE _mm_slli_si128 by one int16: sublane k <- k-1, row 0 = fill.
    is_row0 is the hoisted (row_ids == 0) mask of shape (VL, B)."""
    r = pltpu.roll(v, shift=1, axis=0)
    return jnp.where(is_row0, fill, r)


def _cigar_kernel(slen, n_rows, VL, NEG, sat,
                  nas_ref, dm1_ref, d0_ref, dp1_ref, a0_ref, am1_ref,
                  am2_ref, nl_ref, slen_ref, opts_ref, prof_ref, endsel_ref,
                  qpad_ref,
                  tb_ref, score_ref,
                  Hst, Dst, Aa, Bb, Cc, LastH, scorev, Srow_s, Iv_s, last_s,
                  act_s):
    """One grid step of ROW_CHUNK genome rows.

    slen is the batch's slen_max; slen_ref carries each problem's own
    stripe count.

    Hst: (4, (slen+1)*VL, B) — H rows i, i-1, i-2, i-3; stripe j lives at
         sublanes (j+1)*VL..(j+2)*VL, the [-1] stripe at 0..VL.
    Dst: (3, slen*VL, B).
    LastH: (4, VL, B) — each ring row's value at the problem's OWN last
         stripe (slen_p - 1), feeding the next row's [-1] boundary.
    """
    chunk = pl.program_id(0)
    # 16-bit mode (sat=True) emulates the reference's saturating int16
    # lanes; 32-bit mode (sat=False) is the plain-arithmetic gs32b
    _sadd = _sadd16 if sat else (lambda a, b: a + b)
    _ssub = _ssub16 if sat else (lambda a, b: a - b)
    go = opts_ref[0, :][None, :]
    ge = opts_ref[1, :][None, :]
    fs = opts_ref[2, :][None, :]
    is_row0 = jax.lax.broadcasted_iota(jnp.int32, (VL, B), 0) == 0
    slen_row = slen_ref[0, :][None, :]   # (1, B) per-problem stripe count

    @pl.when(chunk == 0)
    def _init():
        Hst[:] = jnp.full_like(Hst, NEG)
        Dst[:] = jnp.full_like(Dst, NEG)
        Aa[:] = jnp.full_like(Aa, NEG)
        Bb[:] = jnp.full_like(Bb, NEG)
        Cc[:] = jnp.full_like(Cc, NEG)
        LastH[:] = jnp.full_like(LastH, NEG)
        scorev[:] = jnp.full_like(scorev, NEG)
        # boundary stripe [-1]: H(-1,-1)=0 in lane 0 of the i-3 slot,
        # H(0,-1)=H(1,-1)=-fs in the i-2/i-1 slots (nasw-sse.c:253-258).
        # At the first computed row i=2: slot(i)=2%4=2 holds H(i-1)=row 1,
        # slot 1 row 0, slot 0 row -1... we instead write them to the
        # slots they will be read from at i==2 (see below): H3 slot =
        # (2+1)%4=3, H2 slot=(2+2)%4=0, H1 slot=(2+3)%4=1.
        rows = jax.lax.broadcasted_iota(jnp.int32, (VL, B), 0)
        lane0 = rows == 0
        Hst[3, 0:VL] = jnp.where(lane0, 0, NEG)
        Hst[0, 0:VL] = jnp.where(lane0, -fs, NEG)
        Hst[1, 0:VL] = jnp.where(lane0, -fs, NEG)

    def row_body(ii, _):
        i = chunk * ROW_CHUNK + ii

        @pl.when(i >= 2)
        def _():
            cur = jax.lax.rem(i, 4)
            s1 = jax.lax.rem(i + 3, 4)
            s2 = jax.lax.rem(i + 2, 4)
            s3 = jax.lax.rem(i + 1, 4)
            d3s = jax.lax.rem(i, 3)

            # stripe [-1] update (nasw-sse.c:267-271): for i>2, the -1
            # stripe of each history row becomes that row's value at the
            # problem's LAST stripe, shifted up one lane with NEG fill
            @pl.when(i > 2)
            def _shift_boundary():
                for s in (s1, s2, s3):
                    Hst[s, 0:VL] = _shift_lanes_up(LastH[s], NEG, is_row0)

            nas_i = nas_ref[ii, :][None, :]
            dm1 = dm1_ref[ii, :][None, :]
            d0 = d0_ref[ii, :][None, :]
            dp1 = dp1_ref[ii, :][None, :]
            a0 = a0_ref[ii, :][None, :]
            am1 = am1_ref[ii, :][None, :]
            am2 = am2_ref[ii, :][None, :]
            gei = jnp.where(nas_i == 20, fs, ge)

            # striped profile: 4 packed int8 alphabet rows per int32
            grp = nas_i >> 2
            sub = (nas_i & 3) * 8
            P = prof_ref[0]
            for g in range(1, 6):
                P = jnp.where(grp == g, prof_ref[g], P)
            Srow = ((P >> sub) & 0xFF) - 128   # profile bytes are biased
            Srow = jnp.where(qpad_ref[:] != 0, NEG, Srow)
            Srow_s[:] = Srow  # scratch ref: stripe reads need dynamic offsets

            def stripe_body(j, _c):
                # j is a PYTHON int (the stripe loop is unrolled: slen is
                # static, and static VMEM offsets schedule ~10x better
                # than pl.ds with a loop-carried index)
                mj = j < slen_row                 # (1,B) lanes doing stripe j
                I_prev = Iv_s[:]
                last_prev = last_s[:]
                I = I_prev
                last_h = last_prev
                off = (j + 1) * VL
                H3 = Hst[s3, pl.ds(off, VL)]
                H3m1 = Hst[s3, pl.ds(off - VL, VL)]
                H1 = Hst[s1, pl.ds(off, VL)]
                H1m1 = Hst[s1, pl.ds(off - VL, VL)]
                H2 = Hst[s2, pl.ds(off, VL)]
                H2m1 = Hst[s2, pl.ds(off - VL, VL)]
                D3 = Dst[d3s, pl.ds(j * VL, VL)]
                S = Srow_s[pl.ds(j * VL, VL)]
                z = jnp.zeros((VL, B), jnp.int32)
                h = _sadd(H3m1, S)
                # I
                t = _ssub(last_h, go)
                z = z | jnp.where(I > t, 1 << 4, 0)
                t = jnp.maximum(t, I)
                I = _ssub(t, ge)
                y = jnp.where(I > h, 1, 0)
                h = jnp.maximum(h, I)
                # D
                u = _ssub(H3, go)
                z = z | jnp.where(D3 > u, 1 << 5, 0)
                t = _ssub(jnp.maximum(u, D3), gei)
                Dst[d3s, pl.ds(j * VL, VL)] = t
                y = jnp.where(t > h, 2, y)
                h = jnp.maximum(h, t)
                # A
                u = _ssub(H1, dm1)
                v = Aa[0, pl.ds(j * VL, VL)]
                z = z | jnp.where(v > u, 1 << 6, 0)
                t = jnp.maximum(u, v)
                Aa[0, pl.ds(j * VL, VL)] = t
                t = _ssub(t, a0)
                y = jnp.where(t > h, 3, y)
                h = jnp.maximum(h, t)
                # B
                u = _ssub(H1m1, d0)
                v = Bb[0, pl.ds(j * VL, VL)]
                z = z | jnp.where(v > u, 1 << 7, 0)
                t = jnp.maximum(u, v)
                Bb[0, pl.ds(j * VL, VL)] = t
                t = _ssub(t, am2)
                y = jnp.where(t > h, 4, y)
                h = jnp.maximum(h, t)
                # C
                u = _ssub(H1m1, dp1)
                v = Cc[0, pl.ds(j * VL, VL)]
                z = z | jnp.where(v > u, 1 << 8, 0)
                t = jnp.maximum(u, v)
                Cc[0, pl.ds(j * VL, VL)] = t
                t = _ssub(t, am1)
                y = jnp.where(t > h, 5, y)
                h = jnp.maximum(h, t)
                # frameshift transitions
                t = _ssub(H1, fs)
                y = jnp.where(t > h, 6, y)
                h = jnp.maximum(h, t)
                t = _ssub(H2, fs)
                y = jnp.where(t > h, 7, y)
                h = jnp.maximum(h, t)
                t = _ssub(H1m1, fs)
                y = jnp.where(t > h, 8, y)
                h = jnp.maximum(h, t)
                t = _ssub(H2m1, fs)
                y = jnp.where(t > h, 9, y)
                h = jnp.maximum(h, t)
                z = z | y
                tb_ref[ii, pl.ds(j * VL, VL)] = z.astype(jnp.int16)
                Hst[cur, pl.ds(off, VL)] = h
                # lanes past their own stripe count freeze I / last_h;
                # last_s therefore ends the loop holding each problem's
                # OWN last-stripe h — the next row's boundary value
                Iv_s[:] = jnp.where(mj, I, I_prev)
                last_s[:] = jnp.where(mj, h, last_prev)
                return 0

            Iv_s[:] = jnp.full((VL, B), NEG, jnp.int32)
            last_s[:] = jnp.full((VL, B), NEG, jnp.int32)
            for j in range(slen):
                stripe_body(j, 0)

            # lazy-F fixup (nasw-sse.c:521-537): shared (k, j) loop with
            # per-problem (j < slen_p) stripe masks and per-problem break.
            # last_s keeps tracking each problem's last-stripe h so the
            # ring boundary below sees lazy-F updates too.
            # Structure: pass 1 (the pass the reference ALWAYS runs) is
            # inlined straight-line — most rows finish there, and a
            # per-row while_loop entry costs ~1us on TPU — then a
            # while_loop over the rare passes 2..VL, each an UNROLLED
            # static-offset sweep of the slen stripes.  Same masked
            # (k, j) schedule as a flat while_loop: a frozen problem's
            # act bit stops all its later steps mid-pass.
            goe = go + ge
            Iv_s[:] = jnp.maximum(_ssub(last_s[:], goe), _ssub(Iv_s[:], ge))
            act_s[:] = jnp.ones((1, B), jnp.int32)

            def lf_sweep():
                active0 = act_s[:] != 0
                Iv_s[:] = jnp.where(active0,
                                    _shift_lanes_up(Iv_s[:], NEG, is_row0),
                                    Iv_s[:])
                for j in range(slen):
                    stripe_ok = (act_s[:] != 0) & (j < slen_row)
                    I = Iv_s[:]
                    off = (j + 1) * VL
                    h = Hst[cur, off:off + VL]
                    z = tb_ref[ii, j * VL:(j + 1) * VL].astype(jnp.int32)
                    znew = z | jnp.where(I > h, 1 << 9, 0)
                    hnew = jnp.maximum(h, I)
                    tb_ref[ii, j * VL:(j + 1) * VL] = jnp.where(
                        stripe_ok, znew, z).astype(jnp.int16)
                    Hst[cur, off:off + VL] = jnp.where(stripe_ok, hnew, h)
                    last_s[:] = jnp.where(stripe_ok & (j == slen_row - 1),
                                          hnew, last_s[:])
                    h2 = _ssub(hnew, goe)
                    Inew = _ssub(I, ge)
                    allle = jnp.min(jnp.where(Inew <= h2, 1, 0), axis=0,
                                    keepdims=True) != 0
                    Iv_s[:] = jnp.where(stripe_ok, Inew, I)
                    act_s[:] = jnp.where(stripe_ok & allle, 0, act_s[:])

            lf_sweep()                    # pass 1, unconditional

            def lf_pass_cond(k):
                return (k < VL) & jnp.any(act_s[:] != 0)

            def lf_pass_body(k):
                lf_sweep()
                return k + 1

            jax.lax.while_loop(lf_pass_cond, lf_pass_body, 1)

            # one ring store per row: this row's per-problem last-stripe
            # value feeds the [-1] boundary of rows i+1..i+3
            LastH[cur] = last_s[:]

            # capture the final score at each problem's last row
            at_last = (i == nl_ref[0, :][None, :] - 1)
            hfull = Hst[cur, pl.ds(VL, slen * VL)]
            endv = jnp.max(jnp.where(endsel_ref[:] != 0, hfull, NEG), axis=0,
                           keepdims=True)
            scorev[0] = jnp.where(at_last, endv, scorev[0])

        return 0

    jax.lax.fori_loop(0, ROW_CHUNK, row_body, 0)
    score_ref[:] = scorev[0]


def _make_cigar_call(slen, n_rows, interpret, vl=VL, neg=NEG, sat=True):
    n_chunks = (n_rows + ROW_CHUNK - 1) // ROW_CHUNK
    kernel = functools.partial(_cigar_kernel, slen, n_rows, vl, neg, sat)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks,),
        in_specs=[
            *[pl.BlockSpec((ROW_CHUNK, B), lambda g: (g, 0),
                           memory_space=pltpu.VMEM) for _ in range(7)],
            pl.BlockSpec((8, B), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),   # nlv: one row/problem
            pl.BlockSpec((8, B), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),   # slens
            pl.BlockSpec((8, B), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),   # opts: runtime scalars
            pl.BlockSpec((6, slen * vl, B), lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((slen * vl, B), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((slen * vl, B), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ROW_CHUNK, slen * vl, B), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, (slen + 1) * vl, B), jnp.int32),
            pltpu.VMEM((3, slen * vl, B), jnp.int32),
            pltpu.VMEM((1, slen * vl, B), jnp.int32),
            pltpu.VMEM((1, slen * vl, B), jnp.int32),
            pltpu.VMEM((1, slen * vl, B), jnp.int32),
            pltpu.VMEM((4, vl, B), jnp.int32),         # LastH
            pltpu.VMEM((1, 1, B), jnp.int32),
            pltpu.VMEM((slen * vl, B), jnp.int32),
            pltpu.VMEM((vl, B), jnp.int32),
            pltpu.VMEM((vl, B), jnp.int32),
            pltpu.VMEM((1, B), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks * ROW_CHUNK, slen * vl, B), jnp.int16),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=64)
def _compiled_cigar(slen, n_rows, n_lanes, rows_used, interpret):
    call = _make_cigar_call(slen, n_rows, interpret)

    def wrapped(nas, D, A, nlv, slens, opts, prof, endsel, qpad):
        # derive the six donor/acceptor shift streams on device from the
        # two base tracks (cuts host->device transfer volume ~3x)
        D = D.astype(jnp.int32)
        A = A.astype(jnp.int32)
        z1 = jnp.zeros((1, B), jnp.int32)
        z2 = jnp.zeros((2, B), jnp.int32)
        d0 = D[:n_rows]
        dm1 = jnp.concatenate([z1, D[:n_rows - 1]])
        dp1 = D[1:n_rows + 1]
        a0 = A[:n_rows]
        am1 = jnp.concatenate([z1, A[:n_rows - 1]])
        am2 = jnp.concatenate([z2, A[:n_rows - 2]])
        tb, score = call(nas.astype(jnp.int32), dm1, d0, dp1, a0, am1, am2,
                         nlv, slens, opts, prof, endsel.astype(jnp.int32),
                         qpad.astype(jnp.int32))
        # lanes-major repack on device + slice to the used-lane bucket
        # and to the batch's tallest problem: the traceback fetch is the
        # dominant device->host transfer, batches are often sparsely
        # filled, and nl_b padding would otherwise ship as zeros
        tb = jnp.transpose(tb, (2, 0, 1))[:n_lanes, :rows_used]
        return tb, score

    return jax.jit(wrapped)


# ---------------------------------------------------------------------------
# On-device traceback walk.  Downloading the traceback matrix is the
# dominant device->host transfer of the CIGAR path (rows x slen*8 x 128
# x int16 per batch — tens of MB to GB); walking it on device and
# fetching only the per-step state stream (max_steps x 128 x int8)
# shrinks the transfer by ~2 x slen*8.  The walk replicates
# dp_backtrack_st (native/mpnative.c) exactly — state selection, the
# lazy-F bit-9 rewrite, gap-run carry, and the U/V conditional query
# step — vectorized across lanes with per-lane (nl, al, slen) state;
# the host then replays the state stream through the same pinned
# push/reverse/tiny-UV helpers (mx_cigar_from_states).
# ---------------------------------------------------------------------------

_BT_DI = (3, 0, 3, 1, 1, 1, 1, 2, 1, 2, 0, 0, 0, 0, 0, 0)
_BT_DJ = (1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 0, 0, 0, 0)


def _device_backtrack(tb, nlv0, alv, slen0, n_rows, W, max_steps,
                      pos_layout=False):
    """tb: (n_rows, W, B) int16; nlv0/alv/slen0: (B,) int32 per-lane
    dims.  Returns (states (max_steps, B) int8 with 15 = done,
    i_final (B,), j_final (B,)).  pos_layout=True reads a
    position-ordered tb (the scan kernel) instead of the striped one."""
    lanes = jnp.arange(B, dtype=jnp.int32)
    i0 = nlv0 - 1
    j0 = alv - 1
    sl = jnp.maximum(slen0, 1)
    di_tab = jnp.asarray(_BT_DI, jnp.int32)
    dj_tab = jnp.asarray(_BT_DJ, jnp.int32)
    # 4 decode steps per while iteration: a TPU while iteration costs
    # ~1us of loop overhead, which dominated the walk at 1 step/iter.
    # Inactive lanes write the pad value (15 = the buffer's init), so
    # overshooting a lane's path end inside an unrolled group is a no-op.
    UNROLL = 4
    steps_pad = -(-max_steps // UNROLL) * UNROLL
    out0 = jnp.full((steps_pad, B), 15, jnp.int8)

    def step(k, i, j, last, out):
        active = (i >= 2) & (j >= 0)
        ii = jnp.clip(i, 0, n_rows - 1)
        col = (jnp.clip(j, 0, W - 1) if pos_layout
               else jnp.clip((j % sl) * VL + j // sl, 0, W - 1))
        # per-dimension gather: a flattened index would overflow int32
        # (jax's default itemsize) at rows*W*B >= 2^31
        x = tb[ii, col, lanes].astype(jnp.int32)
        # lazy-F overwrote H with I (bit 9)
        x = jnp.where((x >> 9) & 1 == 1, 1 | ((x >> 4) << 4), x)
        state = jnp.where(last == 0, x & 0xF, last)
        is_gap = (state >= 1) & (state <= 5)
        ext = jnp.where(is_gap, (x >> (state + 3)) & 1, 0)
        out = jax.lax.dynamic_update_slice(
            out, jnp.where(active, state, 15).astype(jnp.int8)[None, :],
            (k, 0))
        dj = jnp.where((state == 4) | (state == 5), 1 - ext,
                       jnp.take(dj_tab, state))
        i = jnp.where(active, i - jnp.take(di_tab, state), i)
        j = jnp.where(active, j - dj, j)
        last = jnp.where(active,
                         jnp.where(is_gap & (ext == 1), state, 0), last)
        return i, j, last, out

    def cond(c):
        k, i, j, last, out = c
        return (k < steps_pad) & jnp.any((i >= 2) & (j >= 0))

    def body(c):
        k, i, j, last, out = c
        for u in range(UNROLL):
            i, j, last, out = step(k + u, i, j, last, out)
        return k + UNROLL, i, j, last, out

    _, fi, fj, _, out = jax.lax.while_loop(
        cond, body, (jnp.int32(0), i0, j0, jnp.zeros(B, jnp.int32), out0))
    return out, fi, fj


@functools.lru_cache(maxsize=64)
def _compiled_cigar_dtb(slen, n_rows, rows_used, interpret):
    call = _make_cigar_call(slen, n_rows, interpret)
    W = slen * VL
    max_steps = rows_used + W + 2

    def wrapped(nas, D, A, nlv, slens, opts, prof, endsel, qpad, alv):
        D = D.astype(jnp.int32)
        A = A.astype(jnp.int32)
        z1 = jnp.zeros((1, B), jnp.int32)
        z2 = jnp.zeros((2, B), jnp.int32)
        d0 = D[:n_rows]
        dm1 = jnp.concatenate([z1, D[:n_rows - 1]])
        dp1 = D[1:n_rows + 1]
        a0 = A[:n_rows]
        am1 = jnp.concatenate([z1, A[:n_rows - 1]])
        am2 = jnp.concatenate([z2, A[:n_rows - 2]])
        tb, score = call(nas.astype(jnp.int32), dm1, d0, dp1, a0, am1, am2,
                         nlv, slens, opts, prof, endsel.astype(jnp.int32),
                         qpad.astype(jnp.int32))
        states, fi, fj = _device_backtrack(
            tb, nlv[0].astype(jnp.int32), alv[0].astype(jnp.int32),
            slens[0].astype(jnp.int32), n_rows, W, max_steps)
        return states, fi, fj, score

    return jax.jit(wrapped)


def _cigar_raw_dtb_eval(call, sp, codon, n_rows, W, max_steps,
                        nt8, iov, nlv1, nlv, slens, opts, prof, endsel,
                        qpad, alv):
    """Shared body of the raw-upload dtb wrappers."""
    zero_left = jnp.zeros((1, B), jnp.int8)
    nas, D, A = _prep_seq_device(nt8, zero_left, iov.astype(jnp.int32),
                                 nlv1, sp=sp, codon=codon, n_rows=n_rows)
    z1 = jnp.zeros((1, B), jnp.int32)
    z2 = jnp.zeros((2, B), jnp.int32)
    d0 = D[:n_rows]
    dm1 = jnp.concatenate([z1, D[:n_rows - 1]])
    dp1 = D[1:n_rows + 1]
    a0 = A[:n_rows]
    am1 = jnp.concatenate([z1, A[:n_rows - 1]])
    am2 = jnp.concatenate([z2, A[:n_rows - 2]])
    tb, score = call(nas, dm1, d0, dp1, a0, am1, am2,
                     nlv, slens, opts, prof, endsel.astype(jnp.int32),
                     qpad.astype(jnp.int32))
    states, fi, fj = _device_backtrack(
        tb, nlv[0].astype(jnp.int32), alv[0].astype(jnp.int32),
        slens[0].astype(jnp.int32), n_rows, W, max_steps)
    return states, fi, fj, score


@functools.lru_cache(maxsize=64)
def _compiled_cigar_raw_dtb(slen, n_rows, rows_used, sp_key, trans_code,
                            interpret):
    call = _make_cigar_call(slen, n_rows, interpret)
    W = slen * VL
    max_steps = rows_used + W + 2
    sp = np.asarray(sp_key, np.int32)
    codon = _tables.get_tables(trans_code).codon

    def wrapped(nt8, iov, nlv1, nlv, slens, opts, prof, endsel, qpad, alv):
        return _cigar_raw_dtb_eval(call, sp, codon, n_rows, W, max_steps,
                                   nt8, iov, nlv1, nlv, slens, opts, prof,
                                   endsel, qpad, alv)

    return jax.jit(wrapped)


@functools.lru_cache(maxsize=64)
def _compiled_cigar_raw_dtb_packed(slen, n_rows, rows_used, sp_key,
                                   trans_code, spec, interpret):
    call = _make_cigar_call(slen, n_rows, interpret)
    W = slen * VL
    max_steps = rows_used + W + 2
    sp = np.asarray(sp_key, np.int32)
    codon = _tables.get_tables(trans_code).codon

    def wrapped(buf):
        (nt8, iov, nlv1, nlv, slens, opts, prof, endsel, qpad,
         alv) = _unpack_device(buf, spec)
        return _cigar_raw_dtb_eval(call, sp, codon, n_rows, W, max_steps,
                                   nt8, iov, nlv1, nlv, slens, opts, prof,
                                   endsel, qpad, alv)

    return jax.jit(wrapped)


class CigarBatch:
    """A padded batch of full-CIGAR DP problems (mixed stripe counts).

    VLANES is the SEMANTIC stripe width (8 for gs16b, 4 for gs32b);
    stripes always occupy 8 sublanes in memory (Mosaic's sublane tile),
    so the 32-bit variant leaves its upper 4 sublanes as padding."""

    VLANES = VL      # query positions per stripe vector
    STRIDE = VL      # sublanes per stripe slot in memory (always 8)

    def __init__(self, al_pad: int, nl_pad: int, mat: np.ndarray, opt_scalars):
        assert al_pad % self.VLANES == 0
        self.slen = al_pad // self.VLANES          # batch slen_max
        self.al = al_pad
        self.nl = ((nl_pad + ROW_CHUNK - 1) // ROW_CHUNK) * ROW_CHUNK
        (self.go, self.ge, self.fs, self.default_io, self.xdrop,
         self.end_bonus, self.ie_coef) = opt_scalars
        self.mat = mat.reshape(22, 22)
        self.nas = np.zeros((self.nl, B), np.int8)
        self.D = np.zeros((self.nl + 8, B), np.int16)
        self.A = np.zeros((self.nl + 8, B), np.int16)
        self.nlv = np.zeros((8, B), np.int32)
        self.slens = np.ones((8, B), np.int32)
        W = self.slen * self.STRIDE          # striped row width in cells
        self.prof = np.zeros((6, W, B), np.int32)
        self.qpad = np.ones((W, B), np.int8)
        self.endsel = np.zeros((W, B), np.int32)
        self.alv = np.zeros((1, B), np.int32)   # per-lane real al
        self.dims = []
        self.n = 0

    def _add_query(self, aas, b):
        """Per-problem striping: stripe count from the problem's OWN al
        (the reference's traceback bits depend on it).  Position q lives
        at sublane q//slen_p of memory stripe slot q%slen_p."""
        vl, stride = self.VLANES, self.STRIDE
        al = len(aas)
        slen_p = (al + vl - 1) // vl
        assert slen_p <= self.slen
        from .nasw_pallas import _pack_profile
        col = (self.mat[:, aas].astype(np.int32) + 128) & 0xFF  # biased
        packed22 = _pack_profile(col)
        q = np.arange(al)
        pstriped = (q % slen_p) * stride + q // slen_p
        prof = np.zeros((6, self.slen * stride), np.int32)
        prof[:, pstriped] = packed22
        self.prof[:, :, b] = prof
        self.qpad[pstriped, b] = 0
        qe = al - 1
        self.endsel[(qe % slen_p) * stride + qe // slen_p, b] = 1
        self.slens[:, b] = slen_p
        self.alv[0, b] = al

    def add(self, nas, aas, donor, acceptor, io=None):
        b = self.n
        io = self.default_io if io is None else io
        nl, al = len(nas), len(aas)
        assert nl <= self.nl and al <= self.al and b < B
        self.nas[:nl, b] = nas
        self.D[:nl + 1, b] = donor.astype(np.int32)[:nl + 1] + io
        self.A[:nl + 1, b] = acceptor.astype(np.int32)[:nl + 1]
        self.nlv[:, b] = nl
        self._add_query(aas, b)
        self.dims.append((nl, al))
        self.n += 1
        return b

    def run(self, interpret=None):
        return self.collect(self.launch(interpret))

    LANE_BUCKETS = (16, B)

    def tb_bytes(self) -> int:
        """HBM footprint of the traceback output at launch."""
        return self.nl * self.slen * self.STRIDE * B * 2

    def launch(self, interpret=None):
        """Start the device computation without blocking."""
        import os as _os
        if interpret is None:
            from . import on_tpu_backend
            interpret = not on_tpu_backend()
        n_lanes = next(k for k in self.LANE_BUCKETS if self.n <= k)
        # round the row clip to 512 so the compile-key count stays small
        max_nl = max((nl for nl, _ in self.dims), default=self.nl)
        rows_used = 2048
        while rows_used < max_nl:
            rows_used <<= 1
        rows_used = min(self.nl, rows_used)
        # power-of-two rounding: each distinct rows_used is a separate
        # jit trace (~0.3s of pure Python) + compile, so a multiples
        # rounding gave up to nl/2048 variants per bucket; pow2 caps it
        # at log2 few.  Cost: a larger state-stream fetch, bounded by
        # the walk's early exit
        from .nasw_pallas import _opts_array
        opts = _opts_array(self.go, self.ge, self.fs, self.xdrop,
                           self.end_bonus)
        if _os.environ.get("MINIPROT_TPU_TB_HOST") != "1":
            call = _compiled_cigar_dtb(self.slen, self.nl, rows_used,
                                       interpret)
            return ("dtb",) + tuple(call(
                jnp.asarray(self.nas), jnp.asarray(self.D),
                jnp.asarray(self.A), jnp.asarray(self.nlv),
                jnp.asarray(self.slens), jnp.asarray(opts),
                jnp.asarray(self.prof),
                jnp.asarray(self.endsel.astype(np.int8)),
                jnp.asarray(self.qpad), jnp.asarray(self.alv)))
        call = _compiled_cigar(self.slen, self.nl, n_lanes, rows_used,
                               interpret)
        return ("tb",) + tuple(call(
            jnp.asarray(self.nas), jnp.asarray(self.D), jnp.asarray(self.A),
            jnp.asarray(self.nlv), jnp.asarray(self.slens),
            jnp.asarray(opts), jnp.asarray(self.prof),
            jnp.asarray(self.endsel.astype(np.int8)),
            jnp.asarray(self.qpad)))

    def collect(self, handles):
        from .. import native
        if handles[0] == "dtb":
            _, states, fi, fj, score = handles
            # one device_get for all four outputs: separate np.asarray
            # calls each cost a device round trip (4x the fetch latency
            # through a relay)
            states, fi, fj, score = jax.device_get((states, fi, fj, score))
            states = np.ascontiguousarray(states.T)  # (B, steps)
            score = score[0]
            return [(int(score[b]),
                     native.cigar_from_states(states[b], int(fi[b]),
                                              int(fj[b])))
                    for b in range(self.n)]
        _, tb, score = handles
        tb, score = jax.device_get((tb, score))
        score = score[0]
        out = []
        for b in range(self.n):
            nl, al = self.dims[b]
            slen_p = (al + self.VLANES - 1) // self.VLANES
            tb_b = tb[b, :nl]   # lanes-major: already C-contiguous
            if not tb_b.flags.c_contiguous:
                tb_b = np.ascontiguousarray(tb_b)
            # the decode's "vl" is the cell spacing between stripes,
            # which is the memory stride (sublane index < VLANES always)
            cig = native.backtrack_strided(tb_b, slen_p, self.slen * self.STRIDE,
                                           nl, al, vl=self.STRIDE)
            out.append((int(score[b]), cig))
        return out


# ---------------------------------------------------------------------------
# Raw-upload path: nas/donor/acceptor rebuilt on device from nt4 codes
# (same device prep as the extension kernel; CIGAR jobs are always
# forward-strand and carry no --spsc track on this path, so the folded
# donor stream donor+io is provably non-negative and the kernel's
# single-saturation fold stays bit-exact).
# ---------------------------------------------------------------------------

from .nasw_pallas import _pack_arrays, _prep_seq_device, \
    _unpack_device  # noqa: E402
from .. import tables as _tables           # noqa: E402


@functools.lru_cache(maxsize=64)
def _compiled_cigar_raw(slen, n_rows, n_lanes, rows_used,
                        sp_key, trans_code, interpret):
    call = _make_cigar_call(slen, n_rows, interpret)
    sp = np.asarray(sp_key, np.int32)
    codon = _tables.get_tables(trans_code).codon

    def wrapped(nt8, iov, nlv1, nlv, slens, opts, prof, endsel, qpad):
        zero_left = jnp.zeros((1, B), jnp.int8)
        nas, D, A = _prep_seq_device(nt8, zero_left, iov.astype(jnp.int32),
                                     nlv1, sp=sp, codon=codon, n_rows=n_rows)
        z1 = jnp.zeros((1, B), jnp.int32)
        z2 = jnp.zeros((2, B), jnp.int32)
        d0 = D[:n_rows]
        dm1 = jnp.concatenate([z1, D[:n_rows - 1]])
        dp1 = D[1:n_rows + 1]
        a0 = A[:n_rows]
        am1 = jnp.concatenate([z1, A[:n_rows - 1]])
        am2 = jnp.concatenate([z2, A[:n_rows - 2]])
        tb, score = call(nas, dm1, d0, dp1, a0, am1, am2,
                         nlv, slens, opts, prof, endsel.astype(jnp.int32),
                         qpad.astype(jnp.int32))
        tb = jnp.transpose(tb, (2, 0, 1))[:n_lanes, :rows_used]
        return tb, score

    return jax.jit(wrapped)


class RawCigarBatch(CigarBatch):
    """CigarBatch variant shipping raw nt4 windows (device-side prep)."""

    def __init__(self, al_pad, nl_pad, mat, opt_scalars, *, sp,
                 trans_code: int = 1):
        super().__init__(al_pad, nl_pad, mat, opt_scalars)
        self.sp_key = tuple(int(v) for v in np.asarray(sp).reshape(-1))
        self.trans_code = trans_code
        self.nt = np.zeros((self.nl + 8, B), np.int8)
        self.iov = np.zeros((1, B), np.int32)
        self.nlv1 = np.zeros((1, B), np.int32)
        # nas/D/A stay unused on this path

    def add_raw(self, nt4: np.ndarray, aas: np.ndarray, io=None):
        b = self.n
        io = self.default_io if io is None else io
        nl, al = len(nt4), len(aas)
        assert nl <= self.nl and al <= self.al and b < B
        self.nt[:nl, b] = nt4
        self.iov[0, b] = io
        self.nlv1[0, b] = nl
        self.nlv[:, b] = nl
        self._add_query(aas, b)
        self.dims.append((nl, al))
        self.n += 1
        return b

    def launch(self, interpret=None):
        import os as _os
        if interpret is None:
            from . import on_tpu_backend
            interpret = not on_tpu_backend()
        n_lanes = next(k for k in self.LANE_BUCKETS if self.n <= k)
        max_nl = max((nl for nl, _ in self.dims), default=self.nl)
        rows_used = 2048
        while rows_used < max_nl:
            rows_used <<= 1
        rows_used = min(self.nl, rows_used)
        # power-of-two rounding: each distinct rows_used is a separate
        # jit trace (~0.3s of pure Python) + compile, so a multiples
        # rounding gave up to nl/2048 variants per bucket; pow2 caps it
        # at log2 few.  Cost: a larger state-stream fetch, bounded by
        # the walk's early exit
        from .nasw_pallas import _opts_array
        opts = _opts_array(self.go, self.ge, self.fs, self.xdrop,
                           self.end_bonus)
        if _os.environ.get("MINIPROT_TPU_TB_HOST") != "1":
            if _os.environ.get("MINIPROT_TPU_PACKED") != "0":
                buf, spec = _pack_arrays(
                    (self.nt, self.iov, self.nlv1, self.nlv, self.slens,
                     opts, self.prof, self.endsel.astype(np.int8),
                     self.qpad, self.alv))
                call = _compiled_cigar_raw_dtb_packed(
                    self.slen, self.nl, rows_used, self.sp_key,
                    self.trans_code, spec, interpret)
                return ("dtb",) + tuple(call(jnp.asarray(buf)))
            call = _compiled_cigar_raw_dtb(self.slen, self.nl, rows_used,
                                           self.sp_key, self.trans_code,
                                           interpret)
            return ("dtb",) + tuple(call(
                jnp.asarray(self.nt), jnp.asarray(self.iov),
                jnp.asarray(self.nlv1), jnp.asarray(self.nlv),
                jnp.asarray(self.slens), jnp.asarray(opts),
                jnp.asarray(self.prof),
                jnp.asarray(self.endsel.astype(np.int8)),
                jnp.asarray(self.qpad), jnp.asarray(self.alv)))
        call = _compiled_cigar_raw(self.slen, self.nl, n_lanes, rows_used,
                                   self.sp_key, self.trans_code, interpret)
        return ("tb",) + tuple(call(jnp.asarray(self.nt), jnp.asarray(self.iov),
                    jnp.asarray(self.nlv1), jnp.asarray(self.nlv),
                    jnp.asarray(self.slens), jnp.asarray(opts),
                    jnp.asarray(self.prof),
                    jnp.asarray(self.endsel.astype(np.int8)),
                    jnp.asarray(self.qpad)))


# ---------------------------------------------------------------------------
# 32-bit variant (library-API parity with ns_global_gs32b,
# nasw-sse.c:558-750): 4 int32 lanes per stripe, plain non-saturating
# arithmetic, no extension/end-bonus support.  Bit-parity target is the
# host mx_dp32; the mapper itself always uses the 16-bit kernel, but
# jobs whose true scores exceed int16 range need this one.
# ---------------------------------------------------------------------------

VL32 = 4


@functools.lru_cache(maxsize=16)
def _compiled_dp32(slen, n_rows, n_lanes, rows_used, interpret):
    # geometry stays 8 sublanes per stripe (Mosaic's sublane tile); the
    # 4-lane gs32b striping occupies sublanes 0..3 and pads the rest.
    # Extra lazy-F passes over pad sublanes are provably no-ops for the
    # real lanes: past the fixpoint (all I <= H-goe) neither H nor the
    # traceback bits can change — the same argument that justifies the
    # reference's own early break.
    call = _make_cigar_call(slen, n_rows, interpret,
                            vl=VL, neg=NEG32, sat=False)

    def wrapped(nas, D, A, nlv, slens, opts, prof, endsel, qpad):
        D = D.astype(jnp.int32)
        A = A.astype(jnp.int32)
        z1 = jnp.zeros((1, B), jnp.int32)
        z2 = jnp.zeros((2, B), jnp.int32)
        d0 = D[:n_rows]
        dm1 = jnp.concatenate([z1, D[:n_rows - 1]])
        dp1 = D[1:n_rows + 1]
        a0 = A[:n_rows]
        am1 = jnp.concatenate([z1, A[:n_rows - 1]])
        am2 = jnp.concatenate([z2, A[:n_rows - 2]])
        tb, score = call(nas.astype(jnp.int32), dm1, d0, dp1, a0, am1, am2,
                         nlv, slens, opts, prof, endsel.astype(jnp.int32),
                         qpad.astype(jnp.int32))
        tb = jnp.transpose(tb, (2, 0, 1))[:n_lanes, :rows_used]
        return tb, score

    return jax.jit(wrapped)


class Dp32Batch(CigarBatch):
    """Batched 32-bit full-CIGAR DPs (the gs32b library kernel)."""

    VLANES = VL32

    def launch(self, interpret=None):
        if interpret is None:
            from . import on_tpu_backend
            interpret = not on_tpu_backend()
        n_lanes = next(k for k in self.LANE_BUCKETS if self.n <= k)
        max_nl = max((nl for nl, _ in self.dims), default=self.nl)
        rows_used = 2048
        while rows_used < max_nl:
            rows_used <<= 1
        rows_used = min(self.nl, rows_used)
        # power-of-two rounding: each distinct rows_used is a separate
        # jit trace (~0.3s of pure Python) + compile, so a multiples
        # rounding gave up to nl/2048 variants per bucket; pow2 caps it
        # at log2 few.  Cost: a larger state-stream fetch, bounded by
        # the walk's early exit
        call = _compiled_dp32(self.slen, self.nl, n_lanes, rows_used,
                              interpret)
        from .nasw_pallas import _opts_array
        opts = _opts_array(self.go, self.ge, self.fs, self.xdrop,
                           self.end_bonus)
        # 32-bit library path keeps the host-side decode ("tb" handles)
        return ("tb",) + tuple(call(
            jnp.asarray(self.nas), jnp.asarray(self.D), jnp.asarray(self.A),
            jnp.asarray(self.nlv), jnp.asarray(self.slens),
            jnp.asarray(opts), jnp.asarray(self.prof),
            jnp.asarray(self.endsel.astype(np.int8)),
            jnp.asarray(self.qpad)))
