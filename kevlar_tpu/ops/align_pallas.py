"""Pallas TPU kernel for the batched wavefront aligner.

Same exact ksw_extz DP as :mod:`kevlar_tpu.ops.align_ops`, but with the
wavefront state held in VMEM scratch.  Eight alignment pairs ride each
grid step on the int32 SUBLANE axis — state vectors are ``[8, T]``, which
exactly fills the (8, 128) int32 VPU tile (the first-generation kernel ran
one pair per step on a ``[1, T]`` row: 1/8 utilization, and re-masked a
``[32, T]`` direction buffer every diagonal).  The per-diagonal
substitution scores are computed without any in-kernel gather: the query
is pre-reversed into a modular buffer so the diagonal's query bases
``query[d - i]`` drop out of a dynamic lane rotate (``pltpu.roll``) —
Mosaic forbids unaligned dynamic lane slices but supports dynamic rotates.

Direction bits (5 per cell: op in bits 0-2, gap-continuation in bits 3-4)
are packed six diagonals per int32 word and flushed to the output every
sixth step, so the direction tensor costs ndiag/6 int32 rows instead of
ndiag uint8 rows (uint8 stores would force Mosaic's 32-sublane tile).
The traceback reads the packed words directly (``_traceback_packed``).

``align_batch_pallas`` has the same contract as ``align_ops.align_batch``
and is validated bit-identical against the scalar ksw2 reference both in
interpret mode and compiled on real TPU hardware (Mosaic), including
gap-extend and ambiguous-base cases.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kevlar_tpu.ops.align import NEG_INF

R = 8           # pairs per grid step (int32 sublane tile)
DPW = 6         # diagonals packed per int32 direction word (5 bits each)
MAX_DIM = 512   # above this, VMEM blocks outgrow the core; use align_ops


def _kernel_factory(T, Q, L2, match, mismatch, gapoe, gape):
    ndiag = T + Q - 1
    ndiag6 = -(-ndiag // DPW)
    a = int(match)
    b = int(mismatch if mismatch < 0 else -mismatch)

    def kernel(tl_ref, ql_ref, target_ref, qrbuf_ref, score_ref, zdiag_ref,
               h_prev, h_prev2, e_prev, f_prev, zpack, svec):
        tlen = tl_ref[0]          # [R, T] broadcast copies of each tlen
        qlen = ql_ref[0]
        ii = jax.lax.broadcasted_iota(jnp.int32, (R, T), 1)
        tcodes = target_ref[0]

        neg = jnp.full((R, T), NEG_INF, jnp.int32)
        h_prev[:] = neg
        h_prev2[:] = neg
        e_prev[:] = neg
        f_prev[:] = neg
        svec[:] = jnp.full((R, 128), NEG_INF, jnp.int32)

        def shift1(v):
            """v[:, i] -> v[:, i-1], with NEG_INF entering at lane 0."""
            rolled = pltpu.roll(v, 1, axis=1)
            return jnp.where(ii == 0, jnp.int32(NEG_INF), rolled)

        def body(d, _):
            jj = d - ii
            inbounds = (ii < tlen) & (jj >= 0) & (jj < qlen)

            H_prev = h_prev[:]
            H_prev2 = h_prev2[:]
            E_prev = e_prev[:]
            F_prev = f_prev[:]

            hd = shift1(H_prev2)
            hcol = jnp.where(jj >= 1, -(gapoe + gape * (jj - 1)), 0)
            hd = jnp.where((ii == 0) & (jj >= 1), hcol, hd)
            hd = jnp.where((jj == 0) & (ii >= 1),
                           -(gapoe + gape * (ii - 1)), hd)
            hd = jnp.where((ii == 0) & (jj == 0), 0, hd)

            e = jnp.maximum(shift1(E_prev) - gape, shift1(H_prev) - gapoe)
            e = jnp.where(ii == 0, -(gapoe + gapoe + gape * jj), e)
            f = jnp.maximum(F_prev - gape, H_prev - gapoe)
            f = jnp.where(jj == 0, -(gapoe + gapoe + gape * ii), f)

            # qd[r, i] = query[r, d - i]: qrbuf[r, x] = qext[r, (-x) mod
            # L2], so one dynamic rotate by d aligns qext[d - i] onto
            # lane i for all R rows at once
            rolled = pltpu.roll(qrbuf_ref[0], d, axis=1)
            qd = rolled[:, :T]
            sub_diag = jnp.where(
                (tcodes >= 4) | (qd >= 4), 0,
                jnp.where(tcodes == qd, a, b)).astype(jnp.int32)

            hdiag = hd + sub_diag
            d0 = jnp.where(hdiag >= e, 0, 1)
            h = jnp.maximum(hdiag, e)
            d0 = jnp.where(h >= f, d0, 2)
            h = jnp.maximum(h, f)
            hh = h - gapoe
            d0 = d0 | (((e - gape) > hh).astype(jnp.int32) << 3)
            d0 = d0 | (((f - gape) > hh).astype(jnp.int32) << 4)
            d0 = jnp.where(inbounds, d0, 0).astype(jnp.int32)

            h = jnp.where(inbounds, h, jnp.int32(NEG_INF))
            e = jnp.where(inbounds, e, jnp.int32(NEG_INF))
            f = jnp.where(inbounds, f, jnp.int32(NEG_INF))

            # pack this diagonal's 5-bit codes into the current word
            phase = d % DPW
            zpack[:] = jnp.where(phase == 0, d0,
                                 zpack[:] | (d0 << (5 * phase)))

            @pl.when(phase == DPW - 1)
            def _():
                zdiag_ref[0, pl.ds(d // DPW, 1)] = zpack[:].reshape(1, R, T)

            # the exit cell (tlen-1, qlen-1) is visited exactly once per
            # pair; max-accumulate captures its H without a scalar branch
            is_final = (ii == (tlen - 1)) & (jj == (qlen - 1))
            rowmax = jnp.max(jnp.where(is_final, h, jnp.int32(NEG_INF)),
                             axis=1, keepdims=True)
            svec[:] = jnp.maximum(svec[:], rowmax)

            h_prev2[:] = H_prev
            h_prev[:] = h
            e_prev[:] = e
            f_prev[:] = f
            return 0

        jax.lax.fori_loop(0, ndiag, body, 0)
        if ndiag % DPW:
            # flush the final partial word (static index)
            zdiag_ref[0, pl.ds(ndiag // DPW, 1)] = \
                zpack[:].reshape(1, R, T)
        score_ref[0] = svec[:]

    return kernel, ndiag6


@functools.partial(
    jax.jit,
    static_argnames=('T', 'Q', 'match', 'mismatch', 'gapopen', 'gapextend',
                     'interpret'))
def _align_pallas_batch(targets, tlens, queries, qlens, T, Q, match=1,
                        mismatch=2, gapopen=5, gapextend=0, interpret=False):
    B = targets.shape[0]
    assert B % R == 0
    Bg = B // R
    gapoe = gapopen + gapextend

    # vbuf[b, x] = qext[b, (-x) mod L2] with qext = query padded by the
    # sentinel 4 outside [0, Q); L2 >= T + Q - 1 guarantees the modular
    # wrap always lands in sentinel territory for out-of-range d - i
    L2 = -(-(2 * T + Q) // 128) * 128
    x = np.arange(L2)
    src = (-x) % L2
    valid = src < Q
    src_clip = jnp.asarray(np.clip(src, 0, Q - 1))
    qrbuf = jnp.where(jnp.asarray(valid)[None, :],
                      queries[:, src_clip], jnp.uint8(4)).astype(jnp.int32)

    kernel, ndiag6 = _kernel_factory(T, Q, L2, match, mismatch, gapoe,
                                     gapextend)

    # per-group [R, T]/[R, L2] int32 views; lengths broadcast across lanes
    tg = targets.astype(jnp.int32).reshape(Bg, R, T)
    qg = qrbuf.reshape(Bg, R, L2)
    tl = jnp.broadcast_to(tlens.astype(jnp.int32).reshape(Bg, R, 1),
                          (Bg, R, T))
    ql = jnp.broadcast_to(qlens.astype(jnp.int32).reshape(Bg, R, 1),
                          (Bg, R, T))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Bg,),
        in_specs=[
            pl.BlockSpec((1, R, T), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, T), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, T), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, L2), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, R, 128), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ndiag6, R, T), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, T), jnp.int32),
            pltpu.VMEM((R, T), jnp.int32),
            pltpu.VMEM((R, T), jnp.int32),
            pltpu.VMEM((R, T), jnp.int32),
            pltpu.VMEM((R, T), jnp.int32),
            pltpu.VMEM((R, 128), jnp.int32),
        ],
    )

    scores, zdiags = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Bg, R, 128), jnp.int32),
            jax.ShapeDtypeStruct((Bg, ndiag6, R, T), jnp.int32),
        ],
        interpret=interpret,
    )(tl, ql, tg, qg)
    # [Bg, ndiag6, R, T] -> per-pair [B, ndiag6, T] packed direction words
    zdiags = zdiags.transpose(0, 2, 1, 3).reshape(B, ndiag6, T)
    return scores.reshape(B, 128)[:, 0], zdiags


@functools.partial(jax.jit, static_argnames=('T', 'Q'))
def _traceback_packed(zdiags, tlens, qlens, T, Q):
    """Device backtrack over the PACKED direction words: the cell at
    (i, j) lives in word ``zdiags[(i+j) // DPW, i]``, bits
    ``5*((i+j) % DPW)``.  Same walk as align_ops._traceback_batch."""
    nsteps = T + Q

    def one(zdiag, tlen, qlen):
        def body(carry, _):
            i, j, state, done = carry
            active = ~done
            ii = jnp.maximum(i, 0)
            jj = jnp.maximum(j, 0)
            d = ii + jj
            word = zdiag[d // DPW, ii]
            tmp = (word >> (5 * (d % DPW))) & 0x1F
            cont = (tmp >> (state + 2)) & 1
            s1 = jnp.where(state == 0, tmp & 7,
                           jnp.where(cont == 0, 0, state))
            s2 = jnp.where(s1 == 0, tmp & 7, s1)
            op = jnp.where(active, s2.astype(jnp.uint8), jnp.uint8(3))
            di = ((s2 == 0) | (s2 == 1)).astype(jnp.int32)
            dj = ((s2 == 0) | (s2 == 2)).astype(jnp.int32)
            i2 = jnp.where(active, i - di, i)
            j2 = jnp.where(active, j - dj, j)
            done2 = done | (i2 < 0) | (j2 < 0)
            return (i2, j2, s2, done2), op

        init = (tlen - 1, qlen - 1, jnp.int32(0),
                (tlen <= 0) | (qlen <= 0))
        (fi, fj, _, _), ops = jax.lax.scan(body, init, None, length=nsteps)
        return ops, fi, fj

    return jax.vmap(one)(zdiags, tlens.astype(jnp.int32),
                         qlens.astype(jnp.int32))


def align_batch_pallas(target_seqs, query_seqs, match=1, mismatch=2,
                       gapopen=5, gapextend=0, interpret=None):
    """Device-batched alignment via the Pallas kernel; exact ksw2 results.

    Buckets above MAX_DIM delegate to the XLA wavefront (align_ops) —
    their packed direction blocks would outgrow VMEM.
    """
    from kevlar_tpu import dna

    if interpret is None:
        interpret = jax.default_backend() != 'tpu'

    def bucket(n, floor=128):
        b = floor
        while b < n:
            b *= 2
        return b

    B = len(target_seqs)
    T = bucket(max((len(t) for t in target_seqs), default=1))
    Q = bucket(max((len(q) for q in query_seqs), default=1))
    if T > MAX_DIM or Q > MAX_DIM:
        from kevlar_tpu.ops.align_ops import align_batch
        return align_batch(target_seqs, query_seqs, match=match,
                           mismatch=mismatch, gapopen=gapopen,
                           gapextend=gapextend)
    # pad the batch axis to a power of two (>= R) so the compiled-program
    # count stays logarithmic in partition-size variety (tunnel compiles
    # cost minutes each); padded rows have tlen=qlen=0, score NEG_INF,
    # and are dropped below
    Bpad = bucket(B, floor=R)
    pad_rows = [''] * (Bpad - B)
    targets, tlens = dna.encode_batch(list(target_seqs) + pad_rows, pad_to=T)
    queries, qlens = dna.encode_batch(list(query_seqs) + pad_rows, pad_to=Q)

    scores, zdiags = _align_pallas_batch(
        jnp.asarray(targets), jnp.asarray(tlens), jnp.asarray(queries),
        jnp.asarray(qlens), T=T, Q=Q, match=match, mismatch=mismatch,
        gapopen=gapopen, gapextend=gapextend, interpret=interpret)
    # device traceback: only O(B*(T+Q)) op bytes cross the link, never
    # the packed [B, ndiag/6, T] direction tensor
    from kevlar_tpu.ops.align_ops import _cigars_from_ops_batch
    ops_rev, exit_i, exit_j = _traceback_packed(
        zdiags, jnp.asarray(tlens), jnp.asarray(qlens), T=T, Q=Q)
    scores = np.asarray(scores)
    ops_rev = np.asarray(ops_rev)

    cigars = _cigars_from_ops_batch(ops_rev[:B], np.asarray(exit_i)[:B],
                                    np.asarray(exit_j)[:B])
    return [(cigars[b], int(scores[b])) for b in range(B)]
