"""Pallas TPU kernel for the batched wavefront aligner.

Same exact ksw_extz DP as :mod:`kevlar_tpu.ops.align_ops`, but with the
wavefront state held in VMEM scratch and one grid step per alignment pair.
The per-diagonal substitution scores are computed without any in-kernel
gather: the query is pre-reversed into a modular buffer so the diagonal's
query bases ``query[d - i]`` drop out of a dynamic lane rotate
(``pltpu.roll``) — Mosaic forbids unaligned dynamic lane slices but
supports dynamic rotates.

``align_batch_pallas`` has the same contract as ``align_ops.align_batch``
and is validated bit-identical against the scalar ksw2 reference both in
interpret mode and compiled on real TPU hardware (Mosaic), including
gap-extend and ambiguous-base cases.  Compiled steady-state: ~0.1 s for an
8-pair batch end-to-end over the device tunnel.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kevlar_tpu.ops.align import NEG_INF


def _kernel_factory(T, Q, L2, match, mismatch, gapoe, gape):
    ndiag = T + Q - 1
    ndiag32 = -(-ndiag // 32) * 32   # uint8 sublane tile is 32
    a = int(match)
    b = int(mismatch if mismatch < 0 else -mismatch)

    def kernel(bidx, tlens_ref, qlens_ref, target_ref, qrbuf_ref, score_ref,
               zdiag_ref, h_prev, h_prev2, e_prev, f_prev, zbuf, score_s):
        # NB: the grid id must not be named `b` — it would shadow the
        # mismatch score above (the bug behind the original TPU parity gap)
        tlen = tlens_ref[bidx]
        qlen = qlens_ref[bidx]
        ii = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
        tcodes = target_ref[:].reshape(1, T).astype(jnp.int32)

        neg = jnp.full((1, T), NEG_INF, jnp.int32)
        h_prev[:] = neg
        h_prev2[:] = neg
        e_prev[:] = neg
        f_prev[:] = neg
        score_s[0] = NEG_INF

        def shift1(v):
            """v[i] -> v[i-1], with NEG_INF entering at i == 0."""
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

            # qd[i] = query[d - i]: vbuf[x] = qext[(-x) mod L2], so a
            # dynamic rotate by d aligns qext[d - i] onto lane i
            qrow = qrbuf_ref[:].reshape(1, L2)
            rolled = pltpu.roll(qrow, d, axis=1)
            qd = rolled[:, :T].astype(jnp.int32)
            sub_diag = jnp.where(
                (tcodes >= 4) | (qd >= 4), 0,
                jnp.where(tcodes == qd, a, b)).astype(jnp.int32)

            hdiag = hd + sub_diag
            # direction bits kept in int32 end-to-end: mixing i1 masks with
            # uint8 vectors forces an unsupported Mosaic relayout
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

            # buffer direction rows and flush 32-aligned chunks (Mosaic
            # requires uint8 sublane indices to be multiples of 32)
            row = jax.lax.broadcasted_iota(jnp.int32, (32, T), 0)
            zbuf[:] = jnp.where(row == (d % 32), d0.reshape(1, T), zbuf[:])

            @pl.when((d % 32) == 31)
            def _():
                base = pl.multiple_of(d - 31, 32)
                zdiag_ref[pl.ds(base, 32), :] = zbuf[:].astype(jnp.uint8)

            is_final = (ii == (tlen - 1)) & (jj == (qlen - 1))
            final_h = jnp.max(jnp.where(is_final, h, jnp.int32(NEG_INF)))

            @pl.when(d == (tlen + qlen - 2))
            def _():
                score_s[0] = final_h

            h_prev2[:] = H_prev
            h_prev[:] = h
            e_prev[:] = e
            f_prev[:] = f
            return 0

        jax.lax.fori_loop(0, ndiag, body, 0)
        if ndiag % 32:
            # flush the final partial chunk (static, aligned base)
            zdiag_ref[pl.ds((ndiag // 32) * 32, 32), :] = \
                zbuf[:].astype(jnp.uint8)
        score_ref[:] = jnp.full((1, 128), score_s[0], jnp.int32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=('T', 'Q', 'match', 'mismatch', 'gapopen', 'gapextend',
                     'interpret'))
def _align_pallas_batch(targets, tlens, queries, qlens, T, Q, match=1,
                        mismatch=2, gapopen=5, gapextend=0, interpret=False):
    B = targets.shape[0]
    ndiag = T + Q - 1
    ndiag32 = -(-ndiag // 32) * 32
    gapoe = gapopen + gapextend

    # vbuf[b, x] = qext[b, (-x) mod L2] with qext = query padded by the
    # sentinel 4 outside [0, Q); L2 >= T + Q - 1 guarantees the modular
    # wrap always lands in sentinel territory for out-of-range d - i
    L2 = -(-(2 * T + Q) // 128) * 128
    x = np.arange(L2)
    src = (-x) % L2
    valid = src < Q
    src_clip = jnp.asarray(np.clip(src, 0, Q - 1))
    # int32 buffer: Mosaic's dynamic rotate requires 32-bit lanes
    qrbuf = jnp.where(jnp.asarray(valid)[None, :],
                      queries[:, src_clip], jnp.uint8(4)).astype(jnp.int32)

    kernel = _kernel_factory(T, Q, L2, match, mismatch, gapoe, gapextend)

    def wrapped(tlens_ref, qlens_ref, target_ref, qrbuf_ref, score_ref,
                zdiag_ref, *scratch):
        b = pl.program_id(0)
        kernel(b, tlens_ref, qlens_ref, target_ref, qrbuf_ref,
               score_ref.at[0], zdiag_ref.at[0], *scratch)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            # singleton sublane axis keeps Mosaic's (8, 128) tiling rule
            # satisfied: last-two block dims equal the array dims
            pl.BlockSpec((1, 1, T), lambda b, tl, ql: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L2), lambda b, tl, ql: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 128), lambda b, tl, ql: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ndiag32, T), lambda b, tl, ql: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, T), jnp.int32),
            pltpu.VMEM((1, T), jnp.int32),
            pltpu.VMEM((1, T), jnp.int32),
            pltpu.VMEM((1, T), jnp.int32),
            pltpu.VMEM((32, T), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )

    scores, zdiags = pl.pallas_call(
        wrapped,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, ndiag32, T), jnp.uint8),
        ],
        interpret=interpret,
    )(tlens.astype(jnp.int32), qlens.astype(jnp.int32),
      targets[:, None, :], qrbuf[:, None, :])
    return scores[:, 0, 0], zdiags


def align_batch_pallas(target_seqs, query_seqs, match=1, mismatch=2,
                       gapopen=5, gapextend=0, interpret=None):
    """Device-batched alignment via the Pallas kernel; exact ksw2 results."""
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
    # pad the batch axis to a power of two so the compiled-program count
    # stays logarithmic in partition-size variety (tunnel compiles cost
    # minutes each); padded rows have tlen=qlen=0 and are dropped below
    Bpad = bucket(B, floor=8)
    pad_rows = [''] * (Bpad - B)
    targets, tlens = dna.encode_batch(list(target_seqs) + pad_rows, pad_to=T)
    queries, qlens = dna.encode_batch(list(query_seqs) + pad_rows, pad_to=Q)

    scores, zdiags = _align_pallas_batch(
        jnp.asarray(targets), jnp.asarray(tlens), jnp.asarray(queries),
        jnp.asarray(qlens), T=T, Q=Q, match=match, mismatch=mismatch,
        gapopen=gapopen, gapextend=gapextend, interpret=interpret)
    # device traceback (align_ops): only O(B*(T+Q)) op bytes cross the
    # link, never the [B, ndiag, T] direction tensor
    from kevlar_tpu.ops.align_ops import _traceback_batch, _cigar_from_ops
    ops_rev, exit_i, exit_j = _traceback_batch(
        zdiags, jnp.asarray(tlens), jnp.asarray(qlens), T=T, Q=Q)
    scores = np.asarray(scores)
    ops_rev = np.asarray(ops_rev)
    exit_i = np.asarray(exit_i)
    exit_j = np.asarray(exit_j)

    results = []
    for b in range(B):
        cigar = _cigar_from_ops(ops_rev[b], int(exit_i[b]), int(exit_j[b]))
        results.append((cigar, int(scores[b])))
    return results
