"""Pallas scatter-add probe: can a Mosaic scalar loop beat XLA scatter?

The consume path's bottleneck is the Count-Min table scatter-add
(~70M updates/s through XLA's scatter, see tools/consume_probe.py).  The
VPU has no vector scatter, so any faster path must drive the scalar unit
harder than XLA's lowering does.  This kernel keeps one whole table
resident in VMEM per grid step (laid out [8, C] with C a power of two so
bucket j lives at (j >> log2(C), j & (C-1)) — Mosaic block shapes need
the last two dims tiled (8, 128)) and walks the index stream with a
fori_loop of scalar read-modify-writes.

Correctness is checked against numpy bincount; timing against the XLA
scatter at the main bench's shapes.  Prints one JSON line.

Usage:  python tools/scatter_probe.py [--n N] [--tablesize T] [--interpret]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

if os.environ.get('KEVLAR_PLATFORM'):  # same override kevlar_tpu/__init__ does
    os.environ['JAX_PLATFORMS'] = os.environ['KEVLAR_PLATFORM']
    if 'jax' in sys.modules:
        sys.modules['jax'].config.update('jax_platforms',
                                         os.environ['KEVLAR_PLATFORM'])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128 * 1024
CHUNK_SUB = 8
CHUNK_LANES = CHUNK // CHUNK_SUB


def _make_kernel(log2c):
    colmask = (1 << log2c) - 1
    lanemask = CHUNK_LANES - 1
    lane_shift = CHUNK_LANES.bit_length() - 1

    def kernel(acc_in_ref, idx_ref, acc_out_ref):
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            acc_out_ref[...] = acc_in_ref[...]

        def body(i, carry):
            j = idx_ref[0, 0, i >> lane_shift, i & lanemask]
            jj = jnp.maximum(j, 0)
            row = jj >> log2c
            col = jj & colmask
            delta = jnp.where(j >= 0, jnp.int32(1), jnp.int32(0))
            acc_out_ref[0, row, col] = acc_out_ref[0, row, col] + delta
            return carry

        jax.lax.fori_loop(0, CHUNK, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=('log2c', 'interpret'))
def pallas_scatter_add(acc, idx, log2c, interpret=False):
    """acc [ntables, 8, C] int32 += per-table bincount of idx
    [ntables, nchunks, 8, CHUNK/8] int32 (negative = skip); bucket j of
    table t is acc[t, j >> log2c, j & (C-1)]."""
    ntables, sub, lanes = acc.shape
    nchunks = idx.shape[1]
    return pl.pallas_call(
        _make_kernel(log2c),
        grid=(ntables, nchunks),
        in_specs=[
            pl.BlockSpec((1, sub, lanes), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CHUNK_SUB, CHUNK_LANES),
                         lambda t, c: (t, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, sub, lanes), lambda t, c: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(acc.shape, acc.dtype),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(acc, idx)


@jax.jit
def xla_scatter_add(acc, idx):
    ntables = acc.shape[0]
    for t in range(ntables):
        flat = idx[t].ravel()
        valid = (flat >= 0).astype(jnp.int32)
        acc = acc.at[t, jnp.maximum(flat, 0)].add(valid, mode='drop')
    return acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=4 * 1024 * 1024)
    ap.add_argument('--tablesize', type=int, default=2_000_003)
    ap.add_argument('--ntables', type=int, default=4)
    ap.add_argument('--interpret', action='store_true')
    args = ap.parse_args()

    log2c = max(8, (-(-args.tablesize // 8) - 1).bit_length())
    C = 1 << log2c
    capacity = 8 * C

    rng = np.random.default_rng(7)
    nchunks = -(-args.n // CHUNK)
    idx = np.full((args.ntables, nchunks * CHUNK), -1, np.int32)
    for t in range(args.ntables):
        idx[t, :args.n] = rng.integers(0, args.tablesize, size=args.n)
    idx4 = idx.reshape(args.ntables, nchunks, CHUNK_SUB, CHUNK_LANES)
    acc0 = jnp.zeros((args.ntables, 8, C), jnp.int32)
    idx_dev = jnp.asarray(idx4)

    def timeit(fn):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        return time.time() - t0

    pallas_s = None
    pallas_err = None
    try:
        got = np.asarray(pallas_scatter_add(acc0, idx_dev, log2c,
                                            interpret=args.interpret))
        got_flat = got.reshape(args.ntables, capacity)[:, :args.tablesize]
        for t in range(args.ntables):
            want = np.bincount(idx[t][idx[t] >= 0],
                               minlength=args.tablesize)
            if not (got_flat[t] == want).all():
                print(json.dumps({'metric': 'pallas_scatter', 'ok': False}))
                sys.exit(1)
        pallas_s = timeit(lambda: pallas_scatter_add(
            acc0, idx_dev, log2c, interpret=args.interpret))
    except Exception as err:
        # Mosaic on TPU v5e rejects scalar stores to VMEM ("Cannot store
        # scalars to VMEM"): the VPU has no scatter instruction and the
        # scalar unit cannot address VMEM, so no Pallas formulation of a
        # scalar RMW loop exists on this hardware generation.  That
        # *negative* result is the probe's finding — report it.
        pallas_err = '{}: {}'.format(type(err).__name__,
                                     str(err).splitlines()[0][:160])

    acc0_flat = jnp.zeros((args.ntables, args.tablesize), jnp.int32)
    idx_flat = jnp.asarray(idx)
    xla_s = timeit(lambda: xla_scatter_add(acc0_flat, idx_flat))
    updates = args.n * args.ntables
    print(json.dumps({
        'metric': 'pallas_scatter', 'ok': True,
        'backend': jax.default_backend(),
        'updates': updates,
        'pallas_s': round(pallas_s, 3) if pallas_s else None,
        'pallas_rejected': pallas_err,
        'xla_s': round(xla_s, 3),
        'pallas_updates_per_s_M': (round(updates / pallas_s / 1e6, 1)
                                   if pallas_s else None),
        'xla_updates_per_s_M': round(updates / xla_s / 1e6, 1),
    }))


if __name__ == '__main__':
    main()
