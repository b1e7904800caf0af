"""Pallas wavefront aligner: exact parity with the scalar reference.

Runs in interpret mode on the CPU test mesh; the same kernel compiles via
Mosaic on TPU.
"""

import random

from kevlar_tpu.ops.align import align_scalar
from kevlar_tpu.ops.align_pallas import align_batch_pallas

from . import simdata


def test_pallas_aligner_parity():
    rng = random.Random(909)
    targets, queries, expected = [], [], []
    for _ in range(10):
        g = simdata.make_genome(rng, rng.randint(60, 200))
        q = g[10:-10]
        kind = rng.choice(['none', 'snv', 'ins', 'del'])
        if kind == 'snv' and len(q) > 10:
            q, _, _ = simdata.apply_snv(q, rng.randint(0, len(q) - 1),
                                        rng=rng)
        elif kind == 'ins' and len(q) > 10:
            q = simdata.apply_insertion(
                q, rng.randint(1, len(q) - 1), simdata.make_genome(rng, 5))
        elif kind == 'del' and len(q) > 30:
            q = simdata.apply_deletion(q, rng.randint(1, len(q) - 10), 6)
        targets.append(g)
        queries.append(q)
        expected.append(align_scalar(g, q))
    got = align_batch_pallas(targets, queries, interpret=True)
    assert got == expected


def test_pallas_aligner_grid_step_independence():
    """Regression for the grid-id/mismatch-score shadowing bug: results must
    not depend on batch position, and mismatch-heavy pairs at grid id > 0
    must score exactly (the shadowed value turned the mismatch penalty into
    the batch index)."""
    rng = random.Random(31)
    g = simdata.make_genome(rng, 180)
    q = g[15:-15]
    r1 = simdata.make_genome(rng, 150)
    r2 = simdata.make_genome(rng, 130)
    gn = g[:80] + 'NNNNN' + g[85:]
    pairs = [(g, q), (r1, r2), (g, q), (gn, q), (g, 'A'), (r2, r1[:120])]
    targets = [p[0] for p in pairs]
    queries = [p[1] for p in pairs]
    expected = [align_scalar(t, qq) for t, qq in zip(targets, queries)]
    got = align_batch_pallas(targets, queries, interpret=True)
    assert got == expected
    assert got[0] == got[2]  # duplicate pairs at different grid ids agree
