"""Batched device (wavefront/vmap) aligner: exact parity with the scalar."""

import random

from kevlar_tpu.ops.align import align_scalar
from kevlar_tpu.ops.align_ops import align_batch

from . import simdata


def test_batch_aligner_parity_related_pairs():
    rng = random.Random(4040)
    targets, queries, expected = [], [], []
    for _ in range(16):
        g = simdata.make_genome(rng, rng.randint(60, 200))
        a = rng.randint(0, len(g) // 3)
        b = rng.randint(2 * len(g) // 3, len(g))
        q = g[a:b]
        kind = rng.choice(['none', 'snv', 'ins', 'del'])
        if kind == 'snv' and len(q) > 10:
            q, _, _ = simdata.apply_snv(q, rng.randint(0, len(q) - 1),
                                        rng=rng)
        elif kind == 'ins' and len(q) > 10:
            q = simdata.apply_insertion(
                q, rng.randint(1, len(q) - 1), simdata.make_genome(rng, 6))
        elif kind == 'del' and len(q) > 30:
            q = simdata.apply_deletion(q, rng.randint(1, len(q) - 12), 8)
        targets.append(g)
        queries.append(q)
        expected.append(align_scalar(g, q))
    got = align_batch(targets, queries)
    assert got == expected


def test_batch_aligner_mixed_lengths():
    rng = random.Random(4141)
    targets = [simdata.make_genome(rng, n) for n in (30, 61, 127, 200)]
    queries = [t[5:-5] for t in targets]
    got = align_batch(targets, queries)
    for (cig, score), t, q in zip(got, targets, queries):
        assert (cig, score) == align_scalar(t, q)
