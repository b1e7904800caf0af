"""Real-TPU parity + perf record for the Pallas wavefront aligner.

Runs a randomized batch of (target, query) pairs through the Mosaic kernel
(`ops.align_pallas.align_batch_pallas`) on the default backend and checks
every (score, CIGAR) bit-exactly against the in-repo scalar ksw2 ground
truth (`ops.align.align_scalar`, itself validated against compiled ksw2 —
see tests/test_align.py).  Prints one JSON line; exits nonzero on any
mismatch.

Usage (real TPU):  python tools/pallas_tpu_check.py
       (host run): KEVLAR_PLATFORM=cpu python tools/pallas_tpu_check.py
"""

import json
import random
import sys
import time

import jax


def main():
    from kevlar_tpu.ops.align import align_scalar
    from kevlar_tpu.ops.align_pallas import align_batch_pallas

    rng = random.Random(20260819)
    pairs = []
    for _ in range(32):
        tlen = rng.randint(60, 280)
        qlen = rng.randint(40, 200)
        t = ''.join(rng.choice('ACGT') for _ in range(tlen))
        # half the queries are mutated slices of the target (realistic
        # contig-vs-cutout structure), half are unrelated
        if rng.random() < 0.5 and tlen > qlen:
            s = rng.randrange(tlen - qlen)
            q = list(t[s:s + qlen])
            for _ in range(rng.randint(0, 4)):
                p = rng.randrange(qlen)
                q[p] = rng.choice('ACGT')
            q = ''.join(q)
        else:
            q = ''.join(rng.choice('ACGT') for _ in range(qlen))
        pairs.append((t, q))

    targets = [t for t, _ in pairs]
    queries = [q for _, q in pairs]

    t0 = time.time()
    got = align_batch_pallas(targets, queries)
    compile_and_run_s = time.time() - t0
    t0 = time.time()
    got = align_batch_pallas(targets, queries)
    steady_s = time.time() - t0

    mismatches = 0
    for (t, q), (cigar, score) in zip(pairs, got):
        want_cigar, want_score = align_scalar(t, q)
        if (cigar, score) != (want_cigar, want_score):
            mismatches += 1
            print('# MISMATCH: got {} {} want {} {}'.format(
                cigar, score, want_cigar, want_score), file=sys.stderr)

    print(json.dumps({
        'metric': 'pallas_align_parity',
        'backend': jax.default_backend(),
        'pairs': len(pairs),
        'mismatches': mismatches,
        'first_call_s': round(compile_and_run_s, 2),
        'steady_batch_s': round(steady_s, 3),
        'pairs_per_s_steady': round(len(pairs) / steady_s, 1),
    }))
    sys.exit(1 if mismatches else 0)


if __name__ == '__main__':
    main()
