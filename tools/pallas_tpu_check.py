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

    result = {
        'metric': 'pallas_align_parity',
        'backend': jax.default_backend(),
        'device': str(jax.devices()[0].device_kind)
        if jax.devices() else '?',
        'pairs': len(pairs),
        'mismatches': mismatches,
        'first_call_s': round(compile_and_run_s, 2),
        'steady_batch_s': round(steady_s, 3),
        'pairs_per_s_steady': round(len(pairs) / steady_s, 1),
    }

    # batch-scale head-to-head at production shapes: the Pallas kernel vs
    # the XLA wavefront (align_ops), both end-to-end incl. traceback
    if '--batch-scale' in sys.argv:
        from kevlar_tpu.ops.align_ops import align_batch
        B = 1024
        rng2 = random.Random(7)
        tgts, qrys = [], []
        for _ in range(B):
            tlen = rng2.randint(180, 250)
            qlen = rng2.randint(120, 200)
            t = ''.join(rng2.choice('ACGT') for _ in range(tlen))
            s = rng2.randrange(max(1, tlen - qlen))
            q = list(t[s:s + qlen])
            for _ in range(rng2.randint(0, 5)):
                q[rng2.randrange(len(q))] = rng2.choice('ACGT')
            tgts.append(t)
            qrys.append(''.join(q))
        for name, fn in (('pallas', align_batch_pallas),
                         ('xla_wavefront', align_batch)):
            t0 = time.time()
            out1 = fn(tgts, qrys)
            first = time.time() - t0
            t0 = time.time()
            out2 = fn(tgts, qrys)
            steady = time.time() - t0
            assert out1 == out2
            result['batch_{}'.format(name)] = {
                'pairs': B, 'first_call_s': round(first, 2),
                'steady_s': round(steady, 3),
                'pairs_per_s': round(B / steady, 1)}
            # spot-check 32 pairs against the scalar ground truth
            for i in range(0, B, B // 32):
                want = align_scalar(tgts[i], qrys[i])
                if out1[i] != want:
                    mismatches += 1
                    print('# BATCH MISMATCH at', i, file=sys.stderr)
        result['mismatches'] = mismatches

    print(json.dumps(result))
    sys.exit(1 if mismatches else 0)


if __name__ == '__main__':
    main()
