"""Secondary benchmark: assemble+call throughput (contigs/s).

Simulates partitioned variant loci (reads tiling a mutated locus), then
measures the two call-path engines end to end:

- assemble (native overlap assembler) + localize-free direct alignment
  against the locus cutout via the native C++ aligner (host path)
- the batched device wavefront aligner (``ops.align_ops.align_batch``)

Prints one JSON line per engine (not consumed by the driver; bench.py is
the primary metric).
"""

import json
import random
import sys
import time

from kevlar_tpu.ops.align import align_both_strands
from kevlar_tpu.ops import align_ops


def make_genome(rng, n):
    return ''.join(rng.choice('ACGT') for _ in range(n))


def make_loci(rng, n_loci=64, locus=300, readlen=100, step=10):
    """Returns (partitions, cutouts): reads per locus + the reference span."""
    partitions, cutouts = [], []
    for _ in range(n_loci):
        g = make_genome(rng, locus + 200)
        pos = locus // 2 + 100
        alt = rng.choice([b for b in 'ACGT' if b != g[pos]])
        child = g[:pos] + alt + g[pos + 1:]
        reads = [child[i:i + readlen]
                 for i in range(100, locus + 100 - readlen + 1, step)]
        partitions.append(reads)
        cutouts.append(g[50:locus + 150])
    return partitions, cutouts


def main():
    rng = random.Random(20260817)
    partitions, cutouts = make_loci(rng)

    from kevlar_tpu import native
    have_native = native.available()

    # assemble all partitions
    t0 = time.time()
    contigs = []
    for reads in partitions:
        if have_native:
            cs = list(native.assemble(reads, min_overlap=45))
        else:
            cs = [reads[0]]
        contigs.append(max(cs, key=len))
    asm_s = time.time() - t0

    # host path: native aligner, both strands per contig x cutout
    t0 = time.time()
    for contig, cutout in zip(contigs, cutouts):
        align_both_strands(cutout, contig)
    host_s = time.time() - t0

    # device path: batched wavefront (forward strand; both-strand batched
    # doubles the batch)
    t0 = time.time()
    align_ops.align_batch(cutouts + cutouts,
                          contigs + [c[::-1] for c in contigs])
    dev_first = time.time() - t0  # includes compile
    t0 = time.time()
    align_ops.align_batch(cutouts + cutouts,
                          contigs + [c[::-1] for c in contigs])
    dev_s = time.time() - t0

    # device path at aggregation scale: one dispatch covering the
    # alignments of many alac flushes at once (the regime the device is
    # built for; same compiled program as above)
    REP = 16
    big_t = (cutouts + cutouts) * REP
    big_q = (contigs + [c[::-1] for c in contigs]) * REP
    t0 = time.time()
    align_ops.align_batch(big_t, big_q)
    big_first = time.time() - t0
    t0 = time.time()
    align_ops.align_batch(big_t, big_q)
    big_s = time.time() - t0

    n = len(contigs)
    print(json.dumps({
        'metric': 'assemble_call_contigs_per_s_host',
        'value': round(n / (asm_s + host_s), 1), 'unit': 'contigs/s'}))
    print(json.dumps({
        'metric': 'call_align_contigs_per_s_device',
        'value': round(n / dev_s, 1), 'unit': 'contigs/s'}))
    print(json.dumps({
        'metric': 'call_align_contigs_per_s_device_batched',
        'value': round(n * REP / big_s, 1), 'unit': 'contigs/s'}))
    print('# assemble: {:.3f}s; host align: {:.3f}s; device align: {:.3f}s '
          '(first incl. compile {:.1f}s) for {} loci'.format(
              asm_s, host_s, dev_s, dev_first, n), file=sys.stderr)
    print('# device at aggregation scale: {:.3f}s (first {:.1f}s) for {} '
          'loci ({} pair alignments per dispatch)'.format(
              big_s, big_first, n * REP, len(big_t)), file=sys.stderr)


if __name__ == '__main__':
    main()
