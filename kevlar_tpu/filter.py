"""``filter`` stage: re-count annotated k-mers to deflate FPR-inflated counts.

Parity with /root/reference/kevlar/filter.py: pass 1 re-counts every annotated
k-mer (skipping those in the reference-genome mask) into a fresh, much less
loaded sketch; pass 2 drops annotations whose recount is below `casemin` or
whose control abundance exceeds `ctrlmax`, and drops reads left with no
annotations.

Vectorised: all annotated k-mers across all reads are hashed and counted in
bulk device batches instead of per-k-mer point calls.
"""

import numpy as np

import kevlar_tpu
from kevlar_tpu import dna
from kevlar_tpu.sequence import KmerOfInterest
from kevlar_tpu.sketch import Sketch, estimate_fpr, KevlarUnsuitableFPRError


def _annotated_kmer_hashes(reads):
    """Hash every annotated k-mer of every read; returns (h1, h2) arrays."""
    h1s, h2s = [], []
    for read in reads:
        for ikmer in read.annotations:
            h1, h2 = dna.hash_kmer(read.ikmerseq(ikmer))
            h1s.append(h1)
            h2s.append(h2)
    return (np.array(h1s, dtype=np.uint32), np.array(h2s, dtype=np.uint32))


def first_pass(reads, mask, memory, timer, chunk=1 << 16):
    kevlar_tpu.plog('[kevlar::filter] First pass: re-counting k-mers')
    timer.start('firstpass')
    counts = None
    ksize = None
    n = 0
    pend_h1, pend_h2 = [], []

    def flush():
        if not pend_h1:
            return
        h1 = np.concatenate(pend_h1)
        h2 = np.concatenate(pend_h2)
        if mask is not None:
            mcnt = mask._host_counts(h1, h2)
            keep = mcnt == 0
        else:
            keep = np.ones(h1.shape, dtype=bool)
        # pad every slice to the fixed chunk size so all flushes share one
        # compiled kernel (ragged sizes would otherwise recompile)
        for start in range(0, len(h1), chunk):
            s1 = h1[start:start + chunk]
            s2 = h2[start:start + chunk]
            sk = keep[start:start + chunk]
            if len(s1) < chunk:
                pad = chunk - len(s1)
                s1 = np.concatenate([s1, np.zeros(pad, np.uint32)])
                s2 = np.concatenate([s2, np.ones(pad, np.uint32)])
                sk = np.concatenate([sk, np.zeros(pad, bool)])
            counts.consume_hashes(s1, s2, sk)
        pend_h1.clear()
        pend_h2.clear()

    npending = 0
    for n, read in enumerate(reads, 1):
        if len(read.annotations) == 0:
            continue
        if counts is None:
            ksize = read.annotations[0].ksize
            counts = Sketch(ksize, int(memory) // 4, 4, counter_bits=8,
                            backend='host')
        h1, h2 = _annotated_kmer_hashes([read])
        pend_h1.append(h1)
        pend_h2.append(h2)
        npending += len(h1)
        if npending >= chunk:
            flush()
            npending = 0
    if counts is not None:
        flush()
    elapsed = timer.stop('firstpass')
    message = 'First pass complete! Processed {:d} reads in {:.2f} seconds!'
    kevlar_tpu.plog('[kevlar::filter]', message.format(n, elapsed))
    return counts


def check_fpr(counts, maxfpr):
    fpr = estimate_fpr(counts)
    message = 'FPR for re-computed k-mer counts: {:1.3f}'.format(fpr)
    kevlar_tpu.plog('[kevlar::filter]', message)
    if fpr > maxfpr:
        raise KevlarUnsuitableFPRError(message + ' FPR too high, bailing out!')


def second_pass(reads, counts, casemin, ctrlmax, timer):
    kevlar_tpu.plog('[kevlar::filter] Second pass: discarding k-mers/reads')
    timer.start('secondpass')
    kept = 0
    for read in reads:
        validated_kmers = []
        for ikmer in read.annotations:
            ctrltoohigh = any(a > ctrlmax for a in ikmer.abund[1:])
            if ctrltoohigh:
                continue
            newcount = counts.get(read.ikmerseq(ikmer))
            if newcount < casemin:
                continue
            newabund = tuple([newcount] + list(ikmer.abund[1:]))
            validated_kmers.append(
                KmerOfInterest(ikmer.ksize, ikmer.offset, newabund))
        if len(validated_kmers) == 0:
            continue
        read.annotations = validated_kmers
        yield read
        kept += 1
    elapsed = timer.stop('secondpass')
    message = 'Second pass complete! Validated {:d} reads in {:.2f} seconds!'
    kevlar_tpu.plog('[kevlar::filter]', message.format(kept, elapsed))


def filter(readfile, mask=None, memory=1e6, maxfpr=0.01, casemin=6, ctrlmax=1):
    timer = kevlar_tpu.Timer()
    timer.start()
    reader = kevlar_tpu.parse_augmented_fastx(kevlar_tpu.open(readfile, 'r'))
    counts = first_pass(reader, mask, memory, timer)
    if counts is None:
        return
    check_fpr(counts, maxfpr)
    reader = kevlar_tpu.parse_augmented_fastx(kevlar_tpu.open(readfile, 'r'))
    for read in second_pass(reader, counts, casemin, ctrlmax, timer):
        yield read
    total = timer.stop()
    kevlar_tpu.plog('[kevlar::filter] Total time: {:.2f} seconds'.format(
        total))


def main(args):
    from kevlar_tpu import sketch as sketch_mod
    mask = sketch_mod.load(args.mask) if args.mask else None
    outstream = kevlar_tpu.open(args.out, 'w')
    filterstream = filter(
        args.augfastq, mask=mask, memory=args.memory, maxfpr=args.max_fpr,
        casemin=args.case_min, ctrlmax=args.ctrl_max)
    for record in filterstream:
        kevlar_tpu.print_augmented_fastx(record, outstream)
