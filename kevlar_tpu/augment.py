"""``augment`` stage: re-annotate naked sequences with interesting k-mers.

Contigs come out of assembly with no annotations; this stage carries the
interesting-k-mer labels from the annotated read stream onto any sequence
that contains the same k-mer (either strand), keyed on the canonical
(strand-min) form. Contract: kevlar/augment.py:13-45 — exact-match transfer
with per-window offsets recomputed on the target sequence.
"""

import kevlar_tpu
from kevlar_tpu.dna import revcommin
from kevlar_tpu.sequence import Record


def _collect_ikmer_index(augseqstream, upint):
    """One pass over the annotated stream -> {canonical kmer: abund}, ksize."""
    index = {}
    ksize = None
    seen = 0
    for record in augseqstream:
        if seen and seen % upint == 0:
            kevlar_tpu.plog(
                '[kevlar::augment] processed', seen, 'input reads')
        seen += 1
        for ikmer in record.annotations:
            index[revcommin(record.ikmerseq(ikmer))] = ikmer.abund
            ksize = ikmer.ksize
    return index, ksize


def augment(augseqstream, nakedseqstream, upint=10000):
    index, ksize = _collect_ikmer_index(augseqstream, upint)
    for record in nakedseqstream:
        fresh = Record(
            name=record.name, sequence=record.sequence,
            quality=getattr(record, 'quality', None))
        if ksize is not None:
            seq = record.sequence
            for offset in range(len(seq) - ksize + 1):
                window = seq[offset:offset + ksize]
                abund = index.get(revcommin(window))
                if abund is not None:
                    fresh.annotate(window, offset, abund)
        yield fresh


def main(args):
    annotated = kevlar_tpu.parse_augmented_fastx(
        kevlar_tpu.open(args.augseqs, 'r'))
    naked = kevlar_tpu.parse_augmented_fastx(kevlar_tpu.open(args.seqs, 'r'))
    outstream = kevlar_tpu.open(args.out, 'w')
    for record in augment(annotated, naked):
        kevlar_tpu.print_augmented_fastx(record, outstream)
