"""``augment`` stage: transfer interesting-k-mer annotations onto unannotated
sequences (e.g. assembled contigs) by exact k-mer lookup (both strands)."""

import kevlar_tpu
from kevlar_tpu import sequence


def augment(augseqstream, nakedseqstream, upint=10000):
    ksize = None
    ikmers = {}
    for n, record in enumerate(augseqstream):
        if n > 0 and n % upint == 0:
            kevlar_tpu.plog('[kevlar::augment] processed', n, 'input reads')
        for ikmer in record.annotations:
            seq = record.ikmerseq(ikmer)
            ikmers[seq] = ikmer.abund
            ikmers[kevlar_tpu.revcom(seq)] = ikmer.abund
            ksize = ikmer.ksize

    for record in nakedseqstream:
        qual = getattr(record, 'quality', None)
        newrecord = sequence.Record(
            name=record.name, sequence=record.sequence, quality=qual)
        if ksize is not None:
            numkmers = len(record.sequence) - ksize + 1
            for offset in range(numkmers):
                kmer = record.sequence[offset:offset + ksize]
                if kmer in ikmers:
                    newrecord.annotate(kmer, offset, ikmers[kmer])
        yield newrecord


def main(args):
    augseqs = kevlar_tpu.parse_augmented_fastx(
        kevlar_tpu.open(args.augseqs, 'r'))
    nakedseqs = kevlar_tpu.parse_augmented_fastx(
        kevlar_tpu.open(args.seqs, 'r'))
    outstream = kevlar_tpu.open(args.out, 'w')
    for record in augment(augseqs, nakedseqs):
        kevlar_tpu.print_augmented_fastx(record, outstream)
