"""Simulated mini-genomes/trios for testing (no reference data files used)."""

import random

from kevlar_tpu.sequence import Record


def make_genome(rng, length):
    return ''.join(rng.choice('ACGT') for _ in range(length))


def apply_snv(genome, pos, alt=None, rng=None):
    ref = genome[pos]
    if alt is None:
        choices = [b for b in 'ACGT' if b != ref]
        alt = (rng or random).choice(choices)
    return genome[:pos] + alt + genome[pos + 1:], ref, alt


def apply_insertion(genome, pos, insseq):
    """Insert `insseq` after position pos-1 (i.e. genome[:pos] + ins + ...)."""
    return genome[:pos] + insseq + genome[pos:]


def apply_deletion(genome, pos, dellen):
    return genome[:pos] + genome[pos + dellen:]


def sample_reads(rng, genome, readlen=100, coverage=15, prefix='read',
                 both_strands=True):
    """Error-free uniformly tiled reads at the given coverage."""
    from kevlar_tpu.dna import revcom
    nreads = max(1, int(len(genome) * coverage / readlen))
    reads = []
    maxstart = len(genome) - readlen
    for i in range(nreads):
        start = rng.randint(0, maxstart)
        seq = genome[start:start + readlen]
        if both_strands and rng.random() < 0.5:
            seq = revcom(seq)
        reads.append(Record(name='{}{}'.format(prefix, i), sequence=seq,
                            quality='I' * readlen))
    return reads


def tiled_reads(genome, readlen=100, step=10, prefix='read'):
    """Deterministic tiling (every `step` bp) — uniform coverage, no gaps."""
    reads = []
    n = 0
    for start in range(0, len(genome) - readlen + 1, step):
        reads.append(Record(name='{}{}'.format(prefix, n),
                            sequence=genome[start:start + readlen],
                            quality='I' * readlen))
        n += 1
    return reads


def write_fastq(records, path):
    import kevlar_tpu
    with kevlar_tpu.open(str(path), 'w') as fh:
        for r in records:
            fh.write('@{}\n{}\n+\n{}\n'.format(r.name, r.sequence,
                                               r.quality or 'I' * len(r)))


def write_fasta(seqdict, path):
    import kevlar_tpu
    with kevlar_tpu.open(str(path), 'w') as fh:
        for name, seq in seqdict.items():
            fh.write('>{}\n{}\n'.format(name, seq))
