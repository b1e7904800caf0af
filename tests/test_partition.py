"""Read graph partitioning: components, abundance filters, dedup, strict."""

import random

from kevlar_tpu.partition import partition
from kevlar_tpu.readgraph import ReadGraph
from kevlar_tpu.readpair import ReadPair
from kevlar_tpu.sequence import Record

from . import simdata


def _annotated_read(name, seq, kmers):
    """kmers: list of (kmerseq, offset)"""
    r = Record(name=name, sequence=seq, quality='I' * len(seq))
    for kmerseq, offset in kmers:
        r.annotate(kmerseq, offset, (9, 0, 0))
    return r


def test_two_components():
    rng = random.Random(77)
    g1 = simdata.make_genome(rng, 60)
    g2 = simdata.make_genome(rng, 60)
    k1 = g1[10:31]
    k2 = g2[10:31]
    reads = [
        _annotated_read('a1', g1[:50], [(k1, 10)]),
        _annotated_read('a2', g1[5:55], [(k1, 5)]),
        _annotated_read('b1', g2[:50], [(k2, 10)]),
        _annotated_read('b2', g2[5:55], [(k2, 5)]),
        _annotated_read('b3', g2[8:58], [(k2, 2)]),
    ]
    parts = list(partition(iter(reads), minabund=2, maxabund=200))
    assert len(parts) == 2
    # largest component first
    (n1, reads1), (n2, reads2) = parts
    assert n1 == 1 and n2 == 2
    names1 = {r.name.split()[0] for r in reads1}
    names2 = {r.name.split()[0] for r in reads2}
    assert names1 == {'b1', 'b2', 'b3'}
    assert names2 == {'a1', 'a2'}
    for r in reads1:
        assert 'kvcc=1' in r.name
    for r in reads2:
        assert 'kvcc=2' in r.name


def test_min_abund_filters_kmers():
    rng = random.Random(78)
    g1 = simdata.make_genome(rng, 60)
    k1 = g1[10:31]
    # only one read contains the k-mer -> below minabund=2 -> no partition
    reads = [_annotated_read('solo', g1[:50], [(k1, 10)])]
    parts = list(partition(iter(reads), minabund=2, maxabund=200))
    assert parts == []


def test_dedup_removes_pcr_duplicates():
    rng = random.Random(79)
    g1 = simdata.make_genome(rng, 60)
    k1 = g1[10:31]
    reads = [
        _annotated_read('dup1', g1[:50], [(k1, 10)]),
        _annotated_read('dup2', g1[:50], [(k1, 10)]),  # identical sequence
        _annotated_read('dup3', g1[5:55], [(k1, 5)]),
    ]
    parts = list(partition(iter(reads), minabund=2, maxabund=200))
    assert len(parts) == 1
    _, outreads = parts[0]
    assert len(outreads) == 2  # one PCR duplicate removed


def test_transitive_connectivity():
    """a-b share k1, b-c share k2 -> one component of 3."""
    rng = random.Random(80)
    g = simdata.make_genome(rng, 100)
    k1 = g[10:31]
    k2 = g[50:71]
    reads = [
        _annotated_read('a', g[0:45], [(k1, 10)]),
        _annotated_read('b', g[5:80], [(k1, 5), (k2, 45)]),
        _annotated_read('c', g[45:95], [(k2, 5)]),
    ]
    parts = list(partition(iter(reads), minabund=2, maxabund=200))
    assert len(parts) == 1
    assert len(parts[0][1]) == 3


def test_readpair_merge_same_orientation():
    seq1 = 'ACGTACGGATCGATCGGACTA'
    seq2 = 'GATCGATCGGACTATTTTT'
    shared = 'GATCGATCGGACT'
    r1 = Record('r1', seq1)
    r1.annotate(shared, 7, (9,))
    r2 = Record('r2', seq2)
    r2.annotate(shared, 0, (9,))
    pair = ReadPair(r1, r2, shared)
    assert not pair.incompatible
    assert pair.mergedseq == 'ACGTACGGATCGATCGGACTATTTTT'


def test_readpair_merge_opposite_orientation():
    from kevlar_tpu.dna import revcom
    seq1 = 'ACGTACGGATCGATCGGACTA'
    shared = 'GATCGATCGGACT'
    seq2rc = 'GATCGATCGGACTATTTTT'
    seq2 = revcom(seq2rc)
    r1 = Record('r1', seq1)
    r1.annotate(shared, 7, (9,))
    r2 = Record('r2', seq2)
    r2.annotate(revcom(shared), seq2.index(revcom(shared)), (9,))
    pair = ReadPair(r1, r2, shared)
    assert not pair.incompatible
    assert pair.mergedseq == 'ACGTACGGATCGATCGGACTATTTTT'


def test_readpair_incompatible_mismatch():
    seq1 = 'ACGTACGGATCGATCGGACTA'
    shared = 'GATCGATCGGACT'
    seq2 = 'GATCGATCGGACTATTTTT'
    # corrupt the non-overlap... actually corrupt overlap region after kmer
    seq1_bad = seq1[:20] + 'C'  # change last base of overlap (A->C)
    r1 = Record('r1', seq1_bad)
    r1.annotate(shared, 7, (9,))
    r2 = Record('r2', seq2)
    r2.annotate(shared, 0, (9,))
    pair = ReadPair(r1, r2, shared)
    assert pair.incompatible


def test_strict_mode_excludes_bad_overlap():
    seq1 = 'ACGTACGGATCGATCGGACTA'
    shared = 'GATCGATCGGACT'
    seq2 = 'GATCGATCGGACTATTTTT'
    seq1_bad = seq1[:20] + 'C'
    reads = [
        _annotated_read('x', seq1_bad, [(shared, 7)]),
        _annotated_read('y', seq2, [(shared, 0)]),
    ]
    parts = list(partition(iter(reads), strict=True))
    assert parts == []
    parts_relaxed = list(partition(iter(reads)))
    assert len(parts_relaxed) == 1


def test_readpair_tiebreak_by_read_length():
    """Equal k-mer offsets in all arrangements -> longer read is tail."""
    shared = 'GATCGATCGGACT'
    long_read = 'AAAA' + shared + 'TTTTTTT'      # offset 4, len 24
    short_read = 'CCCC' + shared + 'GGG'         # offset 4, len 20
    r1 = Record('r1', long_read)
    r1.annotate(shared, 4, (9,))
    r2 = Record('r2', short_read)
    r2.annotate(shared, 4, (9,))
    pair = ReadPair(r1, r2, shared)
    assert pair.tail.name == 'r1'
    assert pair.head.name == 'r2'


def test_readpair_tiebreak_by_name():
    """Equal offsets and equal lengths -> lexicographically smaller name.

    The k-mer must sit exactly mid-read (offset == rc-offset) so that both
    strand arrangements tie on offset and the name rule applies."""
    shared = 'GATCGATCGGACT'
    seq_a = 'AAAA' + shared + 'TTTT'
    seq_b = 'CCCC' + shared + 'GGGG'
    r1 = Record('zeta', seq_a)
    r1.annotate(shared, 4, (9,))
    r2 = Record('alpha', seq_b)
    r2.annotate(shared, 4, (9,))
    pair = ReadPair(r1, r2, shared)
    assert pair.tail.name == 'alpha'
    assert pair.head.name == 'zeta'


def test_readpair_multiple_kmer_occurrence_incompatible():
    shared = 'GATCGATCGGACT'
    seq = shared + 'TT' + shared  # k-mer occurs twice
    r1 = Record('r1', seq)
    r1.annotate(shared, 0, (9,))
    r2 = Record('r2', 'AA' + shared + 'CC')
    r2.annotate(shared, 2, (9,))
    pair = ReadPair(r1, r2, shared)
    assert pair.incompatible


def test_readpair_str_smoke():
    shared = 'GATCGATCGGACT'
    r1 = Record('r1', 'ACGTACG' + shared + 'A')
    r1.annotate(shared, 7, (9,))
    r2 = Record('r2', shared + 'ATTTTT')
    r2.annotate(shared, 0, (9,))
    pair = ReadPair(r1, r2, shared)
    assert not pair.incompatible
    text = str(pair)
    assert '|' * len(shared) in text
