"""Unit-level behavior parity with the reference's pinned expectations.

Mirrors the exact assertions of the reference's test_readpair.py (overlap /
offset / orientation matrix, incompatibility rules, merged sequences) and
test_cigar.py (block invariants and `_endcheck` CIGAR canonicalisation on
the reference's own cigar/* data files).  Expected values are the
reference suite's published assertions (cited per test); no reference code
is used.

Skipped automatically when the reference data mount is absent (the
readpair tests are self-contained and always run).
"""

import os

import pytest

import kevlar_tpu
from kevlar_tpu import same_seq
from kevlar_tpu.cigar import AlignmentTokenizer
from kevlar_tpu.ops.align import align
from kevlar_tpu.readpair import ReadPair
from kevlar_tpu.sequence import KmerOfInterest, Record

DATA = '/root/reference/kevlar/tests/data/'

needsdata = pytest.mark.skipif(
    not os.path.isdir(DATA), reason='reference test data not mounted')


def data_file(name):
    return os.path.join(DATA, name)


# ----------------------------------------------------------------------
# ReadPair orientation matrix (reference test_readpair.py:177-273)
# ----------------------------------------------------------------------

def record1():
    return Record(name='read1', sequence='GCTGCACCGATGTACGCAAA',
                  annotations=[KmerOfInterest(5, 14, [15, 0, 0])])


def record2():
    return Record(name='read2', sequence='ACGCAAAGCTATTTAAAACC',
                  annotations=[KmerOfInterest(5, 1, [15, 0, 0]),
                               KmerOfInterest(5, 14, [19, 1, 0])])


def record3():
    # reverse complement of record2
    return Record(name='read3', sequence='GGTTTTAAATAGCTTTGCGT',
                  annotations=[KmerOfInterest(5, 1, [19, 1, 0]),
                               KmerOfInterest(5, 14, [15, 0, 0])])


@pytest.mark.parametrize('read1,read2,sameorientation', [
    (record1(), record2(), True),
    (record2(), record1(), True),
    (record1(), record3(), False),
    (record3(), record1(), False),
])
def test_readpair_basic_matrix(read1, read2, sameorientation):
    """Same answer regardless of read order or orientation
    (reference test_readpair.py:177-207)."""
    pair = ReadPair(read1, read2, 'CGCAA')
    assert pair.overlap == 7
    assert pair.offset == 13
    assert pair.sameorient is sameorientation
    str_reprs = [
        ('GCTGCACCGATGTACGCAAA\n'
         '              |||||\n'
         '             ACGCAAAGCTATTTAAAACC'),
        ('GGTTTTAAATAGCTTTGCGT\n'
         '              |||||\n'
         '             TTTGCGTACATCGGTGCAGC'),
    ]
    assert str(pair) in str_reprs


def test_readpair_kmer_multi_copy():
    """K-mer occurring twice in one read -> incompatible
    (reference test_readpair.py:210-221)."""
    r2a = Record(name='read2', sequence='ACGCAAAGCTATTTACGCAA',
                 annotations=[KmerOfInterest(5, 1, [15, 0, 0]),
                              KmerOfInterest(5, 15, [15, 0, 0])])
    pair = ReadPair(record1(), r2a, 'CGCAA')
    assert pair.incompatible


def test_readpair_mismatch():
    """Single mismatch in the overlap -> incompatible
    (reference test_readpair.py:224-237)."""
    r4 = Record(name='read4', sequence='ACGCAATGCTATTTAAAACC',
                annotations=[KmerOfInterest(5, 1, [15, 0, 0]),
                             KmerOfInterest(5, 14, [19, 1, 0])])
    pair = ReadPair(record1(), r4, 'CGCAA')
    assert pair.incompatible


def test_readpair_big_mismatch():
    """Extensive differences beyond the seed -> incompatible, for either
    shared k-mer (reference test_readpair.py:240-253)."""
    r5 = Record(name='read5',
                sequence='CTCTTCCGGCAGTCACTGTCAAGAGAGGGTGAACT',
                annotations=[KmerOfInterest(7, 15, [12, 0, 0]),
                             KmerOfInterest(7, 16, [13, 0, 0])])
    r6 = Record(name='read6',
                sequence='TCACTGTCAAGAGAGGCCTACGGATTCGGTTACTG',
                annotations=[KmerOfInterest(7, 3, [12, 0, 0]),
                             KmerOfInterest(7, 4, [13, 0, 0])])
    for ikmer in ['CTGTCAA', 'TGTCAAG']:
        pair = ReadPair(r5, r6, ikmer)
        assert pair.incompatible


def _picorecord1():
    return Record(
        name='seq1_901350_901788_1:0:0_0:0:0_21ca1/2',
        sequence=('GTTTTTTTTTTGTTTCCCAAAGTAAGGCTGAGTGAACAATATTTTCTCATAGTT'
                  'TTGACAAAAACAAAGGAATCCTTAGTTATTAAACTCGGGAGTTTGA'),
        annotations=[KmerOfInterest(25, 5, [19, 0, 0]),
                     KmerOfInterest(25, 6, [18, 1, 0]),
                     KmerOfInterest(25, 7, [18, 1, 0]),
                     KmerOfInterest(25, 8, [18, 0, 0]),
                     KmerOfInterest(25, 9, [17, 0, 0])])


def _picorecord3():
    return Record(
        name='seq1_901428_901847_3:0:0_0:0:0_87d/1',
        sequence=('TATTGTTCACTCAGCCTTACTTTGGGAAACAAAAAAAAAACTAAGCTTTTGGAT'
                  'TACAGTTGGAAGTGAGGTCTCAGCCTGCACAAACGAATAAATGTAA'),
        annotations=[KmerOfInterest(25, 11, [17, 0, 0]),
                     KmerOfInterest(25, 10, [18, 0, 0]),
                     KmerOfInterest(25, 9, [18, 1, 0]),
                     KmerOfInterest(25, 8, [18, 1, 0]),
                     KmerOfInterest(25, 7, [19, 0, 0])])


def test_readpair_pico():
    """Head assignment + merged-sequence strand invariance on the pico
    reads (reference test_readpair.py:256-267)."""
    pico2 = Record(
        name='seq1_901428_901847_3:0:0_0:0:0_87d/1',
        sequence=('TTACATTTATTCGTTTGTGCAGGCTGAGACCTCACTTCCAACTGTAATCCAAAA'
                  'GCTTAGTTTTTTTTTTGTTTCCCAAAGTAAGGCTGAGTGAACAATA'),
        annotations=[KmerOfInterest(25, 64, [19, 0, 0]),
                     KmerOfInterest(25, 65, [18, 1, 0]),
                     KmerOfInterest(25, 66, [18, 1, 0]),
                     KmerOfInterest(25, 67, [18, 0, 0]),
                     KmerOfInterest(25, 68, [17, 0, 0])])
    kmer = 'TTTTTTGTTTCCCAAAGTAAGGCTG'
    pair1 = ReadPair(_picorecord1(), pico2, kmer)
    assert pair1.offset == 59
    assert pair1.head.read.name == 'seq1_901428_901847_3:0:0_0:0:0_87d/1'

    pair2 = ReadPair(_picorecord1(), _picorecord3(), kmer)
    assert pair2.offset == 59
    assert pair2.head.read.name == 'seq1_901428_901847_3:0:0_0:0:0_87d/1'

    assert same_seq(pair1.mergedseq, pair2.mergedseq)


def test_readpair_pico_contains():
    """Containment merge returns the containing read's sequence
    (reference test_readpair.py:270-273)."""
    pico4 = Record(
        name='seqname',
        sequence=('TGTTCACTCAGCCTTACTTTGGGAAACAAAAAAAAAACTAAGCTTTTGGATTAC'
                  'AGTTGGAAGTGAGGTCTCAGCCTGCACAAACGAATAAATG'),
        annotations=[KmerOfInterest(25, 8, [17, 0, 0]),
                     KmerOfInterest(25, 7, [18, 0, 0]),
                     KmerOfInterest(25, 6, [18, 1, 0]),
                     KmerOfInterest(25, 5, [18, 1, 0]),
                     KmerOfInterest(25, 4, [19, 0, 0])])
    pico3 = _picorecord3()
    pair = ReadPair(pico3, pico4, 'CACTCAGCCTTACTTTGGGAAACAA')
    assert same_seq(pair.mergedseq, pico3.sequence)


# ----------------------------------------------------------------------
# AlignmentTokenizer on the reference's cigar/* data
# (reference test_cigar.py:17-65)
# ----------------------------------------------------------------------

def _load_pair(contig, gdna):
    query = next(kevlar_tpu.parse_augmented_fastx(
        kevlar_tpu.open(data_file(contig), 'r')))
    target = next(kevlar_tpu.parse_augmented_fastx(
        kevlar_tpu.open(data_file(gdna), 'r')))
    return query, target


@needsdata
@pytest.mark.parametrize('contig,gdna', [
    ('cigar/a.contig.fa', 'cigar/a.gdna.fa'),
    ('cigar/b.contig.fa', 'cigar/b.gdna.fa'),
    ('cigar/c.contig.fa', 'cigar/c.gdna.fa'),
    ('cigar/d.contig.fa', 'cigar/d.gdna.fa'),
    ('phony-snv-01.contig.fa', 'phony-snv-01.gdna.fa'),
    ('phony-snv-02.contig.fa', 'phony-snv-02.gdna.fa'),
])
def test_cigar_block_invariants(contig, gdna):
    """Every block carries the right substring lengths
    (reference test_cigar.py:17-39)."""
    query, target = _load_pair(contig, gdna)
    cigar, score = align(target.sequence, query.sequence)
    tok = AlignmentTokenizer(query.sequence, target.sequence, cigar)
    for block in tok.blocks:
        assert block.type in ('M', 'D', 'I')
        if block.type in ('M', 'D'):
            assert len(block.target) == block.length
        else:
            assert block.target is None
        if block.type in ('M', 'I'):
            assert len(block.query) == block.length
        else:
            assert block.query is None


@needsdata
def test_cigar_nomargin():
    """No-margin alignments are left untouched by _endcheck
    (reference test_cigar.py:42-49)."""
    query, target = _load_pair('nomargin-r-indel-contigs.augfasta',
                               'nomargin-r-gdna.fa')
    cigar, score = align(target.sequence, query.sequence)
    tok = AlignmentTokenizer(query.sequence, target.sequence, cigar)
    assert tok.cigar == tok.origcigar


@needsdata
@pytest.mark.parametrize('contig,gdna,newcigar,origcigar,nblocks', [
    ('b.contig.fa', 'b.gdna.fa', '41D150M50D', '41D144M50D6M', 3),
    ('d.contig.fa', 'd.gdna.fa', '39D129M4D43M6D', '39D129M4D29M6D14M', 5),
])
def test_cigar_gap_center_aligned(contig, gdna, newcigar, origcigar,
                                  nblocks):
    """_endcheck merges the spurious trailing M across a terminal indel,
    producing the exact canonical CIGARs the reference pins
    (reference test_cigar.py:52-65)."""
    query, target = _load_pair('cigar/' + contig, 'cigar/' + gdna)
    cigar, score = align(target.sequence, query.sequence)
    tok = AlignmentTokenizer(query.sequence, target.sequence, cigar)
    assert len(tok.blocks) == nblocks
    assert tok.cigar == newcigar
    assert tok.origcigar == origcigar


# ----------------------------------------------------------------------
# Localizer clustering / cutouts / maxdiff / CLI filters
# (reference test_localize.py)
# ----------------------------------------------------------------------

from kevlar_tpu.localize import (  # noqa: E402
    KevlarRefrSeqNotFoundError, Localizer, decompose_seeds, localize,
    unique_seeds)
from kevlar_tpu import seqio  # noqa: E402


def test_localizer_simple():
    """Seed clustering intervals (reference test_localize.py:22-39)."""
    intervals = Localizer(seedsize=25)
    assert list(intervals.get_cutouts()) == []
    for seqid, pos in [('chr1', 100), ('chr1', 115), ('chr2', 200),
                       ('chr2', 205), ('chr2', 207), ('chr2', 235008),
                       ('chr2', 235075)]:
        intervals.add_seed_match(seqid, pos)
    testint = [c.interval for c in intervals.get_cutouts()]
    assert testint == [('chr1', 100, 140), ('chr2', 200, 232),
                       ('chr2', 235008, 235100)]


def test_localizer_incl_excl():
    """Include/exclude regex filtering (reference test_localize.py:42-75)."""
    intervals = Localizer(seedsize=25)
    for seqid, pos in [('1', 100), ('1', 120), ('12', 200), ('12', 209),
                       ('12', 213), ('X', 1234), ('X', 1245),
                       ('Un', 13579), ('Un', 13597)]:
        intervals.add_seed_match(seqid, pos)
    testint = [c.interval for c in intervals.get_cutouts()]
    assert sorted(testint) == [('1', 100, 145), ('12', 200, 238),
                               ('Un', 13579, 13622), ('X', 1234, 1270)]
    intervals.exclpattern = 'Un'
    testint = [c.interval for c in intervals.get_cutouts()]
    assert sorted(testint) == [('1', 100, 145), ('12', 200, 238),
                               ('X', 1234, 1270)]
    intervals.inclpattern = r'^\d+$'
    testint = [c.interval for c in intervals.get_cutouts()]
    assert sorted(testint) == [('1', 100, 145), ('12', 200, 238)]


@needsdata
def test_get_cutouts_pinned():
    """Exact cutout deflines + sequences on the reference's genomes
    (reference test_localize.py:78-132)."""
    intervals = Localizer(seedsize=10)
    intervals.add_seed_match('bogus-genome-chr2', 10)
    seqs = seqio.parse_seq_dict(open(data_file('bogus-genome/refr.fa')))
    cutouts = list(intervals.get_cutouts(refrseqs=seqs))
    assert len(cutouts) == 1
    assert cutouts[0].defline == 'bogus-genome-chr2_10-20'
    assert cutouts[0].sequence == 'GTTACATTAC'

    seqs = seqio.parse_seq_dict(open(data_file('simple-genome-ctrl1.fa')))
    intervals = Localizer(seedsize=21)
    for pos in (49, 52, 59):
        intervals.add_seed_match('simple', pos)
    cutouts = list(intervals.get_cutouts(refrseqs=seqs, delta=5))
    assert [c.defline for c in cutouts] == ['simple_44-85']
    assert cutouts[0].sequence == ('AATACTATGCCGATTTATTCTTACACAATTAAATT'
                                   'GCTAGT')

    intervals = Localizer(seedsize=21)
    for pos in (40, 80, 120, 500):
        intervals.add_seed_match('simple', pos)
    cutouts = list(intervals.get_cutouts(refrseqs=seqs, clusterdist=None,
                                         delta=10))
    assert [c.defline for c in cutouts] == ['simple_30-531']
    assert len(cutouts[0].sequence) == 501

    intervals = Localizer(seedsize=21)
    intervals.add_seed_match('simple', 100)
    intervals.add_seed_match('simple', 200)
    cutouts = intervals.get_cutouts(refrseqs=seqs, clusterdist=50, delta=25)
    assert [c.defline for c in cutouts] == ['simple_75-146',
                                            'simple_175-246']
    cutouts = intervals.get_cutouts(refrseqs=seqs, clusterdist=100,
                                    delta=50)
    assert [c.defline for c in cutouts] == ['simple_50-271']


@needsdata
def test_get_cutouts_missing_seq_and_boundaries():
    """Unknown seqid error + clamping at sequence boundaries
    (reference test_localize.py:135-164)."""
    seqs = seqio.parse_seq_dict(open(data_file('simple-genome-ctrl1.fa')))
    intervals = Localizer(seedsize=21)
    intervals.add_seed_match('simple', 100)
    intervals.add_seed_match('TheCakeIsALie', 42)
    with pytest.raises(KevlarRefrSeqNotFoundError, match=r'TheCakeIsALie'):
        list(intervals.get_cutouts(refrseqs=seqs))

    intervals = Localizer(seedsize=31)
    intervals.add_seed_match('simple', 15)
    cutouts = list(intervals.get_cutouts(refrseqs=seqs, delta=20))
    assert [c.defline for c in cutouts] == ['simple_0-66']

    intervals = Localizer(seedsize=31)
    for pos in (925, 955, 978):
        intervals.add_seed_match('simple', pos)
    cutouts = list(intervals.get_cutouts(refrseqs=seqs, delta=20))
    assert [c.defline for c in cutouts] == ['simple_905-1000']


@needsdata
@pytest.mark.parametrize('X,numtargets', [
    (100000, 1), (10000, 5), (1000, 33), (0, 1), (None, 33),
])
def test_localize_maxdiff(X, numtargets):
    """Cluster-split distance scaling (reference test_localize.py:167-185);
    maxdiff=0 falls back to 3x the longest contig, like the reference."""
    contigstream = seqio.parse_partitioned_reads(
        kevlar_tpu.parse_augmented_fastx(
            kevlar_tpu.open(data_file('maxdiff-contig.augfasta'), 'r')))
    targeter = localize(contigstream, data_file('maxdiff-refr.fa.gz'),
                        seedsize=51, delta=50, maxdiff=X)
    targets = [cutout for partid, cutout in targeter]
    assert len(targets) == numtargets


@needsdata
@pytest.mark.parametrize('incl,excl,output', [
    (None, None, '>seq1_10-191'),
    (r'seq1', None, '>seq1_10-191'),
    (None, 'seq1', 'WARNING: no reference matches'),
    (r'chr[XY]', None, 'WARNING: no reference matches'),
    (None, r'b0Gu$', '>seq1_10-191'),
])
def test_localize_main_filters(incl, excl, output, capsys):
    """CLI include/exclude matrix (reference test_localize.py:188-205)."""
    import kevlar_tpu.cli
    arglist = ['localize', '--seed-size', '23', '--delta', '50',
               data_file('localize-refr.fa'), data_file('localize-contig.fa')]
    args = kevlar_tpu.cli.parser().parse_args(arglist)
    args.include = incl
    args.exclude = excl
    kevlar_tpu.localize.main(args)
    out, err = capsys.readouterr()
    assert output in out or output in err


@needsdata
def test_localize_main_no_matches(capsys):
    """No seed matches -> warning (reference test_localize.py:208-215)."""
    import kevlar_tpu.cli
    arglist = ['localize', '--seed-size', '23',
               data_file('localize-refr.fa'),
               data_file('localize-contig-bad.fa')]
    args = kevlar_tpu.cli.parser().parse_args(arglist)
    kevlar_tpu.localize.main(args)
    out, err = capsys.readouterr()
    assert 'WARNING: no reference matches' in err


def test_decompose_and_unique_seeds():
    """Seed decomposition and the canonical seed set
    (reference test_localize.py:218-229)."""
    assert list(decompose_seeds('GATTACA', 5)) == ['GATTA', 'ATTAC',
                                                   'TTACA']
    assert list(decompose_seeds('GATTACA', 3)) == ['GAT', 'ATT', 'TTA',
                                                   'TAC', 'ACA']
    parts = [[Record(name='seq', sequence='GATTACA')]]
    assert sorted(unique_seeds(parts, seedsize=5)) == ['ATTAC', 'GATTA',
                                                       'TGTAA']


# ----------------------------------------------------------------------
# Variant / FormattedList / filter-string semantics
# (reference test_vcf.py:28-135)
# ----------------------------------------------------------------------

from kevlar_tpu import vcf as vcf_mod  # noqa: E402
from kevlar_tpu.vcf import (  # noqa: E402
    FormattedList, Variant, VariantFilter as vf)


def test_vcf_snv_obj():
    """0-based internal coords, +1 on VCF write
    (reference test_vcf.py:28-37)."""
    snv = Variant('scaffold42', 10773, 'A', 'G')
    assert str(snv) == 'scaffold42:10773:A->G'
    vcfvalues = ['scaffold42', '10774', '.', 'A', 'G', '.', 'PASS', '.']
    assert snv.vcf == '\t'.join(vcfvalues)
    assert snv.cigar is None
    snv2 = Variant('chr5', 500, 'T', 'G', CIGAR='10D200M10D')
    assert snv2.cigar == '10D200M10D'
    assert snv2.window is None


def test_vcf_indel_obj():
    """Indel string forms (reference test_vcf.py:40-58)."""
    indel1 = Variant('chr3', 8998622, 'GATTACA', 'G')
    assert str(indel1) == 'chr3:8998623:6D'
    assert indel1.vcf == '\t'.join(
        ['chr3', '8998623', '.', 'GATTACA', 'G', '.', 'PASS', '.'])
    indel2 = Variant('chr6', 75522411, 'G', 'GATTACA')
    assert str(indel2) == 'chr6:75522412:I->ATTACA'
    assert indel2.vcf == '\t'.join(
        ['chr6', '75522412', '.', 'G', 'GATTACA', '.', 'PASS', '.'])


def test_vcf_filter_field():
    """Filter accumulation and string form; non-VariantFilter values are
    ignored (reference test_vcf.py:61-82)."""
    v = Variant('scaffold1', 12345, '.', '.')
    assert v.filterstr == '.'
    v.filter(vf.InscrutableCigar)
    assert v.filterstr == 'InscrutableCigar'

    v = Variant('1', 809768, 'C', 'CAT')
    assert v.filterstr == 'PASS'
    v.filter(vf.PassengerVariant)
    assert v.filterstr == 'PassengerVariant'
    v.filter(vf.Homopolymer)
    assert v.filterstr == 'Homopolymer;PassengerVariant'

    v = Variant('one', 112358, 'T', 'A')
    v.filter('SNPyMcSNPface')
    v.filter(6.022e23)
    v.filter(dict(chicken='waffles'))
    assert v.filterstr == 'PASS'


def test_vcf_info_annotate_attribute():
    """FormattedList string forms + annotate/attribute mechanics
    (reference test_vcf.py:85-135)."""
    values = FormattedList()
    assert str(values) == '.'
    values.append(42)
    assert str(values) == '42'
    values.append(1776)
    assert str(values) == '42,1776'
    values.append('B0gU$')
    with pytest.raises(vcf_mod.KevlarMixedDataTypeError):
        str(values)

    v = Variant('1', 12345, 'G', 'C')
    assert v.attribute('VW') is None
    v.annotate('VW', 'AGTNNNNNNNNNNNNNNNNNNNNNTGA')
    assert v.attribute('VW') == 'AGTNNNNNNNNNNNNNNNNNNNNNTGA'
    v.annotate('VW', 'GATTACA')
    assert v.attribute('VW') == 'GATTACA'
    assert v.attribute('VW', pair=True) == 'VW=GATTACA'
    v.annotate('VW', 'ATGCCCTAG', replace=False)
    assert v.attribute('VW') == ['GATTACA', 'ATGCCCTAG']
    assert v.attribute('VW', string=True) == 'GATTACA,ATGCCCTAG'
    assert v.attribute('VW', pair=True) == 'VW=GATTACA,ATGCCCTAG'
    v.annotate('DROPPED', 3)
    assert v.attribute('DROPPED') == 3
    assert v.attribute('DROPPED', string=True) == '3'
    v.annotate('DROPPED', 31, replace=False)
    assert v.attribute('DROPPED') == [3, 31]
    assert v.attribute('DROPPED', pair=True) == 'DROPPED=3,31'
    v.annotate('MATEDIST', 432.1234, replace=False)
    v.annotate('MATEDIST', 8765.4321, replace=False)
    assert v.attribute('MATEDIST', string=True) == '432.123,8765.432'
    v.annotate('LLIH', -436.0111857750478)
    assert v.attribute('LLIH', pair=True) == 'LLIH=-436.011'


def test_vcf_format_field():
    """Per-sample FORMAT get/set (reference test_vcf.py:138-143)."""
    v = Variant('1', 12345, 'G', 'C')
    v.format('NA19238', 'GT', '0/0')
    assert v.format('NA19238', 'GT') == '0/0'
    assert v.format('NA19238', 'XYZ') is None
    assert v.format('NA19239', 'GT') is None


# ----------------------------------------------------------------------
# augment: annotation transfer onto contigs/reads
# (reference test_augment.py)
# ----------------------------------------------------------------------

from kevlar_tpu.augment import augment  # noqa: E402


@needsdata
def test_augment_contigs_pinned():
    """Exact transferred-annotation offsets
    (reference test_augment.py:17-27)."""
    augreads = kevlar_tpu.parse_augmented_fastx(
        kevlar_tpu.open(data_file('snorkel.augfastq'), 'r'))
    nakedseq = kevlar_tpu.parse_augmented_fastx(
        kevlar_tpu.open(data_file('snorkel-contig.fasta'), 'r'))
    augseqs = list(augment(augreads, nakedseq))
    assert len(augseqs) == 1
    assert len(augseqs[0].annotations) == 3
    assert [k.offset for k in augseqs[0].annotations] == [17, 20, 22]


@needsdata
def test_augment_reads_golden(capsys):
    """Byte-exact reaugmented output vs the reference's golden file
    (reference test_augment.py:30-43)."""
    import kevlar_tpu.cli
    arglist = ['augment', data_file('reaugment.augfastq'),
               data_file('reaugment.fq')]
    args = kevlar_tpu.cli.parser().parse_args(arglist)
    kevlar_tpu.augment.main(args)
    out, err = capsys.readouterr()
    assert out == open(data_file('reaugment.out')).read()


@needsdata
def test_augment_contig_mates():
    """Annotation count through mate records
    (reference test_augment.py:46-53)."""
    augreads = kevlar_tpu.parse_augmented_fastx(
        kevlar_tpu.open(data_file('deadbeef.augfastq.gz'), 'r'))
    nakedseq = kevlar_tpu.parse_augmented_fastx(
        kevlar_tpu.open(data_file('deadbeef.contig.fa'), 'r'))
    contigs = list(augment(augreads, nakedseq))
    assert len(contigs) == 1
    assert len(contigs[0].annotations) == 74


@needsdata
def test_augment_reads_roundtrip():
    """Re-augmenting the original reads reproduces their annotations
    (reference test_augment.py:56-64)."""
    augreads = list(kevlar_tpu.parse_augmented_fastx(
        kevlar_tpu.open(data_file('deadbeef.augfastq.gz'), 'r')))
    nakedseq = kevlar_tpu.parse_augmented_fastx(
        kevlar_tpu.open(data_file('deadbeef.fq.gz'), 'r'))
    newreads = list(augment(iter(augreads), nakedseq, upint=5))
    for oldread, newread in zip(augreads, newreads):
        assert oldread.sequence == newread.sequence
        assert oldread.annotations == newread.annotations


@needsdata
def test_augment_cli_pinned(capsys):
    """Exact augmented-FASTA text (reference test_augment.py:67-81)."""
    import kevlar_tpu.cli
    arglist = ['augment', data_file('snorkel.augfastq'),
               data_file('snorkel-contig.fasta')]
    args = kevlar_tpu.cli.parser().parse_args(arglist)
    kevlar_tpu.augment.main(args)
    out, err = capsys.readouterr()
    assert out.strip() == """>contig1
AGGTCTTCGATGCTAGCATTTTTACGACAGACAAAAACAAGATTACATTCCAAAATACATACCGCGCC
                 ATTTTTACGAC          8 0 0#
                    TTTACGACAGA          11 0 0#
                      TACGACAGACA          9 0 0#"""


# ----------------------------------------------------------------------
# split: round-robin partition sharding (reference test_split.py)
# ----------------------------------------------------------------------

from io import StringIO  # noqa: E402

from kevlar_tpu import split as split_mod  # noqa: E402


@needsdata
def test_split_round_robin():
    """Partitions land round-robin across output streams
    (reference test_split.py:18-31)."""
    readstream = kevlar_tpu.parse_augmented_fastx(
        kevlar_tpu.open(data_file('fiveparts.augfastq.gz'), 'r'))
    partstream = seqio.parse_partitioned_reads(readstream)
    outstreams = [StringIO(), StringIO(), StringIO()]
    split_mod.split(partstream, outstreams)
    assert 'kvcc=1' in outstreams[0].getvalue()
    assert 'kvcc=2' in outstreams[1].getvalue()
    assert 'kvcc=3' in outstreams[2].getvalue()
    assert 'kvcc=4' in outstreams[0].getvalue()
    assert 'kvcc=5' in outstreams[1].getvalue()


@needsdata
def test_split_cli_pinned(tmp_path):
    """Exact per-shard partition sizes (reference test_split.py:33-65)."""
    import kevlar_tpu.cli
    arglist = ['split', data_file('fiveparts.augfastq.gz'), '3',
               str(tmp_path / 'out')]
    args = kevlar_tpu.cli.parser().parse_args(arglist)
    split_mod.main(args)

    expected = [[67, 12], [23, 11], [15]]
    for i, sizes in enumerate(expected):
        outfile = str(tmp_path / 'out.{}.augfastx.gz'.format(i))
        readstream = kevlar_tpu.parse_augmented_fastx(
            kevlar_tpu.open(outfile, 'r'))
        partitions = [part for partid, part
                      in seqio.parse_partitioned_reads(readstream)]
        assert [len(p) for p in partitions] == sizes


# ----------------------------------------------------------------------
# unband: band-output merge (reference test_unband.py)
# ----------------------------------------------------------------------

import glob as _glob  # noqa: E402

from kevlar_tpu import unband as unband_mod  # noqa: E402


def data_glob(pattern):
    return sorted(_glob.glob(os.path.join(DATA, pattern)))


@needsdata
def test_unband_beta():
    """Duplicate reads' annotation lists are unioned
    (reference test_unband.py:15-22)."""
    instream = seqio.afxstream(data_glob('collect.beta.?.txt'))
    reads = sorted(unband_mod.unband(instream, numbatches=2),
                   key=lambda r: r.name)
    assert len(reads) == 8
    assert len(reads[0].annotations) == 4


@needsdata
def test_unband_helium():
    """Pinned read + annotation counts on the helium bands
    (reference test_unband.py:25-34)."""
    instream = seqio.afxstream(
        data_glob('helium-unband/novel.band?.augfastq.gz'))
    reads = list(unband_mod.unband(instream, numbatches=16))
    assert len(reads) == 135
    readname = 'seq1_haplo1_285110_285519_1:0:0_0:0:0_2dbcd/1'
    someread = [r for r in reads if r.name == readname][0]
    assert len(someread.annotations) == 75


@needsdata
def test_unband_cli(capsys):
    """CLI merge emits all 135 FASTQ records
    (reference test_unband.py:37-45)."""
    import kevlar_tpu.cli
    arglist = (['unband'] +
               data_glob('helium-unband/novel.band?.augfastq.gz'))
    args = kevlar_tpu.cli.parser().parse_args(arglist)
    unband_mod.main(args)
    out, err = capsys.readouterr()
    qualdeflines = [ln for ln in out.strip().split('\n') if ln == '+']
    assert len(qualdeflines) == 135
