"""VariantMapping parity against the reference's pinned unit expectations.

Mirrors /root/reference/kevlar/tests/test_varmap.py on the reference's
contig/cutout fixtures: CIGAR interpretation, spanning-window derivation
(including truncated and no-margin windows), terminal-SNV trimming,
inscrutable-CIGAR nocalls, passenger/mismatch screens, and the printable
alignment rendering.
"""

import os

import pytest

import kevlar_tpu
from kevlar_tpu import reference
from kevlar_tpu.sequence import Record, parse_augmented_fastx
from kevlar_tpu.varmap import VariantMapping

DATA = '/root/reference/kevlar/tests/data/'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason='reference test data not mounted')


def data_file(name):
    return os.path.join(DATA, name)


def contig(name):
    return next(parse_augmented_fastx(kevlar_tpu.open(data_file(name), 'r')))


def cutout(name):
    return next(reference.load_refr_cutouts(
        kevlar_tpu.open(data_file(name), 'r')))


def test_call_ssc_1bpdel():
    aln = VariantMapping(contig('ssc218.contig.augfasta'),
                         cutout('ssc218.gdna.fa'), score=1e6,
                         cigar='50D132M1D125M50D')
    variants = list(aln.call_variants(31))
    assert len(variants) == 1
    assert str(variants[0]) == '6:23230160:1D'


def test_call_ssc_two_proximal_snvs():
    aln = VariantMapping(contig('ssc107.contig.augfasta.gz'),
                         cutout('ssc107.gdna.fa.gz'), score=1e6,
                         cigar='25D263M25D')
    assert len(list(aln.call_variants(31))) == 2


@pytest.mark.parametrize('prefix,cigar,refrwindow,altwindow', [
    ('phony-snv-01', '25D98M25D',
     'GGGGGTGTCTGCGACCACAGCTGAACATGACGAAACGGGTG',
     'GGGGGTGTCTGCGACCACAGGTGAACATGACGAAACGGGTG'),
    ('phony-snv-02', '24D99M25D',
     'ATTCGTATTACCCCTGGGATTTGGGAGCTGGTCTATATAGG',
     'ATTCGTATTACCCCTGGGATATGGGAGCTGGTCTATATAGG'),
    ('phony-deletion-01', '25D28M8D49M25D',
     'GGCTCAAGACTAAAAAGACTGAGACTCGTTTTTGGTGACAAGCAGGGC',
     'GGCTCAAGACTAAAAAGACTTTTTTGGTGACAAGCAGGGC'),
    ('phony-deletion-02', '40D29M3D36M40D',
     'CATCATCTCGTAGGTTTGTCTAGTGCAAACAGAGTCCCCCTGC',
     'CATCATCTCGTAGGTTTGTCTGCAAACAGAGTCCCCCTGC'),
    ('phony-insertion-01', '10D34M7I49M10D1M',
     'CATCTGTTTTTCTCGAACTCGTATATTATCTATAAATTCC',
     'CATCTGTTTTTCTCGAACTCGATTACAGTATATTATCTATAAATTCC'),
    ('phony-insertion-02', '10D33M27I95M10D',
     'GCCAGGAAGTTTACGATAAGGTGTTGCCATTCGAAATGAC',
     'GCCAGGAAGTTTACGATAAGTATATATATATATATATATATATATATGTGTTGCCATTCGAAATGAC'),
])
def test_variant_window(prefix, cigar, refrwindow, altwindow):
    aln = VariantMapping(contig(prefix + '.contig.fa'),
                         cutout(prefix + '.gdna.fa'), score=1e6, cigar=cigar)
    variants = list(aln.call_variants(21))
    assert len(variants) == 1
    assert variants[0].window == altwindow
    assert variants[0].refrwindow == refrwindow


def test_nocall():
    """A deliberately mismatched pair yields an InscrutableCigar nocall
    with a pinned VCF line (reference test_varmap.py:90-115)."""
    aln = VariantMapping(contig('phony-deletion-01.contig.fa'),
                         cutout('phony-insertion-01.gdna.fa'), score=1e6,
                         cigar='25D5M22I5M46D8M13D2M35I')
    for prop in (aln.offset, aln.targetshort, aln.match, aln.leftflank,
                 aln.indel, aln.indeltype, aln.rightflank):
        assert prop is None
    variants = list(aln.call_variants(21))
    assert len(variants) == 1
    assert variants[0].vcf == (
        'yourchr\t801\t.\t.\t.\t.\tInscrutableCigar\t'
        'CIGAR=25D5M22I5M46D8M13D2M35I;KSW2=1000000.0;CONTIG=AACTGGTGGGCTCAAGA'
        'CTAAAAAGACTTTTTTGGTGACAAGCAGGGCGGCCTGCCCTTCCTGTAGTGCAAGAAAAT')


def test_variant_mapping_interval():
    ctg = Record(name='contig1',
                 sequence='CCTGAGCCCTCTCAAGTCGGGTCCTGGCCCGGTCTGCCCATGAGGC'
                          'TGGGCCTGAGCCCC')
    cut = reference.ReferenceCutout(
        defline='chr1_10000-10060',
        sequence='CCTGAGCCCTCTCAAGTCGGGTCCTGGCCCAGTCTGCCCATGAGGCTGGGCCTGAGC'
                 'CCC')
    mapping = VariantMapping(ctg, cut, score=1e6, cigar='60M')
    assert mapping.seqid == 'chr1'
    assert mapping.interval == ('chr1', 10000, 10060)


@pytest.mark.parametrize('query,target,dist,n,trimcount', [
    ('phony-snv-01b.contig.fa', 'phony-snv-01.gdna.fa', 5, 1, 1),
    ('phony-snv-02b.contig.fa', 'phony-snv-02.gdna.fa', 5, 1, 1),
    ('phony-snv-01b.contig.fa', 'phony-snv-01.gdna.fa', 2, 2, 0),
    ('phony-snv-02b.contig.fa', 'phony-snv-02.gdna.fa', None, 2, 0),
])
def test_call_near_end(query, target, dist, n, trimcount):
    """SNVs within mindist of the alignment end are trimmed (reference
    test_varmap.py:132-153; exercises the self-aligning constructor)."""
    aln = VariantMapping(contig(query), cutout(target))
    calls = list(aln.call_variants(31, mindist=dist))
    assert len(calls) == n
    assert aln.trimmed == trimcount


@pytest.mark.parametrize('query,target,vw,rw', [
    ('trunc-snv.contig.fa', 'trunc-snv.gdna.fa',
     'TAGCATACAGGTAGTCAGGGGGTGTCTGCGACCACAGCTGAA',
     'TAGCATACAGGAAGTCAGGGGGTGTCTGCGACCACAGCTGAA'),
    ('trunc-snv-funky.contig.fa', 'trunc-snv-funky.gdna.fa',
     'TGTGTCTGAGAGGGTGTTGCCAAAGGAGATTAACATTTG',
     'TGTGTCTGTGAGGGTGTTGCCAAAGGAGATTAACATTTG'),
    ('trunc-indel-funky.contig.fa', 'trunc-snv-funky.gdna.fa',
     'TGTGTCTGTGAGTATATAGGTGTTGCCAAAGGAGATTAACATTTGAGT',
     'TGTGTCTGTGAGGGTGTTGCCAAAGGAGATTAACATTTGAGT'),
])
def test_call_truncated_windows(query, target, vw, rw):
    aln = VariantMapping(contig(query), cutout(target))
    if aln.vartype == 'snv':
        assert aln.leftflank is None
        assert aln.indeltype is None
        assert aln.indel is None
        assert aln.rightflank is None
    calls = list(aln.call_variants(31))
    assert len(calls) == 1
    assert calls[0].window == vw
    assert calls[0].refrwindow == rw


def test_call_indel_snv():
    aln = VariantMapping(contig('indel-snv.contig.augfasta'),
                         cutout('indel-snv.gdna.fa'))
    calls = list(aln.call_variants(31))
    assert [(c._refr, c._alt, c._pos) for c in calls] == [
        ('CA', 'C', 500), ('C', 'A', 473)]
    assert len(list(aln.call_variants(31, mindist=None))) == 2


def test_call_num_interesting_kmers():
    aln = VariantMapping(contig('iktest.contig.fa'),
                         cutout('iktest.gdna.fa'))
    calls = list(aln.call_variants(29))
    assert len(calls) == 1
    assert calls[0].attribute('IKMERS') == '1'


def test_passenger_screen():
    aln = VariantMapping(contig('wasp-pass.contig.augfasta'),
                         cutout('wasp.gdna.fa'))
    calls = list(aln.call_variants(29))
    assert [c.filterstr for c in calls] == ['PASS', 'PassengerVariant']


@pytest.mark.parametrize('query,target,refr,alt', [
    ('nomargin-snv-contigs.augfasta', 'nomargin-gdna.fa', 'A', 'G'),
    ('nomargin-indel-contigs.augfasta', 'nomargin-gdna.fa', 'AAGT', 'A'),
    ('nomargin-r-snv-contigs.augfasta', 'nomargin-r-gdna.fa', 'A', 'G'),
    ('nomargin-r-indel-contigs.augfasta', 'nomargin-r-gdna.fa', 'C', 'CTAT'),
])
def test_no_margin(query, target, refr, alt):
    aln = VariantMapping(contig(query), cutout(target))
    calls = list(aln.call_variants(31))
    assert len(calls) == 1
    assert calls[0].filterstr == 'PASS'
    assert (calls[0]._refr, calls[0]._alt) == (refr, alt)


def test_varmap_str():
    """The printable alignment rendering is byte-identical to the
    reference's checked-in wasp-align.txt."""
    aln = VariantMapping(contig('wasp-pass.contig.augfasta'),
                         cutout('wasp.gdna.fa'))
    alignstr = kevlar_tpu.open(data_file('wasp-align.txt'), 'r').read().strip()
    assert str(aln) == alignstr


def test_drop_numerous_mismatches():
    aln = VariantMapping(contig('drop-polysnp-contig.augfasta'),
                         cutout('drop-polysnp-gdna.fa'))
    calls = list(aln.call_variants(21))
    assert calls
    for c in calls:
        assert c.filterstr == 'NumerousMismatches'