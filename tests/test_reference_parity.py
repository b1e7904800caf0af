"""Behavior parity against the reference implementation's own test data.

These tests drive kevlar-tpu on the reference's checked-in datasets
(/root/reference/kevlar/tests/data, mounted read-only) and assert the exact
outputs the reference's test suite pins — the BASELINE.md correctness
target ("bit-identical VCF on kevlar's trio test data").  Expected values
are the reference's published assertions (cited per test); no reference
code is used.

Skipped automatically when the reference data mount is absent.
"""

import os

import pytest

import kevlar_tpu
from kevlar_tpu import seqio
from kevlar_tpu import reference as ref_mod
from kevlar_tpu.alac import alac
from kevlar_tpu.call import call

DATA = '/root/reference/kevlar/tests/data/'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason='reference test data not mounted')


def data_file(name):
    return os.path.join(DATA, name)


def test_ksw2_align_smoke():
    """Exact ksw2 CIGAR + score on the reference's smoke pair
    (reference test_call.py:20-31)."""
    from kevlar_tpu.ops.align import align
    target = ('TAAATAAATATCTGGTGTTTGAGGCAAAAAGGCAGACTTAAATTCTAAATCACACCTG'
              'TGCTTCCAGCACTACCTTCAAGCGCAGGTTCGAGCCAGTCAGGCAGGGTACATAAGAG'
              'TCCATTGTGCCTGTATTATTTTGAGCAATGGCTAAAGTACCTTCACCCTTGCTCACTG'
              'CTCCCCCACTTCCTCAAGTCTCATCGTGTTTTTTTTAGAGCTAGTTTCTTAGTCTCAT'
              'TAGGCTTCAGTCACCAT')
    query = ('TCTGGTGTTTGAGGCAAAAAGGCAGACTTAAATTCTAAATCACACCTGTGCTTCCAGCA'
             'CTACCTTCAAGCGCAGGTTCGAGCCAGTCAGGACTGCTCCCCCACTTCCTCAAGTCTCA'
             'TCGTGTTTTTTTTAGAGCTAGTTTCTTAGTCTCATTAGGCTTCAGTCACCATCATTTCT'
             'TATAGGAATACCA')
    assert align(target, query) == ('10D91M69D79M20I', 155)


@pytest.mark.parametrize('tf,qf,wantcigar', [
    ('pico-7-refr.fa', 'pico-7-asmbl.fa', '10D83M190D75M20I1M'),
    ('pico-2-refr.fa', 'pico-2-asmbl.fa', '10D89M153I75M20I'),
])
def test_align_contig_pairs(tf, qf, wantcigar):
    """Raw alignment CIGARs on the reference's contig/cutout pairs
    (reference test_call.py parametrized align cases)."""
    from kevlar_tpu.ops.align import align_both_strands
    target = next(seqio.parse_fasta(open(data_file(tf))))[1]
    query = next(seqio.parse_fasta(open(data_file(qf))))[1]
    score, cigar, strand = align_both_strands(target, query)
    assert cigar == wantcigar


@pytest.mark.parametrize('cc,pos,ref,alt', [
    (2, 834645, 'A', 'AGTGGGATTACGTAGGAAATCCGCGGGGCTGTGACATATATTTGTTGAC'
                     'AAGCATATATTGTTCCTAGAGGTCGTTGGGTTCGTTACACCCAAGGGGG'
                     'CGTATAACATGTTACTCAGTTGCGTCGGACCGATTAATAACTCGAATGT'
                     'AAGGCAGGATATTT'),
    (3, 4072, 'G', 'GCCGAGACGCAGCGTGATACTTAAGATTAAGTTAAGCAACAGCTTAGCGTAC'
                   'GCAATTGCGTCTAATTGAGGGGCCGTAGATATAAGCTCCGTGTTCTCAGTTG'
                   'GTGGGTAACAGAACCCGCAAGCACACCGCTTTCAGTGTGTCACATGCACA'),
    (5, 1175767, 'T', 'C'),
    (6, 185751, 'TCAAACTCTGGCATTATACATAGGGTTCCCG', 'T'),
    (8, 636698, 'C', 'A'),
    (10, 1527138, 'C', 'CTCCTGGTCTGCCACGGTTGACTTGCCTACATAT'),
])
def test_pico_var_full_pipeline(cc, pos, ref, alt):
    """Full assemble->localize->align->call on the reference's pico-var
    partitions: exactly one call with the reference's pinned position and
    alleles (reference test_alac.py::test_pico_calls) — covers our
    assembler, seed-index localizer, aligner, and variant interpreter."""
    reads = data_file('pico-var/cc{:d}.afq.gz'.format(cc))
    readstream = kevlar_tpu.parse_augmented_fastx(kevlar_tpu.open(reads, 'r'))
    pstream = seqio.parse_partitioned_reads(readstream)
    calls = list(alac(pstream, data_file('human-random-pico.fa.gz'),
                      ksize=25, delta=50))
    assert len(calls) == 1
    assert calls[0].position == pos
    assert calls[0]._refr == ref
    assert calls[0]._alt == alt


def test_pico_4_exact_vcf_row(tmp_path):
    """CLI-level byte-exact VCF data row on pico-4 (reference
    test_alac.py::test_pico_4), including the KSW2 score and canonicalized
    CIGAR."""
    import kevlar_tpu.cli as cli
    from kevlar_tpu import alac as alac_mod
    args = cli.parse_args(['alac', '--ksize', '25',
                           data_file('pico-4.augfastq.gz'),
                           data_file('human-random-pico.fa.gz')])
    out = tmp_path / 'out.vcf'
    args.out = str(out)
    alac_mod.main(args)
    rows = [ln.strip() for ln in open(str(out)) if not ln.startswith('#')]
    want = '\t'.join([
        'seq1', '1175768', '.', 'T', 'C', '.', 'PASS',
        'ALTWINDOW=CCCTGCCATTATAGATGCTAGATTCACATCTTCATTTATTTTTACTTTT;'
        'CIGAR=50D192M50D;IKMERS=25;KSW2=179;'
        'REFRWINDOW=CCCTGCCATTATAGATGCTAGATTTACATCTTCATTTATTTTTACTTTT;'
        'CONTIG=ACCTGATTTTGAAGAAGAAAATCAGTTTAAGTCAAAAGGTTACTTTCCTTGTCCTGAA'
        'CTGGAGAACTGGGGCCCTGCCATTATAGATGCTAGATTCACATCTTCATTTATTTTTACTTTTTG'
        'TCTTGACAGAGTGGGCGCTGGTTTTTTTAATTATTTTTGGCCAATCAAAAAATACTCTCCTTCGT'
        'GGGT'])
    assert rows == [want]


@pytest.mark.parametrize('ccid,varcall', [
    ('5', 'seq1:185752:30D'),
    ('7', 'seq1:226611:190D'),
    ('9', 'seq1:1527139:I->TCCTGGTCTGCCACGGTTGACTTGCCTACATAT'),
])
def test_call_pico_indel(ccid, varcall):
    """Indel calls from the reference's checked-in contig + cutout pairs
    (reference test_call.py::test_call_pico_indel)."""
    q = kevlar_tpu.parse_augmented_fastx(
        kevlar_tpu.open(data_file('pico' + ccid + '.contig.augfasta'), 'r'))
    t = ref_mod.load_refr_cutouts(
        kevlar_tpu.open(data_file('pico' + ccid + '.gdna.fa'), 'r'))
    calls = list(call(list(t), list(q)))
    assert len(calls) == 1
    assert str(calls[0]) == varcall


@pytest.mark.parametrize('ccid,varcall', [
    ('62', '10:108283664:A->G'),
    ('106', '6:7464986:G->A'),
    ('223', '5:42345359:C->G'),
])
def test_call_ssc_isolated_snv(ccid, varcall):
    """Isolated SNVs with delete-match-delete alignment signatures
    (reference test_call.py::test_call_ssc_isolated_snv)."""
    q = kevlar_tpu.parse_augmented_fastx(
        kevlar_tpu.open(data_file('ssc' + ccid + '.contig.augfasta'), 'r'))
    t = ref_mod.load_refr_cutouts(
        kevlar_tpu.open(data_file('ssc' + ccid + '.gdna.fa'), 'r'))
    calls = list(call(list(t), list(q)))
    assert len(calls) == 1
    assert str(calls[0]) == varcall


def test_partition_dedup_and_nodedup():
    """PCR-duplicate handling on the reference's dup.augfastq (reference
    test_partition.py::test_partition_dedup / _nodedup): 16 unique reads in
    one component with dedup, 18 without."""
    from kevlar_tpu.partition import partition
    rs = kevlar_tpu.parse_augmented_fastx(
        kevlar_tpu.open(data_file('dup.augfastq'), 'r'))
    parts = list(partition(rs))
    assert len(parts) == 1 and len(parts[0][1]) == 16
    rs = kevlar_tpu.parse_augmented_fastx(
        kevlar_tpu.open(data_file('dup.augfastq'), 'r'))
    parts = list(partition(rs, dedup=False))
    assert len(parts) == 1 and len(parts[0][1]) == 18


def test_partition_minabund_drops_all():
    """Shared-k-mer abundance floor (reference test_partition.py::
    test_partition_{dedup,nodedup}_minabund): no partitions survive."""
    from kevlar_tpu.partition import partition
    rs = kevlar_tpu.parse_augmented_fastx(
        kevlar_tpu.open(data_file('dupl-part.augfastq.gz'), 'r'))
    assert list(partition(rs, minabund=5)) == []
    rs = kevlar_tpu.parse_augmented_fastx(
        kevlar_tpu.open(data_file('dupl-part-2reads.augfastq.gz'), 'r'))
    assert list(partition(rs, minabund=5, dedup=False)) == []


def test_partition_pico_ccs():
    """10 connected components on pico-filtered (reference
    test_partition.py::test_pico_ccs)."""
    from kevlar_tpu.partition import partition
    rs = kevlar_tpu.parse_augmented_fastx(
        kevlar_tpu.open(data_file('pico-filtered.fq.gz'), 'r'))
    assert len(list(partition(rs, minabund=6))) == 10


def test_varfilter_single_region():
    """BED-region filtering (reference test_varfilter.py::
    test_varfilter_single): 5 calls, exactly one UserFilter'd at
    chr17:36385017."""
    from kevlar_tpu import varfilter as vf
    from kevlar_tpu import vcf as vcf_mod
    bedstream = kevlar_tpu.parse_bed(
        kevlar_tpu.open(data_file('fiveparts-ignore-single.bed'), 'r'))
    with kevlar_tpu.open(data_file('five-snvs-with-likelihood.vcf'),
                         'r') as vs:
        calls = list(vf.varfilter(vcf_mod.VCFReader(vs), bedstream))
    assert len(calls) == 5
    filtered = [c for c in calls if c.filterstr != 'PASS']
    assert len(filtered) == 1
    assert filtered[0].position == 36385017


def test_varfilter_load_predictions_multi_chrom():
    """Interval-forest indexing (reference test_varfilter.py::
    test_load_predictions_multi_chrom)."""
    from kevlar_tpu import varfilter as vf
    from kevlar_tpu import vcf as vcf_mod
    with kevlar_tpu.open(data_file('case-low-abund/calls.vcf.gz'),
                         'r') as vs:
        index = vf.load_predictions(vcf_mod.VCFReader(vs))
    assert len(index) == 5
    assert set(index.trees.keys()) == {'1', '9', '14'}
    assert index.query('chr1', 1, 1000000) == set()
    assert index.query('1', 1, 1000000) == set()
