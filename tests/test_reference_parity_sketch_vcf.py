"""sketch-layer and VCF parity against the reference's pinned cases.

Mirrors /root/reference/kevlar/tests/test_sketch.py and test_vcf.py:
loading every khmer sketch flavor (tables hash with murmur, graphs with
the reversible 2-bit code), autoload build paths, FPR bailout, the exact
VCF FORMAT column ordering, reader pins, round-trips, and region
semantics.
"""

import io
import os

import pytest

import kevlar_tpu
from kevlar_tpu import sketch as sketch_mod, vcf
from kevlar_tpu.vcf import Variant

DATA = '/root/reference/kevlar/tests/data/'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason='reference test data not mounted')


def data_file(name):
    return os.path.join(DATA, name)


def same_seq(a, b):
    return a == b or a == kevlar_tpu.revcom(b)


@pytest.mark.parametrize('filename,testkmer', [
    ('test.countgraph', 'TGGAACCGGCAACGACGAAAA'),
    ('test.smallcountgraph', 'CTGTACTACAGCTACTACAGT'),
    ('test.counttable', 'CCTGATATCCGGAATCTTAGC'),
    ('test.smallcounttable', 'GGGCCCCCATCTCTATCTTGC'),
    ('test.nodegraph', 'GGGAACTTACCTGGGGGTGCG'),
    ('test.nodetable', 'CTGTTCGATATGAGGAATCTG'),
])
def test_sketch_load_every_flavor(filename, testkmer):
    """All six khmer sketch flavors load and answer queries; graph files
    use khmer's reversible 2-bit hash, table files murmur (reference
    test_sketch.py:15-30)."""
    sketch = sketch_mod.load(data_file(filename))
    assert sketch.get(testkmer) > 0
    assert sketch.get('GATTACA' * 3) == 0


def test_sketch_load_badfilename():
    with pytest.raises(sketch_mod.KevlarSketchTypeError,
                       match=r'sketch type from filename'):
        sketch_mod.load(data_file('test.notasketchtype'))


@pytest.mark.parametrize('count,smallcount', [
    (True, True), (True, False), (False, False),
])
def test_allocate_sketch_graphy(count, smallcount):
    """Graph allocations hash reversibly (reference
    test_sketch.py:38-56)."""
    sequence = ('AATCAACGCTTCTTAATAGGCATAGTGTCTCTGCTGCGCATGGACGTGCCATAGCCA'
                'CTACT')
    kmer = 'GCATAGTGTCTCTGCTGCGCA'
    sketch = sketch_mod.allocate(21, 1e4, 4, count, True, smallcount)
    sketch.consume(sequence)
    assert sketch.get(kmer) >= 1
    assert same_seq(sketch.reverse_hash(sketch.hash(kmer)), kmer)


@pytest.mark.parametrize('count,smallcount', [
    (True, True), (True, False), (False, False),
])
def test_allocate_sketch_non_graphy(count, smallcount):
    sequence = ('TGCCACGATCCGGCTATGGCGGAAGGGCACACCTAACCGCGATGACGGAGTAACTCG'
                'CAGCA')
    kmer = 'CTATGGCGGAAGGGCACACCTAACCGCGATGACGG'
    sketch = sketch_mod.allocate(35, 1e4, 4, count, False, smallcount)
    sketch.consume(sequence)
    assert sketch.get(kmer) >= 1
    with pytest.raises(ValueError, match=r'not implemented'):
        sketch.reverse_hash(sketch.hash(kmer))


def test_autoload_matrix():
    """Load-or-build autoload incl. banded graph builds (reference
    test_sketch.py:72-84)."""
    sketch1 = sketch_mod.autoload(data_file('test.nodegraph'))
    assert sketch1.get('GGGAACTTACCTGGGGGTGCG') > 0
    infile = data_file('simple-genome-case-reads.fa.gz')
    sketch2 = sketch_mod.autoload(infile, ksize=25, table_size=1e7)
    assert sketch2.get('AGCTCAGACACTGGCGGTCTCTCCT') > 0
    sketch3 = sketch_mod.autoload(infile, ksize=25, table_size=1e7,
                                  count=True, graph=True, num_bands=4,
                                  band=0)
    assert sketch3.get('CAGCTGACCCACCGACACATAGGTT') > 0


def test_load_sketchfiles_and_fpr_bailout():
    sketches = sketch_mod.load_sketchfiles([data_file('test.counttable')],
                                           maxfpr=0.5)
    for sketch in sketches:
        assert sketch.get('CCTGATATCCGGAATCTTAGC') > 0
        assert sketch.get('GATTACA' * 3) == 0
    with pytest.raises(sketch_mod.KevlarUnsuitableFPRError,
                       match=r'FPR too high, bailing out!!!'):
        sketch_mod.load_sketchfiles([data_file('test.counttable')],
                                    maxfpr=0.001)


# ------------------------------------------------------------------ VCF ---

def test_vcf_writer_format_columns():
    """FORMAT keys sort and per-sample columns join exactly as the
    reference writes them (reference test_vcf.py:146-180)."""
    out = io.StringIO()
    writer = vcf.VCFWriter(out, source='py.test')
    for label in ('NA19238', 'NA19239', 'NA19240'):
        writer.register_sample(label)
    writer.describe_format('GT', 'String', '1', 'Genotype')
    writer.write_header()
    v = Variant('1', 12345, 'G', 'C')
    v.annotate('PART', '42')
    v.annotate('CONTIG', 'A' * 100)
    for label, gt in (('NA19238', '0/0'), ('NA19239', '0/0'),
                      ('NA19240', '0/1')):
        v.format(label, 'GT', gt)
    for label, ab in (('NA19238', '12,9,8'), ('NA19239', '0,0,0'),
                      ('NA19240', '0,0,0')):
        v.format(label, 'ALTABUND', ab)
    writer.write(v)
    outlines = out.getvalue().strip().split('\n')
    fmtlines = [ln for ln in outlines if ln.startswith('##FORMAT')]
    assert len(fmtlines) == 2
    assert ('##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">'
            in fmtlines)
    varlines = [ln for ln in outlines if not ln.startswith('#')]
    assert len(varlines) == 1
    values = varlines[0].split('\t')
    assert len(values) == 12
    assert values[8:12] == ['ALTABUND:GT', '12,9,8:0/0', '0,0,0:0/0',
                            '0,0,0:0/1']


def test_vcf_writer_inconsistent_format():
    out = io.StringIO()
    writer = vcf.VCFWriter(out, source='py.test')
    for label in ('NA19238', 'NA19239', 'NA19240'):
        writer.register_sample(label)
    v = Variant('1', 12345, 'G', 'C')
    v.annotate('PART', '42')
    v.annotate('CONTIG', 'A' * 100)
    v.format('NA19238', 'GT', '0/0')
    v.format('NA19240', 'GT', '0/1')
    v.format('NA19239', 'ALTABUND', '0,0,0')
    v.format('NA19240', 'ALTABUND', '0,0,0')
    with pytest.raises(vcf.VariantAnnotationError,
                       match=r'samples not annotated with the same FORMAT'):
        writer.write(v)


def test_vcf_reader_pinned():
    reader = vcf.VCFReader(
        kevlar_tpu.open(data_file('five-snvs-with-likelihood.vcf'), 'r'))
    calls = list(reader)
    assert len(calls) == 5
    assert calls[1].attribute('PART') == '54'
    assert calls[3].format('Kid', 'ALTABUND') == (
        '21,20,20,19,17,19,20,19,18,17,17,17,17,17,17,17,18,19,19,19,18,18,'
        '18,17,19,18,17,17,17,15,15')


@pytest.mark.parametrize('filename,errormsg', [
    ('five-snvs-fmt-mismatch.vcf', r'sample number mismatch'),
    ('five-snvs-fmtstr-mismatch.vcf', r'format data mismatch'),
])
def test_vcf_reader_format_mismatch(filename, errormsg):
    reader = vcf.VCFReader(kevlar_tpu.open(data_file(filename), 'r'))
    with pytest.raises(vcf.VariantAnnotationError, match=errormsg):
        list(reader)


def test_vcf_roundtrip():
    reader = vcf.VCFReader(
        kevlar_tpu.open(data_file('five-snvs-with-likelihood.vcf'), 'r'))
    out = io.StringIO()
    writer = vcf.VCFWriter(
        out, source=None,
        refr='GCA_000001405.15_GRCh38_no_alt_analysis_set.fna.gz')
    for label in ('Kid', 'Mom', 'Dad'):
        writer.register_sample(label)
    writer.describe_format('GT', 'String', '1', 'Genotype')
    writer.write_header(skipdate=True)
    calls = []
    for call in reader:
        calls.append(call)
        writer.write(call)
    calls2 = list(vcf.VCFReader(out.getvalue().strip().split('\n')))
    assert len(calls) == len(calls2)
    assert [c.position for c in calls] == [c.position for c in calls2]
    assert [str(c) for c in calls] == [str(c) for c in calls2]
    assert [c.window for c in calls] == [c.window for c in calls2]


def test_vcf_region():
    assert Variant('chr12', 1033773, 'A', 'G').region == \
        ('chr12', 1033773, 1033774)
    assert Variant('chr12', 1033773, 'A', 'AGTG').region == \
        ('chr12', 1033773, 1033774)
    assert Variant('chr12', 1033773, 'AT', 'TG').region == \
        ('chr12', 1033773, 1033775)
    assert Variant('chr12', 1033773, 'ATACCG', 'A').region == \
        ('chr12', 1033773, 1033779)