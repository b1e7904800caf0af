"""End-to-end slice: count -> novel -> partition -> alac -> variant calls.

The ONE-model-end-to-end milestone (SURVEY.md §7 step 6): a simulated trio
with a de novo SNV and a de novo insertion must come out of the full pipeline
as correctly placed variant calls.
"""

import random

import pytest

import kevlar_tpu
from kevlar_tpu.batch import batches_from_records
from kevlar_tpu.novel import novel
from kevlar_tpu.partition import partition
from kevlar_tpu.alac import alac
from kevlar_tpu.sketch import Sketch

from . import simdata

KSIZE = 21


@pytest.fixture(scope='module')
def pipeline_calls(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('e2e')
    rng = random.Random(20260817)
    genome = simdata.make_genome(rng, 5000)

    snvpos = 1200
    child, ref, alt = simdata.apply_snv(genome, snvpos, rng=rng)
    # unambiguous insertion at 3300 (in child coordinates; genome coords same
    # since insertion is after the SNV)
    tail = next(b for b in 'ACGT' if b != genome[3299])
    head = next(b for b in 'ACGT' if b != genome[3300] and b != tail)
    ins = head + 'GATTACA' + tail
    child = simdata.apply_insertion(child, 3300, ins)
    # de novo 7 bp deletion at 4200 (after the insertion in coordinates,
    # so genome coordinates 4200.. shift by len(ins) in child space only)
    child = simdata.apply_deletion(child, 4200 + len(ins), 7)

    child_reads = simdata.tiled_reads(child, readlen=100, step=5,
                                      prefix='child')
    mom_reads = simdata.tiled_reads(genome, readlen=100, step=5, prefix='mom')
    dad_reads = simdata.tiled_reads(genome, readlen=100, step=5, prefix='dad')

    def count_reads(reads):
        ct = Sketch(KSIZE, 1000003, 4, counter_bits=8)
        for b in batches_from_records(iter(reads)):
            ct.consume_batch(b.bases)
        return ct

    case = count_reads(child_reads)
    mom = count_reads(mom_reads)
    dad = count_reads(dad_reads)

    refrfile = str(tmp / 'refr.fa')
    simdata.write_fasta({'chr1': genome}, refrfile)

    novelreads = list(novel(iter(child_reads), [case], [mom, dad],
                            ksize=KSIZE, casemin=6, ctrlmax=0))
    assert len(novelreads) > 0

    pstream = partition(iter(novelreads), minabund=2, maxabund=200)
    calls = list(alac(pstream, refrfile, ksize=KSIZE, seedsize=51, delta=50))
    return dict(calls=calls, genome=genome, child=child, snvpos=snvpos,
                ref=ref, alt=alt, ins=ins)


def test_pipeline_finds_snv(pipeline_calls):
    d = pipeline_calls
    passing = [c for c in d['calls'] if c.filterstr == 'PASS']
    snvs = [c for c in passing
            if len(c._refr) == 1 and len(c._alt) == 1]
    assert any(c.seqid == 'chr1' and c.position == d['snvpos'] and
               c._refr == d['ref'] and c._alt == d['alt'] for c in snvs), \
        [(c.position, c._refr, c._alt) for c in snvs]


def test_pipeline_finds_insertion(pipeline_calls):
    d = pipeline_calls
    passing = [c for c in d['calls'] if c.filterstr == 'PASS']
    inss = [c for c in passing if len(c._alt) > len(c._refr)]
    assert any(c.seqid == 'chr1' and c.position == 3299 and
               c._alt == d['genome'][3299] + d['ins'] for c in inss), \
        [(c.position, c._refr, c._alt) for c in inss]


def test_pipeline_finds_deletion(pipeline_calls):
    d = pipeline_calls
    passing = [c for c in d['calls'] if c.filterstr == 'PASS']
    dels = [c for c in passing if len(c._refr) > len(c._alt)]
    # left-aligned deletion of genome[4200:4207] anchored at 4199
    assert any(c.seqid == 'chr1' and len(c._refr) == 8 and
               4190 <= c.position <= 4200 for c in dels), \
        [(c.position, c._refr, c._alt) for c in dels]


def test_pipeline_no_spurious_passing_calls(pipeline_calls):
    d = pipeline_calls
    passing = [c for c in d['calls'] if c.filterstr == 'PASS']
    # exactly the three engineered variants
    assert len(passing) == 3, \
        [(c.position, c._refr, c._alt, c.filterstr) for c in passing]


def test_pipeline_vcf_output(pipeline_calls, tmp_path):
    import io
    from kevlar_tpu.vcf import VCFWriter, VCFReader
    d = pipeline_calls
    out = io.StringIO()
    writer = VCFWriter(out, source='kevlar_tpu::test')
    writer.write_header()
    for c in d['calls']:
        writer.write(c)
    text = out.getvalue()
    assert text.startswith('##fileformat=VCFv4.2')
    # 1-based positions on write
    assert any(line.split('\t')[1] == str(d['snvpos'] + 1)
               for line in text.splitlines() if not line.startswith('#'))
    # roundtrip through the reader
    variants = list(VCFReader(io.StringIO(text)))
    assert len(variants) == len(d['calls'])


def test_alac_threads_identical_calls(pipeline_calls, tmp_path):
    """alac --threads N must produce byte-identical calls to a serial run
    (the reference advertises --threads but runs serially, cli/alac.py:92-94;
    here partitions genuinely assemble+align in parallel)."""
    import random
    from kevlar_tpu.batch import batches_from_records
    d = pipeline_calls
    rng = random.Random(20260817)

    child_reads = simdata.tiled_reads(d['child'], readlen=100, step=5,
                                      prefix='child')
    mom_reads = simdata.tiled_reads(d['genome'], readlen=100, step=5,
                                    prefix='mom')

    def count_reads(reads):
        ct = Sketch(KSIZE, 1000003, 4, counter_bits=8)
        for b in batches_from_records(iter(reads)):
            ct.consume_batch(b.bases)
        return ct

    case = count_reads(child_reads)
    mom = count_reads(mom_reads)
    refrfile = str(tmp_path / 'refr.fa')
    simdata.write_fasta({'chr1': d['genome']}, refrfile)

    novelreads = list(novel(iter(child_reads), [case], [mom], ksize=KSIZE,
                            casemin=6, ctrlmax=0))

    def run(threads):
        pstream = partition(iter(list(novelreads)), minabund=2, maxabund=200)
        return [(c.seqid, c.position, c._refr, c._alt, c.filterstr,
                 c.attribute('CONTIG'))
                for c in alac(pstream, refrfile, ksize=KSIZE, seedsize=51,
                              delta=50, threads=threads)]

    assert run(1) == run(4)
