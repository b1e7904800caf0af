"""Golden regression: the seeded mini-trio pipeline must keep producing a
byte-identical VCF across rounds (guards unintended behavior drift).

Regenerate with ``python -m tests.test_golden`` after *intentional*
behavior changes, and review the diff.
"""

import io
import os
import random

import kevlar_tpu
from kevlar_tpu.batch import batches_from_records
from kevlar_tpu.novel import novel
from kevlar_tpu.partition import partition
from kevlar_tpu.alac import alac
from kevlar_tpu.simlike import simlike
from kevlar_tpu.sketch import Sketch
from kevlar_tpu.vcf import VCFWriter

from . import simdata

GOLDEN = os.path.join(os.path.dirname(__file__), 'data', 'golden_trio.vcf')
KSIZE = 21


def _run_pipeline(tmpdir):
    rng = random.Random(777)
    genome = simdata.make_genome(rng, 4000)
    child, ref, alt = simdata.apply_snv(genome, 1000, rng=rng)
    tail = next(b for b in 'ACGT' if b != genome[2999])
    head = next(b for b in 'ACGT' if b != genome[3000] and b != tail)
    child = simdata.apply_insertion(child, 3000, head + 'CATCATC' + tail)

    child_reads = (simdata.tiled_reads(child, 100, 10, 'cA') +
                   simdata.tiled_reads(genome, 100, 10, 'cB'))
    mom_reads = simdata.tiled_reads(genome, 100, 5, 'm')
    dad_reads = simdata.tiled_reads(genome, 100, 5, 'd')

    def count(reads, bits=8):
        ct = Sketch(KSIZE, 1000003, 4, counter_bits=bits)
        for b in batches_from_records(iter(reads)):
            ct.consume_batch(b.bases)
        return ct

    case, mom, dad = count(child_reads), count(mom_reads), count(dad_reads)
    refr = Sketch(KSIZE, 1000003, 4, counter_bits=4)
    refr.consume(genome)

    refrfile = os.path.join(str(tmpdir), 'refr.fa')
    simdata.write_fasta({'chr1': genome}, refrfile)

    novelreads = list(novel(iter(child_reads), [case], [mom, dad],
                            ksize=KSIZE, casemin=6, ctrlmax=0))
    pstream = partition(iter(novelreads), minabund=2, maxabund=200)
    calls = alac(pstream, refrfile, ksize=KSIZE, seedsize=51, delta=50)
    labels = ['Case', 'Mother', 'Father']
    scored = simlike(calls, case, [mom, dad], refr, mu=10.0, sigma=3.0,
                     casemin=6, samplelabels=labels)
    out = io.StringIO()
    writer = VCFWriter(out, source='kevlar_tpu::golden')
    for label in ('Case', 'Mother', 'Father'):
        writer.register_sample(label)
    writer.write_header(skipdate=True)
    for call in scored:
        writer.write(call)
    return out.getvalue()


def test_golden_vcf(tmp_path):
    text = _run_pipeline(tmp_path)
    with open(GOLDEN) as fh:
        expected = fh.read()
    assert text == expected


if __name__ == '__main__':
    import sys
    import tempfile
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    with tempfile.TemporaryDirectory() as tmpdir:
        text = _run_pipeline(tmpdir)
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    with open(GOLDEN, 'w') as fh:
        fh.write(text)
    print('wrote', GOLDEN, '({} bytes)'.format(len(text)))
