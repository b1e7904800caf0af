"""Accuracy harness: gentrio-simulated trio -> full pipeline -> evaluation.

Measures de novo recall/precision on a multi-variant trio, including
sequencing errors — the in-repo analog of the reference's simulated-trio
accuracy notebooks (bigsim / human-sim-pico).
"""

import random

import pytest

import kevlar_tpu
from kevlar_tpu.batch import batches_from_records
from kevlar_tpu.novel import novel
from kevlar_tpu.partition import partition
from kevlar_tpu.alac import alac
from kevlar_tpu.simlike import simlike
from kevlar_tpu.sketch import Sketch
from kevlar_tpu.gentrio import simulate_variant_genotypes, apply_mutation
from kevlar_tpu.support import MutableString

from . import simdata

KSIZE = 25


def _haplotypes(genome, variants, individual):
    haplo = [MutableString(genome), MutableString(genome)]
    for variant in sorted(variants, key=lambda v: v.position, reverse=True):
        genotype = variant.genotypes[individual]
        for hapindex, allele in enumerate((genotype[0], genotype[2])):
            if allele == '1':
                apply_mutation(haplo[hapindex], variant.position,
                               variant._refr, variant._alt)
    return [str(h) for h in haplo]


def _noisy_reads(rng, haplos, readlen, step, prefix, error_rate=0.01):
    reads = []
    n = 0
    for h, seq in enumerate(haplos):
        for r in simdata.tiled_reads(seq, readlen, step,
                                     '{}h{}_'.format(prefix, h)):
            if error_rate:
                s = list(r.sequence)
                for i in range(len(s)):
                    if rng.random() < error_rate:
                        s[i] = rng.choice([b for b in 'ACGT' if b != s[i]])
                r.sequence = ''.join(s)
            reads.append(r)
            n += 1
    return reads


@pytest.mark.slow
def test_denovo_recall_and_precision(tmp_path):
    rng = random.Random(20260817)
    genome = simdata.make_genome(rng, 30000)
    variants = list(simulate_variant_genotypes(
        {'chr1': genome}, ninh=6, ndenovo=8,
        weights={'snv': 1.0}, rng=114))
    # keep variants well-separated and away from the ends so loci are
    # independently partitionable
    kept, occupied = [], []
    for v in variants:
        if 1000 < v.position < len(genome) - 1000 and \
                all(abs(v.position - p) > 1500 for p in occupied):
            kept.append(v)
            occupied.append(v.position)
    variants = kept
    denovo = [v for v in variants
              if v.genotypes[1] == '0/0' and v.genotypes[2] == '0/0'
              and '1' in v.genotypes[0]]
    assert len(denovo) >= 3

    proband = _haplotypes(genome, variants, 0)
    mother = _haplotypes(genome, variants, 1)
    father = _haplotypes(genome, variants, 2)

    child_reads = _noisy_reads(rng, proband, 100, 8, 'c')   # ~12x/haplo
    mom_reads = _noisy_reads(rng, mother, 100, 10, 'm')
    dad_reads = _noisy_reads(rng, father, 100, 10, 'd')

    def count(reads):
        ct = Sketch(KSIZE, 8_000_003, 4, counter_bits=8)
        for b in batches_from_records(iter(reads)):
            ct.consume_batch(b.bases)
        return ct

    case, mom, dad = count(child_reads), count(mom_reads), count(dad_reads)
    refr = Sketch(KSIZE, 8_000_003, 4, counter_bits=4)
    refr.consume(genome)

    refrfile = str(tmp_path / 'refr.fa')
    simdata.write_fasta({'chr1': genome}, refrfile)

    novelreads = list(novel(iter(child_reads), [case], [mom, dad],
                            ksize=KSIZE, casemin=6, ctrlmax=1))
    pstream = partition(iter(novelreads), minabund=2, maxabund=200)
    calls = alac(pstream, refrfile, ksize=KSIZE, seedsize=51, delta=50)
    scored = list(simlike(calls, case, [mom, dad], refr, mu=12.0, sigma=4.0,
                          casemin=6))

    passing = {(c.seqid, c.position, c._refr, c._alt)
               for c in scored if c.filterstr == 'PASS'}
    truth = {('chr1', v.position, v._refr, v._alt) for v in denovo}

    found = truth & passing
    recall = len(found) / len(truth)
    spurious = passing - truth
    precision = len(found) / max(len(passing), 1)
    assert recall >= 0.8, (sorted(truth), sorted(passing))
    assert precision >= 0.8, sorted(spurious)
    # inherited variants must NOT appear as de novo calls
    inherited = {('chr1', v.position, v._refr, v._alt)
                 for v in variants if v not in denovo}
    assert not (passing & inherited)


@pytest.mark.slow
def test_denovo_long_insertion(tmp_path):
    """A 300 bp de novo insertion — longer than any single read — must be
    assembled across tiling interesting reads and called with the right
    length (the hard case in the reference's quick-start scenario, which
    expects '5 variant calls: a 300 bp insertion and 4 SNVs')."""
    from kevlar_tpu.gentrio import mutate_insertion, mutate_snv
    from kevlar_tpu.vcf import Variant

    rng = random.Random(20260820)
    genome = simdata.make_genome(rng, 30000)
    inspos, snvpos = 9000, 21000
    refr1, alt1, rw1, aw1 = mutate_insertion(
        genome, inspos, 300, 2000, rng, ksize=KSIZE)
    refr2, alt2, rw2, aw2 = mutate_snv(genome, snvpos, 2, ksize=KSIZE)
    variants = [
        Variant('chr1', inspos, refr1, alt1, ALTWINDOW=aw1, REFRWINDOW=rw1),
        Variant('chr1', snvpos, refr2, alt2, ALTWINDOW=aw2, REFRWINDOW=rw2),
    ]
    for v in variants:
        v.annotate('GT', '0/1,0/0,0/0')

    proband = _haplotypes(genome, variants, 0)
    parent = [genome, genome]
    child_reads = _noisy_reads(rng, proband, 100, 8, 'c', error_rate=0.005)
    mom_reads = _noisy_reads(rng, parent, 100, 10, 'm', error_rate=0.005)
    dad_reads = _noisy_reads(rng, parent, 100, 10, 'd', error_rate=0.005)

    def count(reads):
        ct = Sketch(KSIZE, 8_000_003, 4, counter_bits=8)
        for b in batches_from_records(iter(reads)):
            ct.consume_batch(b.bases)
        return ct

    case, mom, dad = count(child_reads), count(mom_reads), count(dad_reads)
    refr = Sketch(KSIZE, 8_000_003, 4, counter_bits=4)
    refr.consume(genome)
    refrfile = str(tmp_path / 'refr.fa')
    simdata.write_fasta({'chr1': genome}, refrfile)

    novelreads = list(novel(iter(child_reads), [case], [mom, dad],
                            ksize=KSIZE, casemin=6, ctrlmax=1))
    pstream = partition(iter(novelreads), minabund=2, maxabund=200)
    calls = alac(pstream, refrfile, ksize=KSIZE, seedsize=51, delta=50)
    scored = list(simlike(calls, case, [mom, dad], refr, mu=12.0, sigma=4.0,
                          casemin=6))
    passing = [c for c in scored if c.filterstr == 'PASS']

    inscalls = [c for c in passing
                if len(c._alt) - len(c._refr) == 300
                and abs(c.position - inspos) <= 10]
    assert len(inscalls) == 1, [(c.position, c._refr[:20], c._alt[:20])
                                for c in passing]
    snvcalls = [c for c in passing
                if c.position == snvpos and (c._refr, c._alt) == (refr2,
                                                                  alt2)]
    assert len(snvcalls) == 1
    assert len(passing) == 2, [(c.position, len(c._alt) - len(c._refr))
                               for c in passing]
