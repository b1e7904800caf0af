"""Variant interpretation: VariantMapping SNV/indel calls, dedup, MNV merge."""

import random

import pytest

from kevlar_tpu.reference import ReferenceCutout
from kevlar_tpu.sequence import Record
from kevlar_tpu.varmap import VariantMapping
from kevlar_tpu.call import call, prelim_call, merge_adjacent, dedup
from kevlar_tpu.vcf import Variant

from . import simdata

KSIZE = 21


def _contig(seq, genome=None, child=None, varpos=None):
    """Contig record annotated with child-genome k-mers spanning varpos."""
    rec = Record(name='contig1', sequence=seq)
    if child is not None and varpos is not None:
        # annotate k-mers of the contig that span the variant
        local = seq.find(child[varpos - KSIZE + 1:varpos + KSIZE])
        for off in range(len(seq) - KSIZE + 1):
            kmer = seq[off:off + KSIZE]
            gpos = child.find(kmer)
            if gpos >= 0 and gpos <= varpos < gpos + KSIZE:
                rec.annotate(kmer, off, (9, 0, 0))
    return rec


def test_snv_call():
    rng = random.Random(42)
    genome = simdata.make_genome(rng, 600)
    child, ref, alt = simdata.apply_snv(genome, 300, rng=rng)
    contig = _contig(child[250:350], genome, child, 300)
    cutout = ReferenceCutout('chr1_200-400', genome[200:400])
    mapping = VariantMapping(contig, cutout)
    assert mapping.vartype == 'snv'
    calls = list(mapping.call_variants(KSIZE))
    real = [c for c in calls if c.filterstr == 'PASS']
    assert len(real) == 1
    c = real[0]
    assert c.seqid == 'chr1'
    assert c.position == 300
    assert c._refr == ref and c._alt == alt
    # windows span +-(k-1) around the variant
    assert c.window == child[300 - KSIZE + 1:300 + KSIZE]
    assert c.refrwindow == genome[300 - KSIZE + 1:300 + KSIZE]


def test_deletion_call():
    rng = random.Random(43)
    genome = simdata.make_genome(rng, 600)
    dellen = 6
    child = simdata.apply_deletion(genome, 300, dellen)
    contig = _contig(child[250:350])
    # annotate a k-mer spanning the deletion junction so it's not a passenger
    junction = child[300 - 10:300 + 11]
    off = contig.sequence.find(junction)
    contig.annotate(junction, off, (9, 0, 0))
    cutout = ReferenceCutout('chr1_200-420', genome[200:420])
    mapping = VariantMapping(contig, cutout)
    assert mapping.vartype == 'indel'
    assert mapping.indeltype == 'D'
    calls = list(mapping.call_variants(KSIZE))
    indels = [c for c in calls if len(c._refr) > 1]
    assert len(indels) == 1
    c = indels[0]
    assert c.position == 299
    assert c._refr == genome[299:300 + dellen]
    assert c._alt == genome[299]


def test_insertion_call():
    rng = random.Random(44)
    genome = simdata.make_genome(rng, 600)
    # craft an insertion that cannot be left/right-shifted (gap alignment is
    # left-aligned, so an ambiguous insertion would legitimately report a
    # smaller coordinate)
    bases = [b for b in 'ACGT' if b != genome[299]]
    tail = bases[0]
    bases2 = [b for b in 'ACGT' if b != genome[300] and b != tail]
    head = bases2[0]
    ins = head + 'TGCATGC' + tail
    child = simdata.apply_insertion(genome, 300, ins)
    contig = _contig(child[250:360])
    junction = child[300 - 10:300 + len(ins) + 10]
    off = contig.sequence.find(junction)
    contig.annotate(junction, off, (9, 0, 0))
    cutout = ReferenceCutout('chr1_200-420', genome[200:420])
    mapping = VariantMapping(contig, cutout)
    assert mapping.vartype == 'indel'
    assert mapping.indeltype == 'I'
    calls = list(mapping.call_variants(KSIZE))
    indels = [c for c in calls if len(c._alt) > 1]
    assert len(indels) == 1
    c = indels[0]
    assert c.position == 299
    assert c._refr == genome[299]
    assert c._alt == genome[299] + ins


def test_perfect_match_nocall():
    rng = random.Random(45)
    genome = simdata.make_genome(rng, 400)
    contig = Record(name='contig1', sequence=genome[150:250])
    cutout = ReferenceCutout('chr1_100-300', genome[100:300])
    mapping = VariantMapping(contig, cutout)
    calls = list(mapping.call_variants(KSIZE))
    assert len(calls) == 1
    assert calls[0].filterstr == 'PerfectMatch'


def test_reverse_strand_contig():
    from kevlar_tpu.dna import revcom
    rng = random.Random(46)
    genome = simdata.make_genome(rng, 600)
    child, ref, alt = simdata.apply_snv(genome, 300, rng=rng)
    fwd = child[250:350]
    contig = Record(name='contig1', sequence=revcom(fwd))
    # annotate with a spanning k-mer (in contig orientation)
    kmer = revcom(child[290:290 + KSIZE])
    contig.annotate(kmer, contig.sequence.find(kmer), (9, 0, 0))
    cutout = ReferenceCutout('chr1_200-400', genome[200:400])
    mapping = VariantMapping(contig, cutout)
    assert mapping.strand == -1
    calls = [c for c in mapping.call_variants(KSIZE)
             if c.filterstr == 'PASS']
    assert len(calls) == 1
    assert calls[0].position == 300
    assert calls[0]._refr == ref and calls[0]._alt == alt


def test_mnv_merge():
    v1 = Variant('chr1', 100, 'A', 'T', ALTWINDOW='TTTTA', REFRWINDOW='TTTTC')
    v2 = Variant('chr1', 101, 'C', 'G', ALTWINDOW='TTTAG', REFRWINDOW='TTTCG')
    # windows: v1.window[1:] must equal v2.window[:-1]
    merged = list(merge_adjacent(iter([v1, v2])))
    assert len(merged) == 1
    assert merged[0]._refr == 'AC'
    assert merged[0]._alt == 'TG'


def test_dedup_keeps_longest_window():
    v1 = Variant('chr1', 100, 'A', 'T', ALTWINDOW='CCACC', REFRWINDOW='CCTCC')
    v2 = Variant('chr1', 100, 'A', 'T', ALTWINDOW='CCCACCC',
                 REFRWINDOW='CCCTCCC')
    out = list(dedup(iter([v1, v2])))
    assert len(out) == 1
    assert out[0].windowlength == 7
