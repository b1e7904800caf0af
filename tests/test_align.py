"""Alignment engine: scalar/wavefront equivalence and CIGAR semantics."""

import random

import pytest

from kevlar_tpu.dna import revcom
from kevlar_tpu.ops.align import (align_scalar, align_numpy,
                                  align_both_strands)

from . import simdata


def test_perfect_match():
    cigar, score = align_numpy('ACGTACGTAC', 'ACGTACGTAC')
    assert cigar == '10M'
    assert score == 10


def test_single_mismatch():
    cigar, score = align_numpy('ACGTACGTAC', 'ACGAACGTAC')
    assert cigar == '10M'
    assert score == 9 - 2  # 9 matches(+9) + 1 mismatch(-2)


def test_contig_within_cutout():
    """Typical kevlar case: query (contig) embedded in a larger target."""
    rng = random.Random(31)
    g = simdata.make_genome(rng, 200)
    contig = g[50:150]
    cigar, score = align_numpy(g, contig)
    # ksw2's backtrack tie-breaking yields a trailing-M artifact here (the
    # last 2 contig bases coincidentally match the last 2 cutout bases);
    # validated bit-identical against compiled ksw2.  The AlignmentTokenizer
    # endcheck canonicalises this to 50D100M50D downstream.
    assert cigar == '50D98M50D2M'
    assert score == 100 - 5 - 5  # two gap opens flanking the match


def test_snv_in_contig():
    rng = random.Random(32)
    g = simdata.make_genome(rng, 200)
    contig, _, _ = simdata.apply_snv(g[50:150], 49, rng=rng)
    cigar, score = align_numpy(g, contig)
    assert cigar == '50D100M50D'
    assert score == 99 - 2 - 10  # 99 matches, 1 mismatch, 2 gap opens
    cigarless, score2 = align_numpy(g[50:150], contig)
    assert cigarless == '100M'
    assert score2 == 99 - 2  # 99 matches + 1 mismatch


def test_deletion_in_contig():
    """Contig missing 5 bp relative to the target -> xMyDzM pattern."""
    rng = random.Random(33)
    g = simdata.make_genome(rng, 120)
    contig = g[:50] + g[55:]  # 5 bp deletion at position 50
    cigar, score = align_numpy(g, contig)
    assert cigar == '50M5D65M'
    assert score == 115 - 5  # 115 matches, one gap of length 5: open 5, ext 0


def test_insertion_in_contig():
    rng = random.Random(34)
    g = simdata.make_genome(rng, 120)
    ins = 'ACGTACGTT'
    contig = g[:60] + ins + g[60:]
    cigar, score = align_numpy(g, contig)
    assert cigar == '60M9I60M'
    assert score == 120 - 5


@pytest.mark.parametrize('tlen,qlen', [(30, 30), (50, 20), (20, 50), (1, 1),
                                       (40, 1), (1, 40)])
def test_scalar_wavefront_equivalence_random(tlen, qlen):
    rng = random.Random(1000 + tlen * 100 + qlen)
    for trial in range(8):
        t = simdata.make_genome(rng, tlen)
        q = simdata.make_genome(rng, qlen)
        cs, ss = align_scalar(t, q)
        cn, sn = align_numpy(t, q)
        assert (cs, ss) == (cn, sn), (t, q)


def test_scalar_wavefront_equivalence_related():
    """Related sequences (mutated copies) — the realistic case."""
    rng = random.Random(2020)
    for trial in range(10):
        g = simdata.make_genome(rng, 80)
        q = g[10:70]
        mutation = rng.choice(['snv', 'ins', 'del'])
        if mutation == 'snv':
            q, _, _ = simdata.apply_snv(q, rng.randint(5, 54), rng=rng)
        elif mutation == 'ins':
            q = simdata.apply_insertion(
                q, rng.randint(5, 54), simdata.make_genome(rng, 4))
        else:
            q = simdata.apply_deletion(q, rng.randint(5, 50), 4)
        cs, ss = align_scalar(g, q)
        cn, sn = align_numpy(g, q)
        assert (cs, ss) == (cn, sn)


def test_n_scores_zero():
    cigar, score = align_numpy('ACGTNACGTA', 'ACGTTACGTA')
    assert cigar == '10M'
    assert score == 9  # N-vs-T scores 0, 9 matches


def test_align_both_strands_picks_better():
    rng = random.Random(35)
    g = simdata.make_genome(rng, 100)
    contig = g[20:80]
    score_f, cigar_f, strand_f = align_both_strands(g, contig)
    assert strand_f == 1 and score_f == 60 - 10
    score_r, cigar_r, strand_r = align_both_strands(g, revcom(contig))
    assert strand_r == -1 and score_r == 60 - 10
    assert cigar_r == cigar_f == '20D60M20D'


def test_empty_query():
    cigar, score = align_numpy('ACGT', '')
    assert cigar == '4D'
