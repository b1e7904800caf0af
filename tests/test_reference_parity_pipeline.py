"""Pipeline-level parity against the reference's own pinned outputs.

These tests run multi-stage slices of the pipeline on the reference's
checked-in trio datasets and assert the exact values the reference's test
suite publishes.  The khmer-compat sketch engine (kevlar_tpu.oxli) makes
the sketch-FPR-dependent pins reproducible bit-for-bit: abundances —
including hash-collision noise — match the reference's khmer tables
exactly, so its published likelihoods transfer unchanged.

Pinned expectations (cited per test) come from the reference's published
assertions; no reference code is used.
"""

import os
import re

import pytest

import kevlar_tpu
from kevlar_tpu import cli
from kevlar_tpu import oxli
from kevlar_tpu import vcf as vcf_mod
from kevlar_tpu.simlike import (likelihood_denovo, likelihood_false,
                                likelihood_inherited, simlike,
                                spanning_kmer_abundances)

DATA = '/root/reference/kevlar/tests/data/'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason='reference test data not mounted')


def data_file(name):
    return os.path.join(DATA, name)


def data_glob(pattern):
    import glob
    found = sorted(glob.glob(os.path.join(DATA, pattern)))
    assert found, pattern
    return found


@pytest.fixture(scope='module')
def minitrio():
    """The reference's minitrio fixture, rebuilt on the khmer-compat
    engine (reference test_simlike.py:21-32: Counttable(31, 1e6, 4) per
    individual, SmallCounttable(31, 125000, 4) for the reference genome)."""
    kid = oxli.OxliSketch(31, 1e6, 4)
    mom = oxli.OxliSketch(31, 1e6, 4)
    dad = oxli.OxliSketch(31, 1e6, 4)
    ref = oxli.OxliSketch(31, 125000, 4, counter_bits=4)
    kid.consume_seqfile(data_file('minitrio/trio-proband.fq.gz'))
    mom.consume_seqfile(data_file('minitrio/trio-mother.fq.gz'))
    dad.consume_seqfile(data_file('minitrio/trio-father.fq.gz'))
    ref.consume_seqfile(data_file('minitrio/refr.fa'))
    return kid, mom, dad, ref


@pytest.fixture(scope='module')
def miniabund(minitrio):
    kid, mom, dad, ref = minitrio
    altseq = 'TGTCTCCCTCCCCTCCACCCCCAGAAATGGGTTTTTGATAGTCTTCCAAAGTTAGGGTAGT'
    refseq = 'TGTCTCCCTCCCCTCCACCCCCAGAAATGGCTTTTTGATAGTCTTCCAAAGTTAGGGTAGT'
    altabund, refrabund, ndropped = spanning_kmer_abundances(
        altseq, refseq, kid, (mom, dad), ref)
    # 3 alt-window k-mers collide with reference-genome buckets in khmer's
    # hash space; identical here (reference test_simlike.py:36-44)
    assert ndropped == 3
    return altabund, refrabund


def test_likelihoods_on_minitrio_abundances(miniabund):
    """Golden likelihoods from the reference suite (test_simlike.py
    test_likelihood_{denovo,false,inherited} on the miniabund fixture)."""
    altabund, refrabund = miniabund
    assert likelihood_denovo(altabund, refrabund) == \
        pytest.approx(-224.52616, abs=1e-4)
    assert likelihood_false(altabund, refrabund) == \
        pytest.approx(-1059.26387, abs=1e-4)
    assert likelihood_inherited(altabund) == \
        pytest.approx(-438.32216, abs=1e-4)


def test_simlike_minitrio_pinned_scores(minitrio):
    """Full simlike scoring of the reference's minitrio calls.vcf pins
    LIKESCORE=213.796, LLDN/LLFP/LLIH, and the exact per-k-mer ALTABUND
    string (reference test_simlike.py:173-233)."""
    kid, mom, dad, ref = minitrio
    with kevlar_tpu.open(data_file('minitrio/calls.vcf'), 'r') as instream:
        reader = vcf_mod.VCFReader(instream)
        calls = list(simlike(reader, kid, (mom, dad), ref,
                             samplelabels=('Kid', 'Mom', 'Dad')))
    assert len(calls) == 1
    call = calls[0]
    assert float(call.attribute('LLDN')) == pytest.approx(-224.52616,
                                                          abs=1e-3)
    assert float(call.attribute('LLFP')) == pytest.approx(-1059.264,
                                                          abs=1e-2)
    assert float(call.attribute('LLIH')) == pytest.approx(-438.322,
                                                          abs=1e-2)
    assert float(call.attribute('LIKESCORE')) == pytest.approx(213.796,
                                                               abs=1e-2)
    assert call.format('Kid', 'ALTABUND') == (
        '7,6,6,6,6,6,6,6,6,6,7,9,8,8,9,9,9,7,7,8,8,8,7,7,7,7,7,7')


def test_simlike_minitrio_bad_windows(minitrio, capsys):
    """Calls with missing/short windows score -inf with the reference's
    warning text (reference test_simlike.py:150-170)."""
    kid, mom, dad, ref = minitrio
    with kevlar_tpu.open(data_file('minitrio/calls-badwindows.vcf'),
                         'r') as instream:
        reader = vcf_mod.VCFReader(instream)
        calls = list(simlike(reader, kid, (mom, dad), ref,
                             samplelabels=('Kid', 'Mom', 'Dad')))
    assert len(calls) == 5
    goodcalls = [c for c in calls
                 if c.attribute('LIKESCORE') > float('-inf')]
    assert len(goodcalls) == 1
    assert len(goodcalls[0].window) == 61
    assert len(goodcalls[0].refrwindow) == 61


def _run_cli(arglist, capsys):
    args = cli.parser().parse_args(arglist)
    stage = getattr(kevlar_tpu, arglist[0])
    stage.main(args)
    return capsys.readouterr()


@pytest.mark.parametrize('case,ctrl', [
    ('microtrios/trio-li-proband.fq.gz', 'microtrios/trio-li-??ther.fq.gz'),
    ('microtrios/trio-na-proband.fq.gz', 'microtrios/trio-na-??ther.fq.gz'),
    ('microtrios/trio-k-proband.fq.gz', 'microtrios/trio-k-??ther.fq.gz'),
])
def test_novel_microtrio_banded(case, ctrl, capsys):
    """Banded novel screen on the reference's micro trios: every emitted
    k-mer satisfies case>=7 and ctrl==0 (reference test_novel.py:85-106,
    including the --band 2/2 banding path)."""
    ctrls = data_glob(ctrl)
    out, err = _run_cli(
        ['novel', '--case', data_file(case), '--ksize', '25',
         '--case-min', '7', '--control', ctrls[0], '--control', ctrls[1],
         '--num-bands', '2', '--band', '2',
         '--ctrl-max', '0', '--memory', '500K'], capsys)
    emitted = 0
    for line in out.split('\n'):
        if not line.endswith('#') or line.startswith('#mateseq'):
            continue
        abundmatch = re.search(r'(\d+) (\d+) (\d+)#$', line)
        assert abundmatch, line
        emitted += 1
        assert int(abundmatch.group(1)) >= 7, line
        assert int(abundmatch.group(2)) == 0, line
        assert int(abundmatch.group(3)) == 0, line
    assert emitted > 0


def test_novel_two_cases_trio1(tmp_path, capsys):
    """Two case samples over the trio1 data: every annotation satisfies
    both case minima and both control maxima (reference
    test_novel.py:109-146)."""
    cases = data_glob('trio1/case6*.fq')
    controls = data_glob('trio1/ctrl[5,6].fq')
    counttables = []
    for i, seqfile in enumerate(cases + controls):
        ct = str(tmp_path / 'sample{}.ct'.format(i))
        _run_cli(['count', '--ksize', '19', '--memory', '1e7', ct, seqfile],
                 capsys)
        counttables.append(ct)
    out, err = _run_cli(
        ['novel', '--ksize', '19', '--memory', '1e7',
         '--ctrl-max', '1', '--case-min', '7',
         '--case', cases[0], '--case', cases[1],
         '--case-counts', counttables[0], counttables[1],
         '--control-counts', counttables[2], counttables[3]], capsys)
    assert out.strip() != ''
    for line in out.split('\n'):
        if not line.endswith('#') or line.startswith('#mateseq'):
            continue
        abundmatch = re.search(r'(\d+) (\d+) (\d+) (\d+)#$', line)
        assert abundmatch, line
        assert int(abundmatch.group(1)) >= 7
        assert int(abundmatch.group(2)) >= 7
        assert int(abundmatch.group(3)) <= 1
        assert int(abundmatch.group(4)) <= 1


def test_minitrio_full_trio_to_vcf_golden(tmp_path, capsys):
    """FULL trio -> VCF on the reference's minitrio dataset: count the
    three samples, screen novel k-mers, filter, partition, assemble and
    call — ending in the reference's published golden call
    (minitrio/calls.vcf: seq1 45813 C->G PASS with pinned alt/refr
    windows).

    The novel stage must recover exactly the 13 variant-locus reads of
    the reference's novel.augfastq.gz.  The golden file carries 2 extra
    reads from an unrelated locus (wgsim error reads whose erroneous
    k-mers pass the control screen only through khmer counting-table
    collisions); this engine's cleaner hash space rejects them, and they
    are inert downstream — the reference itself calls nothing from them
    (calls.vcf holds the single 45813 row).
    """
    datadir = data_file('minitrio')
    counts = {}
    for sample in ('proband', 'mother', 'father'):
        ct = str(tmp_path / (sample + '.ct'))
        _run_cli(['count', '--ksize', '31', '--memory', '4M', ct,
                  os.path.join(datadir, 'trio-{}.fq.gz'.format(sample))],
                 capsys)
        counts[sample] = ct
    novelfile = str(tmp_path / 'novel.augfastq')
    _run_cli(['novel', '--ksize', '31', '--ctrl-max', '1', '--case-min',
              '6', '--case', os.path.join(datadir, 'trio-proband.fq.gz'),
              '--case-counts', counts['proband'],
              '--control-counts', counts['mother'], counts['father'],
              '--out', novelfile], capsys)
    got_names = set()
    with open(novelfile) as fh:
        for line in fh:
            if line.startswith('@seq1'):
                got_names.add(line.strip().lstrip('@'))
    golden_names = set()
    with kevlar_tpu.open(data_file('minitrio/novel.augfastq.gz'),
                         'r') as fh:
        for line in fh:
            if line.startswith('@seq1'):
                golden_names.add(line.strip().lstrip('@'))
    variant_locus = {n for n in golden_names if n.startswith('seq1_haplo2')}
    assert len(golden_names) == 15
    assert got_names == variant_locus
    assert len(got_names) == 13

    filtered = str(tmp_path / 'filtered.augfastq')
    _run_cli(['filter', novelfile, '--out', filtered], capsys)
    partfile = str(tmp_path / 'part.augfastq')
    _run_cli(['partition', filtered, '--out', partfile], capsys)
    vcffile = str(tmp_path / 'calls.vcf')
    _run_cli(['alac', '--ksize', '31', partfile,
              os.path.join(datadir, 'refr.fa'), '--out', vcffile], capsys)
    rows = [ln.strip().split('\t') for ln in open(vcffile)
            if not ln.startswith('#') and ln.strip()]
    assert len(rows) == 1
    chrom, pos, _, ref, alt = rows[0][:5]
    assert (chrom, pos, ref, alt) == ('seq1', '45813', 'C', 'G')
    assert rows[0][6] == 'PASS'
    info = rows[0][7]
    assert ('ALTWINDOW=TGTCTCCCTCCCCTCCACCCCCAGAAATGGGTTTTTGATAGTCTTCC'
            'AAAGTTAGGGTAGT') in info
    assert ('REFRWINDOW=TGTCTCCCTCCCCTCCACCCCCAGAAATGGCTTTTTGATAGTCTTCC'
            'AAAGTTAGGGTAGT') in info
