"""alac-stage parity against the reference's own pinned expectations.

Mirrors /root/reference/kevlar/tests/test_alac.py on the reference's
checked-in data: mate-guided localization call positions, the
maxdiff/maxtargetlen CIGAR matrix, fiveparts whole-run and per-partition
positions, the big-partition skip, seqid exclusion, and --gen-mask output
(byte-identical to the reference's khmer nodetable).
"""

import filecmp
import os

import pytest

import kevlar_tpu
from kevlar_tpu import seqio
from kevlar_tpu.alac import alac
from kevlar_tpu.sequence import parse_augmented_fastx

DATA = '/root/reference/kevlar/tests/data/'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason='reference test data not mounted')


def data_file(name):
    return os.path.join(DATA, name)


def pstream(name):
    return seqio.parse_partitioned_reads(parse_augmented_fastx(
        kevlar_tpu.open(data_file(name), 'r')))


@pytest.mark.parametrize('readfile', [
    'mate-dist/cc130.augfastq.gz',       # with #mateseq=# annotations
    'mate-dist/cc130.nomates.augfastq.gz',
])
def test_alac_matedist(readfile):
    """Pinned PASS positions on the cc130 partition, with and without mate
    sequences (reference test_alac.py:210-237)."""
    calls = list(alac(pstream(readfile),
                      data_file('mate-dist/cc130.refr.fa.gz'),
                      ksize=31, delta=50, seedsize=51))
    assert len(calls) == 3
    passed = [c for c in calls if c.filterstr == 'PASS']
    assert sorted(c.position for c in passed) == [1475, 115377, 127540]


@pytest.mark.parametrize('vcfposition,X,maxtargetlen,cigar', [
    (40692, 10000, 0, '32713D96M6I91M15142D'),
    (40692, 10000, None, '32713D96M6I91M15142D'),
    (40692, 10000, False, '32713D96M6I91M15142D'),
    (40692, 1000, 1000, '50D96M6I91M50D'),
    (40692, 0, 0, '32713D96M6I91M140025D'),
    (40692, None, None, '50D96M6I91M50D'),
])
def test_alac_maxdiff(vcfposition, X, maxtargetlen, cigar):
    """maxdiff/maxtargetlen matrix with pinned CIGARs + positions
    (reference test_alac.py:239-264)."""
    calls = list(alac(pstream('maxdiff-reads.augfastq.gz'),
                      data_file('maxdiff-refr.fa.gz'), ksize=31, delta=50,
                      seedsize=51, maxdiff=X, maxtargetlen=maxtargetlen))
    assert len(calls) == 1
    assert calls[0].attribute('CIGAR') == cigar
    assert calls[0].position == vcfposition - 1


def test_alac_maxdiff_complex_rescue():
    """The (X=10000, maxtargetlen=10000) row of the reference's maxdiff
    matrix pins CIGAR 2763D98M2381D4M329D91M50D as a single
    InscrutableCigar NO-call (reference test_alac.py:239-264 at position
    68538).  The complex-CIGAR rescue (docs/migrating.md) instead emits
    one candidate call per supported M-flanked interior gap — both carry
    the same pinned CIGAR — and lets likelihood ranking arbitrate."""
    calls = list(alac(pstream('maxdiff-reads.augfastq.gz'),
                      data_file('maxdiff-refr.fa.gz'), ksize=31, delta=50,
                      seedsize=51, maxdiff=10000, maxtargetlen=10000))
    assert len(calls) == 2
    assert all(c.attribute('CIGAR') == '2763D98M2381D4M329D91M50D'
               for c in calls)
    assert sorted(c.position for c in calls) == [71397, 73782]
    assert [len(c._refr) - len(c._alt) for c in
            sorted(calls, key=lambda c: c.position)] == [2381, 329]


FIVEPARTS_POSITIONS = {'1': 284801, '2': 1660735, '3': 2315888,
                       '4': 2321205, '5': 593252}


def test_alac_fiveparts_whole_run():
    calls = list(alac(pstream('fiveparts.augfastq.gz'),
                      data_file('fiveparts-refr.fa.gz')))
    assert sorted(c.position for c in calls) == sorted(
        p - 1 for p in FIVEPARTS_POSITIONS.values())


@pytest.mark.parametrize('label,position',
                         sorted(FIVEPARTS_POSITIONS.items()))
def test_alac_single_partition(label, position):
    """--part-id processing of one labeled partition (reference
    test_alac.py:122-138)."""
    readstream = parse_augmented_fastx(
        kevlar_tpu.open(data_file('fiveparts.augfastq.gz'), 'r'))
    partstream = seqio.parse_single_partition(readstream, label)
    calls = list(alac(partstream, data_file('fiveparts-refr.fa.gz')))
    assert len(calls) == 1
    assert calls[0].position == position - 1
    assert calls[0].attribute('PART') == label


def test_alac_bigpart_skipped():
    """Partitions above --max-reads are skipped (reference
    test_alac.py:168-174)."""
    calls = list(alac(pstream('fiveparts.augfastq.gz'),
                      data_file('fiveparts-refr.fa.gz'), maxreads=20))
    assert len(calls) == 3


def test_alac_exclude_all_seqids(capsys):
    """--exclude matching every seqid yields no calls (reference
    test_alac.py:154-165)."""
    import kevlar_tpu.cli as cli
    import kevlar_tpu.alac as alac_mod
    args = cli.parse_args(['alac', '--exclude', '^seq',
                           data_file('fiveparts.augfastq.gz'),
                           data_file('fiveparts-refr.fa.gz')])
    alac_mod.main(args)
    out = capsys.readouterr().out
    assert [ln for ln in out.splitlines()
            if ln and not ln.startswith('#')] == []


def test_alac_generate_mask(tmp_path):
    """--gen-mask writes a khmer nodetable byte-identical to the
    reference's checked-in artifact (reference test_alac.py:177-191)."""
    maskfile = str(tmp_path / 'genmask.nt')
    calls = list(alac(pstream('fiveparts.augfastq.gz'),
                      data_file('fiveparts-refr.fa.gz'),
                      maskfile=maskfile, maskmem=1e6))
    assert len(calls) == 5
    assert filecmp.cmp(data_file('fiveparts-genmask.nodetable'), maskfile)


def test_alac_generate_mask_lowmem(tmp_path, capsys):
    """An undersized mask triggers the FPR warning (reference
    test_alac.py:194-207)."""
    maskfile = str(tmp_path / 'genmask.nt')
    calls = list(alac(pstream('fiveparts.augfastq.gz'),
                      data_file('fiveparts-refr.fa.gz'),
                      maskfile=maskfile, maskmem=100))
    assert len(calls) == 5
    out, err = capsys.readouterr()
    message = 'WARNING: mask FPR is 0.8065; exceeds user-specified limit'
    assert message in out or message in err


def test_alac_no_reference_match(capsys):
    """Contigs with zero seed matches warn and yield nothing (reference
    test_alac.py:112-119)."""
    calls = list(alac(pstream('pico-4.augfastq.gz'),
                      data_file('localize-refr.fa')))
    assert calls == []
    out, err = capsys.readouterr()
    assert 'no reference matches' in err