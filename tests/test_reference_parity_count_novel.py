"""count / novel / filter parity against the reference's pinned cases.

Mirrors /root/reference/kevlar/tests/test_count.py, test_novel.py and
test_filter.py on the reference's data, including byte-identical
khmer-format counttable output (``--sketch-format khmer``), khmer-built
counttables as novel-stage inputs, khmer-format masks in count and
filter, the abundance screen, and skip-until restartability messages.
"""

import contextlib
import glob
import io
import os
from collections import defaultdict

import pytest

import kevlar_tpu
import kevlar_tpu.cli as cli

DATA = '/root/reference/kevlar/tests/data/'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason='reference test data not mounted')


def data_file(name):
    return os.path.join(DATA, name)


def run_main(mod, arglist):
    """Drive one stage through the CLI parser; returns (stdout, log)."""
    args = cli.parse_args([str(a) for a in arglist])
    out_io, err_io = io.StringIO(), io.StringIO()
    old = kevlar_tpu.logstream
    kevlar_tpu.logstream = err_io
    try:
        with contextlib.redirect_stdout(out_io), \
                contextlib.redirect_stderr(err_io):
            mod.main(args)
    finally:
        kevlar_tpu.logstream = old
    return out_io.getvalue(), err_io.getvalue()


@pytest.mark.parametrize('infile,testout,numbands,band,kmers_stored', [
    ('case', 'case', 0, 0, 973),
    ('ctrl1', 'ctrl1', 0, 0, 973),
    ('ctrl2', 'ctrl2', 0, 0, 966),
    ('case', 'case-band-2-1', 2, 1, 501),
    ('case', 'case-band-16-7', 16, 7, 68),
])
def test_count_khmer_format_byte_identical(infile, testout, numbands, band,
                                           kmers_stored, tmp_path):
    """`count --sketch-format khmer` writes files byte-identical to
    khmer's own (incl. hash-range banding) and reports khmer's exact
    distinct-k-mer counts (reference test_count.py:45-68)."""
    from kevlar_tpu import count as count_mod
    out = str(tmp_path / 'out')
    arglist = ['count', '--ksize', 25, '--memory', '10K',
               '--sketch-format', 'khmer']
    if numbands:
        arglist += ['--num-bands', numbands, '--band', band]
    arglist += [out, data_file('simple-genome-%s-reads.fa.gz' % infile)]
    _, err = run_main(count_mod, arglist)
    assert '600 reads processed' in err
    assert '{:d} distinct k-mers stored'.format(kmers_stored) in err
    with open(out + '.counttable', 'rb') as got, \
            open(data_file('simple-genome-%s.ct' % testout), 'rb') as want:
        assert got.read() == want.read()


def test_count_cli_with_khmer_mask(tmp_path):
    """A khmer-format mask routes counting through the khmer engine with
    the reference's exact masked distinct count (reference
    test_count.py:153-170)."""
    from kevlar_tpu import count as count_mod
    from kevlar_tpu.oxli import OxliSketch
    mask = OxliSketch(21, 1e4, 4, counter_bits=1)
    mask.consume('CACCAATCCGTACGGAGAGCCGTATATATAGACTGCTATACTATTGGATCGTACGGG'
                 'GC')
    maskfile = str(tmp_path / 'mask.nt')
    mask.save(maskfile)
    _, err = run_main(count_mod, [
        'count', '--ksize', 21, '--mask', maskfile, '--memory', '1M',
        str(tmp_path / 'out.sct'), data_file('bogus-genome/refr.fa')])
    assert '36898 distinct k-mers stored' in err


def test_novel_abund_screen():
    from kevlar_tpu import novel as novel_mod
    out, _ = run_main(novel_mod, [
        'novel', '--ksize', 25, '--ctrl-max', 1, '--case-min', 8,
        '--case', data_file('screen-case.fa'),
        '--control', data_file('screen-ctrl.fa'), '--abund-screen', 3])
    assert '>seq_error' not in out


def test_novel_skip_until():
    """Restart fast-forward message with the reference's exact skipped
    count and result summary (reference test_novel.py:179-207)."""
    from kevlar_tpu import novel as novel_mod
    ctrls = sorted(glob.glob(data_file('trio1/ctrl[1,2].fq')))
    base = ['novel', '--ctrl-max', 0, '--case-min', 6,
            '--case', data_file('trio1/case1.fq'),
            '--control', ctrls[0], '--control', ctrls[1]]
    readname = 'bogus-genome-chr1_115_449_0:0:0_0:0:0_1f4/1'
    _, err = run_main(novel_mod, base + ['--skip-until', readname])
    assert ('Found read {} (skipped 1001 reads)'.format(readname)) in err
    assert '29 unique novel kmers in 14 reads' in err

    _, err = run_main(novel_mod, base + ['--skip-until', 'BOGUSREADNAME'])
    assert 'Found read' not in err
    assert '(skipped ' not in err
    assert 'Found 0 instances of 0 unique novel kmers in 0 reads' in err


def test_novel_with_khmer_counttables():
    """khmer-built .ct files work as --case-counts/--control-counts (the
    host screen path; reference test_novel.py:266-283)."""
    from kevlar_tpu import novel as novel_mod
    f4, f5 = sorted(glob.glob(data_file('simple-genome-ctrl?.ct')))
    out, err = run_main(novel_mod, [
        'novel', '-k', 25,
        '--case', data_file('simple-genome-case-reads.fa.gz'),
        data_file('ambig.fasta'),
        '--case-counts', data_file('simple-genome-case.ct'),
        '--control-counts', f4, f5])
    assert 'counttables for 2 sample(s) provided' in err


def test_filter_alpha():
    """Recount pass drops FPR-inflated annotations (reference
    test_filter.py:27-46)."""
    from kevlar_tpu import filter as filter_mod
    validated = list(filter_mod.filter(data_file('collect.alpha.txt'),
                                       memory=500))
    assert len(validated) == 8
    badkmers = {'CAGGCCAGGGATCGCCGTG'}
    goodkmers = {'AGGGGCGTGACTTAATAAG', 'GGGCGTGACTTAATAAGGT',
                 'TAGGGGCGTGACTTAATAA', 'GGGGCGTGACTTAATAAGG'}
    for record in validated:
        for kmer in record.annotations:
            seq = record.ikmerseq(kmer)
            assert seq not in badkmers
            assert kevlar_tpu.revcom(seq) not in badkmers
            assert seq in goodkmers or kevlar_tpu.revcom(seq) in goodkmers


@pytest.mark.parametrize('maskfile,nkmers,nkmerinstances', [
    (None, 424, 5782),
    ('bogus-genome/mask.nt', 13, 171),
])
def test_filter_ctrl3(maskfile, nkmers, nkmerinstances):
    """Filter with and without a khmer-format mask pins the exact
    annotation census (reference test_filter.py:49-58)."""
    from kevlar_tpu import filter as filter_mod, sketch as sketch_mod
    mask = sketch_mod.load(data_file(maskfile)) if maskfile else None
    ikmers = defaultdict(int)
    for read in filter_mod.filter(data_file('trio1/novel_3_1,2.txt'),
                                  memory=1e7, mask=mask):
        for ikmer in read.annotations:
            ikmers[kevlar_tpu.revcommin(read.ikmerseq(ikmer))] += 1
    assert len(ikmers) == nkmers
    assert sum(ikmers.values()) == nkmerinstances


def test_filter_abundfilt():
    from kevlar_tpu import filter as filter_mod
    validated = list(filter_mod.filter(data_file('worm.augfasta'),
                                       memory=1000, casemin=5, ctrlmax=0))
    assert len(validated) == 5
    ikmers = defaultdict(int)
    for read in validated:
        for ikmer in read.annotations:
            ikmers[kevlar_tpu.revcommin(read.ikmerseq(ikmer))] += 1
    assert len(ikmers) == 1
    assert sum(ikmers.values()) == 5


def test_filter_main_with_mask():
    from kevlar_tpu import filter as filter_mod
    _, err = run_main(filter_mod, [
        'filter', '--mask', data_file('bogus-genome/mask.nt'),
        '--memory', '10M', '--max-fpr', '0.001', '--case-min', '6',
        data_file('trio1/novel_3_1,2.txt')])
    assert 'Processed 178 reads' in err
    assert 'Validated 18 reads' in err