"""Support modules: mutate, seqio partition streaming, Timer, Progress.

Behavioral parity targets: reference test_mutate.py / test_seqio.py /
test_timer.py / test_progress.py pin these same behaviors.
"""

import io

import pytest

import kevlar_tpu
from kevlar_tpu import mutate, seqio
from kevlar_tpu.sequence import Record


# -- mutate -----------------------------------------------------------------

def test_load_mutations_and_apply():
    table = io.StringIO(
        '# comment\n'
        '\n'
        'chr1 5 snv 1\n'
        'chr1 10 ins GATTACA\n'
        'chr1 20 del 3\n'
        'chr1 30 inv 4\n'
    )
    muts = mutate.load_mutations(table)
    assert set(muts) == {'chr1'}
    assert [m.type for m in muts['chr1']] == ['snv', 'ins', 'del', 'inv']

    seq = 'ACGTACGTACGTACGTACGTACGTACGTACGTACGT'
    m = muts['chr1'][0]
    out = mutate.mutate_snv(seq, m)
    # snv offset: base at pos 5 ('C') advanced by 1 -> 'G'
    assert out[5] == 'G' and out[:5] == seq[:5] and out[6:] == seq[6:]

    out = mutate.mutate_insertion(seq, muts['chr1'][1])
    assert out == seq[:10] + 'GATTACA' + seq[10:]

    out = mutate.mutate_deletion(seq, muts['chr1'][2])
    assert out == seq[:20] + seq[23:]

    out = mutate.mutate_inversion(seq, muts['chr1'][3])
    assert out == seq[:30] + seq[30:34][::-1] + seq[34:]


def test_load_mutations_rejects_bad_rows():
    with pytest.raises(ValueError):
        mutate.load_mutations(io.StringIO('chr1 5 snv\n'))
    with pytest.raises(ValueError):
        mutate.load_mutations(io.StringIO('chr1 5 bogus 1\n'))


def test_mutate_inversion_at_origin():
    seq = 'ACGTAAAA'
    m = mutate.Mutation(seq='chr1', pos=0, type='inv', data='4')
    assert mutate.mutate_inversion(seq, m) == 'TGCA' + seq[4:]


# -- seqio partition streaming ------------------------------------------------

def _rec(name):
    return Record(name=name, sequence='ACGT')


def test_parse_partitioned_reads_groups_by_label():
    reads = [_rec('r1 kvcc=1'), _rec('r2 kvcc=1'), _rec('r3 kvcc=2'),
             _rec('r4 kvcc=2'), _rec('r5 kvcc=2')]
    parts = list(seqio.parse_partitioned_reads(iter(reads)))
    assert [(pid, len(rs)) for pid, rs in parts] == [('1', 2), ('2', 3)]


def test_parse_partitioned_reads_unlabeled_single_group():
    reads = [_rec('r1'), _rec('r2')]
    parts = list(seqio.parse_partitioned_reads(iter(reads)))
    assert len(parts) == 1
    assert parts[0][0] is None
    assert len(parts[0][1]) == 2


def test_parse_partitioned_reads_mixed_labels_error():
    # the reference errors on mixed labeled/unlabeled input (seqio.py:79-81)
    reads = [_rec('r1'), _rec('r2 kvcc=1')]
    with pytest.raises(seqio.KevlarPartitionLabelError):
        list(seqio.parse_partitioned_reads(iter(reads)))


def test_parse_single_partition():
    reads = [_rec('r1 kvcc=1'), _rec('r2 kvcc=2'), _rec('r3 kvcc=2')]
    parts = list(seqio.parse_single_partition(iter(reads), '2'))
    assert len(parts) == 1 and parts[0][0] == '2' and len(parts[0][1]) == 2
    assert list(seqio.parse_single_partition(iter(reads), '9')) == []


# -- Timer / ProgressIndicator ------------------------------------------------

def test_timer_named_phases():
    t = kevlar_tpu.Timer()
    t.start('load')
    elapsed = t.stop('load')
    assert elapsed >= 0
    assert t.probe is not None
    with pytest.raises(ValueError):
        t.stop('never-started')
    with pytest.raises(ValueError):
        t.start('load')  # already started


def test_timer_default_key():
    t = kevlar_tpu.Timer()
    t.start()
    assert t.probe() >= 0
    assert t.stop() >= 0


def test_progress_indicator_decreasing_frequency(capsys):
    logstream = io.StringIO()
    old = kevlar_tpu.logstream
    kevlar_tpu.logstream = logstream
    try:
        pi = kevlar_tpu.ProgressIndicator('processed {counter}', interval=10,
                                          breaks=[100, 1000])
        for _ in range(250):
            pi.update()
        text = logstream.getvalue()
    finally:
        kevlar_tpu.logstream = old
    lines = [ln for ln in text.splitlines() if 'processed' in ln]
    # every 10 up to 100, then every 100: 10,20,...,100 then 200 -> 11 lines
    assert len(lines) == 11
    assert 'processed 200' in lines[-1]
