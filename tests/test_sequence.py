"""Record type and augmented FASTX round-trips."""

import io

from kevlar_tpu.sequence import (Record, KmerOfInterest, parse_augmented_fastx,
                                 print_augmented_fastx)


def test_record_annotate_and_ikmers():
    rec = Record(name='read1', sequence='ACGTACGTAC')
    rec.annotate('CGTAC', 1, (8, 0, 0))
    assert len(rec.annotations) == 1
    ik = rec.annotations[0]
    assert ik.ksize == 5 and ik.offset == 1 and ik.abund == (8, 0, 0)
    assert rec.ikmerseq(ik) == 'CGTAC'
    assert 'CGTAC' in rec.ikmers and 'GTACG' in rec.ikmers  # revcom too


def test_augmented_fastq_write_format():
    rec = Record(name='r', sequence='ACGTACGTAC', quality='IIIIIIIIII')
    rec.annotate('CGTAC', 1, (8, 0, 1))
    out = io.StringIO()
    print_augmented_fastx(rec, out)
    lines = out.getvalue().split('\n')
    assert lines[0] == '@r'
    assert lines[1] == 'ACGTACGTAC'
    assert lines[2] == '+'
    assert lines[3] == 'IIIIIIIIII'
    assert lines[4] == ' CGTAC          8 0 1#'


def test_augmented_fasta_roundtrip():
    rec = Record(name='contig1 kvcc=4', sequence='ACGTACGTACGT')
    rec.annotate('ACGTA', 0, (12,))
    rec.annotate('GTACG', 6, (9,))
    out = io.StringIO()
    print_augmented_fastx(rec, out)
    parsed = list(parse_augmented_fastx(io.StringIO(out.getvalue())))
    assert len(parsed) == 1
    got = parsed[0]
    assert got.name == rec.name
    assert got.sequence == rec.sequence
    assert got.quality is None
    assert [(k.offset, k.abund) for k in got.annotations] == \
        [(0, (12,)), (6, (9,))]


def test_mateseq_roundtrip():
    rec = Record(name='r', sequence='ACGTACGT', quality='IIIIIIII')
    rec.add_mate('TTTTACGT')
    out = io.StringIO()
    print_augmented_fastx(rec, out)
    parsed = list(parse_augmented_fastx(io.StringIO(out.getvalue())))
    assert parsed[0].mates == ['TTTTACGT']


def test_multiple_records_stream():
    text = (
        '@r1\nACGTACGT\n+\nIIIIIIII\n'
        ' CGTAC          6#\n'
        '@r2\nTTTTGGGG\n+\nIIIIIIII\n'
    )
    recs = list(parse_augmented_fastx(io.StringIO(text)))
    assert [r.name for r in recs] == ['r1', 'r2']
    assert len(recs[0].annotations) == 1
    assert recs[0].annotations[0].abund == (6,)
    assert len(recs[1].annotations) == 0
