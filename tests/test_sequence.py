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


def test_augmented_fastx_fuzz_roundtrip():
    """Property: random annotated records survive write->parse unchanged."""
    import random
    from tests import simdata
    rng = random.Random(2026)
    for trial in range(25):
        L = rng.randint(30, 120)
        seq = simdata.make_genome(rng, L)
        fastq = rng.random() < 0.5
        rec = Record(name='r{} extra meta'.format(trial), sequence=seq,
                     quality=('I' * L) if fastq else None)
        k = rng.randint(11, min(31, L))
        nann = rng.randint(0, 4)
        offsets = sorted(rng.sample(range(L - k + 1), min(nann, L - k + 1)))
        for off in offsets:
            nab = rng.randint(1, 4)
            rec.annotate(seq[off:off + k], off,
                         tuple(rng.randint(0, 255) for _ in range(nab)))
        if rng.random() < 0.3:
            rec.add_mate(simdata.make_genome(rng, 40))
        out = io.StringIO()
        print_augmented_fastx(rec, out)
        got = list(parse_augmented_fastx(io.StringIO(out.getvalue())))[0]
        assert got.name == rec.name
        assert got.sequence == rec.sequence
        assert got.quality == rec.quality
        assert [(a.ksize, a.offset, a.abund) for a in got.annotations] == \
            [(a.ksize, a.offset, a.abund) for a in rec.annotations]
        assert got.mates == rec.mates
