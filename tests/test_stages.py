"""Stage coverage: unband, dist, split, assemble, augment."""

import io
import random

import pytest

import kevlar_tpu
from kevlar_tpu.sequence import Record, print_augmented_fastx
from kevlar_tpu.sketch import Sketch

from . import simdata


def _ann_read(name, seq, kmers):
    r = Record(name=name, sequence=seq, quality='I' * len(seq))
    for k, o in kmers:
        r.annotate(k, o, (9, 0, 0))
    return r


def test_unband_merges_duplicate_reads():
    from kevlar_tpu.unband import unband
    seq = 'ACGTACGTACGTACGTACGTACGTACGTAC'
    r1 = _ann_read('read1', seq, [(seq[0:21], 0)])
    r2 = _ann_read('read1', seq, [(seq[5:26], 5)])  # same read, other band
    r3 = _ann_read('read2', seq, [(seq[2:23], 2)])
    out = list(unband(iter([r1, r2, r3]), numbatches=4))
    byname = {r.name: r for r in out}
    assert set(byname) == {'read1', 'read2'}
    offsets = [k.offset for k in byname['read1'].annotations]
    assert offsets == [0, 5]  # merged + sorted by offset
    assert len(byname['read2'].annotations) == 1


def test_dist_mu_sigma(tmp_path):
    from kevlar_tpu.dist import dist
    rng = random.Random(55)
    genome = simdata.make_genome(rng, 2000)
    reads = simdata.tiled_reads(genome, 100, 10, 'r')  # ~10x coverage
    fq = str(tmp_path / 'reads.fq')
    simdata.write_fastq(reads, fq)
    mask = Sketch(21, 100003, 4, counter_bits=1)
    mask.consume(genome)
    mu, sigma, data = dist([fq], mask, ksize=21, memory=4e6)
    assert 7 < mu < 11      # tiled coverage ~= readlen/step adjusted for k
    assert sigma < 3
    assert sum(row['Count'] for row in data) > 0
    # rows are cumulative
    cum = [row['CumulativeFraction'] for row in data]
    assert cum == sorted(cum)
    assert abs(cum[-1] - 1.0) < 1e-9


def test_dist_zero_abundance_error():
    from kevlar_tpu.dist import calc_mu_sigma, KevlarZeroAbundanceDistError
    with pytest.raises(KevlarZeroAbundanceDistError):
        calc_mu_sigma({})


def test_split_round_robin(tmp_path):
    from kevlar_tpu.split import split
    parts = []
    for pid in range(1, 6):
        seq = simdata.make_genome(random.Random(pid), 40)
        reads = [_ann_read('r{}-{} kvcc={}'.format(pid, i, pid), seq,
                           [(seq[0:21], 0)]) for i in range(2)]
        parts.append((str(pid), reads))
    streams = [io.StringIO() for _ in range(2)]
    split(iter(parts), streams)
    texts = [s.getvalue() for s in streams]
    # partitions 1,3,5 -> file 0; 2,4 -> file 1
    assert 'kvcc=1' in texts[0] and 'kvcc=3' in texts[0]
    assert 'kvcc=2' in texts[1] and 'kvcc=4' in texts[1]
    assert 'kvcc=2' not in texts[0]


def test_split_discards_oversized_partition():
    from kevlar_tpu.split import split
    seq = simdata.make_genome(random.Random(9), 40)
    big = [(str(1), [_ann_read('r{} kvcc=1'.format(i), seq, [(seq[:21], 0)])
                     for i in range(5)])]
    stream = io.StringIO()
    split(iter(big), [stream], maxreads=3)
    assert stream.getvalue() == ''


def test_assemble_stage_produces_annotated_contig():
    from kevlar_tpu.assemble import assemble
    rng = random.Random(66)
    genome = simdata.make_genome(rng, 400)
    child, _, _ = simdata.apply_snv(genome, 200, rng=rng)
    kmer = child[190:211]
    reads = []
    for n, start in enumerate(range(100, 201, 10)):
        seq = child[start:start + 100]
        kmers = []
        if 0 <= 190 - start <= 100 - 21:
            kmers.append((kmer, 190 - start))
        r = _ann_read('r{} kvcc=1'.format(n), seq, kmers)
        reads.append(r)
    out = list(assemble(iter([('1', reads)])))
    assert len(out) >= 1
    partid, contig = out[0]
    assert partid == '1'
    assert 'kvcc=1' in contig.name
    # contig spans the full read range and carries the ikmer annotation
    assert len(contig.sequence) == 200
    assert kmer in contig.sequence or \
        kevlar_tpu.revcom(kmer) in contig.sequence
    assert len(contig.annotations) >= 1


def test_assemble_skips_oversized_partition():
    from kevlar_tpu.assemble import assemble
    seq = simdata.make_genome(random.Random(8), 60)
    reads = [_ann_read('r{}'.format(i), seq, [(seq[:21], 0)])
             for i in range(4)]
    out = list(assemble(iter([('1', reads)]), maxreads=2))
    assert out == []


def test_augment_stage_cli_semantics():
    from kevlar_tpu.augment import augment
    seq = simdata.make_genome(random.Random(3), 60)
    kmer = seq[10:31]
    annotated = [_ann_read('src', seq, [(kmer, 10)])]
    naked = [Record(name='contig1', sequence=seq[5:55])]
    out = list(augment(iter(annotated), iter(naked)))
    assert len(out) == 1
    assert len(out[0].annotations) == 1
    assert out[0].annotations[0].offset == 5
    assert out[0].annotations[0].abund == (9, 0, 0)
