"""filter stage: recount validation and mask screening."""

import random

import kevlar_tpu
from kevlar_tpu import filter as filter_mod
from kevlar_tpu.sequence import Record, print_augmented_fastx
from kevlar_tpu.sketch import Sketch

from . import simdata


def _write_augfastq(records, path):
    with kevlar_tpu.open(str(path), 'w') as fh:
        for r in records:
            print_augmented_fastx(r, fh)


def test_filter_recount_validates(tmp_path):
    # six reads share one "novel" k-mer; annotations claim inflated abundance
    kmer = 'ACGTACGTACGTACGTACGTA'  # 21-mer
    reads = []
    for i in range(6):
        seq = 'TTTTT' + kmer + 'GGGGG'
        r = Record(name='r{}'.format(i), sequence=seq, quality='I' * len(seq))
        r.annotate(kmer, 5, (19, 0, 0))
        reads.append(r)
    # one read has an annotation seen only once -> recount below casemin
    lonely = 'TGGATCCATGGATCCATGGAT'
    seq = 'AAAAA' + lonely + 'CCCCC'
    r = Record(name='lonely', sequence=seq, quality='I' * len(seq))
    r.annotate(lonely, 5, (19, 0, 0))
    reads.append(r)

    path = tmp_path / 'novel.augfastq'
    _write_augfastq(reads, path)
    out = list(filter_mod.filter(str(path), casemin=6, ctrlmax=1))
    names = [r.name for r in out]
    assert 'lonely' not in names
    assert len(out) == 6
    for r in out:
        assert len(r.annotations) == 1
        # recomputed case abundance replaces the inflated one
        assert r.annotations[0].abund == (6, 0, 0)


def test_filter_ctrl_too_high_dropped(tmp_path):
    kmer = 'ACGTACGTACGTACGTACGTA'
    reads = []
    for i in range(6):
        seq = 'TTTTT' + kmer + 'GGGGG'
        r = Record(name='r{}'.format(i), sequence=seq, quality='I' * len(seq))
        r.annotate(kmer, 5, (19, 5, 0))  # control abundance 5 > ctrlmax
        reads.append(r)
    path = tmp_path / 'novel.augfastq'
    _write_augfastq(reads, path)
    out = list(filter_mod.filter(str(path), casemin=6, ctrlmax=1))
    assert out == []


def test_filter_mask_screens_kmers(tmp_path):
    kmer = 'ACGTACGTACGTACGTACGTA'
    mask = Sketch(21, 10007, counter_bits=1)
    mask.consume(kmer)
    reads = []
    for i in range(6):
        seq = 'TTTTT' + kmer + 'GGGGG'
        r = Record(name='r{}'.format(i), sequence=seq, quality='I' * len(seq))
        r.annotate(kmer, 5, (19, 0, 0))
        reads.append(r)
    path = tmp_path / 'novel.augfastq'
    _write_augfastq(reads, path)
    # masked k-mer is never re-counted -> recount 0 < casemin -> dropped
    out = list(filter_mod.filter(str(path), mask=mask, casemin=6, ctrlmax=1))
    assert out == []
