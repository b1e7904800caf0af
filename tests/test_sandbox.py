"""Sandbox utilities: compact, get-partitions, subsketch.

Shipped-surface parity with the reference's installed sandbox scripts
(/root/reference/setup.py:65, kevlar/sandbox/*.py).
"""

import random

import kevlar_tpu
from kevlar_tpu.sequence import Record, print_augmented_fastx
from kevlar_tpu.sketch import Sketch


def _ann_read(name, seq, kmers):
    r = Record(name=name, sequence=seq, quality='I' * len(seq))
    for k, o in kmers:
        r.annotate(k, o, (9, 0, 0))
    return r


def test_compact_keeps_best_call_per_class(tmp_path, capsys):
    from kevlar_tpu.sandbox import compact

    bed = tmp_path / 'truth.bed'
    bed.write_text('chr1\t999\t1000\nchr1\t4999\t5000\n')
    vcffile = tmp_path / 'calls.vcf'
    with open(vcffile, 'w') as fh:
        kevlar_tpu.vcf_header(fh, source='test')
        fh.write('chr1\t1000\t.\tA\tC\t.\tPASS\t'
                 'LIKESCORE=200.0;CALLCLASS=1\n')
        fh.write('chr1\t1003\t.\tA\tG\t.\tPASS\t'
                 'LIKESCORE=100.0;CALLCLASS=1\n')
        fh.write('chr1\t9000\t.\tT\tG\t.\tPASS\t'
                 'LIKESCORE=50.0;CALLCLASS=2\n')

    compact.main([str(bed), str(vcffile)])
    rows = [line for line in capsys.readouterr().out.splitlines()
            if line and not line.startswith('#')]
    # class 1 matches the BED region: only its best-scoring matching call
    # survives (EVAL=True); class 2 matches nothing, so its best call is
    # kept flagged EVAL=False
    assert len(rows) == 2
    assert rows[0].split('\t')[1] == '1000'
    assert 'EVAL=True' in rows[0]
    assert rows[1].split('\t')[1] == '9000'
    assert 'EVAL=False' in rows[1]


def test_get_partitions_selects_and_splits(tmp_path):
    from kevlar_tpu.sandbox import get_partitions

    seq = 'ACGTACGTACGTACGTACGTACGTACGTAC'
    aug = tmp_path / 'parts.augfastq'
    with open(aug, 'w') as fh:
        for pid in (1, 2, 3):
            for i in range(2):
                read = _ann_read('r{}-{} kvcc={}'.format(pid, i, pid),
                                 seq, [(seq[:21], 0)])
                print_augmented_fastx(read, fh)

    out = tmp_path / 'sel.augfastq'
    get_partitions.main(['-o', str(out), str(aug), '1', '3'])
    text = out.read_text()
    assert 'kvcc=1' in text and 'kvcc=3' in text
    assert 'kvcc=2' not in text

    get_partitions.main(['-p', str(tmp_path / 'part{}.fq'),
                         str(aug), '2'])
    assert 'kvcc=2' in (tmp_path / 'part2.fq').read_text()


def test_subsketch_preserves_sampled_counts(tmp_path, capsys):
    from kevlar_tpu.sandbox import subsketch
    from . import simdata

    rng = random.Random(99)
    genome = simdata.make_genome(rng, 500)
    src = Sketch(21, 100003, 4, counter_bits=8, backend='host')
    for _ in range(5):
        src.consume(genome)
    srcfile = str(tmp_path / 'src.ct')
    src.save(srcfile)

    subfile = str(tmp_path / 'sub.ct')
    segment = genome[100:160]
    subsketch.main(['--table-size', '9973', srcfile, subfile, segment])
    assert 'Estimated FPR' in capsys.readouterr().out

    from kevlar_tpu import sketch as sketch_mod
    sub = sketch_mod.load(subfile)
    for kmer in src.get_kmers(segment):
        assert sub.get(kmer) == src.get(kmer) == 5
