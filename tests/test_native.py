"""Native C++ layer: parser, aligner, assembler (skipped if g++ missing)."""

import random

import numpy as np
import pytest

from kevlar_tpu import dna

from . import simdata

native = pytest.importorskip('kevlar_tpu.native')
if not native.available():
    pytest.skip('native library unavailable', allow_module_level=True)


def test_fastx_parser_fastq(tmp_path):
    path = str(tmp_path / 'reads.fq')
    with open(path, 'w') as fh:
        fh.write('@r1 extra\nACGT\n+\nIIII\n@r2\nTTNGG\n+\nJJJJJ\n')
    batches = list(native.FastxBatchReader(path, max_reads=10, max_len=8,
                                           want_quals=True))
    assert len(batches) == 1
    bases, lengths, names, quals = batches[0]
    assert names == ['r1 extra', 'r2']
    assert lengths.tolist() == [4, 5]
    assert bases[0, :4].tolist() == [0, 1, 2, 3]
    assert bases[0, 4] == 4  # padding
    assert bases[1, :5].tolist() == [3, 3, 4, 2, 2]
    assert bytes(quals[0][:4]).decode() == 'IIII'


def test_fastx_parser_fasta_multiline_gz(tmp_path):
    import gzip
    path = str(tmp_path / 'seqs.fa.gz')
    with gzip.open(path, 'wt') as fh:
        fh.write('>s1\nACGT\nACGT\n>s2\nGGGG\n')
    batches = list(native.FastxBatchReader(path, max_reads=10, max_len=16))
    bases, lengths, names = batches[0][:3]
    assert names == ['s1', 's2']
    assert lengths.tolist() == [8, 4]


def test_fastx_matches_python_parser(tmp_path):
    rng = random.Random(12)
    reads = simdata.sample_reads(rng, simdata.make_genome(rng, 2000),
                                 readlen=80, coverage=5)
    path = str(tmp_path / 'reads.fq')
    simdata.write_fastq(reads, path)
    allb, alll, alln = [], [], []
    for out in native.FastxBatchReader(path, max_reads=7, max_len=128):
        allb.append(out[0])
        alll.append(out[1])
        alln.extend(out[2])
    bases = np.concatenate(allb)
    assert alln == [r.name for r in reads]
    for i, r in enumerate(reads):
        np.testing.assert_array_equal(bases[i, :len(r.sequence)],
                                      dna.encode(r.sequence))


def test_native_align_parity():
    from kevlar_tpu.ops.align import align_numpy
    rng = random.Random(5)
    for _ in range(25):
        t = simdata.make_genome(rng, rng.randint(20, 300))
        q = simdata.make_genome(rng, rng.randint(20, 300))
        assert native.align(t, q) == align_numpy(t, q)


def test_native_assemble_recovers_locus():
    rng = random.Random(6)
    g = simdata.make_genome(rng, 400)
    reads = [g[i:i + 100] for i in range(0, 301, 10)]
    reads[5] = dna.revcom(reads[5])
    contigs = list(native.assemble(reads, min_overlap=45))
    assert len(contigs) == 1
    assert contigs[0] == g or dna.revcom(contigs[0]) == g


def test_native_assemble_two_loci():
    rng = random.Random(7)
    g1 = simdata.make_genome(rng, 300)
    g2 = simdata.make_genome(rng, 300)
    reads = [g1[i:i + 100] for i in range(0, 201, 20)] + \
            [g2[i:i + 100] for i in range(0, 201, 20)]
    contigs = list(native.assemble(reads, min_overlap=45))
    assert len(contigs) == 2
    got = {c if c in (g1, g2) else dna.revcom(c) for c in contigs}
    assert got == {g1, g2}


def test_native_count_path_matches_python(tmp_path):
    """count.consume_seqfile native fast path == Python parser path."""
    from kevlar_tpu.count import consume_seqfile
    from kevlar_tpu.sketch import Sketch
    rng = random.Random(8)
    reads = simdata.sample_reads(rng, simdata.make_genome(rng, 3000),
                                 readlen=90, coverage=8)
    path = str(tmp_path / 'reads.fq')
    simdata.write_fastq(reads, path)
    s_native = Sketch(21, 100003, 4, counter_bits=8)
    n1 = consume_seqfile(s_native, [path], batch_size=16)
    # force the python path by monkeypatching the native import
    s_python = Sketch(21, 100003, 4, counter_bits=8)
    import kevlar_tpu.batch as batch_mod

    def raise_import(*a, **k):
        raise ImportError

    orig = batch_mod.native_base_batches
    batch_mod.native_base_batches = raise_import
    try:
        n2 = consume_seqfile(s_python, [path], batch_size=16)
    finally:
        batch_mod.native_base_batches = orig
    assert n1 == n2 == len(reads)
    np.testing.assert_array_equal(np.asarray(s_native.tables),
                                  np.asarray(s_python.tables))


def test_native_assemble_error_tolerant_consensus():
    """1% sequencing errors: pileup consensus still recovers the exact
    locus sequence (fermi-lite's BFC-correction analog)."""
    rng = random.Random(99)
    g = simdata.make_genome(rng, 400)

    def noisy(seq):
        s = list(seq)
        for i in range(len(s)):
            if rng.random() < 0.01:
                s[i] = rng.choice([b for b in 'ACGT' if b != s[i]])
        return ''.join(s)

    reads = [noisy(g[s:s + 100]) for s in range(0, 301, 4)]
    contigs = list(native.assemble(reads, min_overlap=45))
    best = max(contigs, key=len)
    assert best == g or dna.revcom(best) == g


def test_spectral_correction_repairs_errors_conservatively():
    """BFC-analog spectral correction: repairs isolated substitution errors
    against the partition k-mer spectrum without ever miscorrecting a base
    that agrees with the truth (anchored runs + unique-repair rule)."""
    import random
    from kevlar_tpu import native
    if not native.available():
        import pytest
        pytest.skip('native library unavailable')

    rng = random.Random(5)
    genome = ''.join(rng.choice('ACGT') for _ in range(600))
    reads, truth = [], []
    for i in range(0, len(genome) - 100, 5):
        r = list(genome[i:i + 100])
        truth.append(''.join(r))
        for p in range(len(r)):
            if rng.random() < 0.01:
                r[p] = rng.choice([b for b in 'ACGT' if b != r[p]])
        reads.append(''.join(r))
    before = sum(a != b for r, t in zip(reads, truth) for a, b in zip(r, t))
    corrected = native.correct(reads)
    after = sum(a != b for r, t in zip(corrected, truth)
                for a, b in zip(r, t))
    miscorrections = sum(
        1 for r, c, t in zip(reads, corrected, truth)
        for a, b, g in zip(r, c, t) if a == g and b != g)
    assert miscorrections == 0
    assert after < before * 0.25

    # error-free input is untouched
    assert native.correct(truth) == truth
