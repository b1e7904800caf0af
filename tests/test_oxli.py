"""khmer/oxli compatibility engine: bit-exact interop with the reference.

The strongest pin is byte-exact reproduction of a khmer output file the
reference's own suite pins: its test_dist.py asserts that a masked count
of minitrio/trio-proband.fq.gz equals the checked-in
trio-proband-mask-counts.ct via filecmp — we assert the same, from our
own engine.
"""

import filecmp
import os

import numpy as np
import pytest

from kevlar_tpu import oxli
from kevlar_tpu import sketch as sketch_mod

DATA = '/root/reference/kevlar/tests/data/'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason='reference test data not mounted')


def data_file(name):
    return os.path.join(DATA, name)


def test_primes_match_khmer_sizing():
    # stored table sizes in the reference's data files
    assert oxli.primes_below(1e4, 4) == [9973, 9967, 9949, 9941]
    assert oxli.primes_below(500, 4) == [499, 491, 487, 479]
    assert oxli.primes_below(1e6, 4) == [999983, 999979, 999961, 999959]


def test_hash_strand_neutral():
    from kevlar_tpu.dna import revcom
    for kmer in ('GATTACA' * 3 + 'GATTACAGATT'[:4],
                 'ACGTACGTACGTACGTACGTACGTACGTACG'):
        assert oxli.hash_kmer(kmer) == oxli.hash_kmer(revcom(kmer))


def test_load_counttable_metadata():
    ct = oxli.OxliSketch.load(data_file('case-low-abund/kid.ct'))
    assert ct.ksize() == 49
    assert ct.hashsizes() == [499, 491, 487, 479]
    assert ct.n_occupied() == 204
    assert ct.counter_bits == 8


@pytest.mark.parametrize('path', [
    'minitrio/mask.nt',
    'minitrio/trio-proband-mask-counts.ct',
    'case-low-abund/kid.ct',
    'case-low-abund/refr.sct',
    'ctrl-high-abund/cc57120.kid.sct',
])
def test_save_roundtrip_byte_identical(path, tmp_path):
    """Loading a khmer file and re-saving reproduces it byte for byte
    (validates reader AND writer against khmer's own output)."""
    sk = oxli.OxliSketch.load(data_file(path))
    out = str(tmp_path / os.path.basename(path))
    sk.save(out)
    assert filecmp.cmp(data_file(path), out, shallow=False)


def test_masked_count_byte_exact(tmp_path):
    """Masked count of trio-proband.fq.gz reproduces the reference's
    pinned counttable byte-for-byte (reference test_dist.py:25-33: same
    tables, same hash placement, same file bytes)."""
    mask = oxli.OxliSketch.load(data_file('minitrio/mask.nt'))
    counts = oxli.OxliSketch(31, 1e4, 4)
    counts.consume_seqfile(data_file('minitrio/trio-proband.fq.gz'),
                           mask=mask, threshold=1, consume_masked=True)
    out = str(tmp_path / 'masked.ct')
    counts.save(out)
    assert filecmp.cmp(data_file('minitrio/trio-proband-mask-counts.ct'),
                       out, shallow=False)


def test_abundance_distribution_pinned():
    """Second dist pass over the pinned counttable yields the reference's
    pinned abundance histogram (reference test_dist.py:36-42)."""
    counts = oxli.OxliSketch.load(
        data_file('minitrio/trio-proband-mask-counts.ct'))
    tracking = oxli.OxliSketch(31, counts.hashsizes(), counter_bits=1)
    hist = counts.abundance_distribution(
        data_file('minitrio/trio-proband.fq.gz'), tracking)
    expected = {10: 6, 11: 10, 12: 12, 13: 18, 14: 16, 15: 11, 16: 9,
                17: 9, 18: 11, 19: 8, 20: 9, 21: 7, 22: 3}
    observed = {i: int(n) for i, n in enumerate(hist) if i > 0 and n > 0}
    assert observed == expected


def test_sketch_load_autodetects_khmer_format():
    sk = sketch_mod.load(data_file('case-low-abund/refr.sct'))
    assert isinstance(sk, oxli.OxliSketch)
    assert sk.counter_bits == 4
    assert sk.ksize() == 49
    fpr = sketch_mod.estimate_fpr(sk)
    assert 0.0 <= fpr < 1.0


def test_get_kmer_counts_matches_get():
    ct = oxli.OxliSketch(27, 1e4, 4)
    seq = 'TTAACCGGTTAACCGGTTAACCGGTTAACCGGTTAACC'
    ct.consume(seq)
    counts = ct.get_kmer_counts(seq)
    assert counts == [ct.get(kmer) for kmer in ct.get_kmers(seq)]
    assert all(c >= 1 for c in counts)
