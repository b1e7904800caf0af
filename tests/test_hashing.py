"""Canonical k-mer hashing: numpy/jax parity and canonicality invariants."""

import numpy as np
import pytest

from kevlar_tpu import dna


def random_seq(rng, length, alphabet='ACGT'):
    return ''.join(rng.choice(list(alphabet)) for _ in range(length))


def test_encode_decode_roundtrip():
    seq = 'ACGTNacgtX'
    codes = dna.encode(seq)
    assert list(codes) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
    assert dna.decode(codes) == 'ACGTNACGTN'


def test_revcom():
    assert dna.revcom('ACGT') == 'ACGT'
    assert dna.revcom('AACC') == 'GGTT'
    assert dna.revcom('ACGTN') == 'NACGT'


def test_revcommin():
    assert dna.revcommin('AACC') == 'AACC'
    assert dna.revcommin('GGTT') == 'AACC'


@pytest.mark.parametrize('ksize', [5, 16, 17, 21, 31, 32])
def test_canonical_invariant(ksize):
    """hash(kmer) == hash(revcom(kmer)) — the khmer contract the reference
    asserts (tests/test_novel.py in the reference repo)."""
    import random
    rng = random.Random(42 + ksize)
    for _ in range(50):
        kmer = random_seq(rng, ksize)
        h_fwd = dna.hash_kmer(kmer)
        h_rev = dna.hash_kmer(dna.revcom(kmer))
        assert h_fwd == h_rev


@pytest.mark.parametrize('ksize', [5, 16, 21, 31])
def test_window_hashes_match_single_kmer_hash(ksize):
    import random
    rng = random.Random(7 + ksize)
    seq = random_seq(rng, 80)
    h1, h2, valid = dna.kmer_hashes(dna.encode(seq), ksize)
    assert valid.all()
    for i in range(len(seq) - ksize + 1):
        kmer = seq[i:i + ksize]
        assert (int(h1[i]), int(h2[i])) == dna.hash_kmer(kmer)


def test_invalid_bases_masked():
    ksize = 5
    seq = 'ACGTACGNTACGTACG'
    h1, h2, valid = dna.kmer_hashes(dna.encode(seq), ksize)
    n_pos = len(seq) - ksize + 1
    for i in range(n_pos):
        window = seq[i:i + ksize]
        assert valid[i] == ('N' not in window)


def test_short_sequence_no_windows():
    h1, h2, valid = dna.kmer_hashes(dna.encode('ACG'), 5)
    assert valid.shape == (0,)


@pytest.mark.parametrize('ksize', [5, 16, 17, 31, 32])
def test_numpy_jax_parity(ksize):
    import jax.numpy as jnp
    from kevlar_tpu.ops import hashing as jhash
    import random
    rng = random.Random(1 + ksize)
    seqs = [random_seq(rng, 64, 'ACGTN') for _ in range(8)]
    bases, _ = dna.encode_batch(seqs)
    nh1, nh2, nvalid = dna.kmer_hashes(bases, ksize)
    jh1, jh2, jvalid = jhash.kmer_hashes(jnp.asarray(bases), ksize)
    np.testing.assert_array_equal(nh1, np.asarray(jh1))
    np.testing.assert_array_equal(nh2, np.asarray(jh2))
    np.testing.assert_array_equal(nvalid, np.asarray(jvalid))


def test_hash_distribution_rough_uniformity():
    """Sanity: band assignment splits k-mers roughly evenly."""
    import random
    rng = random.Random(99)
    seq = random_seq(rng, 20000)
    h1, h2, valid = dna.kmer_hashes(dna.encode(seq), 31)
    bands = np.asarray(h1) & 3
    counts = np.bincount(bands, minlength=4)
    assert counts.min() > 0.8 * counts.mean()


def test_seed_codes_canonical_and_exact():
    import random
    rng = random.Random(5)
    seq = random_seq(rng, 200)
    seedsize = 51
    codes, valid = dna.seed_codes(dna.encode(seq), seedsize)
    assert valid.all()
    rc = dna.revcom(seq)
    rc_codes, _ = dna.seed_codes(dna.encode(rc), seedsize)
    # seed p of seq == seed (L - seedsize - p) of revcom(seq)
    P = len(seq) - seedsize + 1
    for p in range(0, P, 13):
        np.testing.assert_array_equal(codes[p], rc_codes[P - 1 - p])
    # distinct seeds get distinct codes (exact packing)
    uniq = {tuple(c) for c in codes}
    strs = {dna.revcommin(seq[i:i + seedsize]) for i in range(P)}
    assert len(uniq) == len(strs)


def test_long_k_hash_parity_and_canonicality():
    """k > 32 (the reference recommends 45-55 for repeats) hashes via the
    polynomial path: numpy and jax identical, strand-neutral, and
    collision-free on random data."""
    import numpy as np
    import jax.numpy as jnp
    from kevlar_tpu import dna
    from kevlar_tpu.ops import hashing

    rng = np.random.default_rng(5)
    for k in (35, 45, 55):
        bases = rng.integers(0, 4, size=(32, 120)).astype(np.uint8)
        bases[3, 10] = 4  # one invalid base
        h1n, h2n, vn = dna.kmer_hashes(bases, k)
        h1j, h2j, vj = hashing.kmer_hashes(jnp.asarray(bases), k)
        assert np.array_equal(h1n, np.asarray(h1j))
        assert np.array_equal(h2n, np.asarray(h2j))
        assert np.array_equal(vn, np.asarray(vj))
        rc = np.where(bases[:, ::-1] >= 4, np.uint8(4),
                      (3 - bases[:, ::-1]).astype(np.uint8))
        h1r, h2r, vr = dna.kmer_hashes(rc, k)
        assert np.array_equal(np.where(vn, h1n, 0),
                              np.where(vr[:, ::-1], h1r[:, ::-1], 0))
        flat = (h1n.astype(np.uint64) << np.uint64(32)) | \
            h2n.astype(np.uint64)
        assert len(np.unique(flat[vn])) == int(vn.sum())


def test_long_k_novel_screen():
    """End-to-end novel screen at k=45 finds exactly the variant-spanning
    k-mers of a de novo SNV."""
    import random
    import numpy as np
    from kevlar_tpu import dna
    from kevlar_tpu import novel as novel_mod
    from kevlar_tpu.batch import batches_from_records
    from kevlar_tpu.sequence import Record
    from kevlar_tpu.sketch import Sketch

    K = 45
    rng = random.Random(9)
    genome = ''.join(rng.choice('ACGT') for _ in range(5000))
    child = genome[:2500] + ('A' if genome[2500] != 'A' else 'C') + \
        genome[2501:]

    def reads_of(seq):
        return [Record(name='r%d' % i, sequence=seq[s:s + 100])
                for i, s in enumerate(range(0, len(seq) - 100, 7))]

    def consume(sk, recs):
        for b in batches_from_records(iter(recs)):
            h1, h2, valid = dna.kmer_hashes(b.bases, K)
            sk._host_consume_hashes(h1, h2, valid)

    case_sk = Sketch(K, 100000, 4, backend='host')
    ctrl_sk = Sketch(K, 100000, 4, backend='host')
    consume(case_sk, reads_of(child))
    consume(ctrl_sk, reads_of(genome))
    hits = list(novel_mod.novel(iter(reads_of(child)), [case_sk], [ctrl_sk],
                                ksize=K, casemin=6, ctrlmax=0))
    kmers = {kmer.offset for r in hits for kmer in r.annotations}
    uniq = {r.ikmerseq(kmer) for r in hits for kmer in r.annotations}
    assert hits
    assert len(uniq) == K  # exactly the K windows spanning the SNV
