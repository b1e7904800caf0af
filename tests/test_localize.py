"""Seed-index localization: exact matching, clustering, cutouts."""

import random

import pytest

import kevlar_tpu
from kevlar_tpu import localize as localize_mod
from kevlar_tpu.reference import SeedIndex, ReferenceCutout
from kevlar_tpu.sequence import Record

from . import simdata


@pytest.fixture(scope='module')
def genome():
    rng = random.Random(1717)
    return simdata.make_genome(rng, 8000)


def test_seed_index_exact_matches(genome):
    index = SeedIndex({'chr1': genome}, seedsize=51)
    seed = kevlar_tpu.revcommin(genome[1000:1051])
    matches = index.lookup({seed})
    assert matches[seed] == {('chr1', 1000)}
    # reverse-complement form matches the same position
    rcseed = kevlar_tpu.revcommin(kevlar_tpu.dna.revcom(genome[1000:1051]))
    assert rcseed == seed


def test_seed_index_no_match_for_novel(genome):
    index = SeedIndex({'chr1': genome}, seedsize=51)
    alien = kevlar_tpu.revcommin('TGCA' * 13)[:51]
    # k-mer not in the genome: no hits (or, astronomically unlikely, a hit)
    assert index.lookup({alien}) == {}


def test_seed_index_multicopy(genome):
    dup = genome[:3000] + genome[500:560] + genome[3000:]
    index = SeedIndex({'chr1': dup}, seedsize=51)
    seed = kevlar_tpu.revcommin(dup[505:556])
    matches = index.lookup({seed})
    assert len(matches[seed]) == 2


def test_localize_produces_cutout(genome, tmp_path):
    refrfile = str(tmp_path / 'refr.fa')
    simdata.write_fasta({'chr1': genome}, refrfile)
    contig = Record(name='contig1', sequence=genome[2000:2300])
    stream = [('1', [contig])]
    results = list(localize_mod.localize(stream, refrfile, seedsize=51,
                                         delta=50))
    assert len(results) == 1
    partid, gdna = results[0]
    assert partid == '1'
    seqid, start, end = gdna.interval
    assert seqid == 'chr1'
    assert start == 2000 - 50
    assert end == 2300 + 50
    assert gdna.sequence == genome[start:end]


def test_localize_cluster_split(genome, tmp_path):
    """Seeds matching two distant loci produce two cutouts."""
    refrfile = str(tmp_path / 'refr.fa')
    simdata.write_fasta({'chr1': genome}, refrfile)
    chimera = genome[1000:1100] + genome[6000:6100]
    contig = Record(name='contig1', sequence=chimera)
    results = list(localize_mod.localize([('1', [contig])], refrfile,
                                         seedsize=51, delta=10, maxdiff=500))
    assert len(results) == 2
    intervals = sorted(g.interval for _, g in results)
    assert intervals[0][1] == 990
    assert intervals[1][1] >= 5990 - 10


def test_localize_include_exclude(genome, tmp_path):
    refrfile = str(tmp_path / 'refr.fa')
    simdata.write_fasta({'chr1': genome, 'chrDecoy': genome}, refrfile)
    contig = Record(name='contig1', sequence=genome[2000:2300])
    results = list(localize_mod.localize(
        [('1', [contig])], refrfile, seedsize=51, exclpattern='Decoy'))
    assert {g.interval[0] for _, g in results} == {'chr1'}
    results = list(localize_mod.localize(
        [('1', [contig])], refrfile, seedsize=51, inclpattern='Decoy'))
    assert {g.interval[0] for _, g in results} == {'chrDecoy'}


def test_cutout_defline_roundtrip():
    cut = ReferenceCutout('chr7_1000-1500', 'A' * 500)
    assert cut.interval == ('chr7', 1000, 1500)
    assert cut.local_to_global(42) == 1042
    assert len(cut) == 500


def test_seed_index_device_backends_match_host(genome):
    """The device and mesh-sharded binary searches return exactly the host
    backend's matches (exact verification is shared, so this pins the
    search itself)."""
    # two chromosomes, a duplicated segment, and revcom + absent queries
    dup = genome[:3000] + genome[500:560] + genome[3000:]
    refrseqs = {'chr1': dup, 'chr2': kevlar_tpu.dna.revcom(genome[:4000])}
    seeds = set()
    rng = random.Random(99)
    for _ in range(40):
        pos = rng.randrange(0, len(dup) - 51)
        seeds.add(kevlar_tpu.revcommin(dup[pos:pos + 51]))
    for _ in range(10):
        pos = rng.randrange(0, 4000 - 51)
        seeds.add(kevlar_tpu.revcommin(
            kevlar_tpu.dna.revcom(genome[:4000])[pos:pos + 51]))
    seeds.add(kevlar_tpu.revcommin('TGCA' * 13)[:51])  # absent
    seeds.add(kevlar_tpu.revcommin(dup[505:556]))      # multicopy

    expected = SeedIndex(refrseqs, 51, backend='host').lookup(seeds)
    for backend in ('device', 'sharded'):
        got = SeedIndex(refrseqs, 51, backend=backend).lookup(seeds)
        assert got == expected, backend
    assert any(len(v) == 2 for v in expected.values())


def test_seed_index_backend_env_override(genome, monkeypatch):
    monkeypatch.setenv('KEVLAR_SEED_BACKEND', 'device')
    index = SeedIndex({'chr1': genome}, seedsize=51)
    assert index.backend == 'device'
    seed = kevlar_tpu.revcommin(genome[1000:1051])
    assert index.lookup({seed})[seed] == {('chr1', 1000)}
    monkeypatch.setenv('KEVLAR_SEED_BACKEND', 'bogus')
    with pytest.raises(ValueError):
        SeedIndex({'chr1': genome}, seedsize=51)


def test_seed_index_persists_and_reloads(tmp_path):
    """autoindex saves the sorted key arrays next to the FASTA (the
    reference's bwa-index analog) and later calls load them; lookups are
    identical either way, and a stale index rebuilds."""
    import os
    import time
    import numpy as np
    import random
    from kevlar_tpu import reference as refmod
    from kevlar_tpu import dna
    from . import simdata

    rng = random.Random(17)
    genome = simdata.make_genome(rng, 5000)
    fasta = tmp_path / 'g.fa'
    fasta.write_text('>chr9\n' + genome + '\n')

    refmod._index_cache.clear()
    idx1 = refmod.autoindex(str(fasta), 51)
    idxfile = refmod.index_path(str(fasta), 51)
    assert os.path.exists(idxfile)

    seeds = {dna.revcommin(genome[100:151]), dna.revcommin(genome[901:952])}
    want = idx1.lookup(seeds)
    assert all(len(v) >= 1 for v in want.values())

    refmod._index_cache.clear()
    idx2 = refmod.autoindex(str(fasta), 51)   # loads from disk
    assert np.array_equal(idx1._keys, idx2._keys)
    assert idx2.lookup(seeds) == want

    # stale index (fasta newer) rebuilds without error
    refmod._index_cache.clear()
    now = time.time()
    os.utime(str(fasta), (now + 10, now + 10))
    idx3 = refmod.autoindex(str(fasta), 51)
    assert idx3.lookup(seeds) == want


def test_seed_codes_stream_matches_generic_path():
    """The 1-D L>4096 fast path (_seed_codes_stream) must produce the
    exact codes/valid-mask of the generic pack loop — the localizer's
    genome-side keys and the query-side generic keys must never diverge
    (ADVICE r4: previously asserted only in a comment)."""
    import numpy as np
    from kevlar_tpu import dna
    rng = np.random.default_rng(20260821)
    L = 5000  # above the 4096 fast-path threshold
    seq = rng.integers(0, 4, size=L).astype(np.uint8)
    # sprinkle N-runs (code 4) to exercise the invalid mask
    for start in (0, 137, 2048, 4090, L - 20):
        seq[start:start + rng.integers(1, 8)] = 4
    for seedsize in (17, 31, 51, 64, 128):
        fast_codes, fast_valid = dna.seed_codes(seq, seedsize)
        slow_codes, slow_valid = dna.seed_codes(seq[None, :], seedsize)
        assert np.array_equal(fast_valid, slow_valid[0])
        assert np.array_equal(fast_codes[fast_valid],
                              slow_codes[0][slow_valid[0]])
