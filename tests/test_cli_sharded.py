"""CLI-level mesh sharding: `--shards` on count/novel (SURVEY §7 step 11).

Hash-space sharding supersedes the reference's banding workflow
(docs/banding.rst): instead of N serial passes over the input plus an
unband merge, the sketch is sharded across the mesh's 'shard' axis and
counted/screened in one SPMD pass.  These tests pin CLI-level equivalence:
the sharded stages produce byte-identical artifacts to the unsharded ones.
"""

import random

import numpy as np
import pytest

import kevlar_tpu
from kevlar_tpu import cli

from . import simdata


def _run(arglist, capsys):
    args = cli.parser().parse_args(arglist)
    stage = getattr(kevlar_tpu, arglist[0])
    stage.main(args)
    return capsys.readouterr()


@pytest.fixture(scope='module')
def trio_files(tmp_path_factory):
    root = tmp_path_factory.mktemp('shardedcli')
    rng = random.Random(77)
    genome = simdata.make_genome(rng, 4000)
    alt = list(genome)
    alt[2000] = 'A' if alt[2000] != 'A' else 'C'
    proband_genome = ''.join(alt)
    files = {}
    for name, g, cov in (('proband', proband_genome, 12),
                         ('mother', genome, 12), ('father', genome, 12)):
        reads = simdata.sample_reads(rng, g, readlen=80, coverage=cov)
        path = str(root / (name + '.fq'))
        simdata.write_fastq(reads, path)
        files[name] = path
    return files


def test_count_cli_sharded_equivalence(trio_files, tmp_path, capsys):
    plain = str(tmp_path / 'plain.ct')
    sharded = str(tmp_path / 'sharded.ct')
    _run(['count', '-k', '25', '-M', '400K', plain,
          trio_files['proband']], capsys)
    _run(['count', '-k', '25', '-M', '400K', '--shards', '2', sharded,
          trio_files['proband']], capsys)
    a = np.load(plain)
    b = np.load(sharded)
    assert int(a['tablesize']) == int(b['tablesize'])
    np.testing.assert_array_equal(a['tables'], b['tables'])


def test_count_cli_shards_exclude_banding(trio_files, tmp_path, capsys):
    with pytest.raises(ValueError, match='supersedes banding'):
        _run(['count', '-k', '25', '-M', '400K', '--shards', '2',
              '--num-bands', '2', '--band', '1',
              str(tmp_path / 'x.ct'), trio_files['proband']], capsys)


def test_novel_cli_sharded_equivalence(trio_files, tmp_path, capsys):
    """novel --shards 2 over precomputed counttables: identical augfastq."""
    cts = {}
    for sample in ('proband', 'mother', 'father'):
        cts[sample] = str(tmp_path / (sample + '.ct'))
        _run(['count', '-k', '25', '-M', '400K', cts[sample],
              trio_files[sample]], capsys)
    base_args = ['novel', '-k', '25', '--ctrl-max', '0', '--case-min', '5',
                 '--case', trio_files['proband'],
                 '--case-counts', cts['proband'],
                 '--control-counts', cts['mother'], cts['father']]
    plain_out = str(tmp_path / 'plain.augfastq')
    shard_out = str(tmp_path / 'sharded.augfastq')
    _run(base_args + ['--out', plain_out], capsys)
    _run(base_args + ['--shards', '2', '--out', shard_out], capsys)
    plain_text = open(plain_out).read()
    assert plain_text == open(shard_out).read()
    assert plain_text.strip(), 'screen found nothing - fixture is broken'


def test_novel_cli_sharded_fresh_counting(trio_files, tmp_path, capsys):
    """novel --shards with raw FASTQ inputs (counting inside the stage)."""
    base_args = ['novel', '-k', '25', '-M', '400K',
                 '--ctrl-max', '0', '--case-min', '5',
                 '--case', trio_files['proband'],
                 '--control', trio_files['mother'],
                 '--control', trio_files['father']]
    plain_out = str(tmp_path / 'plain.augfastq')
    shard_out = str(tmp_path / 'sharded.augfastq')
    _run(base_args + ['--out', plain_out], capsys)
    _run(base_args + ['--shards', '2', '--out', shard_out], capsys)
    plain_text = open(plain_out).read()
    assert plain_text == open(shard_out).read()
    assert plain_text.strip()


def test_sharded_point_queries_stay_on_device(trio_files):
    """get/get_kmer_counts on a ShardedSketch run through the device query
    path (no full host gather of the tables) and agree with the host
    mirror (VERDICT round-1 item 9)."""
    from kevlar_tpu.count import load_sample_seqfile
    from kevlar_tpu.parallel import make_mesh
    mesh = make_mesh(n_shard=2)
    sk = load_sample_seqfile([trio_files['proband']], 25, 400000,
                             maxfpr=1.0, mesh=mesh)
    rng = random.Random(5)
    seq = simdata.make_genome(rng, 120)
    sk._invalidate()
    host = [int(c) for c in sk._host_counts(
        *__import__('kevlar_tpu.dna', fromlist=['kmer_hashes']).kmer_hashes(
            __import__('kevlar_tpu.dna', fromlist=['encode']).encode(seq),
            25))]
    sk._invalidate()
    assert sk.get_kmer_counts(seq) == host
    kmer = seq[:25]
    assert sk.get(kmer) == host[0]
    # the device paths must not have materialised the host mirror
    assert getattr(sk, '_host_tables', None) is None
    assert sk.n_occupied() > 0
    assert getattr(sk, '_host_tables', None) is None
