"""More CLI-driven stage behaviors: banding, multi-case novel, split files,
save-counts, part-id, simlike fast-mode/outliers."""

import os
import random

import pytest

import kevlar_tpu
from kevlar_tpu.cli import parse_args, mains

from . import simdata

K = 21


@pytest.fixture(scope='module')
def trio_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('cli2')
    rng = random.Random(4321)
    genome = simdata.make_genome(rng, 2000)
    child_genome, ref, alt = simdata.apply_snv(genome, 1000, rng=rng)
    files = {}
    for name, g, step in [('child', child_genome, 8), ('mom', genome, 10),
                          ('dad', genome, 10)]:
        path = str(tmp / (name + '.fq'))
        simdata.write_fastq(simdata.tiled_reads(g, 100, step, name), path)
        files[name] = path
    files['dir'] = str(tmp)
    files['genome'] = genome
    files['child_genome'] = child_genome
    files['snvpos'] = 1000
    return files


def test_count_banded_cli_union(trio_files):
    """Banded counts across all bands sum to the full counts."""
    import numpy as np
    from kevlar_tpu import sketch as sketch_mod
    d = trio_files['dir']
    full_ct = os.path.join(d, 'full.ct')
    args = parse_args(['count', '-k', str(K), '-M', '2M', full_ct,
                       trio_files['child']])
    mains()['count'](args)
    merged = None
    for band in (1, 2):
        path = os.path.join(d, 'band{}.ct'.format(band))
        args = parse_args(['count', '-k', str(K), '-M', '2M',
                           '--num-bands', '2', '--band', str(band),
                           path, trio_files['child']])
        mains()['count'](args)
        t = np.asarray(sketch_mod.load(path).tables).astype(np.int32)
        merged = t if merged is None else merged + t
    full = np.asarray(sketch_mod.load(full_ct).tables)
    np.testing.assert_array_equal(np.minimum(merged, 255).astype('uint8'),
                                  full)


def test_novel_save_counts_and_multicase(trio_files):
    d = trio_files['dir']
    out = os.path.join(d, 'novel_mc.augfastq')
    case_ct = os.path.join(d, 'saved_case.ct')
    ctrl_ct1 = os.path.join(d, 'saved_ctrl1.ct')
    ctrl_ct2 = os.path.join(d, 'saved_ctrl2.ct')
    # two case "samples" (same reads twice) + two controls, computed inline
    # and saved
    args = parse_args([
        'novel', '-k', str(K), '-M', '2M',
        '--case', trio_files['child'], '--case', trio_files['child'],
        '--control', trio_files['mom'], '--control', trio_files['dad'],
        '--save-case-counts', case_ct, os.path.join(d, 'c2.ct'),
        '--save-ctrl-counts', ctrl_ct1, ctrl_ct2,
        '--case-min', '6', '--ctrl-max', '0', '-o', out])
    mains()['novel'](args)
    for path in (case_ct, ctrl_ct1, ctrl_ct2):
        assert os.path.exists(path)
    records = list(kevlar_tpu.parse_augmented_fastx(
        kevlar_tpu.open(out, 'r')))
    assert records
    for rec in records:
        for ik in rec.annotations:
            # abundance tuple: case1, case2, ctrl1, ctrl2
            assert len(ik.abund) == 4
            assert ik.abund[0] >= 6 and ik.abund[1] >= 6
            assert ik.abund[2] == 0 and ik.abund[3] == 0


def test_partition_split_files(trio_files):
    d = trio_files['dir']
    # build a small augfastq via novel
    out = os.path.join(d, 'novel_sp.augfastq')
    args = parse_args([
        'novel', '-k', str(K), '-M', '2M', '--case', trio_files['child'],
        '--control', trio_files['mom'], '--case-min', '6', '--ctrl-max', '0',
        '-o', out])
    mains()['novel'](args)
    prefix = os.path.join(d, 'parts')
    args = parse_args(['partition', '--split', prefix, out])
    mains()['partition'](args)
    files = [f for f in os.listdir(d) if f.startswith('parts.cc')]
    assert files
    recs = list(kevlar_tpu.parse_augmented_fastx(
        kevlar_tpu.open(os.path.join(d, sorted(files)[0]), 'r')))
    assert all('kvcc=1' in r.name for r in recs)


def test_assemble_part_id(trio_files):
    d = trio_files['dir']
    out = os.path.join(d, 'novel_pid.augfastq')
    args = parse_args([
        'novel', '-k', str(K), '-M', '2M', '--case', trio_files['child'],
        '--control', trio_files['mom'], '--case-min', '6', '--ctrl-max', '0',
        '-o', out])
    mains()['novel'](args)
    part = os.path.join(d, 'part_pid.augfastq')
    args = parse_args(['partition', '-o', part, out])
    mains()['partition'](args)
    contigs = os.path.join(d, 'contigs_pid.augfasta')
    args = parse_args(['assemble', '-p', '1', '-o', contigs, part])
    mains()['assemble'](args)
    recs = list(kevlar_tpu.parse_augmented_fastx(
        kevlar_tpu.open(contigs, 'r')))
    assert recs
    assert all('kvcc=1' in r.name for r in recs)
    # the contig spans the SNV
    child = trio_files['child_genome']
    pos = trio_files['snvpos']
    span = child[pos - 5:pos + 5]
    assert any(span in r.sequence or
               span in kevlar_tpu.revcom(r.sequence) for r in recs)


def test_simlike_fast_mode_and_outliers():
    from kevlar_tpu.simlike import simlike
    from kevlar_tpu.sketch import Sketch
    from kevlar_tpu.vcf import Variant, VariantFilter
    rng = random.Random(11)
    genome = simdata.make_genome(rng, 1500)
    child, ref, alt = simdata.apply_snv(genome, 700, rng=rng)
    reads = simdata.tiled_reads(child, 100, 10, 'c')
    case = Sketch(K, 1000003)
    from kevlar_tpu.batch import batches_from_records
    for b in batches_from_records(iter(reads)):
        case.consume_batch(b.bases)
    empty = Sketch(K, 1000003)
    refr = Sketch(K, 1000003, counter_bits=4)
    refr.consume(genome)

    win = child[700 - K + 1:700 + K]
    rwin = genome[700 - K + 1:700 + K]
    # pre-filtered call is skipped entirely in fast mode
    filtered = Variant('chr1', 700, ref, alt, ALTWINDOW=win,
                       REFRWINDOW=rwin, PART='1')
    filtered.filter(VariantFilter.UserFilter)
    out = list(simlike(iter([filtered]), case, [empty, empty], refr,
                       mu=10.0, sigma=3.0, fastmode=True))
    assert out[0].attribute('LIKESCORE') == float('-inf')
    # drop-outliers path executes and still scores
    good = Variant('chr1', 700, ref, alt, ALTWINDOW=win, REFRWINDOW=rwin,
                   PART='2')
    out = list(simlike(iter([good]), case, [empty, empty], refr, mu=10.0,
                       sigma=3.0, dropoutliers=True))
    assert out[0].filterstr == 'PASS'
    assert out[0].attribute('LIKESCORE') > 0


def test_dist_cli(tmp_path, trio_files, capsys):
    """dist CLI: mask of genome k-mers, JSON mu/sigma + TSV output."""
    import json
    from kevlar_tpu.sketch import Sketch
    d = str(tmp_path)
    genome = trio_files['genome']
    mask = Sketch(K, 100003, 4, counter_bits=1)
    mask.consume(genome)
    maskfile = os.path.join(d, 'mask.nt')
    mask.save(maskfile)
    tsv = os.path.join(d, 'dist.tsv')
    args = parse_args(['dist', '-k', str(K), '-M', '4M', '--tsv', tsv,
                       maskfile, trio_files['mom']])
    mains()['dist'](args)
    out = capsys.readouterr().out
    stats = json.loads(out.strip().splitlines()[-1])
    # tiled coverage of mom reads is 10x
    assert 7 < stats['mu'] < 11
    assert os.path.exists(tsv)
    header = open(tsv).readline().split('\t')
    assert header[0] == 'Abundance'


def test_empty_novel_output_pipeline(tmp_path):
    """No novel k-mers (case == control): downstream stages stay clean."""
    rng = random.Random(5150)
    genome = simdata.make_genome(rng, 1500)
    fq = str(tmp_path / 'same.fq')
    simdata.write_fastq(simdata.tiled_reads(genome, 100, 10, 's'), fq)
    out = str(tmp_path / 'novel.augfastq')
    args = parse_args(['novel', '-k', str(K), '-M', '2M', '--case', fq,
                       '--control', fq, '--case-min', '6', '--ctrl-max', '0',
                       '-o', out])
    mains()['novel'](args)
    assert open(out).read() == ''
    part = str(tmp_path / 'part.augfastq')
    mains()['partition'](parse_args(['partition', '-o', part, out]))
    assert open(part).read() == ''


def test_warm_precompiles_pipeline_programs(capsys):
    """`kevlar warm` drives the real stage code over synthetic
    production-shaped inputs so the persistent compile cache gets every
    pipeline program ahead of data."""
    import kevlar_tpu
    import kevlar_tpu.cli as cli
    args = cli.parser().parse_args(
        ['warm', '-k', '21', '-M', '100K', '--readlen', '80',
         '--controls', '1'])
    kevlar_tpu.warm.main(args)
    err = capsys.readouterr().err
    assert 'cache warmed' in err
