"""Full workflow driver: config-driven trio pipeline end to end."""

import json
import random

import pytest

import kevlar_tpu
from kevlar_tpu.workflow import run_mark1
from kevlar_tpu import vcf as vcf_mod

from . import simdata


@pytest.mark.slow
def test_mark1_workflow(tmp_path):
    rng = random.Random(31337)
    genome = simdata.make_genome(rng, 6000)
    snvpos = 2500
    child, ref, alt = simdata.apply_snv(genome, snvpos, rng=rng)

    refrfile = str(tmp_path / 'refr.fa')
    simdata.write_fasta({'chr1': genome}, refrfile)
    childfq = str(tmp_path / 'child.fq')
    momfq = str(tmp_path / 'mom.fq')
    dadfq = str(tmp_path / 'dad.fq')
    # het proband: half the reads carry the variant
    simdata.write_fastq(
        simdata.tiled_reads(child, 100, 10, 'childA') +
        simdata.tiled_reads(genome, 100, 10, 'childB'), childfq)
    simdata.write_fastq(simdata.tiled_reads(genome, 100, 5, 'mom'), momfq)
    simdata.write_fastq(simdata.tiled_reads(genome, 100, 5, 'dad'), dadfq)

    config = {
        'ksize': 21,
        'outdir': str(tmp_path / 'out'),
        'reference': {'fasta': refrfile},
        'case': {'fastx': [childfq], 'label': 'Kid', 'memory': '8M',
                 'max_fpr': 0.6},
        'controls': [
            {'fastx': [momfq], 'label': 'Mom', 'memory': '8M',
             'max_fpr': 0.5},
            {'fastx': [dadfq], 'label': 'Dad', 'memory': '8M',
             'max_fpr': 0.5},
        ],
        'mask': {'memory': '8M', 'max_fpr': 0.9},
        'novel': {'case_min': 6, 'ctrl_max': 1},
        'simlike': {'mu': 10.0, 'sigma': 3.0},
    }
    final = run_mark1(config)

    calls = list(vcf_mod.vcfstream([final]))
    passing = [c for c in calls if c.filterstr == 'PASS']
    assert len(passing) == 1
    c = passing[0]
    assert (c.seqid, c.position) == ('chr1', snvpos)
    assert c._refr == ref and c._alt == alt
    assert float(str(c.attribute('LIKESCORE'))) > 0
    assert c.format('Kid', 'ALTABUND') is not None
    # checkpoint artifacts exist
    import os
    for artifact in ('mask.nt', 'refr.sct', 'case.ct', 'novel.augfastq.gz',
                     'partitioned.augfastq.gz', 'calls.prelim.vcf',
                     'calls.scored.sorted.vcf.gz'):
        assert os.path.exists(os.path.join(config['outdir'], artifact))
    # per-stage wall deltas recorded for benchmarking
    stages = dict(run_mark1.last_stage_times)
    assert 'novel k-mer screen' in stages
    assert all(t >= 0 for t in stages.values())


@pytest.mark.slow
def test_mark1_workflow_profile_trace(tmp_path):
    """'profile' config key: per-stage jax.profiler spans land in a trace
    directory (SURVEY §5 tracing subsystem)."""
    import os
    rng = random.Random(404)
    genome = simdata.make_genome(rng, 3000)
    child, _, _ = simdata.apply_snv(genome, 1500, rng=rng)
    refrfile = str(tmp_path / 'refr.fa')
    simdata.write_fasta({'chr1': genome}, refrfile)
    childfq = str(tmp_path / 'child.fq')
    momfq = str(tmp_path / 'mom.fq')
    dadfq = str(tmp_path / 'dad.fq')
    simdata.write_fastq(simdata.tiled_reads(child, 100, 8, 'kid'), childfq)
    simdata.write_fastq(simdata.tiled_reads(genome, 100, 8, 'mom'), momfq)
    simdata.write_fastq(simdata.tiled_reads(genome, 100, 8, 'dad'), dadfq)
    tracedir = str(tmp_path / 'trace')
    config = {
        'ksize': 21,
        'outdir': str(tmp_path / 'out'),
        'profile': tracedir,
        'reference': {'fasta': refrfile},
        'case': {'fastx': [childfq], 'label': 'Kid', 'memory': '8M',
                 'max_fpr': 0.9},
        'controls': [{'fastx': [momfq], 'label': 'Mom', 'memory': '8M',
                      'max_fpr': 0.9},
                     {'fastx': [dadfq], 'label': 'Dad', 'memory': '8M',
                      'max_fpr': 0.9}],
        'mask': {'memory': '8M', 'max_fpr': 0.9},
        'novel': {'case_min': 6, 'ctrl_max': 1},
        'simlike': {'mu': 8.0, 'sigma': 3.0},
    }
    run_mark1(config)
    found = []
    for root, _, files in os.walk(tracedir):
        found.extend(files)
    assert any(f.endswith(('.xplane.pb', '.trace.json.gz', '.json.gz'))
               or 'trace' in f for f in found), found
