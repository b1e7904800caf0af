"""The unfused scatter/gather path: novel -> filter -> partition -> split ->
assemble -> localize -> call -> varfilter, all through the CLI (the
Snakemake-mark-I shape, without alac)."""

import os
import random

import pytest

import kevlar_tpu
from kevlar_tpu.cli import parse_args, mains

from . import simdata

K = 21


@pytest.mark.slow
def test_unfused_cli_chain(tmp_path):
    d = str(tmp_path)
    rng = random.Random(31415)
    genome = simdata.make_genome(rng, 4000)
    snvpos = 2000
    child_genome, ref, alt = simdata.apply_snv(genome, snvpos, rng=rng)
    childfq = os.path.join(d, 'child.fq')
    momfq = os.path.join(d, 'mom.fq')
    refrfa = os.path.join(d, 'refr.fa')
    simdata.write_fastq(simdata.tiled_reads(child_genome, 100, 8, 'c'),
                        childfq)
    simdata.write_fastq(simdata.tiled_reads(genome, 100, 8, 'm'), momfq)
    simdata.write_fasta({'chr1': genome}, refrfa)

    novelf = os.path.join(d, 'novel.augfastq')
    mains()['novel'](parse_args([
        'novel', '-k', str(K), '-M', '4M', '--case', childfq,
        '--control', momfq, '--case-min', '6', '--ctrl-max', '0',
        '-o', novelf]))

    filtf = os.path.join(d, 'filtered.augfastq')
    mains()['filter'](parse_args(['filter', novelf, '-o', filtf]))

    partf = os.path.join(d, 'part.augfastq')
    mains()['partition'](parse_args(['partition', '-o', partf, filtf]))

    # scatter into 2 shards
    base = os.path.join(d, 'shard')
    mains()['split'](parse_args(['split', partf, '2', base]))
    shard0 = base + '.0.augfastx'
    assert os.path.exists(shard0)

    contigf = os.path.join(d, 'contigs.augfasta')
    mains()['assemble'](parse_args(['assemble', shard0, '-o', contigf]))

    gdnaf = os.path.join(d, 'gdna.fa')
    mains()['localize'](parse_args([
        'localize', '-z', '31', '-d', '25', '-o', gdnaf, refrfa, contigf]))
    gdna_text = open(gdnaf).read()
    assert 'chr1_' in gdna_text and 'kvcc=1' in gdna_text

    callf = os.path.join(d, 'calls.vcf')
    mains()['call'](parse_args([
        'call', '-k', str(K), '-o', callf, contigf, gdnaf]))
    lines = [ln for ln in open(callf) if not ln.startswith('#')]
    assert any(ln.split('\t')[1] == str(snvpos + 1) and
               ln.split('\t')[3] == ref and ln.split('\t')[4] == alt
               for ln in lines), lines

    # varfilter: mask out the variant region -> UserFilter
    bedf = os.path.join(d, 'mask.bed')
    with open(bedf, 'w') as fh:
        fh.write('chr1\t{}\t{}\n'.format(snvpos - 10, snvpos + 10))
    vff = os.path.join(d, 'calls.filtered.vcf')
    mains()['varfilter'](parse_args(['varfilter', '-o', vff, bedf, callf]))
    vlines = [ln for ln in open(vff) if not ln.startswith('#')]
    flagged = [ln for ln in vlines if ln.split('\t')[1] == str(snvpos + 1)]
    assert flagged and 'UserFilter' in flagged[0]
