"""Large simulated-trio workflow benchmark + accuracy check.

Simulates a genome (default 1 Mb), a trio with inherited and de novo
variants (gentrio: SNVs + indels), error-bearing reads at the requested
coverage, then runs the full mark-I workflow driver and scores the PASS
calls against the truth VCF.  Prints one JSON summary line.

Usage:
    KEVLAR_PLATFORM=cpu python tools/sim_trio_bench.py \
        [--genome-size 1000000] [--coverage 25] [--error 0.005] \
        [--threads 4] [--workdir DIR]

(Defaults reproduce the round-1 STATUS.md measurement.)
"""

import argparse
import json
import os
import random
import sys
import time


def simulate_reads(fasta, out_fq, coverage, readlen, error, rng):
    seqs = []
    seq = ''
    with open(fasta) as fh:
        for line in fh:
            if line.startswith('>'):
                if seq:
                    seqs.append(seq)
                seq = ''
            else:
                seq += line.strip()
    if seq:
        seqs.append(seq)
    bases = 'ACGT'
    n = 0
    with open(out_fq, 'w') as out:
        for seq in seqs:  # one haplotype per record
            nreads = len(seq) * coverage // (2 * readlen)
            for _ in range(nreads):
                start = rng.randrange(len(seq) - readlen)
                read = list(seq[start:start + readlen])
                for p in range(readlen):
                    if rng.random() < error:
                        read[p] = rng.choice(
                            [b for b in bases if b != read[p]])
                n += 1
                out.write('@r{}\n{}\n+\n{}\n'.format(
                    n, ''.join(read), 'I' * readlen))
    return n


def denovo_truth(truthvcf):
    """(pos, refr, alt) of rows with de novo genotypes (child het,
    parents hom-ref)."""
    rows = []
    with open(truthvcf) as fh:
        for line in fh:
            if line.startswith('#'):
                continue
            f = line.split('\t')
            gt = f[7] if len(f) < 10 else f[7]
            if 'GT=' in line:
                gtfield = [x for x in f[7].split(';')
                           if x.startswith('GT=')][0][3:]
            else:
                gtfield = ','.join(f[9:12])
            gts = gtfield.replace('|', '/').split(',')
            child, par = gts[0], gts[1:]
            if sorted(child.split('/')) != ['0', '1']:
                continue
            if any(p != '0/0' for p in par):
                continue
            rows.append((int(f[1]) - 1, f[3], f[4]))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--genome-size', type=int, default=1_000_000)
    ap.add_argument('--coverage', type=int, default=25)
    ap.add_argument('--error', type=float, default=0.005)
    ap.add_argument('--readlen', type=int, default=150)
    ap.add_argument('--inherited', type=int, default=10)
    ap.add_argument('--denovo', type=int, default=11)
    ap.add_argument('--seed', type=int, default=20260818)
    ap.add_argument('--threads', type=int, default=4)
    ap.add_argument('--workdir', default=None)
    args = ap.parse_args()

    import tempfile
    workdir = args.workdir or tempfile.mkdtemp(prefix='kevlar_trio_')
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)
    print('# workdir:', workdir, file=sys.stderr)

    rng = random.Random(args.seed)
    t_all = time.time()

    # 1. genome + trio
    with open('genome.fa', 'w') as fh:
        fh.write('>chr1\n')
        g = ''.join(rng.choice('ACGT') for _ in range(args.genome_size))
        for i in range(0, len(g), 80):
            fh.write(g[i:i + 80] + '\n')
    import kevlar_tpu.cli as cli
    import kevlar_tpu.gentrio as gentrio_mod
    gargs = cli.parse_args([
        'gentrio', '--vcf', 'truth.vcf', '--prefix', 'trio',
        '--inherited', str(args.inherited), '--de-novo', str(args.denovo),
        '--seed', str(args.seed), 'genome.fa'])
    gentrio_mod.main(gargs)

    # 2. reads
    for who in ('proband', 'mother', 'father'):
        nr = simulate_reads('trio-{}.fasta'.format(who), who + '.fq',
                            args.coverage, args.readlen, args.error, rng)
        print('# {}: {} reads'.format(who, nr), file=sys.stderr)

    # 3. workflow
    config = {
        'ksize': 31,
        'outdir': 'out',
        'reference': {'fasta': 'genome.fa'},
        'case': {'fastx': ['proband.fq'], 'label': 'Proband',
                 'memory': '100M', 'max_fpr': 0.6},
        'controls': [
            {'fastx': ['mother.fq'], 'label': 'Mother', 'memory': '100M',
             'max_fpr': 0.2},
            {'fastx': ['father.fq'], 'label': 'Father', 'memory': '100M',
             'max_fpr': 0.2},
        ],
        'mask': {'memory': '50M', 'max_fpr': 0.01},
        'novel': {'case_min': 5, 'ctrl_max': 1},
        'localize': {'seed_size': 51, 'delta': 50},
        'simlike': {'mu': args.coverage, 'sigma': args.coverage * 0.3,
                    'epsilon': 0.001},
        'threads': args.threads,
    }
    from kevlar_tpu.workflow import run_mark1
    t0 = time.time()
    finalvcf = run_mark1(config)
    wall = time.time() - t0

    # 4. score against truth
    truth = denovo_truth('truth.vcf')
    import kevlar_tpu
    calls = []
    with kevlar_tpu.open(finalvcf, 'r') as fh:
        for line in fh:
            if line.startswith('#'):
                continue
            f = line.split('\t')
            if f[6] != 'PASS':
                continue
            calls.append((int(f[1]) - 1, f[3], f[4]))
    found = 0
    for pos, ref, alt in truth:
        hit = any(abs(cp - pos) <= 10 and
                  (len(cr) - len(ca)) == (len(ref) - len(alt))
                  for cp, cr, ca in calls)
        found += bool(hit)
    fps = 0
    for cp, cr, ca in calls:
        hit = any(abs(cp - pos) <= 10 and
                  (len(cr) - len(ca)) == (len(ref) - len(alt))
                  for pos, ref, alt in truth)
        fps += not hit
    from kevlar_tpu.workflow import run_mark1 as _rm
    stages = dict(getattr(_rm, 'last_stage_times', []) or [])
    print(json.dumps({
        'metric': 'trio_workflow',
        'stage_wall_s': stages,
        'genome_size': args.genome_size,
        'coverage': args.coverage,
        'error_rate': args.error,
        'denovo_found': found,
        'denovo_total': len(truth),
        'false_positives': fps,
        'workflow_wall_s': round(wall, 1),
        'total_wall_s': round(time.time() - t_all, 1),
    }))


if __name__ == '__main__':
    main()
