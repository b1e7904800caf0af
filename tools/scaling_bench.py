"""Multi-device scaling measurement for the sharded consume+screen path.

The reference scales with k-mer banding: N serial passes, each counting
1/N of the hash space (/root/reference/docs/banding.rst:4-6), scattered
over processes by Snakemake.  The TPU-native replacement is a hash-sharded
sketch over a ('data', 'shard') mesh; this tool MEASURES that path instead
of just dry-running it:

1. **Shard-axis weak scaling** (1/2/4/8 virtual CPU devices, one process):
   per-shard table size and the read batch stay constant.  The sharded
   design replicates the hash pass per shard (every device screens all
   reads against its own hash range — no all-to-all), so per-device work
   is ~constant and total compute grows with n; on an oversubscribed host
   the n devices' work serializes onto the same cores, so the honest
   proxy metric is ``serialized_efficiency = n * wall_1 / wall_n`` — how
   close the SPMD program comes to n independent single-device runs.  On
   n real chips the same per-device work runs concurrently, so
   1/serialized_efficiency bounds the per-chip wall inflation.
2. **Data-axis scaling at equal total work**: 1 device vs N devices over
   the SAME doubled read batch on this host — isolates the data-parallel
   partitioning overhead from core contention (XLA's CPU backend already
   multithreads a single device across cores, so a throughput "speedup"
   on virtual devices would be meaningless).
3. **Two-process (Gloo) run**: the same shard-axis program with the mesh
   spanning 2 OS processes x 4 devices — the DCN analog of 2 TPU hosts;
   its overhead vs the single-process 8-device run is the cross-host cost.

Writes SCALING.json next to this script.  For real multi-host TPU
hardware, run the same worker under jax.distributed on every host:

    # on every host of a 2-host slice (coordinator = host 0):
    python tools/scaling_bench.py --worker --ndev 0 --n-data 1 --n-shard 8 \
        --distributed COORD_IP:8476 NPROC PID --out host_scaling.json

(--ndev 0 keeps the real backend: no CPU override.)
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

B = 2048          # reads per data-shard
L = 160           # padded read length
READLEN = 150
KSIZE = 31
SHARD_TABLESIZE = 262144   # buckets per shard (constant under weak scaling)
REPS = 8


def worker(ndev, n_data, n_shard, out, distributed=None, bmul=None):
    import jax
    if ndev:
        jax.config.update('jax_platforms', 'cpu')
        jax.config.update('jax_num_cpu_devices', ndev)
    if distributed:
        coord, nproc, pid = distributed
        jax.distributed.initialize(coord, num_processes=int(nproc),
                                   process_id=int(pid))
    import numpy as np
    from kevlar_tpu.parallel import make_mesh, ShardedSketch
    from kevlar_tpu.parallel import sharded_novel_screen

    devices = jax.devices()
    mesh = make_mesh(n_data=n_data, n_shard=n_shard, devices=devices)

    rng = np.random.default_rng(4242)
    nreads = B * (bmul if bmul else n_data)
    bases = rng.integers(0, 4, size=(nreads, L)).astype(np.uint8)
    bases[:, READLEN:] = 4
    lengths = np.full((nreads,), READLEN, dtype=np.int32)

    case = ShardedSketch(mesh, KSIZE, SHARD_TABLESIZE * n_shard)
    mom = ShardedSketch(mesh, KSIZE, SHARD_TABLESIZE * n_shard)
    dad = ShardedSketch(mesh, KSIZE, SHARD_TABLESIZE * n_shard)

    # warm up (compile) both programs
    for sk in (case, mom, dad):
        sk.consume_batch(bases)
    res = sharded_novel_screen(mesh, [case], [mom, dad], bases, lengths,
                               casemin=2, ctrlmax=255)
    np.asarray(res[0])

    t0 = time.time()
    for _ in range(REPS):
        case.consume_batch(bases)
    np.asarray(case.tables.addressable_shards[0].data)  # force the chain
    consume_s = time.time() - t0

    t0 = time.time()
    for _ in range(REPS):
        res = sharded_novel_screen(mesh, [case], [mom, dad], bases, lengths,
                                   casemin=2, ctrlmax=255)
        np.asarray(res[0])
    screen_s = time.time() - t0

    result = {
        'devices': len(devices), 'n_data': n_data, 'n_shard': n_shard,
        'reads_per_rep': nreads, 'reps': REPS,
        'consume_s': round(consume_s, 3), 'screen_s': round(screen_s, 3),
        'consume_reads_per_s': round(nreads * REPS / consume_s),
        'screen_reads_per_s': round(nreads * REPS / screen_s),
    }
    if not distributed or int(distributed[2]) == 0:
        with open(out, 'w') as fh:
            json.dump(result, fh)
    return result


def run_subprocess(ndev, n_data, n_shard, tag, tmpdir, bmul=None):
    out = os.path.join(tmpdir, 'scale_{}.json'.format(tag))
    env = dict(os.environ)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    cmd = [sys.executable, os.path.abspath(__file__), '--worker',
           '--ndev', str(ndev), '--n-data', str(n_data),
           '--n-shard', str(n_shard), '--out', out]
    if bmul:
        cmd += ['--bmul', str(bmul)]
    subprocess.run(cmd, check=True, cwd=REPO, env=env,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(out) as fh:
        return json.load(fh)


def run_gloo(tmpdir):
    """2 processes x 4 devices, shard axis spanning the process boundary."""
    out = os.path.join(tmpdir, 'scale_gloo.json')
    port = '29' + str(500 + os.getpid() % 100)
    env = dict(os.environ)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    procs = []
    for pid in (0, 1):
        cmd = [sys.executable, os.path.abspath(__file__), '--worker',
               '--ndev', '4', '--n-data', '1', '--n-shard', '8',
               '--distributed', 'localhost:' + port, '2', str(pid),
               '--out', out]
        procs.append(subprocess.Popen(
            cmd, cwd=REPO, env=env, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL))
    for p in procs:
        if p.wait(timeout=600) != 0:
            raise RuntimeError('gloo worker failed')
    with open(out) as fh:
        return json.load(fh)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--worker', action='store_true')
    ap.add_argument('--ndev', type=int, default=0)
    ap.add_argument('--n-data', type=int, default=1)
    ap.add_argument('--n-shard', type=int, default=1)
    ap.add_argument('--out', default='scaling_worker.json')
    ap.add_argument('--distributed', nargs=3, default=None,
                    metavar=('COORD', 'NPROC', 'PID'))
    ap.add_argument('--bmul', type=int, default=None,
                    help='batch multiplier override (equal-total-work runs)')
    args = ap.parse_args()
    if args.worker:
        res = worker(args.ndev, args.n_data, args.n_shard, args.out,
                     args.distributed, bmul=args.bmul)
        print(json.dumps(res))
        return

    import tempfile
    tmpdir = tempfile.mkdtemp(prefix='kevlar_scaling_')
    cores = os.cpu_count()
    results = {'host_physical_cores': cores,
               'note': ('CPU-mesh proxy on {} physical cores: virtual '
                        'devices SERIALIZE, so shard-axis rows report '
                        'serialized_efficiency = n*wall_1/wall_n (the SPMD '
                        'program vs n independent single-device runs; on n '
                        'real chips the per-device work runs concurrently '
                        'and 1/serialized_efficiency bounds per-chip wall '
                        'inflation). The data-axis row partitions the SAME '
                        'batch over 1 vs N devices (equal total work). The '
                        'gloo row adds the cross-process (DCN-analog) cost '
                        'at equal device count.').format(cores)}

    print('# shard-axis weak scaling (per-device work constant)',
          file=sys.stderr)
    shard_rows = []
    for n in (1, 2, 4, 8):
        row = run_subprocess(n, 1, n, 'shard{}'.format(n), tmpdir)
        shard_rows.append(row)
    base = shard_rows[0]
    for row in shard_rows:
        n = row['devices']
        row['consume_serialized_efficiency'] = round(
            n * base['consume_s'] / row['consume_s'], 3)
        row['screen_serialized_efficiency'] = round(
            n * base['screen_s'] / row['screen_s'], 3)
        print(json.dumps(row), flush=True)
    results['shard_axis'] = shard_rows

    print('# data-axis partitioning overhead at equal total work',
          file=sys.stderr)
    ndev = min(cores, 8)
    d1 = run_subprocess(1, 1, 1, 'data1', tmpdir)
    # same total batch (B * ndev reads) on 1 device vs partitioned over ndev
    d1big = run_subprocess(1, 1, 1, 'data1big', tmpdir, bmul=ndev)
    dn = run_subprocess(ndev, ndev, 1, 'data{}'.format(ndev), tmpdir)
    data = {'1_device_1x': d1, '1_device_Nx_batch': d1big,
            'N_devices_Nx_batch': dn,
            'consume_efficiency': round(
                d1big['consume_s'] / dn['consume_s'], 3),
            'screen_efficiency': round(
                d1big['screen_s'] / dn['screen_s'], 3)}
    results['data_axis'] = data
    print(json.dumps(data), flush=True)

    print('# 2-process gloo (DCN analog), 8 devices total', file=sys.stderr)
    try:
        gloo = run_gloo(tmpdir)
        single8 = shard_rows[-1]
        gloo['vs_single_process_screen'] = round(
            single8['screen_s'] / gloo['screen_s'], 3)
        gloo['vs_single_process_consume'] = round(
            single8['consume_s'] / gloo['consume_s'], 3)
        results['two_process_gloo'] = gloo
        print(json.dumps(gloo), flush=True)
    except Exception as exc:  # gloo may be unavailable in some sandboxes
        results['two_process_gloo'] = {'error': str(exc)}
        print('# gloo run failed:', exc, file=sys.stderr)

    outpath = os.path.join(REPO, 'SCALING.json')
    with open(outpath, 'w') as fh:
        json.dump(results, fh, indent=1)
    print('# wrote', outpath, file=sys.stderr)


if __name__ == '__main__':
    main()
