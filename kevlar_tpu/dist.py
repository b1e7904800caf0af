"""``dist`` stage: abundance distribution of k-mers inside a mask.

Parity with /root/reference/kevlar/dist.py: count masked k-mers (e.g.
single-copy exonic k-mers), histogram distinct k-mer abundances, output
weighted mean/stddev as JSON plus an optional TSV and plot.  Feeds
``simlike --mu/--sigma``.

The count pass runs on device; the distinct-k-mer tracking of the second
pass uses an exact host-side hash set over canonical hash pairs (the
reference tracks via a khmer Nodetable with the same prime sizes).
"""

from collections import defaultdict
import json
import math

import numpy as np

import kevlar_tpu
from kevlar_tpu import dna, seqio
from kevlar_tpu.batch import batches_from_records
from kevlar_tpu.sketch import Sketch


class KevlarZeroAbundanceDistError(ValueError):
    pass


def count_first_pass(infiles, counts, mask):
    kevlar_tpu.plog('[kevlar::dist] Processing input')
    for filename in infiles:
        kevlar_tpu.plog('    -', filename)
        stream = seqio.multi_file_iter([filename])
        for batch in batches_from_records(stream):
            counts.consume_batch(batch.bases, mask=mask, mask_threshold=1,
                                 consume_masked=True)
    kevlar_tpu.plog('[kevlar::dist] Done processing input!')


def count_second_pass(infiles, counts, mask):
    """Histogram of abundances over distinct masked k-mers.

    Distinct-k-mer dedup runs through a presence (tracking) sketch, khmer
    style (reference dist.py:49-57) — bounded memory regardless of genome
    size, unlike a Python set of hashes.
    """
    kevlar_tpu.plog('[kevlar::dist] Second pass over the data')
    abundance = defaultdict(int)
    tracking = Sketch(counts.ksize(), counts.tablesize, counts.ntables,
                      counter_bits=1, backend='host')
    ksize = counts.ksize()
    for filename in infiles:
        kevlar_tpu.plog('    -', filename)
        stream = seqio.multi_file_iter([filename])
        for batch in batches_from_records(stream):
            h1, h2, valid = dna.kmer_hashes(batch.bases, ksize)
            h1, h2, valid = h1.ravel(), h2.ravel(), valid.ravel()
            mcnt = mask._host_counts(h1, h2, valid)
            keep = valid & (mcnt > 0)
            fresh = keep & (tracking._host_counts(h1, h2, keep) == 0)
            if not fresh.any():
                continue
            keys = (h1.astype(np.uint64) << np.uint64(32)) | \
                h2.astype(np.uint64)
            _, first = np.unique(keys[fresh], return_index=True)
            idx = np.flatnonzero(fresh)[first]
            ccnt = counts._host_counts(h1[idx], h2[idx])
            for cnt in ccnt.tolist():
                if cnt > 0:
                    abundance[int(cnt)] += 1
            tracking._host_consume_hashes(h1[idx], h2[idx])
    kevlar_tpu.plog('[kevlar::dist] Done second pass over input!')
    return abundance


def weighted_mean_std_dev(values, weights):
    mu = np.average(values, weights=weights)
    sigma = math.sqrt(np.average((np.array(values) - mu) ** 2,
                                 weights=weights))
    return mu, sigma


def calc_mu_sigma(abundance):
    total = sum(abundance.values())
    if total == 0:
        raise KevlarZeroAbundanceDistError(
            'all k-mer abundances are 0, please check input files')
    return weighted_mean_std_dev(list(abundance.keys()),
                                 list(abundance.values()))


def compute_dist(abundance):
    """Rows of (Abundance, Count, CumulativeCount, CumulativeFraction)."""
    total = sum(abundance.values())
    rows = []
    cuml = 0
    for abund, count in sorted(abundance.items()):
        assert count > 0, (abund, count)
        cuml += count
        rows.append({
            'Abundance': abund,
            'Count': count,
            'CumulativeCount': cuml,
            'CumulativeFraction': cuml / total,
        })
    return rows


def write_dist_tsv(rows, outstream):
    fields = ['Abundance', 'Count', 'CumulativeCount', 'CumulativeFraction']
    print(*fields, sep='\t', file=outstream)
    for row in rows:
        print(*[row[f] for f in fields], sep='\t', file=outstream)


def _abundance_oxli(infiles, mask, ksize, memory):
    """khmer-engine distribution for khmer-format masks (hash spaces
    cannot mix): masked counting + tracking-deduped histogram, matching
    the reference's two khmer passes (dist.py:25-79)."""
    from kevlar_tpu.oxli import OxliSketch
    counts = OxliSketch(ksize, int(memory) // 4, 4, counter_bits=8)
    kevlar_tpu.plog('[kevlar::dist] Processing input')
    for filename in infiles:
        kevlar_tpu.plog('    -', filename)
        counts.consume_seqfile(filename, mask=mask, threshold=1,
                               consume_masked=True)
    kevlar_tpu.plog('[kevlar::dist] Done processing input!')
    kevlar_tpu.plog('[kevlar::dist] Second pass over the data')
    tracking = OxliSketch(ksize, counts.hashsizes(), counter_bits=1)
    abundance = defaultdict(int)
    for filename in infiles:
        kevlar_tpu.plog('    -', filename)
        hist = counts.abundance_distribution(filename, tracking)
        for i, count in enumerate(hist.tolist()):
            if i > 0 and count > 0:
                abundance[i] += count
    kevlar_tpu.plog('[kevlar::dist] Done second pass over input!')
    return abundance


def dist(infiles, mask, ksize=31, memory=1e6, threads=1):
    from kevlar_tpu.oxli import OxliSketch
    if isinstance(mask, OxliSketch):
        abundance = _abundance_oxli(infiles, mask, ksize, memory)
    else:
        counts = Sketch(ksize, int(memory) // 4, 4, counter_bits=8)
        count_first_pass(infiles, counts, mask)
        abundance = count_second_pass(infiles, counts, mask)
    mu, sigma = calc_mu_sigma(abundance)
    data = compute_dist(abundance)
    return mu, sigma, data


def main(args):
    from kevlar_tpu import sketch as sketch_mod
    mask = sketch_mod.load(args.mask)
    mu, sigma, data = dist(
        args.infiles, mask, ksize=args.ksize, memory=args.memory,
        threads=args.threads)
    out = {'mu': mu, 'sigma': sigma}
    print(json.dumps(out))
    if args.tsv:
        with kevlar_tpu.open(args.tsv, 'w') as fh:
            write_dist_tsv(data, fh)
    if args.plot:
        try:
            import matplotlib
            matplotlib.use('Agg')
            from matplotlib import pyplot as plt
        except ImportError:
            kevlar_tpu.plog('[kevlar::dist] matplotlib unavailable; '
                            'skipping plot')
            return
        matplotlib.rcParams['figure.figsize'] = [12, 6]
        plt.plot([r['Abundance'] for r in data],
                 [r['Count'] for r in data], color='blue')
        plt.axvline(x=mu, color='blue', linestyle='--')
        plt.axvline(x=mu - sigma, color='red', linestyle=':')
        plt.axvline(x=mu + sigma, color='red', linestyle=':')
        if args.plot_xlim:
            plt.xlim(args.plot_xlim)
        plt.xlabel('K-mer abundance')
        plt.ylabel('Frequency')
        plt.savefig(args.plot, dpi=300)
