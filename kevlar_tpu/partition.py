"""``partition`` stage: group reads into connected components by shared
novel k-mers.

Parity with /root/reference/kevlar/partition.py: builds the read graph,
extracts components (largest first), labels reads with ``kvcc=N``, optional
strict overlap validation, per-partition PCR dedup, optional GML dump and
per-partition split output.
"""

import kevlar_tpu
from kevlar_tpu.readgraph import ReadGraph, to_gml


def partition(readstream, strict=False, minabund=None, maxabund=None,
              dedup=True, gmlfile=None):
    timer = kevlar_tpu.Timer()
    timer.start()

    timer.start('loadreads')
    kevlar_tpu.plog('[kevlar::partition] Loading reads')
    graph = ReadGraph()
    graph.load(readstream, minabund=minabund, maxabund=maxabund)
    elapsed = timer.stop('loadreads')
    kevlar_tpu.plog(
        '[kevlar::partition] Reads loaded in {:.2f} sec'.format(elapsed))

    timer.start('buildgraph')
    mode = 'strict' if strict else 'relaxed'
    kevlar_tpu.plog(
        '[kevlar::partition] Building read graph in {:s} mode'.format(mode))
    graph.populate_edges(strict=strict)
    elapsed = timer.stop('buildgraph')
    kevlar_tpu.plog(
        '[kevlar::partition] Graph built in {:.2f} sec'.format(elapsed))

    if gmlfile:
        to_gml(graph, gmlfile)

    timer.start('partition')
    kevlar_tpu.plog('[kevlar::partition] Partition readgraph')
    part_iter = graph.partitions(dedup, minabund, maxabund, abundfilt=True)
    n = 0
    for n, part in enumerate(part_iter, 1):
        reads = [graph.get_record(readname) for readname in list(part)]
        for read in reads:
            read.name += ' kvcc={:d}'.format(n)
        yield n, reads
    elapsed = timer.stop('partition')
    kevlar_tpu.plog(
        '[kevlar::partition] Partitioning done in {:.2f} sec'.format(elapsed))
    total = timer.stop()
    kevlar_tpu.plog(
        '[kevlar::partition] Total time: {:.2f} seconds'.format(total))


def main(args):
    if args.split:
        kevlar_tpu.mkdirp(args.split, trim=True)
    outstream = None if args.split else kevlar_tpu.open(args.out, 'w')
    readstream = kevlar_tpu.parse_augmented_fastx(
        kevlar_tpu.open(args.infile, 'r'))
    partitioner = partition(
        readstream, strict=args.strict, minabund=args.min_abund,
        maxabund=args.max_abund, dedup=args.dedup, gmlfile=args.gml)
    numreads = 0
    partnum = 0
    for partnum, part in partitioner:
        numreads += len(part)
        if args.split:
            ofname = '{:s}.cc{:d}.augfastq.gz'.format(args.split, partnum)
            with kevlar_tpu.open(ofname, 'w') as outfile:
                for read in part:
                    kevlar_tpu.print_augmented_fastx(read, outfile)
        else:
            for read in part:
                kevlar_tpu.print_augmented_fastx(read, outstream)
    message = 'grouped {:d} reads into {:d} connected components'.format(
        numreads, partnum)
    kevlar_tpu.plog('[kevlar::partition]', message)
