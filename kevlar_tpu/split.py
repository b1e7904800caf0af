"""``split`` stage: round-robin partitions across N output files."""

from itertools import cycle

import kevlar_tpu
from kevlar_tpu import seqio


def split(pstream, outstreams, maxreads=10000):
    for partdata, outstream in zip(pstream, cycle(outstreams)):
        partid, partition = partdata
        if len(partition) > maxreads:
            message = 'WARNING: discarding partition with {} reads'.format(
                len(partition))
            kevlar_tpu.plog('[kevlar::split]', message)
            continue
        for read in partition:
            kevlar_tpu.print_augmented_fastx(read, outstream)


def main(args):
    partfile = kevlar_tpu.open(args.infile, 'r')
    readstream = kevlar_tpu.parse_augmented_fastx(partfile)
    partstream = seqio.parse_partitioned_reads(readstream)
    outstreams = []
    for i in range(args.numfiles):
        outfile = '{:s}.{:d}.augfastx'.format(args.base, i)
        if args.infile.endswith('.gz'):
            outfile += '.gz'
        outstreams.append(kevlar_tpu.open(outfile, 'w'))
    split(partstream, outstreams)
    for stream in outstreams:
        stream.close()
