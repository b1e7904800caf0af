"""``unband`` stage: merge per-band novel outputs into one stream.

Parity with /root/reference/kevlar/unband.py: records are hash-partitioned by
read name into temp batch files; within a batch, duplicate reads' annotation
lists are unioned and sorted by offset.

Note that in the fully TPU-native pipeline banding is usually unnecessary —
the sketch is hash-sharded across devices instead of re-run per band
(see kevlar_tpu.parallel) — but the file-based merge is kept for parity and
for offline/multi-pass workflows.
"""

from tempfile import TemporaryDirectory

import kevlar_tpu
from kevlar_tpu import seqio


def create_batch_files(numbatches, tempdir):
    batchfiles = []
    for i in range(numbatches):
        tempfn = '{dir:s}/kevlar-unband-batch{batch:d}.augfastq.gz'.format(
            dir=tempdir, batch=i)
        batchfiles.append(kevlar_tpu.open(tempfn, 'w'))
    return batchfiles


def write_records_to_batches(recordstream, batchfiles):
    numbatches = len(batchfiles)
    kevlar_tpu.plog('[kevlar::unband] writing records to '
                    '{:d} temp batch files'.format(numbatches))
    for record in recordstream:
        batch = hash(record.name) % numbatches
        kevlar_tpu.print_augmented_fastx(record, batchfiles[batch])


def resolve_batch(batchfile):
    reads = {}
    filename = batchfile.name
    batchfile.close()
    batchfile = kevlar_tpu.open(filename, 'r')
    for read in kevlar_tpu.parse_augmented_fastx(batchfile):
        if read.name not in reads:
            reads[read.name] = read
        else:
            for ikmer in read.annotations:
                reads[read.name].annotations.append(ikmer)
    for readname in sorted(reads):
        read = reads[readname]
        read.annotations.sort(key=lambda k: k.offset)
        yield read
    batchfile.close()


def resolve_batches(batchfiles):
    kevlar_tpu.plog('[kevlar::unband] resolving duplicate reads in '
                    '{:d} batches'.format(len(batchfiles)))
    for n, batchfile in enumerate(batchfiles):
        for read in resolve_batch(batchfile):
            yield read
        kevlar_tpu.plog(
            '[kevlar::unband]     batch {:d} complete'.format(n))
    kevlar_tpu.plog('[kevlar::unband] Done!')


def unband(recordstream, numbatches=16):
    with TemporaryDirectory() as tempdir:
        batchfiles = create_batch_files(numbatches, tempdir)
        write_records_to_batches(recordstream, batchfiles)
        for read in resolve_batches(batchfiles):
            yield read


def main(args):
    outstream = kevlar_tpu.open(args.out, 'w')
    records = seqio.afxstream(args.infile)
    for read in unband(records, args.n_batches):
        kevlar_tpu.print_augmented_fastx(read, outstream)
