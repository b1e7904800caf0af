"""Host sequence I/O: FASTA/FASTQ parsing and partitioned-read streams.

Behavioral parity with /root/reference/kevlar/seqio.py: partition streams are
keyed on ``kvcc=N`` labels in read names, and mixing labeled/unlabeled reads
is an error.
"""

import re

import kevlar_tpu
from kevlar_tpu.sequence import Record, parse_augmented_fastx


class KevlarPartitionLabelError(ValueError):
    pass


def parse_fasta(data):
    """Yield (defline, sequence) tuples from FASTA text lines."""
    name, seq = None, []
    for line in data:
        line = line.rstrip()
        if line.startswith('>'):
            if name:
                yield (name, ''.join(seq))
            name, seq = line, []
        else:
            seq.append(line)
    if name:
        yield (name, ''.join(seq))


def parse_seq_dict(data):
    """Load FASTA into a {seqid: sequence} dict (first defline token)."""
    seqs = {}
    for defline, sequence in parse_fasta(data):
        seqid = defline[1:].replace('\t', ' ').split(' ')[0]
        assert seqid not in seqs, seqid
        seqs[seqid] = sequence
    return seqs


def parse_fastx(instream):
    """Yield plain Records from FASTA or FASTQ text (no annotations)."""
    first = None
    for line in instream:
        if line.strip():
            first = line
            break
    if first is None:
        return
    if first[0] == '>':
        name, seq = first[1:].strip(), []
        for line in instream:
            line = line.rstrip()
            if line.startswith('>'):
                yield Record(name=name, sequence=''.join(seq))
                name, seq = line[1:].strip(), []
            elif line:
                seq.append(line)
        yield Record(name=name, sequence=''.join(seq))
    elif first[0] == '@':
        line = first
        while True:
            name = line[1:].strip()
            seq = next(instream).strip()
            next(instream)
            qual = next(instream).strip()
            yield Record(name=name, sequence=seq, quality=qual)
            line = instream.readline() if hasattr(instream, 'readline') \
                else next(instream, '')
            while line and not line.strip():
                line = instream.readline() if hasattr(instream, 'readline') \
                    else next(instream, '')
            if not line:
                return
    else:
        raise ValueError('unrecognized sequence format: ' + first[:40])


def multi_file_iter(filenames, parser=parse_fastx):
    for filename in filenames:
        with kevlar_tpu.open(filename, 'r') as fh:
            for record in parser(fh):
                yield record


def afxstream(filelist):
    for infile in filelist:
        fh = kevlar_tpu.open(infile, 'r')
        for record in parse_augmented_fastx(fh):
            yield record


def partition_id(readname):
    partmatch = re.search(r'kvcc=(\d+)', readname)
    if not partmatch:
        return None
    return partmatch.group(1)


def parse_partitioned_reads(readstream):
    current_part = None
    reads = []
    for read in readstream:
        name = read.name if hasattr(read, 'name') else read.defline
        part = partition_id(name)
        if part is None:
            reads.append(read)
            current_part = False
            continue
        if current_part is False:
            message = 'reads with and without partition labels (kvcc=#)'
            raise KevlarPartitionLabelError(message)
        if part != current_part:
            if current_part:
                yield current_part, reads
                reads = []
            current_part = part
        reads.append(read)
    if current_part is False:
        current_part = None
    yield current_part, reads


def parse_single_partition(readstream, partid):
    for pid, partition in parse_partitioned_reads(readstream):
        if pid == partid:
            yield pid, partition
