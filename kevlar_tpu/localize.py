"""``localize`` stage: map contigs to reference target cutouts via seeds.

Parity with /root/reference/kevlar/localize.py, with the BWA subprocess
replaced by the native exact seed index (:mod:`kevlar_tpu.reference`):
contigs are decomposed into canonical seeds (default 51 bp), matched exactly
against the genome, seed positions are clustered per partition (clusters
split at gaps > maxdiff, default 3x the longest contig), and each cluster's
span ±delta becomes a reference cutout with defline ``seqid_start-end``.
"""

from collections import defaultdict
import re

import kevlar_tpu
from kevlar_tpu import seqio
from kevlar_tpu.reference import ReferenceCutout, SeedIndex


class KevlarRefrSeqNotFoundError(ValueError):
    pass


class Localizer:
    def __init__(self, seedsize, incl=None, excl=None):
        self._positions = defaultdict(list)
        self._seedsize = seedsize
        self.inclpattern = incl
        self.exclpattern = excl

    def __len__(self):
        return sum(len(self._positions[s]) for s in self._positions
                   if not self.ignore_seqid(s))

    def ignore_seqid(self, seqid):
        include = True
        exclude = False
        if self.inclpattern:
            include = re.search(self.inclpattern, seqid) is not None
        if self.exclpattern:
            exclude = re.search(self.exclpattern, seqid) is not None
        return exclude or not include

    def add_seed_match(self, seqid, pos):
        self._positions[seqid].append(pos)

    def get_cutouts(self, refrseqs=None, delta=0, clusterdist=1000):
        for seqid in sorted(self._positions):
            if self.ignore_seqid(seqid):
                continue
            matchpos = sorted(self._positions[seqid])
            assert len(matchpos) > 0
            if refrseqs and seqid not in refrseqs:
                raise KevlarRefrSeqNotFoundError(seqid)

            def new_cutout(cluster):
                startpos = max(cluster[0] - delta, 0)
                endpos = cluster[-1] + self._seedsize + delta
                subseq = None
                if refrseqs:
                    endpos = min(endpos, len(refrseqs[seqid]))
                    subseq = refrseqs[seqid][startpos:endpos]
                defline = '{:s}_{:d}-{:d}'.format(seqid, startpos, endpos)
                return ReferenceCutout(defline, subseq)

            if not clusterdist:
                yield new_cutout(matchpos)
                continue

            cluster = []
            prevpos = None
            for nextpos in matchpos:
                if prevpos:
                    if nextpos - prevpos > clusterdist:
                        yield new_cutout(cluster)
                        cluster = []
                cluster.append(nextpos)
                prevpos = nextpos
            yield new_cutout(cluster)


def decompose_seeds(seq, seedsize):
    for i in range(len(seq) - seedsize + 1):
        yield seq[i:i + seedsize]


def unique_seeds(partitions, seedsize=51):
    """Canonical seed set over all contigs of all partitions."""
    seeds = set()
    for partition in partitions:
        for contig in partition:
            for seed in decompose_seeds(contig.sequence, seedsize):
                seeds.add(kevlar_tpu.revcommin(seed))
    return seeds


def get_seed_matches(seeds, refrseqs, seedsize=51):
    """Exact genomic matches for canonical seeds: {seed: {(seqid, pos)}}."""
    kevlar_tpu.plog('[kevlar::localize] computing seed matches')
    index = SeedIndex(refrseqs, seedsize)
    seed_matches = index.lookup(seeds)
    kevlar_tpu.plog('[kevlar::localize] found positions for '
                    '{} seeds'.format(len(seed_matches)))
    return seed_matches


def cutout(contigs, refrseqs, seed_matches, seedsize=51, delta=50,
           maxdiff=None, inclpattern=None, exclpattern=None, debug=False):
    """Compute reference target cutouts for one partition's contigs."""
    localizer = Localizer(seedsize, incl=inclpattern, excl=exclpattern)
    for contig in contigs:
        for seed in decompose_seeds(contig.sequence, seedsize):
            seed = kevlar_tpu.revcommin(seed)
            if seed not in seed_matches:
                continue
            for seqid, position in seed_matches[seed]:
                localizer.add_seed_match(seqid, position)
    if maxdiff is None:
        maxcontiglen = max(len(c.sequence) for c in contigs)
        maxdiff = maxcontiglen * 3
    cutter = localizer.get_cutouts(refrseqs=refrseqs, delta=delta,
                                   clusterdist=maxdiff)
    for gdna in cutter:
        yield gdna


def localize(partstream, refrfile, seedsize=51, delta=50, maxdiff=None,
             inclpattern=None, exclpattern=None, debug=False):
    """Generator wrapper for the reference target cutout procedure."""
    partdata = list(partstream)
    partitions = [part for partid, part in partdata]
    kevlar_tpu.plog('[kevlar::localize] loaded {} read partitions into '
                    'memory'.format(len(partitions)))

    seeds = unique_seeds(partitions, seedsize)
    kevlar_tpu.plog('[kevlar::localize] contigs decomposed into '
                    '{} seeds'.format(len(seeds)))

    kevlar_tpu.plog('[kevlar::localize] loading reference sequences')
    refrseqs = seqio.parse_seq_dict(kevlar_tpu.open(refrfile, 'r'))
    seed_matches = get_seed_matches(seeds, refrseqs, seedsize=seedsize)
    if len(seed_matches) == 0:
        kevlar_tpu.plog('[kevlar::localize] WARNING: no reference matches')
        return

    ncutouts = 0
    for partid, contiglist in partdata:
        cutter = cutout(
            contiglist, refrseqs, seed_matches, seedsize=seedsize,
            delta=delta, maxdiff=maxdiff, inclpattern=inclpattern,
            exclpattern=exclpattern)
        for gdna in cutter:
            ncutouts += 1
            yield partid, gdna
    if ncutouts == 0:
        kevlar_tpu.plog('[kevlar::localize] WARNING: no reference matches')
        return


def main(args):
    contigstream = seqio.afxstream(args.contigs)
    if args.part_id:
        pstream = seqio.parse_single_partition(contigstream, args.part_id)
    else:
        pstream = seqio.parse_partitioned_reads(contigstream)
    outstream = kevlar_tpu.open(args.out, 'w')
    localizer = localize(
        pstream, args.refr, seedsize=args.seed_size, delta=args.delta,
        maxdiff=args.max_diff, inclpattern=args.include,
        exclpattern=args.exclude)
    from kevlar_tpu import sequence
    for part, gdna in localizer:
        seqname = gdna.defline
        if part is not None:
            seqname += ' kvcc={}'.format(part)
        record = sequence.Record(name=seqname, sequence=gdna.sequence)
        sequence.write_record(record, outstream)
