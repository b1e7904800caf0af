"""Overlapping read pairs anchored by one shared interesting k-mer.

Behavioral parity with /root/reference/kevlar/readpair.py: relative
orientation via k-mer sequence equality; head/tail assignment by largest
k-mer offset, then read length, then name; offset/overlap computation; merge
with perfect-overlap check; `incompatible` if the merge failed or the shared
k-mer occurs more than once in either read.

Used by strict-mode partitioning and the greedy overlap assembler.
"""

import kevlar_tpu
from kevlar_tpu.sequence import Record, KmerOfInterest


class ReadWithKmer:
    def __init__(self, read, kmerseq):
        self.read = read
        self.kmer = read.ikmers.get(kmerseq)
        self.kmerseq = read.ikmerseq(self.kmer) if self.kmer else None
        self.num_occurrences = (
            read.sequence.count(kmerseq) +
            read.sequence.count(kevlar_tpu.revcom(kmerseq))
        )

    def __len__(self):
        return len(self.read.sequence)

    @property
    def offset(self):
        return self.kmer.offset

    @property
    def name(self):
        return self.read.name

    def revcom(self):
        seq = kevlar_tpu.revcom(self.read.sequence)
        kmerseqrc = kevlar_tpu.revcom(self.kmerseq)
        newoffset = len(seq) - self.kmer.offset - self.kmer.ksize
        kmer = KmerOfInterest(self.kmer.ksize, newoffset, self.kmer.abund)
        kdict = {self.kmerseq: kmer, kmerseqrc: kmer}
        newread = Record(self.read.name, seq, annotations=[kmer], ikmers=kdict)
        return ReadWithKmer(newread, self.kmerseq)


class ReadPair:
    def __init__(self, read1, read2, sharedkmer):
        self._r1 = ReadWithKmer(read1, sharedkmer)
        self._r2 = ReadWithKmer(read2, sharedkmer)
        self._r1rc = self._r1.revcom()
        self._r2rc = self._r2.revcom()
        self._seedkmer = sharedkmer
        self._merged = None
        self.head = None
        self.tail = None
        self.overlap = None
        self.offset = None
        self.sameorient = None
        self.validate()

    def __str__(self):
        return '{}\n{}{}\n{}{}'.format(
            self.tail.read.sequence, ' ' * self.tail.offset,
            '|' * self.tail.kmer.ksize, ' ' * self.offset,
            self.head.read.sequence)

    @property
    def incompatible(self):
        return self._merged is None

    def assign_by_largest_kmer_offset(self):
        if self.sameorient:
            arrangements = [(self._r1, self._r2), (self._r1rc, self._r2rc)]
        else:
            arrangements = [(self._r1, self._r2rc), (self._r1rc, self._r2)]
        offsets = [max(read.kmer.offset for read in arr)
                   for arr in arrangements]
        if len(set(offsets)) == 1:
            return
        optimal = arrangements[0] if offsets[0] > offsets[1] \
            else arrangements[1]
        self.tail = max(optimal, key=lambda r: r.kmer.offset)
        self.head = min(optimal, key=lambda r: r.kmer.offset)

    def assign_by_read_length(self):
        if len(self._r1) == len(self._r2):
            return
        elif len(self._r1) > len(self._r2):
            self.tail = self._r1
            self.head = self._r2 if self.sameorient else self._r2rc
        else:
            self.tail = self._r2 if self.sameorient else self._r2rc
            self.head = self._r1

    def assign_by_read_name(self):
        if self._r1.read.name < self._r2.read.name:
            self.tail = self._r1
            self.head = self._r2 if self.sameorient else self._r2rc
        else:
            self.tail = self._r2 if self.sameorient else self._r2rc
            self.head = self._r1

    def set_head_and_tail(self):
        self.assign_by_largest_kmer_offset()
        if self.tail is None:
            self.assign_by_read_length()
        if self.tail is None:
            self.assign_by_read_name()
        assert self.tail is not None

    def calc_offset(self):
        if self.tail.offset < self.head.offset:
            self.head, self.tail = self.tail, self.head
        self.offset = self.tail.offset - self.head.offset
        self.overlap = len(self.tail) - self.offset

    @property
    def mergedseq(self):
        return self._merged

    def _merge(self):
        tailseq = self.tail.read.sequence
        headseq = self.head.read.sequence
        if headseq in tailseq or tailseq in headseq:
            self._merged = tailseq
            return
        headindex = len(tailseq) - self.offset
        headsuffix = headseq[headindex:]
        tailprefix = tailseq[self.offset:self.offset + self.overlap]
        if tailprefix == headseq[:headindex]:
            self._merged = tailseq + headsuffix

    def validate(self):
        if self._r1.num_occurrences != 1 or self._r2.num_occurrences != 1:
            return
        self.sameorient = self._r1.kmerseq == self._r2.kmerseq
        self.set_head_and_tail()
        self.calc_offset()
        self._merge()
