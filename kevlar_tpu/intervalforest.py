"""Labeled interval trees (per-chromosome) with delta-extended queries.

Replaces the reference's `intervaltree` dependency with a sorted-array +
bisect implementation (intervals are loaded once, queried many times).
Query semantics parity with /root/reference/kevlar/intervalforest.py:
half-open intervals; point queries return intervals containing the point;
range queries return intervals overlapping [start, end).
"""

from bisect import bisect_right
from collections import defaultdict


class Interval:
    __slots__ = ('begin', 'end', 'data')

    def __init__(self, begin, end, data=None):
        self.begin = begin
        self.end = end
        self.data = data

    def __eq__(self, other):
        return (self.begin, self.end, id(self.data)) == \
            (other.begin, other.end, id(other.data))

    def __hash__(self):
        return hash((self.begin, self.end, id(self.data)))

    def __repr__(self):
        return 'Interval({}, {}, {!r})'.format(self.begin, self.end,
                                               self.data)


class _Tree:
    """Interval set over one label; O(log n + k) stabbing via sorted starts
    and a max-end sweep."""

    def __init__(self):
        self.intervals = []
        self._sorted = None

    def add(self, interval):
        self.intervals.append(interval)
        self._sorted = None

    def _ensure(self):
        if self._sorted is None:
            self._sorted = sorted(self.intervals, key=lambda iv: iv.begin)
            self._starts = [iv.begin for iv in self._sorted]
            # running max of ends for early termination
            self._maxend = []
            m = float('-inf')
            for iv in self._sorted:
                m = max(m, iv.end)
                self._maxend.append(m)

    def query(self, start, end):
        """All intervals overlapping [start, end) (end > start)."""
        self._ensure()
        hits = set()
        hi = bisect_right(self._starts, end - 1)
        for idx in range(hi - 1, -1, -1):
            iv = self._sorted[idx]
            if self._maxend[idx] <= start:
                break
            if iv.end > start:
                hits.add(iv)
        return hits

    def __len__(self):
        return len(self.intervals)

    def __iter__(self):
        return iter(self.intervals)


class IntervalForest:
    """Single point of access for a labeled set of interval trees.

    >>> index = IntervalForest()
    >>> index.insert('chr17', 238026, 238046)
    >>> index.insert('chr17', 1533596, 1533597, 'C->A')
    >>> sorted(iv.data for iv in index.query('chr17', 1533500, 1533700))
    ['C->A']
    >>> index.query('chr17', 238006)
    set()
    >>> sorted(iv.data for iv in index.query('chr17', 238006, delta=30))
    ['chr17:238026-238046']
    >>> index.query('chr4', 1533500, 1533700)
    set()
    """

    def __init__(self):
        self.trees = defaultdict(_Tree)

    def __len__(self):
        return sum(len(tree) for tree in self.trees.values())

    def __iter__(self):
        for label, tree in self.trees.items():
            for interval in tree:
                yield interval.data

    def insert(self, label, start, end, data=None):
        assert label is not None
        if data is None:
            data = '{:s}:{:d}-{:d}'.format(label, start, end)
        self.trees[label].add(Interval(start, end, data))

    def query(self, label, start, end=None, delta=0):
        if label not in self.trees:
            return set()
        if delta > 0:
            if end:
                end += delta
            else:
                end = start + delta
            start -= delta
        if end is None:
            # point query: intervals containing `start`
            return self.trees[label].query(start, start + 1)
        return self.trees[label].query(start, end)
