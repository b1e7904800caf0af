"""Accuracy evaluation: match calls against truth intervals by CALLCLASS."""

from collections import defaultdict
import sys

from kevlar_tpu.intervalforest import IntervalForest


def populate_index_from_bed(instream):
    index = IntervalForest()
    for line in instream:
        if line.startswith('#') or line.strip() == '':
            continue
        values = line.strip().split()
        chrom = values[0]
        start, end = [int(coord) for coord in values[1:3]]
        strrepr = '{:s}:{:d}-{:d}'.format(chrom, start, end)
        index.insert(chrom, start, end, strrepr)
    return index


def compact(variants, index, delta=10):
    """Keep, per CALLCLASS, the call matching a true variant (or the best
    scoring call if none match); assumes input sorted by LIKESCORE."""
    variants_by_class = defaultdict(list)
    calls = []
    for varcall in variants:
        if varcall.filterstr != 'PASS':
            continue
        callclass = varcall.attribute('CALLCLASS')
        if callclass is None:
            calls.append(varcall)
        else:
            variants_by_class[callclass].append(varcall)

    for callclass, calllist in variants_by_class.items():
        nmatches = 0
        match = None
        for varcall in calllist:
            hits = index.query(varcall.seqid, varcall.position, delta=delta)
            if hits == set():
                continue
            nmatches += 1
            if match is None:
                match = varcall
        if nmatches == 0:
            calllist[0].annotate('EVAL', 'False')
            calls.append(calllist[0])
        else:
            if nmatches > 1:
                print('WARNING: found', nmatches, 'matches for CALLCLASS',
                      callclass, file=sys.stderr)
            match.annotate('EVAL', 'True')
            calls.append(match)

    calls.sort(key=lambda c: float(c.attribute('LIKESCORE')), reverse=True)
    calls = [c for c in calls if float(c.attribute('LIKESCORE')) > 0.0]
    return calls
