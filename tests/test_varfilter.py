"""IntervalForest + varfilter + evaluate."""

import io

from kevlar_tpu.intervalforest import IntervalForest
from kevlar_tpu.varfilter import varfilter
from kevlar_tpu.evaluate import compact, populate_index_from_bed
from kevlar_tpu.vcf import Variant


def test_intervalforest_basic():
    index = IntervalForest()
    index.insert('chr17', 238026, 238046)
    index.insert('chr17', 1533596, 1533597, 'C->A')
    hits = index.query('chr17', 1533500, 1533700)
    assert {iv.data for iv in hits} == {'C->A'}
    assert index.query('chr17', 238006) == set()
    hits = index.query('chr17', 238006, delta=30)
    assert {iv.data for iv in hits} == {'chr17:238026-238046'}
    assert index.query('chr4', 1533500, 1533700) == set()
    assert len(index) == 2


def test_intervalforest_point_query():
    index = IntervalForest()
    index.insert('chr1', 100, 200, 'a')
    index.insert('chr1', 150, 250, 'b')
    assert {iv.data for iv in index.query('chr1', 160)} == {'a', 'b'}
    assert {iv.data for iv in index.query('chr1', 210)} == {'b'}
    assert index.query('chr1', 300) == set()


def test_varfilter_flags_overlapping():
    calls = [
        Variant('chr1', 100, 'A', 'T'),
        Variant('chr1', 500, 'G', 'C'),
        Variant('chr2', 100, 'G', 'C'),
    ]
    bed = [('chr1', 50, 150, []), ('chr2', 500, 600, [])]
    out = list(varfilter(iter(calls), iter(bed)))
    by_key = {(c.seqid, c.position): c for c in out}
    assert 'UserFilter' in by_key[('chr1', 100)].filterstr
    assert by_key[('chr1', 500)].filterstr == 'PASS'
    assert by_key[('chr2', 100)].filterstr == 'PASS'


def test_evaluate_compact():
    bed = io.StringIO('chr1\t100\t101\nchr1\t900\t901\n')
    index = populate_index_from_bed(bed)
    v1 = Variant('chr1', 100, 'A', 'T', LIKESCORE=50.0, CALLCLASS='1')
    v2 = Variant('chr1', 300, 'C', 'G', LIKESCORE=40.0, CALLCLASS='1')
    v3 = Variant('chr1', 555, 'G', 'C', LIKESCORE=20.0, CALLCLASS='2')
    calls = compact([v1, v2, v3], index)
    # class 1: the truth-matching call (v1) wins; class 2: best call kept
    assert v1 in calls
    assert v2 not in calls
    assert v3 in calls
    assert v1.attribute('EVAL') == 'True'
    assert v3.attribute('EVAL') == 'False'
