"""dist / evaluate parity against the reference's pinned values.

The dist cases run on the reference's khmer-built minitrio mask
(khmer-engine masked counting + tracking-deduped histogram), pinning the
exact abundance dictionary and mu/sigma the reference suite pins
(test_dist.py; note its own assertions use pytest.approx with reversed
arguments — the values here are asserted properly).
"""

import contextlib
import io
import json
import os

import pytest

import kevlar_tpu
import kevlar_tpu.cli as cli
from kevlar_tpu import dist as dist_mod, evaluate, sketch as sketch_mod, vcf

DATA = '/root/reference/kevlar/tests/data/'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason='reference test data not mounted')


def data_file(name):
    return os.path.join(DATA, name)


PINNED_ABUND = {10: 6, 11: 10, 12: 12, 13: 18, 14: 16, 15: 11, 16: 9,
                17: 9, 18: 11, 19: 8, 20: 9, 21: 7, 22: 3}


def test_dist_abundance_dict():
    """Exact masked abundance histogram on minitrio (reference
    test_dist.py:36-43)."""
    mask = sketch_mod.load(data_file('minitrio/mask.nt'))
    abund = dist_mod._abundance_oxli(
        [data_file('minitrio/trio-proband.fq.gz')], mask, 31, 4e4)
    assert dict(abund) == PINNED_ABUND


def test_dist_mu_sigma():
    mask = sketch_mod.load(data_file('minitrio/mask.nt'))
    mu, sigma, data = dist_mod.dist(
        [data_file('minitrio/trio-proband.fq.gz')], mask, memory=4e4)
    assert mu == pytest.approx(15.32558, abs=1e-4)
    assert sigma == pytest.approx(3.280581, abs=1e-5)
    assert [row['Count'] for row in data[-5:]] == [11, 8, 9, 7, 3]


def test_calc_mu_sigma_pinned():
    mu, sigma = dist_mod.calc_mu_sigma(dict(PINNED_ABUND))
    assert mu == pytest.approx(15.32558, abs=1e-4)
    assert sigma == pytest.approx(3.280581, abs=1e-5)


def test_dist_empty_raises():
    from kevlar_tpu.oxli import OxliSketch
    mask = OxliSketch(31, 1e4, 4, counter_bits=1)
    mask.consume('GATTACA' * 10)
    mask.consume('A' * 50)
    with pytest.raises(dist_mod.KevlarZeroAbundanceDistError):
        dist_mod.dist([data_file('minitrio/trio-proband.fq.gz')], mask,
                      memory=4e4)


def test_dist_main_json():
    args = cli.parse_args(['dist', '-M', '40K',
                           data_file('minitrio/mask.nt'),
                           data_file('minitrio/trio-proband.fq.gz')])
    out_io, err_io = io.StringIO(), io.StringIO()
    old = kevlar_tpu.logstream
    kevlar_tpu.logstream = err_io
    try:
        with contextlib.redirect_stdout(out_io), \
                contextlib.redirect_stderr(err_io):
            dist_mod.main(args)
    finally:
        kevlar_tpu.logstream = old
    js = json.loads(out_io.getvalue().strip().splitlines()[-1])
    assert js['mu'] == pytest.approx(15.32558, abs=1e-4)
    assert js['sigma'] == pytest.approx(3.280581, abs=1e-5)


def test_evaluate_compact():
    """Truth-matching compaction keeps 33 calls (reference
    test_evaluate.py:14-24)."""
    index = evaluate.populate_index_from_bed(
        kevlar_tpu.open(data_file('compact-test-refr.bed.gz'), 'r'))
    reader = vcf.VCFReader(
        kevlar_tpu.open(data_file('compact-test-pred.vcf.gz'), 'r'))
    calls = list(evaluate.compact(reader, index, delta=10))
    assert len(calls) == 33