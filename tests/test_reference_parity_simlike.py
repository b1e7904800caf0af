"""simlike parity against the reference suite's khmer-built sketch files.

These fixtures (ctrl-high-abund, case-low-abund, simlike-fast-mode) were
counted and saved by khmer itself, so they pin the full binary-format
interop path — hash, prime table sizing, AND the NibbleStorage layout of
4-bit .sct files (even bucket in the high nibble) — through simlike's
heuristic filters.  Mirrors /root/reference/kevlar/tests/test_simlike.py.
"""

import os

import pytest

import kevlar_tpu
from kevlar_tpu import simlike, sketch, vcf

DATA = '/root/reference/kevlar/tests/data/'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason='reference test data not mounted')


def data_file(name):
    return os.path.join(DATA, name)


def prelim_calls(name):
    return vcf.VCFReader(kevlar_tpu.open(data_file(name), 'r'))


@pytest.fixture(scope='module')
def ctrlhigh():
    return tuple(sketch.load(data_file('ctrl-high-abund/cc57120.%s.sct' % w))
                 for w in ('kid', 'mom', 'dad', 'refr'))


@pytest.fixture(scope='module')
def caselow():
    return (sketch.load(data_file('case-low-abund/kid.ct')),
            sketch.load(data_file('case-low-abund/mom.ct')),
            sketch.load(data_file('case-low-abund/dad.ct')),
            sketch.load(data_file('case-low-abund/refr.sct')))


@pytest.mark.parametrize('threshold,filterstatus', [
    (-10, False), (-1, False), (0, False), (None, False), (False, False),
    (1, True), (3, True), (5, True), (15, False), (49, False),
])
def test_simlike_ctrl_high_abund(threshold, filterstatus, ctrlhigh):
    """ControlAbundance threshold matrix on khmer-built .sct trios
    (reference test_simlike.py:274-296)."""
    kid, mom, dad, refr = ctrlhigh
    calls = list(simlike.simlike(
        prelim_calls('ctrl-high-abund/cc57120.calls.vcf'), kid, [mom, dad],
        refr, samplelabels=['Kid', 'Mom', 'Dad'], ctrlabundhigh=threshold))
    assert len(calls) == 2
    for c in calls:
        assert ('ControlAbundance' in c.filterstr) is filterstatus


@pytest.mark.parametrize('casemin,abund,numfilt', [
    (6, -10, 0), (6, -1, 0), (6, 0, 0), (6, None, 0), (6, False, 0),
    (6, 5, 4), (7, 5, 5), (6, 4, 5), (6, 9, 4), (6, 10, 3),
])
def test_simlike_case_low_abund(casemin, abund, numfilt, caselow):
    """CaseAbundance low-run matrix (reference test_simlike.py:299-324).

    caseabundgate=0 pins the reference's pure run-length semantics; the
    default likelihood gate (a documented extension, docs/migrating.md)
    would rescue the high-LIKESCORE rows and is covered separately in
    tests/test_simlike.py."""
    kid, mom, dad, refr = caselow
    calls = list(simlike.simlike(
        prelim_calls('case-low-abund/calls.vcf.gz'), kid, [mom, dad], refr,
        samplelabels=['Kid', 'Mom', 'Dad'], casemin=casemin,
        caseabundlow=abund, caseabundgate=0))
    assert len(calls) == 5
    assert sum('CaseAbundance' in c.filterstr for c in calls) == numfilt


def test_simlike_min_like_score(ctrlhigh):
    """minlikescore gating (reference test_simlike.py:327-346)."""
    kid, mom, dad, refr = ctrlhigh

    def run(minlikescore):
        return list(simlike.simlike(
            prelim_calls('ctrl-high-abund/cc57120.calls.vcf'), kid,
            [mom, dad], refr, samplelabels=['Kid', 'Mom', 'Dad'],
            ctrlabundhigh=0, caseabundlow=0, minlikescore=minlikescore))

    calls = run(0.0)
    assert sum(c.filterstr == 'PASS' for c in calls) == 1
    assert sum(c.filterstr != 'PASS' for c in calls) == 1
    calls = run(400.0)
    assert sum(c.filterstr == 'PASS' for c in calls) == 0


def test_simlike_fastmode():
    """Fast mode short-circuits already-filtered calls: no ALTABUND
    computed, pinned filter strings (reference test_simlike.py:249-271)."""
    kid = sketch.load(data_file('simlike-fast-mode/cc27.kid.ct'))
    mom = sketch.load(data_file('simlike-fast-mode/cc27.mom.ct'))
    dad = sketch.load(data_file('simlike-fast-mode/cc27.dad.ct'))
    refr = sketch.load(data_file('simlike-fast-mode/cc27.refr.sct'))
    calls = list(simlike.simlike(
        prelim_calls('simlike-fast-mode/cc27.calls.vcf'), kid, [mom, dad],
        refr, fastmode=True, samplelabels=['Proband', 'Mother', 'Father']))
    assert len(calls) == 4
    assert [c.format('Proband', 'ALTABUND') for c in calls] == [None] * 4
    assert [c.filterstr for c in calls] == [
        'LikelihoodFail;PassengerVariant', 'ControlAbundance;LikelihoodFail',
        'ControlAbundance;LikelihoodFail', 'LikelihoodFail;UserFilter']