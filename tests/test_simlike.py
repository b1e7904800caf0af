"""Likelihood scoring: golden values and trio scoring semantics.

Golden constants for `abund_log_prob` are the published values pinned by the
reference implementation's test suite (kevlar test_simlike.py) — they define
the mathematical contract of the model.
"""

import random

import pytest

from kevlar_tpu.simlike import (abund_log_prob, likelihood_denovo,
                                likelihood_false, likelihood_inherited,
                                simlike, spanning_kmer_abundances)
from kevlar_tpu.sketch import Sketch
from kevlar_tpu.vcf import Variant

from . import simdata


def test_abund_log_prob_genotype0():
    assert abund_log_prob(0, 3, refrabund=1) == pytest.approx(-12.44134,
                                                              abs=1e-4)
    assert abund_log_prob(0, 4, refrabund=1) == pytest.approx(-17.43855,
                                                              abs=1e-4)
    assert abund_log_prob(0, 4, refrabund=6) == pytest.approx(-10.24689,
                                                              abs=1e-4)
    assert abund_log_prob(0, 4, refrabund=15) == pytest.approx(-6.83168,
                                                               abs=1e-4)


def test_abund_log_prob_genotype1():
    assert abund_log_prob(1, 1) == pytest.approx(-8.43023, abs=1e-4)
    assert abund_log_prob(1, 10) == pytest.approx(-3.08648, abs=1e-4)
    assert abund_log_prob(1, 15) == pytest.approx(-2.305232, abs=1e-4)
    assert abund_log_prob(1, 20) == pytest.approx(-3.08648, abs=1e-4)
    assert abund_log_prob(1, 10, mean=50.0, sd=9.9) == \
        pytest.approx(-7.10969, abs=1e-4)
    assert abund_log_prob(1, 20, mean=50.0, sd=9.9) == \
        pytest.approx(-3.02848, abs=1e-4)


def test_abund_log_prob_genotype2():
    assert abund_log_prob(2, 1) == pytest.approx(-9.56869, abs=1e-4)
    assert abund_log_prob(2, 10) == pytest.approx(-6.12338, abs=1e-4)
    assert abund_log_prob(2, 30) == pytest.approx(-2.99838, abs=1e-4)
    assert abund_log_prob(2, 53) == pytest.approx(-7.13119, abs=1e-4)
    assert abund_log_prob(2, 29, mean=47.0, sd=9.3) == \
        pytest.approx(-5.0220, abs=1e-3)
    assert abund_log_prob(2, 37, mean=47.0, sd=9.3) == \
        pytest.approx(-3.727054, abs=1e-4)
    assert abund_log_prob(2, 43, mean=47.0, sd=9.3) == \
        pytest.approx(-3.241449, abs=1e-4)


def _fake_abunds():
    case = [7, 6, 6, 8, 9, 7]
    mom = [0, 1, 0, 0, 1, 0]
    dad = [0, 0, 0, 1, 0, 0]
    refrabund = [1] * 6
    return [case, mom, dad], refrabund


def test_likelihoods_denovo_dominates_for_denovo_pattern():
    abunds, refrabund = _fake_abunds()
    lldn = likelihood_denovo(abunds, refrabund, mean=15.0)
    llfp = likelihood_false(abunds, refrabund, mean=15.0)
    llih = likelihood_inherited(abunds, mean=15.0)
    assert lldn > llfp
    assert lldn > llih


def test_likelihoods_inherited_dominates_for_inherited_pattern():
    case = [14, 15, 16, 15, 14, 15]
    mom = [15, 16, 15, 14, 15, 16]
    dad = [0, 0, 0, 0, 0, 0]
    abunds = [case, mom, dad]
    refrabund = [1] * 6
    lldn = likelihood_denovo(abunds, refrabund, mean=30.0)
    llih = likelihood_inherited(abunds, mean=30.0)
    assert llih > lldn


KSIZE = 21


@pytest.fixture(scope='module')
def scoring_trio():
    rng = random.Random(555)
    genome = simdata.make_genome(rng, 3000)
    snvpos = 1500
    child_genome, ref, alt = simdata.apply_snv(genome, snvpos, rng=rng)
    # proband is het: half reads from each haplotype
    child_reads = (simdata.tiled_reads(child_genome, 100, 10, 'childA') +
                   simdata.tiled_reads(genome, 100, 10, 'childB'))
    mom_reads = simdata.tiled_reads(genome, 100, 5, 'mom')
    dad_reads = simdata.tiled_reads(genome, 100, 5, 'dad')

    def count(reads):
        from kevlar_tpu.batch import batches_from_records
        ct = Sketch(KSIZE, 1000003, 4, counter_bits=8)
        for b in batches_from_records(iter(reads)):
            ct.consume_batch(b.bases)
        return ct

    case, mom, dad = count(child_reads), count(mom_reads), count(dad_reads)
    refr = Sketch(KSIZE, 1000003, 4, counter_bits=4)
    refr.consume(genome)
    return dict(genome=genome, child=child_genome, snvpos=snvpos, ref=ref,
                alt=alt, case=case, mom=mom, dad=dad, refr=refr)


def test_spanning_kmer_abundances_drops_refr_kmers(scoring_trio):
    d = scoring_trio
    p = d['snvpos']
    altseq = d['child'][p - KSIZE + 1:p + KSIZE]
    refseq = d['genome'][p - KSIZE + 1:p + KSIZE]
    abunds, refrabund, ndropped = spanning_kmer_abundances(
        altseq, refseq, d['case'], [d['mom'], d['dad']], d['refr'])
    assert ndropped == 0
    assert len(abunds[0]) == KSIZE
    assert all(a >= 6 for a in abunds[0])       # het coverage ~10
    assert all(a == 0 for a in abunds[1])
    assert all(a == 0 for a in abunds[2])
    assert all(r == 1 for r in refrabund)       # unique in genome
    # k-mers present in the reference genome get dropped
    refseq_only = d['genome'][100:100 + 2 * KSIZE - 1]
    abunds2, _, ndropped2 = spanning_kmer_abundances(
        refseq_only, refseq_only, d['case'], [d['mom'], d['dad']], d['refr'])
    assert ndropped2 == KSIZE
    assert abunds2[0] == []


def test_simlike_scores_denovo_call(scoring_trio):
    d = scoring_trio
    p = d['snvpos']
    call = Variant('chr1', p, d['ref'], d['alt'],
                   ALTWINDOW=d['child'][p - KSIZE + 1:p + KSIZE],
                   REFRWINDOW=d['genome'][p - KSIZE + 1:p + KSIZE],
                   PART='1')
    # (mu=10: tiled coverage of a het k-mer is ~10)
    out = list(simlike(iter([call]), d['case'], [d['mom'], d['dad']],
                       d['refr'], mu=10.0, sigma=3.0, casemin=6))
    assert len(out) == 1
    scored = out[0]
    assert scored.filterstr == 'PASS'
    assert scored.attribute('LIKESCORE') > 0
    assert scored.attribute('LLDN') > scored.attribute('LLIH')
    assert scored.attribute('LLDN') > scored.attribute('LLFP')
    assert scored.attribute('CALLCLASS') == '1'
    assert scored.format('Case', 'ALTABUND') is not None


def test_simlike_filters_inherited_call(scoring_trio):
    """A variant present in mom at high abundance scores poorly."""
    d = scoring_trio
    p = d['snvpos']
    refwin = d['genome'][p - KSIZE + 1:p + KSIZE]
    # swap: pretend ref window is the ALT (abundant in all three samples)
    call = Variant('chr1', p, d['alt'], d['ref'], ALTWINDOW=refwin,
                   REFRWINDOW=refwin, PART='2')
    out = list(simlike(iter([call]), d['case'], [d['mom'], d['dad']],
                       d['refr'], mu=10.0, sigma=3.0, casemin=6))
    assert len(out) == 1
    # every window k-mer exists in the reference genome -> all dropped ->
    # PassengerVariant (no spanning novel k-mers)
    assert 'PassengerVariant' in out[0].filterstr


def test_simlike_partition_best_call_wins(scoring_trio):
    d = scoring_trio
    p = d['snvpos']
    goodcall = Variant('chr1', p, d['ref'], d['alt'],
                       ALTWINDOW=d['child'][p - KSIZE + 1:p + KSIZE],
                       REFRWINDOW=d['genome'][p - KSIZE + 1:p + KSIZE],
                       PART='7')
    # weaker call in the same partition: shorter window, low abundance
    weak = Variant('chr1', p + 500, d['genome'][p + 500], 'A',
                   ALTWINDOW='T' * KSIZE, REFRWINDOW='G' * KSIZE, PART='7')
    out = list(simlike(iter([goodcall, weak]), d['case'],
                       [d['mom'], d['dad']], d['refr'], mu=10.0, sigma=3.0,
                       casemin=6))
    by_pos = {c.position: c for c in out}
    assert by_pos[p].attribute('CALLCLASS') == '7'
    assert 'PartitionScore' in by_pos[p + 500].filterstr or \
        'PassengerVariant' in by_pos[p + 500].filterstr


def test_vectorised_likelihoods_match_scalar():
    """The numpy-vectorised likelihood sums must match per-k-mer scalar
    evaluation via abund_log_prob."""
    import math
    rng = random.Random(2027)
    for trial in range(10):
        K = rng.randint(1, 40)
        case = [rng.randint(0, 40) for _ in range(K)]
        mom = [rng.randint(0, 6) for _ in range(K)]
        dad = [rng.randint(0, 6) for _ in range(K)]
        if rng.random() < 0.5:
            refr = [rng.randint(1, 4) for _ in range(K)]   # SNV mode
        else:
            refr = [None] * K                               # indel mode
        abunds = [case, mom, dad]
        mu, sd, eps = 25.0, 7.0, 0.001

        lldn = likelihood_denovo(abunds, refr, mean=mu, sd=sd, error=eps)
        ref_dn = sum(abund_log_prob(1, a, mean=mu, sd=sd) for a in case)
        for alist in (mom, dad):
            ref_dn += sum(abund_log_prob(0, a, refrabund=r, mean=mu,
                                         error=eps)
                          for a, r in zip(alist, refr))
        assert lldn == pytest.approx(ref_dn, rel=1e-9)

        llfp = likelihood_false(abunds, refr, mean=mu, error=eps)
        ref_fp = sum(
            abund_log_prob(0, a, refrabund=r, mean=mu, error=eps)
            for alist in abunds for a, r in zip(alist, refr))
        assert llfp == pytest.approx(ref_fp, rel=1e-9)

        llih = likelihood_inherited(abunds, mean=mu, sd=sd, error=eps)
        from kevlar_tpu.simlike import INHERITANCE_SCENARIOS
        ref_ih = 0.0
        for ac, am, ad in zip(case, mom, dad):
            best = None
            for gc, gm, gf in INHERITANCE_SCENARIOS:
                t = (abund_log_prob(gc, ac, mean=mu, sd=sd, error=eps)
                     + abund_log_prob(gm, am, mean=mu, sd=sd, error=eps)
                     + abund_log_prob(gf, ad, mean=mu, sd=sd, error=eps)
                     + math.log(1 / 15))
                best = t if best is None or t > best else best
            ref_ih += best
        ref_ih += math.log(15 / 11)
        assert llih == pytest.approx(ref_ih, rel=1e-9)


def _vcf_rows(calls):
    import io
    from kevlar_tpu import vcf as vcf_mod
    buf = io.StringIO()
    w = vcf_mod.VCFWriter(buf, source='test')
    for lbl in ('Case', 'Control1', 'Control2'):
        w.register_sample(lbl)
    w.write_header()
    for c in calls:
        w.write(c)
    return [l for l in buf.getvalue().splitlines() if not l.startswith('#')]


def _three_calls(d):
    p = d['snvpos']
    denovo = Variant('chr1', p, d['ref'], d['alt'],
                     ALTWINDOW=d['child'][p - KSIZE + 1:p + KSIZE],
                     REFRWINDOW=d['genome'][p - KSIZE + 1:p + KSIZE],
                     PART='1')
    boring = Variant('chr1', 100, d['genome'][100], 'N',
                     ALTWINDOW=d['genome'][100 - KSIZE + 1:100 + KSIZE],
                     REFRWINDOW=d['genome'][100 - KSIZE + 1:100 + KSIZE],
                     PART='2')
    # indel-shaped windows (different lengths -> refrabund=None mode)
    ins = Variant('chr1', 200, d['genome'][200], d['genome'][200] + 'ACGTA',
                  ALTWINDOW=d['child'][p - KSIZE + 1:p + KSIZE - 5],
                  REFRWINDOW=d['genome'][200 - KSIZE + 1:200 + KSIZE],
                  PART='3')
    return [denovo, boring, ins]


def test_batched_gather_matches_per_call(scoring_trio, monkeypatch):
    """The device-batch bundle gather (bucketed query_batch dispatches)
    must reproduce the per-call host gather bit-for-bit: identical VCF
    rows including LIKESCORE/LLDN/LLFP/LLIH and ALTABUND strings."""
    d = scoring_trio

    def run():
        return _vcf_rows(simlike(
            iter(_three_calls(d)), d['case'], [d['mom'], d['dad']],
            d['refr'], mu=10.0, sigma=3.0, casemin=6))

    monkeypatch.setenv('KEVLAR_SIMLIKE_BATCH', '0')
    host = run()
    monkeypatch.setenv('KEVLAR_SIMLIKE_BATCH', '1')
    batched = run()
    assert host == batched
    assert len(host) == 3


def test_batched_gather_default_for_sharded_sketches(scoring_trio):
    """Mesh-sharded sketches take the batched path automatically and
    produce the same scores as unsharded host gathering."""
    from kevlar_tpu.parallel import make_mesh, ShardedSketch
    d = scoring_trio
    host = _vcf_rows(simlike(
        iter(_three_calls(d)), d['case'], [d['mom'], d['dad']],
        d['refr'], mu=10.0, sigma=3.0, casemin=6))
    mesh = make_mesh(n_data=1, n_shard=8)
    sh = {k: ShardedSketch.from_sketch(mesh, d[k])
          for k in ('case', 'mom', 'dad', 'refr')}
    sharded = _vcf_rows(simlike(
        iter(_three_calls(d)), sh['case'], [sh['mom'], sh['dad']],
        sh['refr'], mu=10.0, sigma=3.0, casemin=6))
    assert host == sharded


def test_device_scoring_matches_host():
    """The (call, k-mer, scenario) device tensor scoring
    (ops/simlike_ops.py) must match the exact host likelihoods within
    float32 tolerance and preserve the score ranking."""
    import numpy as np
    from kevlar_tpu.ops import simlike_ops
    from kevlar_tpu.simlike import (_AbundanceBundle, likelihood_false,
                                    likelihood_inherited)

    rng = random.Random(77)
    bundles, expected = [], []
    for trial in range(50):
        K = rng.randint(0, 40)
        case = np.array([rng.randint(0, 40) for _ in range(K)])
        mom = np.array([rng.randint(0, 6) for _ in range(K)])
        dad = np.array([rng.randint(0, 6) for _ in range(K)])
        if rng.random() < 0.5:
            refr = [rng.randint(0, 4) for _ in range(K)]   # SNV mode
        else:
            refr = [None] * K                              # indel mode
        b = _AbundanceBundle(case, [mom, dad], refr, 0)
        bundles.append(b)
        abunds = b.aslists()
        expected.append((
            likelihood_denovo(abunds, refr, mean=25.0, sd=7.0, error=0.001),
            likelihood_false(abunds, refr, mean=25.0, error=0.001),
            likelihood_inherited(abunds, mean=25.0, sd=7.0, error=0.001)))

    lldn, llfp, llih = simlike_ops.score_bundles(
        bundles, mean=25.0, sd=7.0, error=0.001)
    got_scores, exp_scores = [], []
    for i, (edn, efp, eih) in enumerate(expected):
        assert lldn[i] == pytest.approx(edn, rel=2e-5, abs=2e-3)
        assert llfp[i] == pytest.approx(efp, rel=2e-5, abs=2e-3)
        assert llih[i] == pytest.approx(eih, rel=2e-5, abs=2e-3)
        got_scores.append(lldn[i] - max(llfp[i], llih[i]))
        exp_scores.append(edn - max(efp, eih))
    assert np.array_equal(np.argsort(got_scores), np.argsort(exp_scores))


def test_device_scoring_end_to_end(scoring_trio, monkeypatch):
    """simlike with KEVLAR_SIMLIKE_DEVICE=1 must produce the same PASS
    calls and near-identical LIKESCOREs as the host path."""
    monkeypatch.setenv('KEVLAR_SIMLIKE_BATCH', '1')
    d = scoring_trio
    p = d['snvpos']

    def run():
        call = Variant('chr1', p, d['ref'], d['alt'],
                       ALTWINDOW=d['child'][p - KSIZE + 1:p + KSIZE],
                       REFRWINDOW=d['genome'][p - KSIZE + 1:p + KSIZE],
                       PART='1')
        out = list(simlike(iter([call]), d['case'], [d['mom'], d['dad']],
                           d['refr'], mu=10.0, sigma=3.0, casemin=6))
        return {(c.seqid, c.position): (c.filterstr,
                                        c.attribute('LIKESCORE'))
                for c in out}

    monkeypatch.delenv('KEVLAR_SIMLIKE_DEVICE', raising=False)
    host = run()
    monkeypatch.setenv('KEVLAR_SIMLIKE_DEVICE', '1')
    dev = run()
    assert set(host) == set(dev)
    for key in host:
        assert host[key][0] == dev[key][0]
        assert dev[key][1] == pytest.approx(host[key][1], rel=1e-4,
                                            abs=1e-2)


def _trough_trio(rng=None):
    """Case sketch whose ALT-window abundance has a below-casemin trough
    (het coverage dip), controls empty: CaseAbundance fires while the
    likelihood is decisively de novo."""
    rng = rng or random.Random(777)
    altwindow = ''.join(rng.choice('ACGT') for _ in range(2 * KSIZE - 1))
    refrwindow = ''.join(rng.choice('ACGT') for _ in range(2 * KSIZE - 1))
    case = Sketch(KSIZE, 1000003, 4, counter_bits=8)
    for _ in range(10):
        case.consume(altwindow)               # every k-mer ~10
    for _ in range(10):
        case.consume(altwindow[:KSIZE + 10])  # first 11 k-mers ~20
    mom = Sketch(KSIZE, 1000003, 4, counter_bits=8)
    dad = Sketch(KSIZE, 1000003, 4, counter_bits=8)
    refr = Sketch(KSIZE, 1000003, 4, counter_bits=4)
    refr.consume(refrwindow)
    call = Variant('chr1', 100, 'A', 'C', ALTWINDOW=altwindow,
                   REFRWINDOW=refrwindow, PART='9')
    return call, case, [mom, dad], refr


def test_case_abund_gate_rescues_likelihood_confirmed_call():
    """A sole CaseAbundance filter is rescinded when LIKESCORE clears the
    gate (the coverage-trough failure mode: run of below-casemin ALT
    k-mers in a call the likelihood model confirms as de novo)."""
    call, case, controls, refr = _trough_trio()
    out = list(simlike(iter([call]), case, controls, refr, mu=20.0,
                       sigma=6.0, casemin=15, caseabundlow=5,
                       caseabundgate=50.0))
    assert len(out) == 1
    assert out[0].attribute('LIKESCORE') > 50.0
    assert out[0].filterstr == 'PASS'
    assert out[0].attribute('CALLCLASS') == '9'


def test_case_abund_gate_zero_restores_reference_semantics():
    call, case, controls, refr = _trough_trio()
    out = list(simlike(iter([call]), case, controls, refr, mu=20.0,
                       sigma=6.0, casemin=15, caseabundlow=5,
                       caseabundgate=0.0))
    assert out[0].filterstr == 'CaseAbundance'


def test_case_abund_gate_spares_combined_filters():
    """The gate only rescues a SOLE CaseAbundance filter: corroborating
    evidence from another heuristic (here ControlAbundance) keeps the
    call filtered regardless of score."""
    call, case, controls, refr = _trough_trio()
    altwindow = call.attribute('ALTWINDOW')
    for _ in range(5):                 # 5 leading ALT k-mers abundant in mom
        controls[0].consume(altwindow[:KSIZE + 4])
    out = list(simlike(iter([call]), case, controls, refr, mu=20.0,
                       sigma=6.0, casemin=15, caseabundlow=5, ctrlmax=1,
                       ctrlabundhigh=4, caseabundgate=1e-9))
    assert 'CaseAbundance' in out[0].filterstr
    assert 'ControlAbundance' in out[0].filterstr
