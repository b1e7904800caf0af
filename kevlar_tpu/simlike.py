"""``simlike`` stage: trio likelihood scoring of variant calls.

Parity with /root/reference/kevlar/simlike.py, implemented scipy-free:
- genotype 0 -> log-binomial(scaledmean = mean*refrabund, error); indels use
  refrabund=1 and error*0.01; abundance clamped at scaledmean; log C(n,k)
  via lgamma (exact for integral n, and well-defined for fractional means
  where scipy's exact-mode comb silently floors)
- genotype 1 -> Normal(mean/2, sd/2) logpdf; genotype 2 -> Normal(mean, sd)
- LLDN = case het + controls absent; LLFP = all absent; LLIH = per-k-mer max
  over the 11 trio inheritance scenarios + log(15/11) correction
- LIKESCORE = LLDN - max(LLFP, LLIH)
- heuristic filters: PassengerVariant, CaseAbundance (consecutive low case
  k-mers), ControlAbundance (too many high control k-mers), window sanity
- per-partition: only max-scoring PASS calls keep CALLCLASS; ties above
  ambigthresh -> AmbiguousCall; final sort by LIKESCORE descending.
"""

from collections import defaultdict
from math import log, lgamma, pi, isclose, inf

import kevlar_tpu


class KevlarSampleLabelingError(ValueError):
    pass


LOG_2PI = log(2.0 * pi)


def norm_logpdf(x, mu, sd):
    z = (x - mu) / sd
    return -0.5 * z * z - log(sd) - 0.5 * LOG_2PI


def log_choose(n, k):
    """log C(n, k) via lgamma; n may be fractional (scaled means)."""
    if k < 0 or k > n:
        return -inf
    return lgamma(n + 1.0) - lgamma(k + 1.0) - lgamma(n - k + 1.0)


def discard_nonunique_kmers(altseq, case, controls, refr):
    case_counts = case.get_kmer_counts(altseq)
    alt_counts_refr = refr.get_kmer_counts(altseq)
    case_counts_valid = [
        c for c, r in zip(case_counts, alt_counts_refr) if r == 0]
    ctrl_counts_valid = []
    for control in controls:
        ctrl_counts = control.get_kmer_counts(altseq)
        ctrl_counts_valid.append(
            [c for c, r in zip(ctrl_counts, alt_counts_refr) if r == 0])
    return case_counts_valid, ctrl_counts_valid, alt_counts_refr


def discard_outlier_abunds(case_counts, ctrl_counts):
    meanabund = sum(case_counts) / len(case_counts)
    case_counts_valid = [a for a in case_counts if abs(a - meanabund) < 20]
    ctrl_counts_valid = []
    for control in ctrl_counts:
        meanabund = sum(control) / len(control)
        ctrl_counts_valid.append(
            [a for a in control if abs(a - meanabund) < 20])
    return case_counts_valid, ctrl_counts_valid


def spanning_kmer_abundances(altseq, refrseq, case, controls, refr,
                             dropoutliers=False):
    """Abundances of variant-spanning k-mers; drops k-mers present in the
    reference genome; returns (abundances, refr_abunds, ndropped)."""
    orig_nkmers = len(altseq) - case.ksize() + 1
    case_counts, ctrl_counts, alt_counts_refr = discard_nonunique_kmers(
        altseq, case, controls, refr)
    if dropoutliers:
        case_counts, ctrl_counts = discard_outlier_abunds(
            case_counts, ctrl_counts)
    ndropped = orig_nkmers - len(case_counts)
    abundances = [case_counts] + ctrl_counts
    if len(altseq) == len(refrseq):  # SNV or MNV
        refr_counts = refr.get_kmer_counts(refrseq)
        refr_abunds = [
            c for c, r in zip(refr_counts, alt_counts_refr) if r == 0]
    else:  # INDEL
        refr_abunds = [None] * len(case_counts)
    return abundances, refr_abunds, ndropped


def abund_log_prob(genotype, abundance, refrabund=None, mean=30.0, sd=8.0,
                   error=0.001):
    """log P(abundance | genotype in {0, 1, 2})."""
    if genotype == 0:
        if not refrabund:  # INDEL mode
            refrabund = 1
            error *= 0.01
        scaledmean = mean * refrabund
        if abundance > scaledmean:
            abundance = scaledmean
        return (log_choose(scaledmean, abundance)
                + (abundance * log(error))
                + ((scaledmean - abundance) * log(1.0 - error)))
    elif genotype == 1:
        return norm_logpdf(abundance, mean / 2, sd / 2)
    elif genotype == 2:
        return norm_logpdf(abundance, mean, sd)


# ---------------------------------------------------------------------------
# Vectorised likelihood sums (numpy): identical math to abund_log_prob,
# evaluated across all k-mers at once.  The scalar abund_log_prob remains the
# reference implementation (golden-value tests); tests/test_simlike.py checks
# the vectorised paths against it.
# ---------------------------------------------------------------------------

import functools

import numpy as _np


@functools.lru_cache(maxsize=1 << 16)
def _lgamma_cached(x):
    return lgamma(x)


_lgamma_vec = _np.vectorize(_lgamma_cached, otypes=[float])


def _lp0_vec(abunds, refrabunds, mean, error):
    """Vectorised genotype-0 log-probabilities.

    refrabunds entries of None/0 trigger INDEL mode (refrabund=1, error*0.01)
    per-element, matching the scalar code.
    """
    a = _np.asarray(abunds, dtype=float)
    r = _np.array([0.0 if x is None else float(x) for x in refrabunds])
    indel = r == 0.0
    r = _np.where(indel, 1.0, r)
    err = _np.where(indel, error * 0.01, error)
    scaledmean = mean * r
    a = _np.minimum(a, scaledmean)
    nck = (_lgamma_vec(scaledmean + 1.0) - _lgamma_vec(a + 1.0)
           - _lgamma_vec(scaledmean - a + 1.0))
    return nck + a * _np.log(err) + (scaledmean - a) * _np.log(1.0 - err)


def _lp_het_vec(abunds, mean, sd):
    a = _np.asarray(abunds, dtype=float)
    z = (a - mean / 2) / (sd / 2)
    return -0.5 * z * z - _np.log(sd / 2) - 0.5 * LOG_2PI


def _lp_hom_vec(abunds, mean, sd):
    a = _np.asarray(abunds, dtype=float)
    z = (a - mean) / sd
    return -0.5 * z * z - _np.log(sd) - 0.5 * LOG_2PI


def likelihood_denovo(abunds, refrabunds, mean=30.0, sd=8.0, error=0.001):
    assert len(abunds[1]) == len(refrabunds)
    assert len(abunds[2]) == len(refrabunds)
    if len(abunds[0]) == 0:
        return 0.0
    logsum = float(_np.sum(_lp_het_vec(abunds[0], mean, sd)))
    for altabunds in abunds[1:]:
        logsum += float(_np.sum(_lp0_vec(altabunds, refrabunds, mean, error)))
    return logsum


def likelihood_false(abunds, refrabunds, mean=30.0, error=0.001):
    assert len(abunds[1]) == len(refrabunds)
    assert len(abunds[2]) == len(refrabunds)
    logsum = 0.0
    for altabunds in abunds:
        if len(altabunds):
            logsum += float(_np.sum(_lp0_vec(altabunds, refrabunds, mean,
                                             error)))
    return logsum


INHERITANCE_SCENARIOS = [
    (1, 0, 1), (1, 0, 2),
    (1, 1, 0), (1, 1, 1), (1, 1, 2),
    (1, 2, 0), (1, 2, 1),
    (2, 1, 1), (2, 1, 2),
    (2, 2, 1), (2, 2, 2),
]


def likelihood_inherited(abunds, mean=30.0, sd=8.0, error=0.001):
    """Max-likelihood inheritance scenario per k-mer (trios only),
    vectorised over (k-mer, scenario)."""
    K = len(abunds[0])
    if K == 0:
        return log(15.0 / 11.0)
    # per-person log-probs for genotypes 0/1/2: [3 genotypes, K]
    per_person = []
    for a in (abunds[0], abunds[1], abunds[2]):
        # genotype 0 with no refrabund: the scalar code's "INDEL mode"
        # (refrabund=1, error*0.01) — parity with the reference, which never
        # passes refrabund in the inheritance scan (simlike.py:688-690)
        none_refr = [None] * len(a)
        lp = _np.stack([
            _lp0_vec(a, none_refr, mean, error),
            _lp_het_vec(a, mean, sd),
            _lp_hom_vec(a, mean, sd),
        ])
        per_person.append(lp)
    scen = _np.asarray(INHERITANCE_SCENARIOS)  # [S, 3]
    totals = (per_person[0][scen[:, 0]] + per_person[1][scen[:, 1]]
              + per_person[2][scen[:, 2]]) + log(1.0 / 15.0)  # [S, K]
    logsum = float(_np.sum(_np.max(totals, axis=0)))
    return log(15.0 / 11.0) + logsum


def joinlist(thelist):
    if len(thelist) == 0:
        return '.'
    return ','.join(str(v) for v in thelist)


def calc_likescore(call, altabund, refrabund, mu, sigma, epsilon):
    lldn = likelihood_denovo(altabund, refrabund, mean=mu, sd=sigma,
                             error=epsilon)
    llfp = likelihood_false(altabund, refrabund, mean=mu, error=epsilon)
    llih = likelihood_inherited(altabund, mean=mu, sd=sigma, error=epsilon)
    likescore = lldn - max(llfp, llih)
    call.annotate('LLDN', lldn)
    call.annotate('LLFP', llfp)
    call.annotate('LLIH', llih)
    call.annotate('LIKESCORE', likescore)


def default_sample_labels(nsamples):
    samples = ['Control{:d}'.format(i) for i in range(nsamples)]
    samples[0] = 'Case'
    return samples


def annotate_abundances(call, abundances, refrabund, samplelabels):
    if len(refrabund) > 0 and None not in refrabund:
        call.annotate('REFRCOPYNUM', ','.join(map(str, refrabund)))
    for sample, abundlist in zip(samplelabels, abundances):
        call.format(sample, 'ALTABUND', joinlist(abundlist))


def process_partition(partitionid, calls, ambigthresh=10):
    passcalls = [c for c in calls if c.filterstr == 'PASS']
    if len(passcalls) == 0:
        return
    maxscore = max(c.attribute('LIKESCORE') for c in passcalls)
    maxcalls = []
    for c in calls:
        passed = c.filterstr == 'PASS'
        optimal = isclose(c.attribute('LIKESCORE'), maxscore)
        if passed and optimal:
            maxcalls.append(c)
        else:
            c.filter(kevlar_tpu.vcf.VariantFilter.PartitionScore)
    for c in maxcalls:
        if ambigthresh and len(maxcalls) > ambigthresh:
            c.filter(kevlar_tpu.vcf.VariantFilter.AmbiguousCall)
        else:
            c.annotate('CALLCLASS', partitionid)


def window_check(call, ksize=31):
    altspan = call.window
    refspan = call.refrwindow
    altmissing = altspan is None
    refmissing = refspan is None
    altshort = altspan and len(altspan) < ksize
    refshort = refspan and len(refspan) < ksize
    if altmissing or refmissing or altshort or refshort:
        if call.filterstr == 'PASS':
            kevlar_tpu.plog('[kevlar::simlike] WARNING: stubbornly refusing '
                            'to compute likelihood for', str(call))
        return True
    return False


def check_hash_spanning_novel_kmers(call, caseabundlist, casemin):
    abovethresh = [a for a in caseabundlist if a >= casemin]
    if len(abovethresh) == 0:
        call.filter(kevlar_tpu.vcf.VariantFilter.PassengerVariant)


def check_case_abund_low(call, caseabundlist, casemin, caseabundlow):
    if not caseabundlow or caseabundlow <= 0:
        return
    # filter if `caseabundlow` consecutive case k-mers are below casemin
    run = 0
    for a in caseabundlist:
        if a < casemin:
            run += 1
            if run >= caseabundlow:
                call.filter(kevlar_tpu.vcf.VariantFilter.CaseAbundance)
                return
        else:
            run = 0


def check_ctrl_abund_high(call, ctrlabundlists, ctrlmax, ctrlabundhigh):
    if not ctrlabundhigh or ctrlabundhigh <= 0:
        return
    for abundlist in ctrlabundlists:
        toohigh = [a for a in abundlist if a > ctrlmax]
        if len(toohigh) > ctrlabundhigh:
            call.filter(kevlar_tpu.vcf.VariantFilter.ControlAbundance)
            break


def simlike(variants, case, controls, refr, mu=30.0, sigma=8.0, epsilon=0.001,
            casemin=6, ctrlmax=1, caseabundlow=5, ctrlabundhigh=4,
            samplelabels=None, fastmode=False, minlikescore=0.0,
            dropoutliers=False, ambigthresh=10):
    calls_by_partition = defaultdict(list)
    if samplelabels is None:
        samplelabels = default_sample_labels(len(controls) + 1)
    for call in variants:
        skipvar = fastmode and call.filterstr != 'PASS'
        if skipvar or window_check(call, case.ksize()):
            call.annotate('LIKESCORE', float('-inf'))
            calls_by_partition[call.attribute('PART')].append(call)
            continue
        altabund, refrabund, ndropped = spanning_kmer_abundances(
            call.window, call.refrwindow, case, controls, refr,
            dropoutliers=dropoutliers)
        call.annotate('DROPPED', ndropped)
        check_hash_spanning_novel_kmers(call, altabund[0], casemin)
        check_case_abund_low(call, altabund[0], casemin, caseabundlow)
        check_ctrl_abund_high(call, altabund[1:], ctrlmax, ctrlabundhigh)
        skipvar = fastmode and call.filterstr != 'PASS'
        if skipvar:
            call.annotate('LIKESCORE', float('-inf'))
            calls_by_partition[call.attribute('PART')].append(call)
            continue
        calc_likescore(call, altabund, refrabund, mu, sigma, epsilon)
        annotate_abundances(call, altabund, refrabund, samplelabels)
        calls_by_partition[call.attribute('PART')].append(call)

    allcalls = []
    for partitionid, calls in calls_by_partition.items():
        process_partition(partitionid, calls, ambigthresh=ambigthresh)
        allcalls.extend(calls)

    allcalls.sort(key=lambda c: c.attribute('LIKESCORE'), reverse=True)
    for call in allcalls:
        if call.attribute('LIKESCORE') < minlikescore:
            call.filter(kevlar_tpu.vcf.VariantFilter.LikelihoodFail)
        yield call


def main(args):
    from kevlar_tpu import sketch as sketch_mod
    from kevlar_tpu import vcf as vcf_mod
    nsamples = len(args.controls) + 1
    if args.sample_labels:
        nlabels = len(args.sample_labels)
        if nlabels and nlabels != nsamples:
            raise KevlarSampleLabelingError(
                'provided {:d} labels but {:d} samples'.format(
                    nlabels, nsamples))
    else:
        args.sample_labels = default_sample_labels(nsamples)

    kevlar_tpu.plog('[kevlar::simlike] Loading k-mer counts for each sample')
    case = sketch_mod.load(args.case)
    controls = [sketch_mod.load(c) for c in args.controls]
    refr = sketch_mod.load(args.refr)

    reader = vcf_mod.vcfstream(args.vcf)
    outstream = kevlar_tpu.open(args.out, 'w')
    writer = vcf_mod.VCFWriter(outstream, source='kevlar::simlike')
    for label in args.sample_labels:
        writer.register_sample(label)
    writer.write_header()

    kevlar_tpu.plog('[kevlar::simlike] Computing likelihood scores for '
                    'preliminary variant calls')
    calculator = simlike(
        reader, case, controls, refr, mu=args.mu, sigma=args.sigma,
        epsilon=args.epsilon, casemin=args.case_min, ctrlmax=args.ctrl_max,
        caseabundlow=args.case_abund_low, ctrlabundhigh=args.ctrl_abund_high,
        samplelabels=args.sample_labels, fastmode=args.fast_mode,
        minlikescore=args.min_like_score, dropoutliers=args.drop_outliers,
        ambigthresh=args.ambig_thresh)
    for call in calculator:
        writer.write(call)
