"""``call`` stage: align contigs to reference cutouts and call variants.

Parity with /root/reference/kevlar/call.py: per partition, every contig is
aligned to every cutout; only interpretable alignments with the optimal score
are reported; calls are deduplicated by (seqid, pos) keeping the longest
window; adjacent SNVs merge into MNVs; targets longer than
``--max-target-length`` become no-calls; ``--gen-mask`` persists a
variant-spanning-k-mer Bloom mask for reuse.
"""

from collections import defaultdict

import kevlar_tpu
from kevlar_tpu import seqio
from kevlar_tpu.varmap import VariantMapping
from kevlar_tpu.vcf import VariantFilter as vf


def alignments_to_report(alignments):
    """Pick the interpretable alignment(s) with the optimal score."""
    if len(alignments) <= 1:
        return alignments
    scrtbl = [aln for aln in alignments if aln.vartype is not None]
    finallist = scrtbl if scrtbl else alignments
    bestscore = max(aln.score for aln in finallist)
    return [aln for aln in finallist if aln.score == bestscore]


def dedup(callstream):
    calls = {}
    for call in callstream:
        if call.seqid not in calls:
            calls[call.seqid] = defaultdict(set)
        calls[call.seqid][call.position].add(call)
    for seqid in sorted(calls):
        for position in sorted(calls[seqid]):
            sortedcalls = sorted(
                calls[seqid][position], key=lambda call: call.windowlength,
                reverse=True)
            yield sortedcalls[0]


def merge_adjacent(callstream):
    prev = None
    for call in callstream:
        if prev is not None:
            trymerge = prev.test_merge(call)
            if trymerge is not None:
                call = trymerge
                prev = None
        if prev is not None:
            yield prev
        prev = call
    if prev is not None:
        yield prev


def prelim_call(targetlist, querylist, partid=None, match=1, mismatch=2,
                gapopen=5, gapextend=0, ksize=31, refrfile=None, debug=False,
                mindist=5, homopolyfilt=True, maxtargetlen=10000):
    """The core calling procedure, as a generator."""
    for query in sorted(querylist, reverse=True, key=len):
        alignments = []
        for target in sorted(targetlist, key=lambda cutout: cutout.defline):
            nocall = bool(maxtargetlen and len(target) > maxtargetlen)
            mapping = VariantMapping(
                query, target, match=match, mismatch=mismatch,
                gapopen=gapopen, gapextend=gapextend,
                homopolyfilt=homopolyfilt, nocall=nocall)
            alignments.append(mapping)
        aligns2report = alignments_to_report(alignments)
        for alignment in aligns2report:
            if debug:
                kevlar_tpu.plog(
                    'DEBUG ', alignment.cutout.defline, ' vs ',
                    alignment.contig.name, '\n', str(alignment), sep='',
                    end='\n\n')
            for varcall in alignment.call_variants(ksize, mindist):
                if partid is not None:
                    varcall.annotate('PART', partid)
                yield varcall


def call(*args, **kwargs):
    """prelim_call + dedup + adjacent-SNV merge."""
    for varcall in merge_adjacent(dedup(prelim_call(*args, **kwargs))):
        yield varcall


def load_contigs(contigstream):
    kevlar_tpu.plog('[kevlar::call] Loading contigs into memory by partition')
    contigs_by_partition = {}
    nparts = 0
    ncontigs = 0
    for partid, contiglist in contigstream:
        nparts += 1
        ncontigs += len(contiglist)
        contigs_by_partition[partid] = contiglist
    kevlar_tpu.plog('[kevlar::call] Loaded {} contigs from {} '
                    'partitions'.format(ncontigs, nparts))
    return contigs_by_partition


def make_call_mask(calls, ksize, maskmem, maskmaxfpr=0.01, maskfile=None,
                   logprefix='[kevlar::call]'):
    """Build a Bloom mask of ALTWINDOW k-mers from a call set."""
    from kevlar_tpu import sketch as sketch_mod
    buckets = int(maskmem) * sketch_mod.BUCKETS_PER_BYTE[1] // 4
    mask = sketch_mod.Sketch(ksize, buckets, 4, counter_bits=1,
                             backend='host')
    for varcall in calls:
        window = varcall.attribute('ALTWINDOW')
        if window is not None and len(window) >= ksize:
            mask.consume(window)
    fpr = sketch_mod.estimate_fpr(mask)
    if fpr > maskmaxfpr:
        message = 'WARNING: mask FPR is {:.4f}'.format(fpr)
        message += '; exceeds user-specified limit of {:.4f}'.format(
            maskmaxfpr)
        kevlar_tpu.plog(logprefix, message)
    if maskfile:
        mask.save(maskfile)
    return mask


def main(args):
    outstream = kevlar_tpu.open(args.out, 'w')
    from kevlar_tpu import vcf as vcf_mod
    from kevlar_tpu import reference as reference_mod
    writer = vcf_mod.VCFWriter(
        outstream, source='kevlar::call', refr=args.refr)
    writer.write_header()

    contigstream = seqio.parse_partitioned_reads(
        kevlar_tpu.parse_augmented_fastx(
            kevlar_tpu.open(args.queryseq, 'r')))
    contigs_by_partition = load_contigs(contigstream)

    gdnastream = seqio.parse_partitioned_reads(
        reference_mod.load_refr_cutouts(
            kevlar_tpu.open(args.targetseq, 'r')))
    allcalls = []
    for partid, gdnas in gdnastream:
        if partid not in contigs_by_partition:
            continue
        contigs = contigs_by_partition[partid]
        caller = call(
            gdnas, contigs, partid, match=args.match, mismatch=args.mismatch,
            gapopen=args.open, gapextend=args.extend, ksize=args.ksize,
            refrfile=args.refr, debug=args.debug, mindist=5,
            homopolyfilt=not args.no_homopoly_filter,
            maxtargetlen=args.max_target_length)
        for varcall in caller:
            if args.gen_mask:
                allcalls.append(varcall)
            writer.write(varcall)
    if args.gen_mask:
        kevlar_tpu.plog('[kevlar::call] generating mask of variant-spanning '
                        'k-mers')
        make_call_mask(allcalls, args.ksize, args.mask_mem,
                       args.mask_max_fpr, args.gen_mask)
