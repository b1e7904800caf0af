"""``alac`` stage: fused assemble → localize → align → call.

Parity with /root/reference/kevlar/alac.py: assemble all partitions, localize
all contigs in one pass over the reference, call per partition, sort calls by
(seqid, position), optional variant-spanning-k-mer mask generation.
"""

from collections import defaultdict

import kevlar_tpu
from kevlar_tpu import seqio


def alac(pstream, refrfile, threads=1, ksize=31, maxreads=10000, delta=50,
         seedsize=31, maxdiff=None, inclpattern=None, exclpattern=None,
         match=1, mismatch=2, gapopen=5, gapextend=0, min_ikmers=None,
         maskfile=None, maskmem=1e6, maskmaxfpr=0.01, maxtargetlen=10000):
    from kevlar_tpu import assemble as assemble_mod
    from kevlar_tpu import localize as localize_mod
    from kevlar_tpu import call as call_mod

    assembler = assemble_mod.assemble(pstream, maxreads=maxreads,
                                      threads=threads)
    contigs_by_partition = defaultdict(list)
    for partid, contig in assembler:
        if min_ikmers is not None and len(contig.annotations) < min_ikmers:
            continue
        contigs_by_partition[partid].append(contig)

    contigstream = [(pid, ctgs) for pid, ctgs in contigs_by_partition.items()]
    targeter = localize_mod.localize(
        contigstream, refrfile, seedsize=seedsize, delta=delta,
        maxdiff=maxdiff, inclpattern=inclpattern, exclpattern=exclpattern)
    targets_by_partition = defaultdict(list)
    for partid, gdna in targeter:
        targets_by_partition[partid].append(gdna)

    def call_partition(partid):
        gdnalist = targets_by_partition[partid]
        contigs = contigs_by_partition[partid]
        return list(call_mod.call(
            gdnalist, contigs, partid, match=match, mismatch=mismatch,
            gapopen=gapopen, gapextend=gapextend, ksize=ksize,
            refrfile=refrfile, maxtargetlen=maxtargetlen))

    partids = sorted(targets_by_partition)
    calls = []
    if threads and threads > 1:
        # the native aligner releases the GIL during the DP, so partitions
        # genuinely align in parallel (the reference advertises --threads
        # but runs serially, cli/alac.py:92-94 vs alac.py:19-67)
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=threads) as pool:
            for partcalls in pool.map(call_partition, partids):
                calls.extend(partcalls)
    else:
        for partid in partids:
            calls.extend(call_partition(partid))
    calls = sorted(calls, key=lambda c: (c.seqid, c.position))
    if maskfile:
        kevlar_tpu.plog('[kevlar::alac] generating mask of variant-spanning '
                        'k-mers')
        call_mod.make_call_mask(calls, ksize, maskmem, maskmaxfpr, maskfile,
                                logprefix='[kevlar::alac]')
    for varcall in calls:
        yield varcall


def main(args):
    from kevlar_tpu import vcf as vcf_mod
    readstream = kevlar_tpu.parse_augmented_fastx(
        kevlar_tpu.open(args.infile, 'r'))
    if args.part_id:
        pstream = seqio.parse_single_partition(readstream, args.part_id)
    else:
        pstream = seqio.parse_partitioned_reads(readstream)
    outstream = kevlar_tpu.open(args.out, 'w')
    workflow = alac(
        pstream, args.refr, threads=args.threads, ksize=args.ksize,
        maxreads=args.max_reads, delta=args.delta, seedsize=args.seed_size,
        maxdiff=args.max_diff, inclpattern=args.include,
        exclpattern=args.exclude, match=args.match, mismatch=args.mismatch,
        gapopen=args.open, gapextend=args.extend, min_ikmers=args.min_ikmers,
        maskfile=args.gen_mask, maskmem=args.mask_mem,
        maskmaxfpr=args.mask_max_fpr, maxtargetlen=args.max_target_length)
    writer = vcf_mod.VCFWriter(outstream, source='kevlar::alac',
                               refr=args.refr)
    writer.write_header()
    for varcall in workflow:
        writer.write(varcall)
