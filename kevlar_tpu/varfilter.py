"""``varfilter`` stage: flag calls overlapping user-specified BED regions."""

import kevlar_tpu
from kevlar_tpu.intervalforest import IntervalForest


def load_predictions(varcalls):
    kevlar_tpu.plog('[kevlar::varfilter] Loading predictions to filter')
    index = IntervalForest()
    for call in varcalls:
        index.insert(*call.region, data=call)
    return index


def varfilter(callstream, maskstream):
    callindex = load_predictions(callstream)
    kevlar_tpu.plog('[kevlar::varfilter] Filtering preliminary variant calls')
    from kevlar_tpu import vcf as vcf_mod
    for chrom, start, end, data in maskstream:
        hits = callindex.query(chrom, start, end)
        for interval in hits:
            interval.data.filter(vcf_mod.VariantFilter.UserFilter)
    for varcall in callindex:
        yield varcall


def main(args):
    from kevlar_tpu import vcf as vcf_mod
    reader = vcf_mod.vcfstream(args.vcf)
    bedstream = kevlar_tpu.parse_bed(kevlar_tpu.open(args.filt, 'r'))
    outstream = kevlar_tpu.open(args.out, 'w')
    writer = vcf_mod.VCFWriter(outstream, source='kevlar::varfilter')
    writer.write_header()
    for varcall in varfilter(reader, bedstream):
        writer.write(varcall)
