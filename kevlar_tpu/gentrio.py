"""``gentrio`` stage: simulate a trio with inherited and de novo variants.

Parity with /root/reference/kevlar/gentrio.py: random SNV/ins/del with
configurable weights, the 14 valid inheritance genotype scenarios, two
haplotype FASTAs per individual, and a truth VCF.
"""

import random
import sys

import kevlar_tpu
from kevlar_tpu.support import MutableString
from kevlar_tpu.vcf import Variant

nucl_to_index = {'A': 0, 'C': 1, 'G': 2, 'T': 3}
index_to_nucl = {0: 'A', 1: 'C', 2: 'G', 3: 'T'}

DWEIGHTS = {'snv': 0.8, 'ins': 0.1, 'del': 0.1}

# (child, mother, father) genotype codes: 0=hom ref, 1=het, 2=hom alt;
# only combinations consistent with Mendelian inheritance
inheritance_scenarios = [
    (0, 0, 1), (0, 1, 0), (0, 1, 1), (1, 0, 1), (1, 0, 2), (1, 1, 0),
    (1, 1, 1), (1, 1, 2), (1, 2, 0), (1, 2, 1), (2, 1, 1), (2, 1, 2),
    (2, 2, 1), (2, 2, 2),
]


def weighted_choice(values, weights, rng=random.Random()):
    assert len(values) == len(weights)
    total = sum(weights)
    r = rng.uniform(0, total)
    cumsum = 0
    for v, w in zip(values, weights):
        if cumsum + w >= r:
            return v
        cumsum += w
    raise AssertionError


def mutagenize(sequence, rng=None, rate=0.05):
    mutseq = []
    for nucl in sequence:
        if rng and rng.random() < rate:
            offset = rng.choice([1, 2, 3])
            nucl = index_to_nucl[(nucl_to_index[nucl] + offset) % 4]
        mutseq.append(nucl)
    return ''.join(mutseq)


def mutate_snv(sequence, position, offset, ksize=31):
    orignucl = sequence[position]
    newnucl = index_to_nucl[(nucl_to_index[orignucl] + offset) % 4]
    windowstart = max(position - ksize + 1, 0)
    windowend = min(position + ksize, len(sequence))
    refrwindow = sequence[windowstart:windowend]
    altwindow = (sequence[windowstart:position] + newnucl
                 + sequence[position + 1:windowend])
    return orignucl, newnucl, refrwindow, altwindow


def mutate_insertion(sequence, position, length, duplpos, rng=None, ksize=31):
    duplseq = mutagenize(sequence[duplpos:duplpos + length], rng, rate=0.05)
    refrseq = sequence[position - 1]
    altseq = refrseq + duplseq
    windowstart = max(position - ksize + 1, 0)
    windowend = min(position + ksize - 1, len(sequence))
    refrwindow = sequence[windowstart:windowend]
    altwindow = (sequence[windowstart:position] + duplseq
                 + sequence[position:windowend])
    return refrseq, altseq, refrwindow, altwindow


def mutate_deletion(sequence, position, length, ksize=31):
    delseq = sequence[position:position + length]
    altseq = sequence[position - 1]
    refrseq = altseq + delseq
    windowstart = max(position - ksize + 1, 0)
    windowend = min(position + length + ksize - 1, len(sequence))
    refrwindow = sequence[windowstart:windowend]
    altwindow = (sequence[windowstart:position]
                 + sequence[position + length:windowend])
    return refrseq, altseq, refrwindow, altwindow


def generate_mutations(sequences, n=10, ksize=31, weights=DWEIGHTS, rng=None):
    if rng is None:
        seed = random.randrange(sys.maxsize)
        kevlar_tpu.plog('[kevlar::gentrio] using random seed', seed)
        rng = random.Random(seed)
    if isinstance(rng, int):
        rng = random.Random(rng)
    weightkeys = sorted(weights.keys())
    weightvalues = [weights[k] for k in weightkeys]
    for _ in range(n):
        seqid = rng.choice(sorted(sequences.keys()))
        seq = sequences[seqid]
        seqlength = len(seq)
        position = rng.randint(0, seqlength - 1)
        muttype = weighted_choice(weightkeys, weightvalues, rng)
        if muttype == 'snv':
            offset = rng.randint(1, 3)
            refrseq, altseq, refrwindow, altwindow = mutate_snv(
                seq, position, offset, ksize)
        elif muttype == 'ins':
            length = rng.randint(5, 350)
            duplpos = rng.randint(0, seqlength)
            refrseq, altseq, refrwindow, altwindow = mutate_insertion(
                seq, position, length, duplpos, rng, ksize)
        elif muttype == 'del':
            length = rng.randint(5, 350)
            refrseq, altseq, refrwindow, altwindow = mutate_deletion(
                seq, position, length, ksize)
        else:
            raise ValueError('unknown mutation type {}'.format(muttype))
        yield Variant(seqid, position, refrseq, altseq, ALTWINDOW=altwindow,
                      REFRWINDOW=refrwindow)


def pick_inheritance_genotypes(rng):
    genotype_codes = rng.choice(inheritance_scenarios)
    genotypes = []
    for code in genotype_codes:
        if code == 0:
            genotype = '0/0'
        elif code == 2:
            genotype = '1/1'
        else:
            genotype = rng.choice(['0/1', '1/0'])
        genotypes.append(genotype)
    return tuple(genotypes)


def simulate_variant_genotypes(sequences, ninh=20, ndenovo=10,
                               weights=DWEIGHTS, rng=None):
    if rng is None:
        seed = random.randrange(sys.maxsize)
        kevlar_tpu.plog('[kevlar::gentrio] using random seed', seed)
        rng = random.Random(seed)
    if isinstance(rng, int):
        rng = random.Random(rng)

    for variant in generate_mutations(sequences, n=ninh, weights=weights,
                                      rng=rng):
        variant.annotate('GT', ','.join(pick_inheritance_genotypes(rng)))
        yield variant
    for variant in generate_mutations(sequences, n=ndenovo, weights=weights,
                                      rng=rng):
        genotypes = (rng.choice(['0/1', '1/0']), '0/0', '0/0')
        variant.annotate('GT', ','.join(genotypes))
        yield variant


def apply_mutation(sequence, position, refr, alt):
    if len(refr) == len(alt):  # SNV
        assert sequence[position] == refr
        sequence[position] = alt
    elif len(refr) < len(alt):  # Insertion
        sequence[position:position] = alt[1:]
    else:  # Deletion
        dellength = len(refr) - len(alt)
        del sequence[position:position + dellength]


def weights_str_to_dict(wstring):
    weights = {}
    for keyvaluepair in wstring.split(','):
        muttype, relfreq = keyvaluepair.split('=')
        weights[muttype] = float(relfreq)
    total = sum(weights.values())
    return {t: (v / total) for t, v in weights.items()}


def gentrio(sequences, outstreams, ninh=20, ndenovo=10, weights=DWEIGHTS,
            seed=None, upint=100, logstream=sys.stderr):
    assert len(outstreams) == 3
    mutator = simulate_variant_genotypes(
        sequences, ninh=ninh, ndenovo=ndenovo, weights=weights, rng=seed)
    variants = list(mutator)
    variants.sort(key=lambda v: v.position, reverse=True)

    for seqid, sequence in sequences.items():
        for ind in range(3):  # proband mother father
            haploseqs = [MutableString(sequence), MutableString(sequence)]
            for variant in variants:
                if variant.seqid != seqid:
                    continue
                genotype = variant.genotypes[ind]
                haplotypes = (genotype[0], genotype[2])
                for hapindex in range(2):
                    if haplotypes[hapindex] == '0':
                        continue
                    apply_mutation(
                        haploseqs[hapindex], variant.position,
                        variant._refr, variant._alt)
            print('>', seqid, '_haplo1\n', haploseqs[0], sep='',
                  file=outstreams[ind])
            print('>', seqid, '_haplo2\n', haploseqs[1], sep='',
                  file=outstreams[ind])

    variants.sort(key=lambda v: (v.seqid, v.position))
    for variant in variants:
        yield variant


def main(args):
    from kevlar_tpu import seqio
    seqfile = kevlar_tpu.open(args.genome, 'r')
    genomeseqs = seqio.parse_seq_dict(seqfile)

    samples = ('proband', 'mother', 'father')
    outfiles = ['{:s}-{:s}.fasta'.format(args.prefix, s) for s in samples]
    outstreams = [kevlar_tpu.open(outfile, 'w') for outfile in outfiles]

    vcfout = None
    if args.vcf:
        vcfout = kevlar_tpu.open(args.vcf, 'w')
        kevlar_tpu.vcf_header(vcfout, source='kevlar::gentrio',
                              infoheader=True)
    weights = weights_str_to_dict(args.weights)
    mutator = gentrio(
        genomeseqs, outstreams, ninh=args.inherited, ndenovo=args.de_novo,
        weights=weights, seed=args.seed)
    for variant in mutator:
        if vcfout:
            print(variant.vcf, file=vcfout)
    for outstream in outstreams:
        outstream.close()
