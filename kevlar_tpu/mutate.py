"""``mutate`` stage: apply an explicit mutation table to a genome."""

from collections import defaultdict, namedtuple

import kevlar_tpu
from kevlar_tpu.sequence import Record, write_record, parse_augmented_fastx

Mutation = namedtuple('Mutation', 'seq pos type data')
char_to_index = {'A': 0, 'C': 1, 'G': 2, 'T': 3}
index_to_char = {0: 'A', 1: 'C', 2: 'G', 3: 'T'}


def load_mutations(instream, logstream=None):
    mutations = defaultdict(list)
    count = 0
    for line in instream:
        if line.startswith('#') or line.strip() == '':
            continue
        try:
            sequence, offset, vartype, data = line.strip().split()
        except ValueError:
            raise ValueError('error parsing mutation: ' + line)
        if vartype not in ['snv', 'ins', 'del', 'inv']:
            raise ValueError('invalid variant type "{:s}"'.format(vartype))
        mutations[sequence].append(
            Mutation(seq=sequence, pos=int(offset), type=vartype, data=data))
        count += 1
    kevlar_tpu.plog('    loaded {:d} mutations on {:d} sequences'.format(
        count, len(mutations)))
    return mutations


def mutate_snv(sequence, mutation):
    refrbase = sequence[mutation.pos]
    newindex = (char_to_index[refrbase] + int(mutation.data)) % 4
    newbase = index_to_char[newindex]
    return sequence[:mutation.pos] + newbase + sequence[mutation.pos + 1:]


def mutate_insertion(sequence, mutation):
    return sequence[:mutation.pos] + mutation.data + sequence[mutation.pos:]


def mutate_deletion(sequence, mutation):
    del_length = int(mutation.data)
    return sequence[:mutation.pos] + sequence[mutation.pos + del_length:]


def mutate_inversion(sequence, mutation):
    inv_length = int(mutation.data)
    prefix = sequence[:mutation.pos]
    suffix = sequence[mutation.pos + inv_length:]
    if mutation.pos == 0:
        invseq = sequence[mutation.pos + inv_length - 1::-1]
    else:
        invseq = sequence[mutation.pos + inv_length - 1:mutation.pos - 1:-1]
    return prefix + invseq + suffix


mutation_functions = {
    'snv': mutate_snv,
    'ins': mutate_insertion,
    'del': mutate_deletion,
    'inv': mutate_inversion,
}


def mutate_sequence(sequence, mutlist):
    for mutation in mutlist:
        sequence = mutation_functions[mutation.type](sequence, mutation)
    return sequence


def mutate_genome(infile, mutations):
    parser = parse_augmented_fastx(kevlar_tpu.open(infile, 'r'))
    for record in parser:
        sequence = record.sequence
        if record.name in mutations:
            mutlist = sorted(mutations[record.name], key=lambda m: m.pos,
                             reverse=True)
            sequence = mutate_sequence(sequence, mutlist)
        yield Record(name=record.name, sequence=sequence)


def main(args):
    kevlar_tpu.plog('[kevlar::mutate] loading mutations')
    mutations = load_mutations(kevlar_tpu.open(args.mutations, 'r'))
    kevlar_tpu.plog('[kevlar::mutate] mutating genome')
    outstream = kevlar_tpu.open(args.out, 'w')
    for record in mutate_genome(args.genome, mutations):
        write_record(record, outstream)
