"""call-stage parity against the reference's own pinned expectations.

Mirrors /root/reference/kevlar/tests/test_call.py on the reference's
checked-in contig/cutout fixtures: variant-window derivation, the
funky-CIGAR canonicalisation cases, perfect-match nocalls, equally-optimal
alignment tie sets, SNV dedup, MNV merging, the homopolymer filter, and
the max-target-length matrix.
"""

import os

import pytest

import kevlar_tpu
from kevlar_tpu import reference, seqio
from kevlar_tpu.call import call, load_contigs
from kevlar_tpu.sequence import parse_augmented_fastx

DATA = '/root/reference/kevlar/tests/data/'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason='reference test data not mounted')


def data_file(name):
    return os.path.join(DATA, name)


def contigs(name):
    return list(parse_augmented_fastx(kevlar_tpu.open(data_file(name), 'r')))


def targets(name):
    return list(reference.load_refr_cutouts(
        kevlar_tpu.open(data_file(name), 'r')))


def by_partition(name, cutouts=False):
    if cutouts:
        stream = reference.load_refr_cutouts(
            kevlar_tpu.open(data_file(name), 'r'))
    else:
        stream = parse_augmented_fastx(kevlar_tpu.open(data_file(name), 'r'))
    return load_contigs(seqio.parse_partitioned_reads(stream))


def test_variant_window():
    """ALTWINDOW derivation on the ssc223 SNV (reference
    test_call.py:92-106)."""
    calls = list(call(targets('ssc223.gdna.fa'),
                      contigs('ssc223.contig.augfasta')))
    assert len(calls) == 1
    assert calls[0].window == ('TTATTTTTAACAAAGGAGCAAAGGAGCAAAGGGCAAATACA'
                               'ATGAGGCAAAGATAGTCTCT')


@pytest.mark.parametrize('part,coord,window', [
    (12, 7027071, 'CAGGGAGAGGCAGCCTGCCCTCAACCTGGGAGAGCACTGTCTAATCAGCTCCCATCTCA'
                  'GG'),
    (16, 25755121, 'TTTTGGTGTTTAGACATGAAGTCCTTGCCCATCGAGTTATGCCTATGTCCTGAATGCT'
                   'ATTGCCTAGG'),
    (23, 59459928, 'CAGGCGTGAGCCACCGCGCCTGGCCAGGAGCATTGTTTGAACCCAGAAGGCGGAGGTT'
                   'GCA'),
    (192, 28556906, 'AAAATACAAAAATTAGCCAGGCATGGTGGTGCATGCCTGTAATACCAGCCTTTTAGA'
                    'GGC'),
])
def test_funky_cigar(part, coord, window):
    """Spurious trailing-M CIGARs canonicalise to clean SNV calls
    (reference test_call.py:109-133)."""
    calls = list(call(
        targets('funkycigar/part.cc{:d}.gdna.fa.gz'.format(part)),
        contigs('funkycigar/part.cc{:d}.contig.fa.gz'.format(part))))
    assert len(calls) == 1
    assert calls[0].seqid == '17'
    assert calls[0].position == coord - 1
    assert calls[0].attribute('ALTWINDOW') == window


def test_funky_cigar_deletion():
    calls = list(call(targets('funkycigar/deletion.gdna.fa'),
                      contigs('funkycigar/deletion.contig.fa')))
    assert len(calls) == 1
    assert calls[0].seqid == 'chr42'
    assert calls[0].position == 53644
    assert calls[0]._refr == 'ATGTCTGTTTTCTTAACCT'
    assert calls[0]._alt == 'A'
    assert calls[0].attribute('CONTIG') == \
        contigs('funkycigar/deletion.contig.fa')[0].sequence


def test_perfect_match_filter():
    calls = list(call(targets('nodiff.gdna.fa'), contigs('nodiff.contig.fa')))
    assert len(calls) == 1
    assert (calls[0].seqid, calls[0].position) == ('chr99', 2899377)
    assert calls[0].filterstr == 'PerfectMatch'


def test_cigar_filter_regression():
    """Equally-optimal alignments may legitimately yield either of two
    calls (reference test_call.py:170-188)."""
    calls = sorted(call(targets('14153.cc5463.gdna.augfasta.gz'),
                        contigs('14153.cc5463.contig.augfasta.gz')),
                   key=lambda c: c.position)
    assert len(calls) == 2
    assert calls[1].seqid == '6'
    varcall = (calls[1]._refr, calls[1]._alt, calls[1].position)
    assert varcall in (('AGAAA', 'A', 154734241), ('GAAGA', 'G', 154734239))


def test_multibest_revcom():
    """One contig equally optimal against four cutouts: all four reported,
    same allele and window (reference test_call.py:191-209)."""
    calls = list(call(targets('multibestrc.gdna.fa'),
                      contigs('multibestrc.contig.fa')))
    assert len(calls) == 4
    assert [c.position + 1 for c in calls] == [
        34495786, 34583830, 58088279, 60344854]
    for c in calls:
        assert (c._refr, c._alt) == ('A', 'G')
        assert c.window == ('CCTGAGCCCTCTCAAGTCGGGTCCTGGCCCGGTCTGCCCATGAGG'
                            'CTGGGCCTGAGCCCCA')


def test_snv_dedup():
    calls = list(call(targets('bee-dupl.gdna.fa'),
                      contigs('bee-dupl.contigs.augfasta'), ksize=27))
    assert len(calls) == 1
    assert (calls[0].seqid, calls[0].position) == ('linkagegroup5', 8173)


def test_call_mnv():
    """Adjacent SNVs merge into an MNV; trailing passenger stays filtered
    (reference test_call.py:270-287)."""
    calls = sorted(call(targets('mnv-gdna.fa'), contigs('mnv-contig.augfasta'),
                        ksize=49), key=lambda v: v.position)
    assert [v.position for v in calls] == [98153308, 98153312, 98153407]
    assert (calls[1]._refr, calls[1]._alt) == ('GA', 'TT')
    assert calls[2].filterstr == 'PassengerVariant'


def test_call_mnv_3bp():
    calls = list(call(targets('ant.gdna.fa'), contigs('ant.contig.augfasta'),
                      ksize=29))
    assert len(calls) == 1
    assert (calls[0]._refr, calls[0]._alt) == ('ACG', 'GTT')
    assert calls[0].filterstr == 'PASS'


def test_call_homopolymers():
    calls = list(call(targets('homopolymer/14153-6parts.targets.fasta'),
                      contigs('homopolymer/14153-6parts.contigs.augfasta'),
                      ksize=49))
    assert len(calls) == 6
    filters = [c.filterstr for c in calls]
    assert 'PASS' not in filters
    for f in filters:
        assert 'Homopolymer' in f


def _homopolymer_prelim(homopolyfilt=True):
    cc = by_partition('homopolymer/12175-3parts.contigs.augfasta')
    tt = by_partition('homopolymer/12175-3parts.targets.fasta', cutouts=True)
    prelim = []
    for partid in cc:
        prelim.extend(call(tt[partid], cc[partid], partid=partid,
                           homopolyfilt=homopolyfilt))
    return prelim


def _homopolymer_sketches():
    from kevlar_tpu import sketch
    return (sketch.load(data_file('homopolymer/12175-kid.sct')),
            sketch.load(data_file('homopolymer/12175-mom.sct')),
            sketch.load(data_file('homopolymer/12175-dad.sct')),
            sketch.load(data_file('homopolymer/12175-refr.sct')))


def test_call_homopolymers_mixed_results():
    """Scored homopolymer candidates split into negative control /
    borderline PASS / filtered positive (reference test_call.py:327-371;
    exercises khmer-built .sct abundance queries).

    caseabundgate=0 pins the reference's score-blind Homopolymer
    outcome; the default likelihood gate (docs/migrating.md) would
    rescue the high-LIKESCORE positive and is covered in
    tests/test_simlike.py."""
    from kevlar_tpu import simlike
    kid, mom, dad, refr = _homopolymer_sketches()
    calls = list(simlike.simlike(
        _homopolymer_prelim(), kid, [mom, dad], refr,
        samplelabels=['Proband', 'Mother', 'Father'], caseabundgate=0))
    assert len(calls) == 6
    interesting = [c for c in calls if c.filterstr in ('PASS', 'Homopolymer')]
    assert len(interesting) == 3
    call1, call2, call3 = interesting
    assert (call1.position, call1.filterstr) == (123651924, 'PASS')
    assert (call1._refr, call1._alt) == ('TAA', 'T')
    assert (call2.position, call2.filterstr) == (124641259, 'PASS')
    assert (call2._refr, call2._alt) == ('TAAA', 'T')
    assert (call3.position, call3.filterstr) == (128660727, 'Homopolymer')


def test_call_homopolymer_filter_disabled():
    from kevlar_tpu import simlike
    kid, mom, dad, refr = _homopolymer_sketches()
    calls = list(simlike.simlike(
        _homopolymer_prelim(homopolyfilt=False), kid, [mom, dad], refr,
        samplelabels=['Proband', 'Mother', 'Father']))
    assert len(calls) == 6
    for c in calls:
        assert 'Homopolymer' not in c.filterstr


@pytest.mark.parametrize('contigfile,gdnafile,maxtargetlen,numpassing', [
    ('bigtarget-contig.augfasta.gz', 'bigtarget-gdna.fasta.gz', 10000, 0),
    ('mnv-contig.augfasta', 'mnv-gdna.fa', 10000, 3),
    ('mnv-contig.augfasta', 'mnv-gdna.fa', 50, 0),
])
def test_call_max_target_length(contigfile, gdnafile, maxtargetlen,
                                numpassing):
    """Oversized targets become nocalls carrying only CONTIG/IKMERS/PART
    (reference test_call.py:407-439)."""
    cc = by_partition(contigfile)
    tt = by_partition(gdnafile, cutouts=True)
    calls = []
    for partid in cc:
        calls.extend(call(tt[partid], cc[partid], partid=partid,
                          maxtargetlen=maxtargetlen))
    nocalls = [c for c in calls if c.seqid == '.']
    passcalls = [c for c in calls if c.seqid != '.']
    assert len(passcalls) == numpassing
    for c in nocalls:
        assert sorted(c.info.keys()) == ['CONTIG', 'IKMERS', 'PART']


def test_call_max_target_length_cli(capsys):
    import kevlar_tpu.cli as cli
    from kevlar_tpu import call as call_mod
    args = cli.parse_args(['call', '--max-target-length', '10000',
                           data_file('bigtarget-contig.augfasta.gz'),
                           data_file('bigtarget-gdna.fasta.gz')])
    call_mod.main(args)
    out = capsys.readouterr().out
    calllines = [ln for ln in out.strip().split('\n')
                 if not ln.startswith('#')]
    assert len(calllines) == 1
    assert calllines[0].startswith('.\t.\t.\t.\t.')
    assert 'PASS' not in calllines[0]