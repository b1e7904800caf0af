

def test_get_kmer_hashes_canonical():
    from kevlar_tpu.sketch import Sketch
    from kevlar_tpu.dna import revcom
    s = Sketch(21, 10007, backend='host')
    seq = 'ACGTACGTACGTAAACCCGGGTTTACGTACGT'
    hashes = s.get_kmer_hashes(seq)
    assert len(hashes) == len(seq) - 21 + 1
    assert s.get_kmer_hashes(revcom(seq)) == hashes[::-1]


def test_abundance_distribution_khmer_contract():
    import random
    import numpy as np
    from kevlar_tpu.sketch import Sketch
    from kevlar_tpu.sequence import Record
    from . import simdata
    rng = random.Random(606)
    genome = simdata.make_genome(rng, 400)
    reads = simdata.tiled_reads(genome, 100, 20, 'r')  # 5x tiling
    counts = Sketch(21, 100003, backend='host')
    for r in reads:
        counts.consume(r.sequence)
    tracking = Sketch(21, 100003, counter_bits=1, backend='host')
    hist = counts.abundance_distribution(iter(reads), tracking)
    assert hist.shape == (256,)
    # every distinct k-mer counted exactly once: total distinct ~= genome kmers
    total = int(hist.sum())
    assert abs(total - (len(genome) - 21 + 1)) <= 5
    assert hist[0] == 0
    # a second pass with the same tracking sketch adds nothing
    hist2 = counts.abundance_distribution(iter(reads), tracking)
    assert int(hist2.sum()) == 0
