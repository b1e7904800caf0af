"""Reference genome handling: cutouts + exact seed matching (no BWA).

The reference pipeline shells out to ``bwa mem -k s -T s -a -c 5000`` for
exact seed matching (/root/reference/kevlar/localize.py:131-144 — with match
score 1 and threshold = seed length, only perfect full-length matches are
reported).  Here the same contract is implemented natively: every seed-sized
window of the reference genome is packed into an exact canonical 256-bit code
(:func:`kevlar_tpu.dna.seed_codes`), folded to a 64-bit key, sorted once, and
queried by binary search with exact sequence verification — a vectorised
numpy index with no subprocess, no index files on disk.
"""

import re

import numpy as np

import kevlar_tpu
from kevlar_tpu import dna, seqio


class KevlarRefrSeqNotFoundError(ValueError):
    """Raised if the reference sequence cannot be found."""
    pass


class KevlarInvalidCutoutDeflineError(ValueError):
    pass


class KevlarDeflineSequenceLengthMismatchError(RuntimeError):
    pass


# parity with bwa mem -c 5000: seeds with more matches are skipped
MAX_SEED_HITS = 5000

_FOLD = np.array([0x9e3779b97f4a7c15, 0xbf58476d1ce4e5b9,
                  0x94d049bb133111eb, 0x2545f4914f6cdd1d], dtype=np.uint64)


def _fold_codes(codes):
    """Fold [N, 4] uint64 canonical seed codes to a single uint64 key."""
    acc = np.zeros(codes.shape[:-1], dtype=np.uint64)
    for w in range(4):
        x = (codes[..., w] + _FOLD[w]) * _FOLD[3 - w]
        acc ^= x ^ (x >> np.uint64(29))
    return acc


class SeedIndex:
    """Sorted-key index of every canonical seed in a reference genome.

    ``backend`` selects where the binary search runs:

    - ``'host'`` (default): numpy ``searchsorted`` — right for references
      that fit comfortably in host RAM.
    - ``'device'``: the sorted keys live in HBM as uint32 hi/lo planes and
      the whole seed batch is searched in one jit dispatch
      (:func:`kevlar_tpu.ops.seed_ops.seed_ranges`).
    - ``'sharded'``: keys sharded over the 'shard' axis of the device mesh
      with pmin/psum combine — for references beyond one chip's HBM.

    The env var ``KEVLAR_SEED_BACKEND`` overrides the default.  Exact
    sequence verification always runs on the host, so every backend returns
    identical matches.
    """

    def __init__(self, refrseqs, seedsize, backend=None):
        import os
        self.seedsize = seedsize
        self.refrseqs = refrseqs
        self.backend = (backend or
                        os.environ.get('KEVLAR_SEED_BACKEND', 'host'))
        if self.backend not in ('host', 'device', 'sharded'):
            raise ValueError(
                'unknown seed backend {!r}; expected host, device, or '
                'sharded'.format(self.backend))
        self._device_index = None
        self._seqids = sorted(refrseqs)
        keys_all, seqidx_all, pos_all = [], [], []
        for si, seqid in enumerate(self._seqids):
            seq = refrseqs[seqid]
            if len(seq) < seedsize:
                continue
            codes, valid = dna.seed_codes(dna.encode(seq), seedsize)
            keys = _fold_codes(codes)
            pos = np.nonzero(valid)[0]
            keys_all.append(keys[pos])
            seqidx_all.append(np.full(pos.shape, si, dtype=np.int32))
            pos_all.append(pos.astype(np.int64))
        if keys_all:
            keys = np.concatenate(keys_all)
            order = np.argsort(keys, kind='stable')
            self._keys = keys[order]
            self._seqidx = np.concatenate(seqidx_all)[order]
            self._pos = np.concatenate(pos_all)[order]
        else:
            self._keys = np.zeros(0, dtype=np.uint64)
            self._seqidx = np.zeros(0, dtype=np.int32)
            self._pos = np.zeros(0, dtype=np.int64)

    def save(self, path):
        """Persist the sorted key/position arrays (uncompressed npz —
        load latency matters more than disk).  Written to a temp file in
        the same directory and atomically renamed so a concurrent reader
        (autoindex in another process) never observes a partial file."""
        import os
        import tempfile
        if not path.endswith('.npz'):
            path += '.npz'  # np.savez would append it silently
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or '.',
                                   suffix='.npz.tmp')
        try:
            with os.fdopen(fd, 'wb') as fh:
                np.savez(fh, keys=self._keys, seqidx=self._seqidx,
                         pos=self._pos, seqids=np.array(self._seqids),
                         seedsize=self.seedsize)
            os.replace(tmp, path)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise

    @classmethod
    def from_file(cls, path, refrseqs, backend=None):
        """Load a persisted index; ``refrseqs`` still backs the exact
        sequence verification in :meth:`lookup`.  Arrays are memory-mapped
        (copy-on-write) when the npz is uncompressed: lookups only touch
        O(log n) key pages, so neither load latency nor resident memory
        scales with the genome."""
        import os
        from kevlar_tpu.sketch import _load_npz_mmap
        data = _load_npz_mmap(path)
        if data is None:
            data = np.load(path, allow_pickle=False)
        obj = cls.__new__(cls)
        obj.seedsize = int(data['seedsize'])
        obj.refrseqs = refrseqs
        obj.backend = (backend or
                       os.environ.get('KEVLAR_SEED_BACKEND', 'host'))
        obj._device_index = None
        obj._seqids = [str(s) for s in data['seqids']]
        obj._keys = data['keys']
        obj._seqidx = data['seqidx']
        obj._pos = data['pos']
        return obj

    def _search_device(self, qkeys):
        """(start, count) per query key via the device binary search."""
        import jax.numpy as jnp
        from kevlar_tpu.ops import seed_ops

        # pad the query batch to a power of two to bound recompiles
        nq = len(qkeys)
        cap = 1
        while cap < nq:
            cap *= 2
        qpad = np.full(cap, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
        qpad[:nq] = qkeys
        qhi, qlo = seed_ops.split_words(qpad)
        if self.backend == 'sharded':
            if self._device_index is None:
                from kevlar_tpu.parallel import mesh as meshmod
                mesh = meshmod.make_mesh()
                n_shard = mesh.shape['shard']
                khi, klo, n_valid, base = seed_ops.shard_keys(
                    self._keys, n_shard)
                # base stays host-side int64 (genome-scale indexes exceed
                # the 32-bit lanes the device search runs on)
                self._device_index = (mesh, jnp.asarray(khi),
                                      jnp.asarray(klo),
                                      jnp.asarray(n_valid), base)
            mesh, khi, klo, n_valid, base = self._device_index
            start, count = seed_ops.seed_ranges_sharded(
                mesh, khi, klo, jnp.asarray(qhi), jnp.asarray(qlo),
                n_valid, base)
        else:
            if self._device_index is None:
                khi, klo = seed_ops.split_words(self._keys)
                self._device_index = (jnp.asarray(khi), jnp.asarray(klo))
            khi, klo = self._device_index
            start, count = seed_ops.seed_ranges(
                khi, klo, jnp.asarray(qhi), jnp.asarray(qlo))
        start = np.asarray(start)[:nq]
        count = np.asarray(count)[:nq]
        return start, start + count

    def lookup(self, seeds):
        """Match canonical seed strings; returns {seed: set((seqid, pos))}.

        Only perfect full-length matches are returned; seeds with more than
        MAX_SEED_HITS matches yield none (bwa -c parity).
        """
        result = {}
        seedlist = sorted(seeds)
        if not seedlist or len(self._keys) == 0:
            return result
        qbases, _ = dna.encode_batch(seedlist)
        qcodes, qvalid = dna.seed_codes(qbases, self.seedsize)
        qkeys = _fold_codes(qcodes[:, 0, :])
        if self.backend in ('device', 'sharded'):
            lo, hi = self._search_device(qkeys)
        else:
            lo = np.searchsorted(self._keys, qkeys, side='left')
            hi = np.searchsorted(self._keys, qkeys, side='right')
        for i, seed in enumerate(seedlist):
            if not qvalid[i, 0]:
                continue
            n = int(hi[i] - lo[i])
            if n == 0 or n > MAX_SEED_HITS:
                continue
            matches = set()
            for idx in range(int(lo[i]), int(hi[i])):
                seqid = self._seqids[self._seqidx[idx]]
                pos = int(self._pos[idx])
                # exact verification (guards against 64-bit fold collisions)
                window = self.refrseqs[seqid][pos:pos + self.seedsize]
                if dna.revcommin(window.upper()) == seed:
                    matches.add((seqid, pos))
            if matches:
                result[seed] = matches
        return result


_index_cache = {}


def index_path(refrfile, seedsize):
    """On-disk seed-index file for a reference FASTA (the `bwa index`
    analog — the reference's quick start builds its BWA index before the
    timed workflow, docs/quick-start.rst)."""
    return '{}.kevseedidx{}.npz'.format(refrfile, seedsize)


def autoindex(refrfile, seedsize=51, refrseqs=None):
    """Build (or load) the seed index for a reference FASTA file.

    Mirrors the reference's ``autoindex`` (reference.py:35-51: run
    ``bwa index`` iff the index files are missing): the sorted key/pos
    arrays persist next to the FASTA and later runs load them instead of
    re-extracting and re-sorting every genome seed.  A stale index (older
    than the FASTA) is rebuilt.
    """
    import os
    if not os.path.isfile(refrfile):
        raise KevlarRefrSeqNotFoundError(
            'reference file {:s} does not exist'.format(refrfile))
    key = (os.path.abspath(refrfile), seedsize)
    if key in _index_cache:
        return _index_cache[key]
    if refrseqs is None:
        refrseqs = seqio.parse_seq_dict(kevlar_tpu.open(refrfile, 'r'))
    idxfile = index_path(refrfile, seedsize)
    index = None
    if os.path.isfile(idxfile) and \
            os.path.getmtime(idxfile) >= os.path.getmtime(refrfile):
        try:
            index = SeedIndex.from_file(idxfile, refrseqs)
            kevlar_tpu.plog('[kevlar::reference] loaded seed index '
                            '"{}"'.format(idxfile))
        except Exception as exc:
            kevlar_tpu.plog('[kevlar::reference] discarding unreadable '
                            'seed index {}: {}'.format(idxfile, exc))
            index = None
    if index is None:
        kevlar_tpu.plog('[kevlar::reference] building seed index for '
                        '"{}" (seedsize {})'.format(refrfile, seedsize))
        index = SeedIndex(refrseqs, seedsize)
        try:
            index.save(idxfile)
        except OSError as exc:  # read-only genome dir: stay in-memory
            kevlar_tpu.plog('[kevlar::reference] could not persist seed '
                            'index: {}'.format(exc))
    _index_cache.clear()  # keep at most one genome index in memory
    _index_cache[key] = index
    return index


class ReferenceCutout:
    """An interval of the reference genome matched by a variant contig.

    Deflines use the ``seqid_start-end`` convention of the reference
    implementation (/root/reference/kevlar/reference.py:117-130).
    """

    def __init__(self, defline=None, sequence=None):
        self.defline = defline
        self.sequence = sequence
        self._seqid = None
        self._startpos = None
        self._endpos = None
        if defline:
            self.parse_defline(defline)

    def __len__(self):
        return self._endpos - self._startpos

    def parse_defline(self, defline):
        match = re.search(r'(\S+)_(\d+)-(\d+)', defline)
        if not match:
            raise KevlarInvalidCutoutDeflineError(defline)
        self._seqid = match.group(1)
        self._startpos = int(match.group(2))
        self._endpos = int(match.group(3))
        if not self.sequence:
            return
        if len(self) != len(self.sequence):
            raise KevlarDeflineSequenceLengthMismatchError(
                'defline length: {:d}, sequence length: {:d}'.format(
                    len(self), len(self.sequence)))

    @property
    def interval(self):
        return self._seqid, self._startpos, self._endpos

    def local_to_global(self, coordinate):
        return self._startpos + coordinate


def load_refr_cutouts(instream):
    for defline, sequence in seqio.parse_fasta(instream):
        yield ReferenceCutout(defline[1:], sequence)
