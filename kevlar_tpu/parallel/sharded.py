"""Hash-range-sharded Count-Min sketch over a ('data', 'shard') mesh.

Layout
------
- sketch tables ``uint8 [ntables, total_tablesize]`` are sharded on the
  bucket axis across the 'shard' mesh axis (each device owns one contiguous
  hash range per table) and replicated across 'data';
- read batches are sharded on the batch axis across 'data' and replicated
  across 'shard'.

Collectives
-----------
- consume (default, hash-routed): read batches are sharded over BOTH mesh
  axes, each device hashes only its own slice ONCE, bins each table's
  bucket indices by owner shard, and a ``lax.all_to_all`` over 'shard'
  delivers every index to the one shard that owns its hash range; owners
  scatter-add what they receive and a ``psum`` over 'data' merges the
  read shards.  Hash + scatter-candidate work is done once per k-mer
  (the SURVEY §2.3 "all-to-all of queried hashes" banding design).
- consume (fallback, ``route='replicate'``): reads replicated across
  'shard'; every device hashes every k-mer and scatter-drops the indices
  outside its range — N_shard× redundant compute, no index exchange.
- query: non-owner shards report a sentinel max count and a ``pmin`` over
  'shard' selects the owning shard's count.

This replaces the reference's banding scatter/gather (N serial passes +
unband merge, docs/banding.rst) with a single SPMD pass.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from kevlar_tpu.ops import hashing
from kevlar_tpu.sketch import MAXCOUNT


def _local_consume(tables_local, h1, h2, valid, shard_size, total, ntables,
                   maxcount, counter_bits=8):
    from kevlar_tpu.ops import sketch_ops
    shard_id = lax.axis_index('shard')
    lo = (shard_id * shard_size).astype(jnp.int32)
    h1f, h2f, vf = h1.ravel(), h2.ravel(), valid.ravel()
    rows = []
    for t in range(ntables):
        gidx = ((h1f + jnp.uint32(t) * h2f) % jnp.uint32(total)).astype(
            jnp.int32)
        lidx = gidx - lo
        ok = vf & (lidx >= 0) & (lidx < shard_size)
        # PLANAR unpacked layout for sub-byte counters (identity for
        # 8-bit): flat 1-D, free of the [nbytes, cpb] tiled-layout
        # memory blowup (sketch_ops.planar_index)
        nbytes = sketch_ops.packed_width(shard_size, counter_bits)
        planar_size = sketch_ops.COUNTERS_PER_BYTE[counter_bits] * nbytes
        pidx = sketch_ops.planar_index(lidx, counter_bits, nbytes)
        # out-of-range -> index planar_size, dropped by scatter mode='drop'
        pidx_safe = jnp.where(ok, pidx, planar_size)
        inc = jnp.zeros((planar_size,), jnp.int32).at[pidx_safe].add(
            ok.astype(jnp.int32), mode='drop')
        inc = lax.psum(inc, 'data')
        row = sketch_ops.unpack_row_planar(tables_local[t], counter_bits)
        row = jnp.minimum(row.astype(jnp.int32) + inc,
                          maxcount).astype(jnp.uint8)
        rows.append(sketch_ops.pack_row_planar(row, counter_bits))
    return jnp.stack(rows)


_RANK_BLOCK = 127   # int8 within-block rank capacity


def _route_consume(tables_local, h1, h2, valid, shard_size, total, ntables,
                   maxcount, capacity, n_shard, counter_bits=8):
    """Hash-routed consume: bin every table's bucket indices by owner
    shard, exchange them in ONE fused ``all_to_all``, scatter-add locally.

    Each device hashes only its own read slice (bases sharded over both
    mesh axes), so hash + scatter work is done once per k-mer instead of
    once per shard.  All ``ntables`` send buffers ride a single
    ``[T, S, C]`` all_to_all (round 4 issued one per table).  Destination
    ranks come from an int8 *block* cumsum — within-block rank (<= 127
    fits int8) plus an int32 per-block base — which cuts the dominant
    [T, K, S] rank traffic 4x; at 8 shards this turned a 6.2x wall blowup
    into slightly-better-than-flat (SCALING.json v3).

    Per (table, destination) capacity is ``capacity`` slots; the returned
    overflow scalar is the largest bin population seen (callers must
    verify it is <= capacity — overflowing increments are dropped, so the
    caller re-runs the batch down the replicate path).
    """
    from kevlar_tpu.ops import sketch_ops
    h1f, h2f, vf = h1.ravel(), h2.ravel(), valid.ravel()
    nbytes = sketch_ops.packed_width(shard_size, counter_bits)
    planar_size = sketch_ops.COUNTERS_PER_BYTE[counter_bits] * nbytes
    C = int(capacity)
    BLK = _RANK_BLOCK
    K = h1f.shape[0]
    Kp = -(-K // BLK) * BLK
    pad = Kp - K
    ts = jnp.arange(ntables, dtype=jnp.uint32)[:, None]
    gidx = (h1f[None, :] + ts * h2f[None, :]) % jnp.uint32(total)  # [T, K]
    owner = (gidx // jnp.uint32(shard_size)).astype(jnp.int32)
    lidx = (gidx % jnp.uint32(shard_size)).astype(jnp.int32)
    owner = jnp.where(vf[None, :], owner, jnp.int32(n_shard))
    if pad:
        owner = jnp.concatenate(
            [owner, jnp.full((ntables, pad), n_shard, jnp.int32)], axis=1)
        lidx = jnp.concatenate(
            [lidx, jnp.zeros((ntables, pad), jnp.int32)], axis=1)
    nblk = Kp // BLK
    oh = (owner.reshape(ntables, nblk, BLK)[..., None] ==
          jnp.arange(n_shard, dtype=jnp.int32)).astype(jnp.int8)
    within = jnp.cumsum(oh, axis=2, dtype=jnp.int8)    # [T, nblk, BLK, S]
    totals = within[:, :, -1, :].astype(jnp.int32)     # [T, nblk, S]
    base = jnp.cumsum(totals, axis=1) - totals         # exclusive blocks
    overflow = jnp.max(totals.sum(axis=1))
    ob = jnp.clip(owner.reshape(ntables, nblk, BLK), 0, n_shard - 1)
    w = jnp.take_along_axis(within, ob[..., None], axis=3)[..., 0]
    bb = jnp.take_along_axis(
        jnp.broadcast_to(base[:, :, None, :],
                         (ntables, nblk, BLK, n_shard)),
        ob[..., None], axis=3)[..., 0]
    jd = (bb + w.astype(jnp.int32) - 1).reshape(ntables, Kp)[:, :K]
    owner = owner[:, :K]
    lidx = lidx[:, :K]
    pos = jnp.where((owner < n_shard) & (jd < C), owner * C + jd,
                    n_shard * C)
    # send buffers: local bucket index per slot; unfilled slots carry
    # shard_size (out of range at the receiver)
    tidx = jnp.broadcast_to(jnp.arange(ntables)[:, None], pos.shape)
    buf = jnp.full((ntables, n_shard * C + 1), shard_size, jnp.int32)
    buf = buf.at[tidx, pos].set(lidx, mode='drop')
    recv = lax.all_to_all(
        buf[:, :n_shard * C].reshape(ntables, n_shard, C), 'shard',
        split_axis=1, concat_axis=1, tiled=True)       # [T, S, C]
    rf = recv.reshape(ntables, n_shard * C)
    ok = (rf >= 0) & (rf < shard_size)
    pidx = sketch_ops.planar_index(rf, counter_bits, nbytes)
    tidx2 = jnp.broadcast_to(jnp.arange(ntables)[:, None], rf.shape)
    inc = jnp.zeros((ntables, planar_size + 1), jnp.int32)
    inc = inc.at[tidx2, jnp.where(ok, pidx, planar_size)].add(
        ok.astype(jnp.int32), mode='drop')[:, :planar_size]
    inc = lax.psum(inc, 'data')
    new_rows = []
    for t in range(ntables):
        row = sketch_ops.unpack_row_planar(tables_local[t], counter_bits)
        row = jnp.minimum(row.astype(jnp.int32) + inc[t],
                          maxcount).astype(jnp.uint8)
        new_rows.append(sketch_ops.pack_row_planar(row, counter_bits))
    overflow = lax.pmax(lax.pmax(overflow, 'shard'), 'data')
    return jnp.stack(new_rows), overflow


def _local_gather(tables_local, h1, h2, shard_size, total, ntables,
                  counter_bits=8):
    """Min-over-tables count with non-owned buckets as sentinel 255."""
    shard_id = lax.axis_index('shard')
    lo = (shard_id * shard_size).astype(jnp.int32)
    counts = None
    for t in range(ntables):
        gidx = ((h1 + jnp.uint32(t) * h2) % jnp.uint32(total)).astype(
            jnp.int32)
        lidx = gidx - lo
        ok = (lidx >= 0) & (lidx < shard_size)
        lc = jnp.clip(lidx, 0, shard_size - 1)
        if counter_bits == 8:
            c = tables_local[t][lc]
        elif counter_bits == 4:
            byte = tables_local[t][lc >> 1]
            c = (byte >> ((lc & 1) << 2).astype(jnp.uint8)) & jnp.uint8(0xF)
        else:
            byte = tables_local[t][lc >> 3]
            c = (byte >> (lc & 7).astype(jnp.uint8)) & jnp.uint8(1)
        c = jnp.where(ok, c, jnp.uint8(255))
        counts = c if counts is None else jnp.minimum(counts, c)
    return lax.pmin(counts, 'shard')


def _local_gather_multi(tables_list, h1, h2, shard_size, total, ntables):
    """Min-over-tables counts for S samples at once: list of uint8 arrays.

    Same packed-word trick as sketch_ops.gather_counts_multi, applied to the
    local shard: the bucket index depends only on (h1, h2, table), so up to
    4 samples' local counters interleave into one uint32 word and a single
    gather per table serves them all.  Non-owned buckets gather the sentinel
    word 0xFFFFFFFF (byte 255 for every sample) so the ``pmin`` over 'shard'
    selects the owning shard's counts.
    """
    nsamples = len(tables_list)
    shard_id = lax.axis_index('shard')
    lo = (shard_id * shard_size).astype(jnp.int32)
    per_sample = [None] * nsamples
    for w0 in range(0, nsamples, 4):
        group = tables_list[w0:w0 + 4]
        packed = group[0].astype(jnp.uint32)
        for s, tbl in enumerate(group[1:], start=1):
            packed = packed | (tbl.astype(jnp.uint32) << jnp.uint32(8 * s))
        gathered = None
        for t in range(ntables):
            gidx = ((h1 + jnp.uint32(t) * h2) % jnp.uint32(total)).astype(
                jnp.int32)
            lidx = gidx - lo
            ok = (lidx >= 0) & (lidx < shard_size)
            word = jnp.where(
                ok, packed[t][jnp.clip(lidx, 0, shard_size - 1)],
                jnp.uint32(0xFFFFFFFF))
            gathered = word[None] if gathered is None else \
                jnp.concatenate([gathered, word[None]])
        for s in range(len(group)):
            byte = (gathered >> jnp.uint32(8 * s)) & jnp.uint32(0xFF)
            per_sample[w0 + s] = lax.pmin(
                jnp.min(byte, axis=0).astype(jnp.uint8), 'shard')
    return per_sample


class ShardedSketch:
    """Count-Min sketch hash-sharded across the 'shard' axis of a mesh."""

    def __init__(self, mesh, ksize, total_tablesize, ntables=4,
                 counter_bits=8, exact=False):
        self.mesh = mesh
        self._ksize = int(ksize)
        self.ntables = int(ntables)
        self.counter_bits = int(counter_bits)
        self.maxcount = MAXCOUNT[self.counter_bits]
        n_shard = mesh.shape['shard']
        total = int(total_tablesize)
        self.shard_size = -(-total // n_shard)  # ceil
        # shards must pack to whole bytes (sub-byte counters store 8 or 2
        # buckets per byte, matching the single-device Sketch layout)
        self.shard_size += (-self.shard_size) % 8
        # with ``exact`` the hash space is exactly the requested tablesize
        # (the tail shard's padding buckets are never addressed), so counts
        # are bit-identical to a single-device Sketch of the same size and
        # the sketch round-trips through save/load unchanged; the default
        # uses the padded size as the hash space (slightly lower FPR)
        self.tablesize = total if exact else self.shard_size * n_shard
        from kevlar_tpu.ops import sketch_ops
        self.shard_width = sketch_ops.packed_width(self.shard_size,
                                                   self.counter_bits)
        sharding = NamedSharding(mesh, P(None, 'shard'))
        self.tables = jax.device_put(
            jnp.zeros((self.ntables, self.shard_width * n_shard),
                      dtype=jnp.uint8),
            sharding)

    @classmethod
    def from_sketch(cls, mesh, sketch):
        """Re-shard a single-device Sketch (e.g. a loaded counttable)
        across the mesh, preserving its exact hash space so abundances are
        bit-identical."""
        from kevlar_tpu.sketch import _np_pack
        out = cls(mesh, sketch.ksize(), sketch.tablesize,
                  ntables=sketch.ntables, counter_bits=sketch.counter_bits,
                  exact=True)
        host = np.asarray(sketch._host())  # [ntables, tablesize] unpacked
        n_shard = mesh.shape['shard']
        padded = np.zeros((out.ntables, out.shard_size * n_shard), np.uint8)
        padded[:, :host.shape[1]] = host
        rows = padded.reshape(out.ntables * n_shard, out.shard_size)
        packed = _np_pack(rows, out.counter_bits)
        packed = packed.reshape(out.ntables, n_shard * out.shard_width)
        out.tables = jax.device_put(
            jnp.asarray(packed), NamedSharding(mesh, P(None, 'shard')))
        return out

    def ksize(self):
        return self._ksize

    def hashsizes(self):
        return [self.tablesize] * self.ntables

    # -- Sketch-interface parity (host-side queries over gathered mirror) --
    def _host(self):
        if getattr(self, '_host_tables', None) is None:
            from kevlar_tpu.sketch import _np_unpack
            packed = np.asarray(self.tables)
            n_shard = self.mesh.shape['shard']
            per_shard = packed.reshape(
                self.ntables * n_shard, self.shard_width)
            self._host_tables = _np_unpack(
                per_shard, self.counter_bits, self.shard_size).reshape(
                    self.ntables, -1)[:, :self.tablesize]
        return self._host_tables

    def _invalidate(self):
        self._host_tables = None

    def n_occupied(self):
        return int(self._occupied_fn()(self.tables))

    def n_unique_kmers(self):
        occ = self.n_occupied()
        if occ >= self.tablesize:
            return self.tablesize
        return int(round(-self.tablesize * np.log1p(-occ / self.tablesize)))

    def _host_counts(self, h1, h2, valid=None):
        tables = self._host()
        counts = None
        for t in range(self.ntables):
            idx = (h1 + np.uint32(t) * h2) % np.uint32(self.tablesize)
            c = tables[t][idx.astype(np.int64)]
            counts = c if counts is None else np.minimum(counts, c)
        if valid is not None:
            counts = np.where(valid, counts, 0)
        return counts

    def get(self, kmer):
        from kevlar_tpu import dna
        encoded = dna.encode(kmer)
        if len(kmer) == self._ksize and not (encoded >= 4).any():
            counts, _ = self._query_padded(encoded)
            return int(counts[0])
        h1, h2 = dna.hash_kmer(kmer)
        return int(self._host_counts(np.uint32([h1]), np.uint32([h2]))[0])

    def get_kmer_counts(self, seq):
        from kevlar_tpu import dna
        counts, valid = self._query_padded(dna.encode(seq))
        n = len(seq) - self._ksize + 1
        return [int(c) for c in np.where(valid[:n], counts[:n], 0)]

    def _query_padded(self, encoded):
        """Point query without gathering the sketch to the host: the
        sequence rides one row of a device query batch (row length padded
        to a 64 multiple so repeated queries reuse one compiled program);
        every shard reads only its own table range and a ``pmin`` selects
        the owners' counts."""
        L = max(64, -(-int(encoded.shape[0]) // 64) * 64)
        row = np.full((1, L), 4, np.uint8)
        row[0, :encoded.shape[0]] = encoded
        counts, valid = self.query_batch(row)
        return counts[0], valid[0]

    def _occupied_fn(self):
        cache = getattr(self, '_fn_cache', None)
        if cache is None:
            cache = self._fn_cache = {}
        if 'occupied' in cache:
            return cache['occupied']
        mesh = self.mesh
        shard_size, total = self.shard_size, self.tablesize
        bits = self.counter_bits

        @jax.jit
        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(P(None, 'shard'),), out_specs=P())
        def occupied(tables_local):
            from kevlar_tpu.ops import sketch_ops
            # PLANAR unpack (layout-safe for sub-byte); recover each
            # planar position's bucket index for the in-range mask
            row = sketch_ops.unpack_row_planar(tables_local[0], bits)
            cpb = sketch_ops.COUNTERS_PER_BYTE[bits]
            nbytes = sketch_ops.packed_width(shard_size, bits)
            byte = jnp.arange(nbytes, dtype=jnp.int32)
            bucket = jnp.concatenate([byte * cpb + p for p in range(cpb)])
            lo = lax.axis_index('shard').astype(jnp.int32) * shard_size
            inrange = (bucket < shard_size) & (lo + bucket < total)
            n = jnp.sum(((row > 0) & inrange).astype(jnp.int32))
            return lax.psum(n, 'shard')

        cache['occupied'] = occupied
        return occupied

    def save(self, filename):
        """Gather shards to host and persist in the standard npz format
        (loadable as a single-device Sketch)."""
        import os
        np.savez_compressed(
            filename, tables=self._host(), ksize=self._ksize,
            tablesize=self.tablesize, ntables=self.ntables,
            counter_bits=self.counter_bits)
        if not filename.endswith('.npz') and os.path.exists(filename + '.npz'):
            os.replace(filename + '.npz', filename)

    def _consume_fn(self, has_mask, mask_threshold, consume_masked,
                    mask_bits=8, mask_dims=None):
        # memoize: a fresh jax.jit wrapper per call would defeat the
        # compilation cache
        key = (has_mask, mask_threshold, consume_masked, mask_bits,
               mask_dims)
        cache = getattr(self, '_fn_cache', None)
        if cache is None:
            cache = self._fn_cache = {}
        if key in cache:
            return cache[key]
        mesh = self.mesh
        ksize = self._ksize
        shard_size, total = self.shard_size, self.tablesize
        ntables, maxcount = self.ntables, self.maxcount
        bits = self.counter_bits
        mask_shard, mask_total = mask_dims if mask_dims else (shard_size,
                                                              total)

        if has_mask:
            @jax.jit
            @functools.partial(
                shard_map, mesh=mesh,
                in_specs=(P(None, 'shard'), P(None, 'shard'),
                          P('data', None)),
                out_specs=P(None, 'shard'))
            def consume(tables_local, mask_local, bases_local):
                h1, h2, valid = hashing.kmer_hashes(bases_local, ksize)
                mcnt = _local_gather(mask_local, h1, h2, mask_shard,
                                     mask_total, mask_local.shape[0],
                                     mask_bits)
                if consume_masked:
                    valid = valid & (mcnt >= jnp.uint8(mask_threshold))
                else:
                    valid = valid & (mcnt <= jnp.uint8(mask_threshold))
                return _local_consume(tables_local, h1, h2, valid,
                                      shard_size, total, ntables, maxcount,
                                      bits)
            cache[key] = consume
            return consume

        @jax.jit
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(None, 'shard'), P('data', None)),
            out_specs=P(None, 'shard'))
        def consume(tables_local, bases_local):
            h1, h2, valid = hashing.kmer_hashes(bases_local, ksize)
            return _local_consume(tables_local, h1, h2, valid, shard_size,
                                  total, ntables, maxcount, bits)
        cache[key] = consume
        return consume

    def _consume_fn_a2a(self, capacity):
        key = ('a2a', int(capacity))
        cache = getattr(self, '_fn_cache', None)
        if cache is None:
            cache = self._fn_cache = {}
        if key in cache:
            return cache[key]
        mesh = self.mesh
        ksize = self._ksize
        shard_size, total = self.shard_size, self.tablesize
        ntables, maxcount = self.ntables, self.maxcount
        bits = self.counter_bits
        n_shard = mesh.shape['shard']

        @jax.jit
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(None, 'shard'), P(('data', 'shard'), None)),
            out_specs=(P(None, 'shard'), P()))
        def consume(tables_local, bases_local):
            h1, h2, valid = hashing.kmer_hashes(bases_local, ksize)
            return _route_consume(tables_local, h1, h2, valid, shard_size,
                                  total, ntables, maxcount, capacity,
                                  n_shard, bits)
        cache[key] = consume
        return consume

    def _a2a_capacity(self, bases_shape):
        """Per-(table, destination) routing capacity: 1.25x the expected
        bin population under uniform hashing (measured max/expected is
        ~1.02 on read data — a good hash concentrates tightly; the
        overflow->replicate fallback covers pathological inputs), 128
        floor, multiple of 8."""
        n_dev = self.mesh.shape['data'] * self.mesh.shape['shard']
        B = -(-bases_shape[0] // n_dev) * n_dev
        windows = max(bases_shape[1] - self._ksize + 1, 1)
        per_dev = (B // n_dev) * windows
        exp_bin = -(-per_dev // self.mesh.shape['shard'])
        cap = max(128, exp_bin + exp_bin // 4)
        return -(-cap // 8) * 8

    def consume_batch(self, bases, numbands=None, band=None, mask=None,
                      mask_threshold=0, consume_masked=False, route=None,
                      a2a_capacity=None):
        """Count a [B, L] base batch.

        ``route`` picks the consume collective: ``'alltoall'`` (default
        when unmasked) hashes each k-mer once and routes its bucket
        indices to the owner shard; ``'replicate'`` replicates the reads
        across 'shard' and drops out-of-range indices (the fallback, and
        the only masked mode — the mask screen needs every shard to see
        every k-mer for the ``pmin`` count select).  If a routed batch
        overflows its per-destination capacity (pathologically repetitive
        input), the batch is transparently re-run down the replicate path
        — counts are identical either way.

        Banding is intentionally unsupported: hash-space sharding over the
        mesh supersedes it (docs/sharding.md).  A mask must share this
        sketch's mesh/tablesize layout.
        """
        if numbands:
            raise ValueError(
                'banding is superseded by mesh sharding for ShardedSketch')
        bases = np.asarray(bases)
        if mask is not None:
            assert isinstance(mask, ShardedSketch), \
                'sharded consume requires a sharded mask on the same mesh'
            fn = self._consume_fn(True, int(mask_threshold),
                                  bool(consume_masked),
                                  mask_bits=mask.counter_bits,
                                  mask_dims=(mask.shard_size,
                                             mask.tablesize))
            self.tables = fn(self.tables, mask.tables,
                             self._pad_rows(bases))
            self._invalidate()
            return
        if route is None:
            route = 'alltoall'
        if route == 'alltoall':
            cap = int(a2a_capacity or self._a2a_capacity(bases.shape))
            fn = self._consume_fn_a2a(cap)
            new_tables, overflow = fn(
                self.tables, self._pad_rows(bases, both_axes=True))
            if int(overflow) <= cap:
                self.tables = new_tables
                self._invalidate()
                return
            del new_tables  # partial adds discarded; fall through
        fn = self._consume_fn(False, 0, False)
        self.tables = fn(self.tables, self._pad_rows(bases))
        self._invalidate()

    def _pad_rows(self, bases, both_axes=False):
        n = self.mesh.shape['data']
        if both_axes:
            n *= self.mesh.shape['shard']
        B = bases.shape[0]
        if B % n:
            pad = n - B % n
            bases = np.concatenate(
                [bases, np.full((pad, bases.shape[1]), 4, np.uint8)])
        return bases

    def _query_fn(self):
        cache = getattr(self, '_fn_cache', None)
        if cache is None:
            cache = self._fn_cache = {}
        if 'query' in cache:
            return cache['query']
        mesh = self.mesh
        ksize = self._ksize
        shard_size, total, ntables = \
            self.shard_size, self.tablesize, self.ntables
        bits = self.counter_bits

        @jax.jit
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(None, 'shard'), P('data', None)),
            out_specs=(P('data', None), P('data', None)))
        def query(tables_local, bases_local):
            h1, h2, valid = hashing.kmer_hashes(bases_local, ksize)
            counts = _local_gather(tables_local, h1, h2, shard_size, total,
                                   ntables, bits)
            return jnp.where(valid, counts, jnp.uint8(0)), valid

        cache['query'] = query
        return query

    def query_batch(self, bases):
        """Counts for every window of a [B, L] batch (gathered to host)."""
        bases = self._pad_rows(np.asarray(bases))
        B = bases.shape[0]
        counts, valid = self._query_fn()(self.tables, bases)
        return np.asarray(counts)[:B], np.asarray(valid)[:B]


_screen_fn_cache = {}


def sharded_novel_screen(mesh, case_sketches, ctrl_sketches, bases, lengths,
                         casemin, ctrlmax, screen=None):
    """The full novel screen over sharded sketches, one SPMD program.

    All sketches must share mesh/tablesize/ksize.  Returns host arrays
    (interesting, abunds, discard, skip) like
    :func:`kevlar_tpu.ops.novel_ops.novel_screen`.
    """
    s0 = case_sketches[0]
    ksize = s0.ksize()
    shard_size, total, ntables = s0.shard_size, s0.tablesize, s0.ntables
    s0_bits = s0.counter_bits
    n_case, n_ctrl = len(case_sketches), len(ctrl_sketches)

    bases = np.asarray(bases)
    lengths = np.asarray(lengths, dtype=np.int32)
    B = bases.shape[0]
    n_data = mesh.shape['data']
    if B % n_data:
        pad = n_data - B % n_data
        bases = np.concatenate(
            [bases, np.full((pad, bases.shape[1]), 4, np.uint8)])
        lengths = np.concatenate([lengths, np.zeros(pad, np.int32)])

    table_specs = tuple(P(None, 'shard') for _ in range(n_case + n_ctrl))

    fn_key = (mesh, ksize, shard_size, total, ntables, n_case, n_ctrl,
              casemin, ctrlmax, screen, s0_bits)
    if fn_key in _screen_fn_cache:
        _screen_step = _screen_fn_cache[fn_key]
        all_tables = tuple(s.tables for s in case_sketches) + \
            tuple(s.tables for s in ctrl_sketches)
        interesting, abunds, discard, skip = _screen_step(
            all_tables, bases, lengths)
        return (np.asarray(interesting)[:B], np.asarray(abunds)[:, :B],
                np.asarray(discard)[:B], np.asarray(skip)[:B])

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(table_specs, P('data', None), P('data')),
        out_specs=(P('data', None), P(None, 'data', None), P('data'),
                   P('data')))
    def _screen_step(all_tables, bases_local, lengths_local):
        h1, h2, valid = hashing.kmer_hashes(bases_local, ksize)
        Bl = bases_local.shape[0]

        bad = (bases_local >= 4).astype(jnp.int32)
        cumbad = jnp.cumsum(bad, axis=-1)
        total_bad = jnp.take_along_axis(
            jnp.concatenate([jnp.zeros((Bl, 1), jnp.int32), cumbad], axis=1),
            lengths_local.astype(jnp.int32)[:, None], axis=1)[:, 0]
        skip = (total_bad > 0) | (lengths_local < ksize)

        if s0_bits == 8:
            counts = _local_gather_multi(list(all_tables), h1, h2,
                                         shard_size, total, ntables)
        else:  # sub-byte counttables: per-sample packed gathers
            counts = [_local_gather(t, h1, h2, shard_size, total, ntables,
                                    s0_bits) for t in all_tables]
        case_counts = jnp.stack(counts[:n_case])
        ctrl_counts = jnp.stack(counts[n_case:]) if n_ctrl else \
            jnp.zeros((0,) + h1.shape, jnp.uint8)

        below = case_counts < jnp.uint8(casemin)
        any_below = jnp.any(below, axis=0)
        if screen is not None:
            first_fail = jnp.argmax(below, axis=0)
            fail_abund = jnp.take_along_axis(
                case_counts, first_fail[None], axis=0)[0]
            discard_kmer = valid & any_below & \
                (fail_abund < jnp.uint8(screen))
            discard = jnp.any(discard_kmer, axis=-1) & ~skip
        else:
            discard = jnp.zeros((Bl,), dtype=bool)
        ctrl_ok = jnp.all(ctrl_counts <= jnp.uint8(ctrlmax), axis=0) \
            if n_ctrl else jnp.ones_like(any_below)
        interesting = valid & ~any_below & ctrl_ok & ~skip[:, None]
        abunds = jnp.concatenate([case_counts, ctrl_counts], axis=0)
        return interesting, abunds, discard, skip

    _screen_fn_cache[fn_key] = _screen_step
    all_tables = tuple(s.tables for s in case_sketches) + \
        tuple(s.tables for s in ctrl_sketches)
    interesting, abunds, discard, skip = _screen_step(all_tables, bases,
                                                     lengths)
    return (np.asarray(interesting)[:B], np.asarray(abunds)[:, :B],
            np.asarray(discard)[:B], np.asarray(skip)[:B])
