"""Connected components on the read↔k-mer bipartite graph (device kernel).

The reference builds a networkx read graph with edges between reads sharing an
interesting k-mer and extracts connected components
(/root/reference/kevlar/readgraph.py:104-161).  Here the same components are
computed without materialising read-read edges: alternating min-label
propagation over the bipartite (read, k-mer) incidence list — two scatter-min
/ gather steps per iteration, converging in O(component diameter) iterations
inside one ``lax.while_loop``.
"""

import jax
import jax.numpy as jnp


def connected_components_bipartite(read_ids, kmer_ids, n_reads, n_kmers):
    """Labels for each read: min read-index reachable via shared k-mers.

    Parameters
    ----------
    read_ids, kmer_ids : int32 [E] incidence pairs (read contains k-mer)
    n_reads, n_kmers : static ints

    Returns int32 [n_reads] component labels (the smallest read index in the
    component); isolated reads keep their own index.
    """
    read_ids = jnp.asarray(read_ids, dtype=jnp.int32)
    kmer_ids = jnp.asarray(kmer_ids, dtype=jnp.int32)
    init = jnp.arange(n_reads, dtype=jnp.int32)

    def step(labels):
        kl = jnp.full((n_kmers,), jnp.int32(2 ** 30))
        kl = kl.at[kmer_ids].min(labels[read_ids])
        new = labels.at[read_ids].min(kl[kmer_ids])
        return new

    def cond(state):
        labels, prev, it = state
        return jnp.any(labels != prev) & (it < n_reads + 2)

    def body(state):
        labels, _, it = state
        return step(labels), labels, it + 1

    first = step(init)
    labels, _, _ = jax.lax.while_loop(
        cond, body, (first, init, jnp.int32(0)))
    return labels


connected_components_bipartite_jit = jax.jit(
    connected_components_bipartite, static_argnames=('n_reads', 'n_kmers'))


def host_connected_components(read_ids, kmer_ids, n_reads, n_kmers):
    """Union-find fallback for small graphs (device dispatch not worth it).

    Returns the same labels as the device kernel: the smallest read index in
    each component.
    """
    parent = list(range(n_reads))

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    first_read_for_kmer = {}
    for r, k in zip(read_ids, kmer_ids):
        r = int(r)
        k = int(k)
        if k in first_read_for_kmer:
            ra, rb = find(first_read_for_kmer[k]), find(r)
            if ra != rb:
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        else:
            first_read_for_kmer[k] = r
    import numpy as np
    return np.array([find(i) for i in range(n_reads)], dtype=np.int32)


# below this edge count, the host union-find wins over a device dispatch
HOST_CC_THRESHOLD = 200_000


def connected_components(read_ids, kmer_ids, n_reads, n_kmers):
    """Dispatch to host union-find or the device label-propagation kernel."""
    if len(read_ids) < HOST_CC_THRESHOLD:
        return host_connected_components(read_ids, kmer_ids, n_reads,
                                         n_kmers)
    return connected_components_bipartite_jit(
        read_ids, kmer_ids, n_reads=n_reads, n_kmers=n_kmers)
