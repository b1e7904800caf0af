"""kevlar_tpu: a TPU-native, reference-free trio variant-discovery framework.

A from-scratch re-design of the kevlar workflow (reference:
kevlar-dev/kevlar) for TPU hardware: k-mer counting and novel-k-mer screening
run as batched JAX/Pallas kernels over device-resident Count-Min sketches,
read partitioning is device label-propagation, contig↔reference alignment is
a batched affine-gap DP with exact ksw2 semantics, and likelihood scoring is
vectorised.  Multi-device scaling shards the sketch hash space across a
``jax.sharding.Mesh`` (the banding/scatter-gather parallelism of the
reference becomes ICI collectives).

Pipeline stages (each a module with a generator-style core + ``main(args)``):
count, novel, filter, unband, partition, split, assemble, localize, call,
alac, varfilter, simlike, plus utilities augment, dist, gentrio, mutate,
evaluate.
"""

import builtins
from gzip import open as gzopen
import os
from os import makedirs
from os.path import dirname
import re
import sys

__version__ = '0.1.0'

# Persistent XLA compilation cache: every CLI stage is its own process, and
# TPU compiles (especially through remote-compile tunnels) can take minutes —
# the cache makes every shape a one-time cost across the whole workflow.
# Environments with an accelerator plugin may pre-import jax from a site
# hook, in which case env vars are read-too-late and the setting must go
# through jax.config (same pitfall as the platform override below).
if 'JAX_COMPILATION_CACHE_DIR' not in os.environ:
    _cache_dir = os.path.join(
        os.path.expanduser('~'), '.cache', 'kevlar_tpu', 'jax_cache')
    try:
        makedirs(_cache_dir, exist_ok=True)
        os.environ['JAX_COMPILATION_CACHE_DIR'] = _cache_dir
        os.environ.setdefault(
            'JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
    except OSError:
        _cache_dir = None
else:
    _cache_dir = os.environ['JAX_COMPILATION_CACHE_DIR']
if _cache_dir and 'jax' in sys.modules:
    try:
        _jax = sys.modules['jax']
        if _jax.config.jax_compilation_cache_dir is None:
            _jax.config.update('jax_compilation_cache_dir', _cache_dir)
            _jax.config.update(
                'jax_persistent_cache_min_compile_time_secs',
                float(os.environ.get(
                    'JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')))
    except Exception as _exc:
        print('kevlar_tpu: warning: could not enable the persistent XLA '
              'compile cache ({}: {}); first compiles will not be cached'
              .format(type(_exc).__name__, _exc), file=sys.stderr)

# Optional platform override: KEVLAR_PLATFORM=cpu routes the (identical) XLA
# programs to the host backend — useful for small inputs where TPU compile
# latency would dominate, and for environments without an accelerator.
# jax may already be imported (e.g. by a site hook), in which case the env
# var is too late and the override must go through jax.config.
if os.environ.get('KEVLAR_PLATFORM'):
    _plat = os.environ['KEVLAR_PLATFORM']
    os.environ['JAX_PLATFORMS'] = _plat
    if 'jax' in sys.modules:
        try:
            sys.modules['jax'].config.update('jax_platforms', _plat)
        except Exception:
            pass

logstream = None
teelog = False


def plog(*args, **kwargs):
    """Print logging output to the configured log stream."""
    if logstream is not None:
        print(*args, **kwargs, file=logstream)
    if logstream is None or teelog:
        print(*args, **kwargs, file=sys.stderr)


def open(filename, mode):
    """gz-aware text open; '-'/None mean stdin/stdout."""
    if mode not in ('r', 'w'):
        raise ValueError('invalid mode "{}"'.format(mode))
    if filename in ('-', None):
        return sys.stdin if mode == 'r' else sys.stdout
    if str(filename).endswith('.gz'):
        return gzopen(filename, mode + 't')
    return builtins.open(filename, mode)


def mkdirp(path, trim=False):
    outdir = dirname(path) if trim else path
    makedirs(outdir, exist_ok=True)
    return outdir


def parse_bed(instream):
    """Yield (chrom, start, end, extra-fields) from BED text."""
    for line in instream:
        row = line.strip()
        if not row or row.startswith('#'):
            continue
        chrom, start, end, *extra = re.split(r'\s+', row)
        yield chrom, int(start), int(end), extra


def bedstream(bedfilelist):
    for bedfile in bedfilelist:
        yield from parse_bed(open(bedfile, 'r'))


# Core substrate
from kevlar_tpu.dna import revcom, revcommin, same_seq  # noqa: E402
from kevlar_tpu.support import (  # noqa: E402
    Timer, ProgressIndicator, MutableString,
)
from kevlar_tpu.sequence import (  # noqa: E402
    Record, KmerOfInterest, parse_augmented_fastx, print_augmented_fastx,
)
from kevlar_tpu import dna  # noqa: E402
from kevlar_tpu import seqio  # noqa: E402
from kevlar_tpu import batch  # noqa: E402
from kevlar_tpu import sketch  # noqa: E402
from kevlar_tpu.seqio import (  # noqa: E402
    parse_partitioned_reads, parse_single_partition,
)

# Pipeline stages (imported lazily via __getattr__ to keep startup light and
# avoid import cycles during incremental construction).
_STAGE_MODULES = (
    'count', 'novel', 'filter', 'unband', 'partition', 'split', 'assemble',
    'augment', 'localize', 'reference', 'call', 'varmap', 'cigar', 'alac',
    'varfilter', 'simlike', 'dist', 'gentrio', 'mutate', 'evaluate', 'vcf',
    'readgraph', 'readpair', 'intervalforest', 'support', 'cli',
    'ops', 'parallel', 'workflow', 'workflows', 'native', 'warm',
)


def __getattr__(name):
    if name in _STAGE_MODULES:
        import importlib
        module = importlib.import_module('kevlar_tpu.' + name)
        globals()[name] = module
        return module
    raise AttributeError('module kevlar_tpu has no attribute ' + name)


def multi_file_iter(filenames):
    from kevlar_tpu.seqio import multi_file_iter as mfi
    return mfi(filenames)


def vcf_header(outstream, version='4.2', source='kevlar', infoheader=False):
    print('##fileformat=VCFv', version, sep='', file=outstream)
    print('##source=', source, sep='', file=outstream)
    if infoheader:
        print('##INFO=<GT,Number=3,Type=String,Description="Genotypes of each '
              'individual in the trio (proband, mother, father)">',
              file=outstream)
    print('##INFO=<VW,Number=1,Type=String,Description="Genomic interval '
          'bounding all k-mers that contain the alternate allele">',
          file=outstream)
    print('##INFO=<RW,Number=1,Type=String,Description="Genomic interval '
          'bounding all k-mers that contain the reference allele">',
          file=outstream)
    print('#CHROM', 'POS', 'ID', 'REF', 'ALT', 'QUAL', 'FILTER', 'INFO',
          sep='\t', file=outstream)
