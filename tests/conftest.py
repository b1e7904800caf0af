"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding (hash-sharded sketches, data-parallel read batches) is
exercised on host devices; the driver separately dry-runs the multi-chip path
and benches on real TPU hardware.

Note: the environment pins JAX_PLATFORMS=axon (the TPU tunnel) via
sitecustomize, so the platform must be overridden through jax.config before
the backend initialises — env vars alone are not enough.
"""

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_logstream():
    """Keep the logging globals test-local.

    The CLI entry point binds ``kevlar_tpu.logstream`` to the *current*
    ``sys.stderr`` — under capsys that's a per-test capture object, and
    leaving it bound leaks one test's capture into the next (plog output
    then bypasses the later test's capsys).  Reset to the dynamic default
    around every test.
    """
    import kevlar_tpu
    kevlar_tpu.logstream = None
    kevlar_tpu.teelog = False
    yield
    kevlar_tpu.logstream = None
    kevlar_tpu.teelog = False


@pytest.fixture
def datadir(tmp_path):
    return tmp_path
