"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding (hash-sharded sketches, data-parallel read batches) is
exercised on host devices; the driver separately dry-runs the multi-chip path
and benches on real TPU hardware.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import pytest  # noqa: E402


@pytest.fixture
def datadir(tmp_path):
    return tmp_path
