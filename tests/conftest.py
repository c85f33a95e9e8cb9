"""Test harness: run every test on a virtual 8-device CPU mesh.

This is the TPU-native answer to testing multi-chip sharding without a pod
(SURVEY.md §4): 8 virtual CPU devices exercise the same pjit/Mesh code paths
as a real slice.  Note: this environment pre-registers a TPU platform plugin
via sitecustomize, so we must force CPU through jax.config (the env var is
clobbered before pytest starts).
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# persistent compile cache: XLA CPU compiles are slow on this 1-core host.
# (env vars are too late — sitecustomize imports jax before pytest starts)
jax.config.update('jax_compilation_cache_dir',
                  os.path.abspath(os.path.join(os.path.dirname(__file__),
                                               '..', '.jax_cache')))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import pytest  # noqa: E402


@pytest.fixture(scope='session')
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f'expected 8 virtual devices, got {len(devs)}'
    return devs
