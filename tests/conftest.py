"""Test configuration: force an 8-device virtual CPU platform so pjit/sharding
paths are exercised without TPU hardware (SURVEY.md §4 'implication').

Note: the env var alone is not enough under the axon TPU plugin — the explicit
``jax.config.update('jax_platforms', 'cpu')`` is what actually wins.
"""
import os

# hard override (not setdefault): the launch shell may carry
# JAX_PLATFORMS=axon, and entry points enforce the env var via jax.config
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax

jax.config.update('jax_platforms', 'cpu')

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        'markers',
        'slow: heavy whole-network transplant / lockstep / long-run tests; '
        'skipped by default — run with RUN_SLOW=1 or --runslow')


def pytest_addoption(parser):
    parser.addoption('--runslow', action='store_true', default=False,
                     help='run tests marked slow (full tier)')


def pytest_collection_modifyitems(config, items):
    if config.getoption('--runslow') or os.environ.get('RUN_SLOW') == '1':
        return
    skip = pytest.mark.skip(reason='slow tier: set RUN_SLOW=1 or --runslow')
    for item in items:
        if 'slow' in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope='session')
def devices():
    return jax.devices()
