"""Platform selection helper.

The axon TPU plugin ignores the ``JAX_PLATFORMS`` environment variable (it
pre-populates ``jax.config.jax_platforms`` with ``'axon,cpu'`` at import),
so ``JAX_PLATFORMS=cpu python tools/train.py ...`` would silently run on
the TPU. Entry points restore standard JAX semantics by calling
:func:`enforce_env_platform` (via ``register_all_modules``) before first
device use.
"""
from __future__ import annotations

import os


def enforce_env_platform() -> None:
    """Apply ``JAX_PLATFORMS`` from the environment via ``jax.config``.

    No-op when the env var is unset, when the config already matches, or
    when jax backends are already initialized (changing platforms then is
    impossible — whoever initialized them chose deliberately).
    """
    env = os.environ.get('JAX_PLATFORMS')
    if not env:
        return
    import jax

    try:
        from jax._src import xla_bridge
        if xla_bridge.backends_are_initialized():
            return
    except Exception:
        pass
    if getattr(jax.config, 'jax_platforms', None) != env:
        jax.config.update('jax_platforms', env)
