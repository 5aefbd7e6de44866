"""lednet_tpu: a TPU-native (JAX/XLA/Pallas/pjit) real-time semantic
segmentation framework with the capabilities of the LED-Net reference stack
(ly27253/LED-Net, an mmsegmentation fork).

Layering mirrors the reference's (SURVEY.md §1) but rebuilt TPU-first:
registry+config -> structures -> data -> models -> engine -> evaluation ->
apis -> tools.
"""
import os as _os

from lednet_tpu.config import Config, ConfigDict
from lednet_tpu.registry import (DATASETS, HOOKS, METRICS, MODELS, TRANSFORMS)
from lednet_tpu.version import __version__

# Honor JAX_PLATFORMS even under plugins that ignore the env var (the axon
# TPU plugin does): enforce it via jax.config so `JAX_PLATFORMS=cpu
# tools/train.py ...` reliably runs on CPU, restoring standard JAX semantics.
if _os.environ.get('JAX_PLATFORMS'):
    import jax as _jax

    try:
        if getattr(_jax.config, 'jax_platforms', None) is None:
            _jax.config.update('jax_platforms', _os.environ['JAX_PLATFORMS'])
    except Exception:  # already initialized with a platform — leave it
        pass


def register_all_modules() -> None:
    """Import every module package so its components self-register.

    Analogue of the reference's ``mmseg/utils/set_env.py:8-40``.
    """
    import lednet_tpu.models  # noqa: F401
    import lednet_tpu.datasets  # noqa: F401
    import lednet_tpu.evaluation  # noqa: F401
