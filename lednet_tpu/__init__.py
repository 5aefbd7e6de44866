"""lednet_tpu: a TPU-native (JAX/XLA/Pallas/pjit) real-time semantic
segmentation framework with the capabilities of the LED-Net reference stack
(ly27253/LED-Net, an mmsegmentation fork).

Layering mirrors the reference's (SURVEY.md §1) but rebuilt TPU-first:
registry+config -> structures -> data -> models -> engine -> evaluation ->
apis -> tools.
"""
from lednet_tpu.config import Config, ConfigDict
from lednet_tpu.registry import (DATASETS, HOOKS, METRICS, MODELS, TRANSFORMS)
from lednet_tpu.version import __version__


def register_all_modules() -> None:
    """Import every module package so its components self-register, and
    honor ``JAX_PLATFORMS`` even under plugins that ignore the env var
    (the axon TPU plugin pre-populates jax.config with 'axon,cpu').

    Analogue of the reference's ``mmseg/utils/set_env.py:8-40``.
    """
    from lednet_tpu.utils.platform import enforce_env_platform
    enforce_env_platform()
    import lednet_tpu.models  # noqa: F401
    import lednet_tpu.datasets  # noqa: F401
    import lednet_tpu.evaluation  # noqa: F401
