"""SEAM fused (channel-free plane) eval path == the module form.

The fused path (lednet_tpu/models/seam.py::_fused_eval) recomputes the
reference pipeline (``tools/speed/ddrnet_speed.py:282-338``) on (B, H, W)
planes; it must match the conv formulation to fp tolerance on the same
parameters, including the stride-2/4 Laplacian slices and the
binarize-after-upsample order."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lednet_tpu.models.seam import SEAM


@pytest.mark.parametrize('hw', [(16, 24), (90, 160), (17, 23)])
def test_fused_matches_module(hw):
    H, W = hw
    C = 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, H, W, C)), jnp.float32)
    ref_mod = SEAM(C, fused_eval=False)
    variables = ref_mod.init(jax.random.PRNGKey(0), x, train=False)
    # make BN stats non-trivial so the fold is actually exercised
    variables = jax.tree.map(lambda a: a, variables)
    ref = ref_mod.apply(variables, x, train=False)
    got = SEAM(C, fused_eval=True).apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_matches_module_adaptive():
    C = 8
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 32, 48, C)), jnp.float32)
    ref_mod = SEAM(C, adaptive_threshold=True, fused_eval=False)
    variables = ref_mod.init(jax.random.PRNGKey(0), x, train=False)
    ref = ref_mod.apply(variables, x, train=False)
    got = SEAM(C, adaptive_threshold=True, fused_eval=True).apply(
        variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_bf16_dtype():
    C = 8
    x = jnp.ones((1, 16, 16, C), jnp.bfloat16)
    mod = SEAM(C, fused_eval=True)
    variables = SEAM(C, fused_eval=False).init(
        jax.random.PRNGKey(0), x.astype(jnp.float32), train=False)
    out = mod.apply(variables, x, train=False)
    assert out.dtype == jnp.bfloat16
