"""Driver-contract tests: dryrun_multichip must compile+run the full train
step on the virtual 8-device mesh (conftest forces the CPU platform)."""
import pytest
import sys
import os.path as osp

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))


@pytest.mark.slow
def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


@pytest.mark.slow
def test_entry_builds():
    from __graft_entry__ import _build_model
    import jax
    import jax.numpy as jnp
    from lednet_tpu.engine.state import jit_init
    model = _build_model()
    # small-shape compile check of the same jittable fn entry() returns
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jit_init(model, jax.random.PRNGKey(0), x, train=False)
    out = jax.jit(lambda v, x: model.apply(v, x, method='predict'))(variables, x)
    assert out.shape == (1, 64, 64, 2)


def test_mesh_2d_helpers():
    import jax
    import pytest
    from lednet_tpu.parallel.mesh import image_sharding, make_mesh_2d
    mesh = make_mesh_2d(jax.devices()[:8], spatial=2)
    assert mesh.axis_names == ('data', 'spatial')
    assert mesh.devices.shape == (4, 2)
    sh = image_sharding(mesh)
    assert sh.spec == ('data', 'spatial')
    with pytest.raises(ValueError):
        make_mesh_2d(jax.devices()[:5], spatial=2)
