"""VPDDepthHead tests (reference ``vpd_depth_head.py``): forward shape
chain (deconv x3 + two bilinear 2x ups = 32x the 1/16 aggregate grid),
fmap_border cropping, SiLog loss, and the DepthEstimator pairing."""
import jax
import jax.numpy as jnp
import numpy as np

from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401


def _feats(rng, b=1, base=8, chans=(8, 16, 32, 32)):
    # 4-scale pyramid at 1/1, 1/2, 1/4, 1/8 of an (base x base) grid
    return [jnp.asarray(rng.standard_normal(
        (b, base // (2 ** i), base // (2 ** i), c)).astype(np.float32))
        for i, c in enumerate(chans)]


def _build(**kw):
    cfg = dict(type='VPDDepthHead', in_channels=(8, 16, 32, 32),
               embed_dim=8, feature_dim=64, num_deconv_filters=(8, 8, 8),
               max_depth=10.0)
    cfg.update(kw)
    return MODELS.build(cfg)


def test_vpd_depth_head_forward(rng):
    head = _build()
    feats = _feats(rng)
    variables = head.init(jax.random.PRNGKey(0), feats, train=False)
    depth = head.apply(variables, feats, train=False)
    # aggregate grid is 1/4 of the base (x0 twice-strided) = 2x2;
    # decoder upscales 2^3 (deconvs) * 2 * 2 (bilinear) = 32x -> 64
    assert depth.shape == (1, 64, 64, 1)
    d = np.asarray(depth)
    assert (d >= 0).all() and (d <= 10.0).all()


def test_vpd_depth_head_fmap_border(rng):
    head = _build(fmap_border=1)
    feats = _feats(rng, base=16)
    variables = head.init(jax.random.PRNGKey(0), feats, train=False)
    depth = head.apply(variables, feats, train=False)
    # aggregate grid 4x4 cropped to 3x3, decoded 32x -> 96
    assert depth.shape == (1, 96, 96, 1)


def test_vpd_depth_head_loss(rng):
    head = _build()
    feats = _feats(rng)
    variables = head.init(jax.random.PRNGKey(0), feats, train=False)
    depth = head.apply(variables, feats, train=False)
    gt = jnp.asarray(rng.uniform(0.1, 9.0, (1, 64, 64)).astype(np.float32))
    losses = head.loss_by_feat(depth, gt)
    assert 'loss_silog' in losses
    assert np.isfinite(float(losses['loss_silog']))


def test_depth_estimator_with_vpd_head():
    model = MODELS.build(dict(
        type='DepthEstimator',
        backbone=dict(type='ResNet', depth=18, base_channels=8,
                      stem_channels=8, out_indices=(0, 1, 2, 3)),
        decode_head=dict(type='VPDDepthHead', in_channels=(8, 16, 32, 64),
                         embed_dim=8, feature_dim=64,
                         num_deconv_filters=(8, 8, 8))))
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)}, x, train=False)
    depth = model.apply(variables, x, method='predict')
    assert depth.shape == (1, 64, 64, 1)
