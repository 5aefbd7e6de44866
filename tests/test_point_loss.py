"""Uncertainty-point-sampled mask losses (ops/point_loss.py) — parity with
mmcv ``point_sample`` (= grid_sample align_corners=False) and semantics of
mmdet's ``get_uncertain_point_coords_with_randomness``."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_point_sample_matches_torch_grid_sample(rng):
    torch = pytest.importorskip('torch')
    import torch.nn.functional as F
    from lednet_tpu.ops.point_loss import point_sample_nhw

    maps = rng.normal(size=(3, 9, 13)).astype(np.float32)
    coords = rng.uniform(0, 1, size=(3, 40, 2)).astype(np.float32)

    got = np.asarray(point_sample_nhw(jnp.asarray(maps),
                                      jnp.asarray(coords)))
    # mmcv point_sample: grid_sample on 2*coords-1, align_corners=False
    t = F.grid_sample(torch.from_numpy(maps)[:, None],
                      2.0 * torch.from_numpy(coords)[:, :, None] - 1.0,
                      mode='bilinear', align_corners=False)
    want = t[:, 0, :, 0].numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_uncertain_coords_prefer_boundary():
    """The importance-sampled fraction must concentrate where |logit| is
    small (the mask boundary), per PointRend's uncertainty heuristic."""
    from lednet_tpu.ops.point_loss import uncertain_point_coords

    # logit ramp crossing zero at x = 0.5: boundary is the x ~ 0.5 column
    w = 64
    xs = jnp.linspace(-8, 8, w)
    logit = jnp.broadcast_to(xs[None, None, :], (1, 16, w))
    coords = uncertain_point_coords(jax.random.PRNGKey(0), logit,
                                    num_points=128,
                                    oversample_ratio=3.0,
                                    importance_sample_ratio=0.75)
    assert coords.shape == (1, 128, 2)
    imp = coords[0, :96, 0]  # first 96 = importance-sampled x coords
    assert float(jnp.abs(imp - 0.5).mean()) < 0.1
    rand = coords[0, 96:, 0]  # the 32 random ones stay uniform
    assert float(jnp.abs(rand - 0.5).mean()) > 0.15


def test_sampled_losses_approximate_dense():
    """On an easy mask the point-sampled BCE/Dice should approximate the
    dense values (same estimand, Monte-Carlo + importance sampling)."""
    from lednet_tpu.ops.point_loss import sampled_mask_bce_dice

    rng = np.random.default_rng(1)
    h = w = 48
    gt = np.zeros((2, h, w), np.float32)
    gt[:, 8:40, 8:40] = 1.0
    logit = (gt * 2 - 1) * 3 + rng.normal(size=gt.shape).astype(np.float32)

    bce, dice = sampled_mask_bce_dice(jax.random.PRNGKey(0),
                                      jnp.asarray(logit), jnp.asarray(gt),
                                      num_points=2048)
    dense_bce = -(gt * jax.nn.log_sigmoid(logit) +
                  (1 - gt) * jax.nn.log_sigmoid(-logit)).mean((-2, -1))
    prob = jax.nn.sigmoid(logit)
    inter = (prob * gt).sum((-2, -1))
    dense_dice = 1 - (2 * inter + 1) / (prob.sum((-2, -1)) +
                                        gt.sum((-2, -1)) + 1)
    # importance sampling oversamples the boundary, so BCE skews high vs
    # the dense mean — only sanity-band it; dice is ratio-based and closer
    assert bce.shape == (2,) and np.all(np.isfinite(np.asarray(bce)))
    np.testing.assert_allclose(np.asarray(dice), np.asarray(dense_dice),
                               atol=0.2)
    assert float(bce.mean()) > float(np.asarray(dense_bce).mean())


def test_sampled_loss_gradients_flow():
    from lednet_tpu.ops.point_loss import sampled_mask_bce_dice

    gt = jnp.zeros((1, 16, 16)).at[:, 4:12, 4:12].set(1.0)

    def f(logit):
        bce, dice = sampled_mask_bce_dice(jax.random.PRNGKey(0), logit, gt,
                                          num_points=64)
        return bce.sum() + dice.sum()

    g = jax.grad(f)(jnp.zeros((1, 16, 16)))
    assert float(jnp.abs(g).sum()) > 0


def test_psa_mask_matches_cuda_kernel_semantics():
    """psa_mask (the mmcv PSAMask CUDA op re-expressed as a static gather)
    vs a literal python transcription of the kernel: for each position p,
    the mask window centered at p scatters into target-position channels;
    out-of-image offsets are zero. Collect = A^T / distribute = A in the
    torch (channel, spatial) layout."""
    import numpy as np
    import jax.numpy as jnp
    from lednet_tpu.models.decode_heads.point_setr_heads import psa_mask

    rng = np.random.default_rng(0)
    h, w, mh, mw = 4, 5, 5, 7
    half_h, half_w = (mh - 1) // 2, (mw - 1) // 2
    y = rng.normal(size=(2, h, w, mh * mw)).astype(np.float32)

    # literal kernel: collect[n, t, p] over channel-first torch layout
    collect = np.zeros((2, h * w, h * w), np.float32)
    for py in range(h):
        for px in range(w):
            for dy in range(mh):
                for dx in range(mw):
                    ty, tx = py + dy - half_h, px + dx - half_w
                    if 0 <= ty < h and 0 <= tx < w:
                        collect[:, ty * w + tx, py * w + px] = \
                            y[:, py, px, dy * mw + dx]

    A = np.asarray(psa_mask(jnp.asarray(y), (mh, mw)))   # A[p, t]
    np.testing.assert_allclose(A.transpose(0, 2, 1), collect, atol=1e-6)
