"""Uncertainty-based point sampling for mask losses.

Behavioral spec: mmdet's ``get_uncertain_point_coords_with_randomness`` +
``mmcv.ops.point_sample`` as used by the reference's SAN and Mask2Former
losses (``mmseg/models/decode_heads/san_head.py:679-691``): oversample
``num_points * oversample_ratio`` random points, keep the
``importance_sample_ratio * num_points`` most uncertain (uncertainty =
-|logit|, PointRend's heuristic), then top up with fresh uniform points.
Mask BCE / Dice are computed on the sampled points instead of the full mask
grid — O(P) instead of O(hw) per (query, class) pair.

All shapes are static (num_points / ratios are python constants), so the
whole path stays inside one XLA program — no dynamic gather sizes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def point_sample_nhw(maps, coords):
    """Bilinear-sample ``maps`` (N, h, w) at normalized ``coords``
    (N, P, 2) in [0, 1] (x, y) — mmcv ``point_sample`` contract:
    ``grid_sample(2*coords-1, align_corners=False)`` with half-pixel
    centers and zeros padding (out-of-range taps contribute 0, so samples
    within half a pixel of the border fade toward 0 exactly as in torch)."""
    N, H, W = maps.shape
    x = coords[..., 0] * W - 0.5
    y = coords[..., 1] * H - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    wx = x - x0
    wy = y - y0
    flat = maps.reshape(N, H * W)

    def tap(yy, xx):
        ok = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        idx = jnp.clip(yy, 0, H - 1) * W + jnp.clip(xx, 0, W - 1)
        return jnp.take_along_axis(flat, idx, axis=1) * ok

    top = tap(y0, x0) * (1 - wx) + tap(y0, x0 + 1) * wx
    bot = tap(y0 + 1, x0) * (1 - wx) + tap(y0 + 1, x0 + 1) * wx
    return top * (1 - wy) + bot * wy


def uncertain_point_coords(rng, mask_logit, num_points: int,
                           oversample_ratio: float = 3.0,
                           importance_sample_ratio: float = 0.75):
    """Coords (N, num_points, 2) mixing importance-sampled uncertain points
    with uniform random ones. ``mask_logit`` is (N, h, w) raw logits."""
    n = mask_logit.shape[0]
    n_over = int(num_points * oversample_ratio)
    n_imp = int(importance_sample_ratio * num_points)
    n_rand = num_points - n_imp
    k1, k2 = jax.random.split(rng)
    coords = jax.random.uniform(k1, (n, n_over, 2), jnp.float32)
    vals = point_sample_nhw(mask_logit.astype(jnp.float32), coords)
    _, idx = jax.lax.top_k(-jnp.abs(vals), n_imp)
    picked = jnp.take_along_axis(coords, idx[..., None], axis=1)
    if n_rand > 0:
        rand = jax.random.uniform(k2, (n, n_rand, 2), jnp.float32)
        picked = jnp.concatenate([picked, rand], axis=1)
    return picked


def sampled_mask_bce_dice(rng, mask_logit, gt_mask, num_points: int,
                          oversample_ratio: float = 3.0,
                          importance_sample_ratio: float = 0.75):
    """Per-mask (BCE, Dice) on sampled points.

    ``mask_logit``/``gt_mask``: (N, h, w) raw logits and {0,1} float GT.
    Returns ``(bce, dice)`` each (N,): BCE is the mean over points, Dice the
    PointRend-sampled soft dice (eps 1 as in the dense path). The coords are
    chosen from the *logits* only (the reference wraps the coord computation
    in ``no_grad``; gradients flow through the sampled values, and the
    bilinear sample of the prediction is itself differentiable)."""
    coords = jax.lax.stop_gradient(uncertain_point_coords(
        rng, jax.lax.stop_gradient(mask_logit), num_points,
        oversample_ratio, importance_sample_ratio))
    pred_pts = point_sample_nhw(mask_logit.astype(jnp.float32), coords)
    gt_pts = point_sample_nhw(gt_mask.astype(jnp.float32), coords)
    bce = -(gt_pts * jax.nn.log_sigmoid(pred_pts) +
            (1 - gt_pts) * jax.nn.log_sigmoid(-pred_pts)).mean(-1)
    prob = jax.nn.sigmoid(pred_pts)
    inter = (prob * gt_pts).sum(-1)
    dice = 1 - (2 * inter + 1) / (prob.sum(-1) + gt_pts.sum(-1) + 1)
    return bce, dice
