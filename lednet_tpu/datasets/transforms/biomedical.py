"""Biomedical 3D transforms.

Behavioral spec: reference ``mmseg/datasets/transforms/transforms.py:1556-2298``
(the nnUNet-inspired family). Volumes are (C, Z, Y, X) float arrays in
``results['img']`` with (Z, Y, X) ``gt_seg_map``. The NIfTI loaders need
nibabel (absent) and are gated; everything else is plain numpy.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

from lednet_tpu.registry import TRANSFORMS


@TRANSFORMS.register_module()
class BioMedical3DRandomCrop:
    """Random (Z, Y, X) crop of volume + label."""

    def __init__(self, crop_shape: Sequence[int], keep_foreground: bool = True):
        self.crop_shape = tuple(crop_shape)
        self.keep_foreground = keep_foreground

    def __call__(self, results: Dict) -> Dict:
        img = results['img']
        cz, cy, cx = self.crop_shape
        _, Z, Y, X = img.shape
        z = np.random.randint(0, max(Z - cz, 0) + 1)
        y = np.random.randint(0, max(Y - cy, 0) + 1)
        x = np.random.randint(0, max(X - cx, 0) + 1)
        results['img'] = img[:, z:z + cz, y:y + cy, x:x + cx]
        if 'gt_seg_map' in results:
            results['gt_seg_map'] = results['gt_seg_map'][z:z + cz, y:y + cy,
                                                          x:x + cx]
        results['img_shape'] = results['img'].shape[1:]
        return results


@TRANSFORMS.register_module()
class BioMedical3DRandomFlip:
    """Flip along a random subset of the three spatial axes."""

    def __init__(self, prob: float, axes: Sequence[int] = (0, 1, 2),
                 swap_label_pairs=None):
        self.prob = prob
        self.axes = tuple(axes)

    def __call__(self, results: Dict) -> Dict:
        if np.random.rand() >= self.prob:
            return results
        n = np.random.randint(1, len(self.axes) + 1)
        chosen = tuple(np.random.choice(self.axes, n, replace=False))
        img_axes = tuple(a + 1 for a in chosen)  # skip channel dim
        results['img'] = np.flip(results['img'], axis=img_axes).copy()
        if 'gt_seg_map' in results:
            results['gt_seg_map'] = np.flip(results['gt_seg_map'],
                                            axis=chosen).copy()
        return results


@TRANSFORMS.register_module()
class BioMedicalGaussianNoise:
    def __init__(self, prob: float = 0.1, mean: float = 0.0,
                 std: float = 0.1):
        self.prob = prob
        self.mean = mean
        self.std = std

    def __call__(self, results: Dict) -> Dict:
        if np.random.rand() < self.prob:
            noise = np.random.normal(self.mean, self.std,
                                     results['img'].shape)
            results['img'] = (results['img'] + noise).astype(np.float32)
        return results


@TRANSFORMS.register_module()
class BioMedicalGaussianBlur:
    def __init__(self, sigma_range: Tuple[float, float] = (0.5, 1.0),
                 prob: float = 0.2, prob_per_channel: float = 0.5,
                 different_sigma_per_channel: bool = True,
                 different_sigma_per_axis: bool = False):
        self.sigma_range = sigma_range
        self.prob = prob
        self.prob_per_channel = prob_per_channel
        self.per_channel = different_sigma_per_channel

    def __call__(self, results: Dict) -> Dict:
        if np.random.rand() >= self.prob:
            return results
        from scipy.ndimage import gaussian_filter
        img = results['img']
        out = img.copy()
        sigma = np.random.uniform(*self.sigma_range)
        for c in range(img.shape[0]):
            if np.random.rand() < self.prob_per_channel:
                s = np.random.uniform(*self.sigma_range) \
                    if self.per_channel else sigma
                out[c] = gaussian_filter(img[c], s)
        results['img'] = out.astype(np.float32)
        return results


@TRANSFORMS.register_module()
class BioMedicalRandomGamma:
    def __init__(self, prob: float = 0.5, gamma_range=(0.5, 2.0),
                 invert_image: bool = False, per_channel: bool = False,
                 retain_stats: bool = False):
        self.prob = prob
        self.gamma_range = gamma_range
        self.retain_stats = retain_stats

    def __call__(self, results: Dict) -> Dict:
        if np.random.rand() >= self.prob:
            return results
        img = results['img'].astype(np.float32)
        gamma = np.random.uniform(*self.gamma_range)
        mean, std = img.mean(), img.std()
        lo, rng = img.min(), np.ptp(img) + 1e-7
        img = ((img - lo) / rng) ** gamma * rng + lo
        if self.retain_stats:
            img = (img - img.mean()) / (img.std() + 1e-7) * std + mean
        results['img'] = img
        return results


@TRANSFORMS.register_module()
class BioMedical3DPad:
    def __init__(self, pad_shape: Sequence[int], pad_val: float = 0.0,
                 seg_pad_val: int = 0):
        self.pad_shape = tuple(pad_shape)
        self.pad_val = pad_val
        self.seg_pad_val = seg_pad_val

    def __call__(self, results: Dict) -> Dict:
        img = results['img']
        pads = [(0, 0)] + [(0, max(t - s, 0))
                           for t, s in zip(self.pad_shape, img.shape[1:])]
        results['img'] = np.pad(img, pads, constant_values=self.pad_val)
        if 'gt_seg_map' in results:
            results['gt_seg_map'] = np.pad(results['gt_seg_map'], pads[1:],
                                           constant_values=self.seg_pad_val)
        results['pad_shape'] = results['img'].shape[1:]
        return results


@TRANSFORMS.register_module()
class LoadBiomedicalImageFromFile:
    """Gated: NIfTI loading needs nibabel (not in this image)."""

    def __init__(self, *args, **kwargs):
        try:
            import nibabel  # noqa: F401
            self._nib = True
        except ImportError:
            self._nib = False

    def __call__(self, results: Dict) -> Dict:
        if not self._nib:
            raise NotImplementedError(
                'LoadBiomedicalImageFromFile needs nibabel; install it or '
                'pre-convert volumes to .npy and use LoadImageFromNpyFile')
        import nibabel as nib
        vol = nib.load(results['img_path']).get_fdata().astype(np.float32)
        if vol.ndim == 3:
            vol = vol[None]
        results['img'] = vol
        results['img_shape'] = vol.shape[1:]
        results['ori_shape'] = vol.shape[1:]
        return results


@TRANSFORMS.register_module()
class LoadBiomedicalAnnotation(LoadBiomedicalImageFromFile):
    def __call__(self, results: Dict) -> Dict:
        if not self._nib:
            raise NotImplementedError('needs nibabel')
        import nibabel as nib
        seg = nib.load(results['seg_map_path']).get_fdata()
        results['gt_seg_map'] = seg.astype(np.int32)
        return results
