"""Geometric & photometric augmentation transforms (numpy/cv2 host side).

Behavioral spec: reference ``mmseg/datasets/transforms/transforms.py`` and the
mmcv transforms it inherits. The canonical LED-Net train pipeline
(``configs/_base_/datasets/pascal_voc12.py:6-18``) is: LoadImageFromFile ->
LoadAnnotations -> RandomResize((2048,512), ratio (0.5,2.0), keep_ratio) ->
RandomCrop(512^2, cat_max_ratio=0.75) -> RandomFlip(0.5) ->
PhotoMetricDistortion -> PackSegInputs.

Distribution-parity notes (SURVEY.md §7.4): RandomResize samples a uniform
ratio against scale=(W,H); keep_ratio resizing uses mmcv's 'rescale' rule
(min(long/longest, short/shortest)); RandomCrop re-draws up to 10 times while
one class (ignoring 255) covers > cat_max_ratio; PhotoMetricDistortion follows
the SSD ordering (brightness -> [contrast] -> saturation -> hue -> [contrast])
with per-step coin flips in BGR/HSV uint8 space.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import cv2
import numpy as np

from lednet_tpu.registry import TRANSFORMS


def _rescale_size(old_size: Tuple[int, int], scale, return_scale=False):
    """mmcv.rescale_size: (w, h) target given scale tuple/factor."""
    w, h = old_size
    if isinstance(scale, (float, int)):
        scale_factor = scale
    else:
        max_long, max_short = max(scale), min(scale)
        scale_factor = min(max_long / max(h, w), max_short / min(h, w))
    new_size = (int(w * scale_factor + 0.5), int(h * scale_factor + 0.5))
    if return_scale:
        return new_size, scale_factor
    return new_size


def _imresize(img, size_wh, interpolation='bilinear'):
    interp = {'bilinear': cv2.INTER_LINEAR, 'nearest': cv2.INTER_NEAREST,
              'bicubic': cv2.INTER_CUBIC}[interpolation]
    return cv2.resize(img, size_wh, interpolation=interp)


@TRANSFORMS.register_module()
class Resize:
    """mmcv Resize: ``scale=(w, h)``; ``keep_ratio`` rescales the long edge."""

    def __init__(self, scale=None, scale_factor=None, keep_ratio=False,
                 clip_object_border=True, interpolation='bilinear',
                 backend='cv2'):
        self.scale = scale
        self.scale_factor = scale_factor
        self.keep_ratio = keep_ratio
        self.interpolation = interpolation

    def _target_scale(self, results):
        if results.get('scale') is not None:
            return results['scale']
        if self.scale is not None:
            return self.scale
        h, w = results['img'].shape[:2]
        f = self.scale_factor
        if isinstance(f, (tuple, list)):
            f = f[0]
        return (int(w * f), int(h * f))

    def __call__(self, results: Dict) -> Dict:
        img = results['img']
        h, w = img.shape[:2]
        scale = self._target_scale(results)
        if self.keep_ratio:
            new_w, new_h = _rescale_size((w, h), scale)
        else:
            new_w, new_h = int(scale[0]), int(scale[1])
        results['img'] = _imresize(img, (new_w, new_h), self.interpolation)
        results['img_shape'] = (new_h, new_w)
        results['scale'] = (new_w, new_h)
        results['scale_factor'] = (new_w / w, new_h / h)
        results['keep_ratio'] = self.keep_ratio
        for key in results.get('seg_fields', []):
            results[key] = _imresize(results[key], (new_w, new_h), 'nearest')
        return results


@TRANSFORMS.register_module()
class RandomResize:
    """Sample a ratio in ``ratio_range`` against ``scale=(w, h)``, then
    delegate to Resize(keep_ratio)."""

    def __init__(self, scale, ratio_range=(0.5, 2.0), keep_ratio=True,
                 interpolation='bilinear', resize_type='Resize', **kwargs):
        self.scale = scale
        self.ratio_range = ratio_range
        self.resize = Resize(scale=None, keep_ratio=keep_ratio,
                             interpolation=interpolation)

    def __call__(self, results: Dict) -> Dict:
        lo, hi = self.ratio_range
        ratio = np.random.random_sample() * (hi - lo) + lo
        results['scale'] = (int(self.scale[0] * ratio),
                            int(self.scale[1] * ratio))
        out = self.resize(results)
        out.pop('scale', None)
        return out


@TRANSFORMS.register_module()
class ResizeToMultiple:
    """Pad-free resize up to the next multiple (reference ``transforms.py:33``)."""

    def __init__(self, size_divisor=32, interpolation='bilinear'):
        self.size_divisor = size_divisor
        self.interpolation = interpolation

    def __call__(self, results: Dict) -> Dict:
        img = results['img']
        h, w = img.shape[:2]
        d = self.size_divisor
        new_h, new_w = -(-h // d) * d, -(-w // d) * d
        results['img'] = _imresize(img, (new_w, new_h), self.interpolation)
        results['img_shape'] = (new_h, new_w)
        for key in results.get('seg_fields', []):
            results[key] = _imresize(results[key], (new_w, new_h), 'nearest')
        return results


@TRANSFORMS.register_module()
class RandomCrop:
    """Random crop with the class-balance re-draw loop
    (reference ``transforms.py:208``: up to 10 attempts while a single class
    covers more than ``cat_max_ratio`` of the crop, ignore_index excluded)."""

    def __init__(self, crop_size, cat_max_ratio=1.0, ignore_index=255):
        self.crop_size = crop_size  # (h, w)
        self.cat_max_ratio = cat_max_ratio
        self.ignore_index = ignore_index

    def _sample_bbox(self, img_shape):
        h, w = img_shape[:2]
        margin_h = max(h - self.crop_size[0], 0)
        margin_w = max(w - self.crop_size[1], 0)
        y = np.random.randint(0, margin_h + 1)
        x = np.random.randint(0, margin_w + 1)
        return y, min(y + self.crop_size[0], h), x, min(x + self.crop_size[1], w)

    def __call__(self, results: Dict) -> Dict:
        img = results['img']
        y1, y2, x1, x2 = self._sample_bbox(img.shape)
        gt = results.get('gt_seg_map')
        if self.cat_max_ratio < 1.0 and gt is not None:
            for _ in range(10):
                crop = gt[y1:y2, x1:x2]
                labels, cnt = np.unique(crop, return_counts=True)
                cnt = cnt[labels != self.ignore_index]
                if len(cnt) > 1 and cnt.max() / cnt.sum() < self.cat_max_ratio:
                    break
                y1, y2, x1, x2 = self._sample_bbox(img.shape)
        results['img'] = img[y1:y2, x1:x2]
        results['img_shape'] = results['img'].shape[:2]
        for key in results.get('seg_fields', []):
            results[key] = results[key][y1:y2, x1:x2]
        return results


@TRANSFORMS.register_module()
class RandomFlip:
    def __init__(self, prob=None, direction='horizontal', swap_seg_labels=None):
        self.prob = prob
        self.direction = direction

    def __call__(self, results: Dict) -> Dict:
        flip = self.prob is not None and np.random.rand() < self.prob
        results['flip'] = flip
        results['flip_direction'] = self.direction if flip else None
        if flip:
            axis = 1 if self.direction == 'horizontal' else 0
            results['img'] = np.flip(results['img'], axis=axis).copy()
            for key in results.get('seg_fields', []):
                results[key] = np.flip(results[key], axis=axis).copy()
        return results


@TRANSFORMS.register_module()
class RandomRotate:
    """Reference ``transforms.py:340``: rotate with prob, uniform degree."""

    def __init__(self, prob, degree, pad_val=0, seg_pad_val=255,
                 center=None, auto_bound=False):
        self.prob = prob
        self.degree = (-degree, degree) if isinstance(degree, (int, float)) \
            else degree
        self.pad_val = pad_val
        self.seg_pad_val = seg_pad_val
        self.center = center

    def __call__(self, results: Dict) -> Dict:
        if np.random.rand() >= self.prob:
            return results
        angle = np.random.uniform(*self.degree)
        img = results['img']
        h, w = img.shape[:2]
        center = self.center or ((w - 1) * 0.5, (h - 1) * 0.5)
        mat = cv2.getRotationMatrix2D(center, -angle, 1.0)
        results['img'] = cv2.warpAffine(img, mat, (w, h),
                                        borderValue=self.pad_val)
        for key in results.get('seg_fields', []):
            results[key] = cv2.warpAffine(
                results[key], mat, (w, h), flags=cv2.INTER_NEAREST,
                borderValue=self.seg_pad_val)
        return results


@TRANSFORMS.register_module()
class Pad:
    """Bottom-right pad to a fixed ``size=(h, w)`` or to the next multiple of
    ``size_divisor`` (mmcv Pad as used by the voc12_aug pipeline): image gets
    ``pad_val``, seg fields get ``seg_pad_val`` (ignore)."""

    def __init__(self, size=None, size_divisor=None, pad_val=0,
                 seg_pad_val=255, pad_to_square=False):
        assert (size is None) != (size_divisor is None), \
            'exactly one of size / size_divisor must be set'
        self.size = size
        self.size_divisor = size_divisor
        if isinstance(pad_val, dict):  # mmdet-style dict(img=., seg=.)
            seg_pad_val = pad_val.get('seg', seg_pad_val)
            pad_val = pad_val.get('img', 0)
        self.pad_val = pad_val
        self.seg_pad_val = seg_pad_val

    def _target(self, h, w):
        if self.size is not None:
            return max(self.size[0], h), max(self.size[1], w)
        d = self.size_divisor
        return -(-h // d) * d, -(-w // d) * d

    def __call__(self, results: Dict) -> Dict:
        img = results['img']
        h, w = img.shape[:2]
        th, tw = self._target(h, w)
        pad = ((0, th - h), (0, tw - w)) + ((0, 0),) * (img.ndim - 2)
        results['img'] = np.pad(img, pad, constant_values=self.pad_val)
        results['pad_shape'] = (th, tw)
        results['img_shape'] = (th, tw)
        for key in results.get('seg_fields', []):
            seg = results[key]
            spad = ((0, th - seg.shape[0]), (0, tw - seg.shape[1])) \
                + ((0, 0),) * (seg.ndim - 2)
            results[key] = np.pad(seg, spad, constant_values=self.seg_pad_val)
        return results


@TRANSFORMS.register_module()
class RandomRotFlip:
    """Synapse-style augmentation (reference ``transforms.py:878``): with
    ``rotate_prob`` rotate by a uniform angle in ``degree``; otherwise with
    ``flip_prob`` apply a random k*90 rotation plus a random-axis flip."""

    def __init__(self, rotate_prob=0.5, flip_prob=0.5, degree=(-20, 20)):
        self.rotate_prob = rotate_prob
        self.flip_prob = flip_prob
        self.degree = (-degree, degree) if isinstance(degree, (int, float)) \
            else tuple(degree)

    def _rot90_flip(self, results):
        k = np.random.randint(0, 4)
        axis = np.random.randint(0, 2)
        for key in ['img'] + list(results.get('seg_fields', [])):
            arr = np.rot90(results[key], k)
            results[key] = np.flip(arr, axis=axis).copy()
        results['img_shape'] = results['img'].shape[:2]
        return results

    def _rotate(self, results):
        angle = np.random.uniform(min(self.degree), max(self.degree))
        h, w = results['img'].shape[:2]
        mat = cv2.getRotationMatrix2D(((w - 1) * 0.5, (h - 1) * 0.5),
                                      -angle, 1.0)
        results['img'] = cv2.warpAffine(results['img'], mat, (w, h))
        for key in results.get('seg_fields', []):
            results[key] = cv2.warpAffine(results[key], mat, (w, h),
                                          flags=cv2.INTER_NEAREST)
        return results

    def __call__(self, results: Dict) -> Dict:
        if np.random.rand() < self.rotate_prob:
            return self._rotate(results)
        if np.random.rand() < self.flip_prob:
            return self._rot90_flip(results)
        return results


@TRANSFORMS.register_module()
class ConcatCDInput:
    """Change-detection input fusion (reference ``transforms.py:2465``):
    channel-concat the image pair into a single 6-channel ``img``."""

    def __init__(self, input_keys=('img', 'img2')):
        self.input_keys = tuple(input_keys)

    def __call__(self, results: Dict) -> Dict:
        results['img'] = np.concatenate(
            [results.pop(k) for k in self.input_keys], axis=2)
        return results


@TRANSFORMS.register_module()
class RandomDepthMix:
    """Depth-estimation augmentation (reference ``transforms.py:2495``):
    with ``prob``, paste a random vertical strip of the (unscaled) depth map
    into every image channel."""

    def __init__(self, prob: float = 0.25, mix_scale_ratio: float = 0.75):
        self.prob = prob
        self.mix_scale_ratio = mix_scale_ratio

    def __call__(self, results: Dict) -> Dict:
        if np.random.rand() > self.prob:
            return results
        h, w = results['img_shape'][:2]
        left = int(w * np.random.rand())
        width = int(max(1, (w - left) * self.mix_scale_ratio
                        * np.random.rand()))
        depth = results['gt_depth_map'] / results.get(
            'depth_rescale_factor', 1)
        img = results['img']
        strip = depth[:, left:left + width]
        if img.ndim == 3:
            img[:, left:left + width, :] = strip[..., None]
        else:
            img[:, left:left + width] = strip
        results['img'] = img
        return results


@TRANSFORMS.register_module()
class PhotoMetricDistortion:
    """SSD-style photometric jitter in uint8 BGR/HSV space
    (reference ``transforms.py:583``)."""

    def __init__(self, brightness_delta=32, contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta=18):
        self.brightness_delta = brightness_delta
        self.contrast_lower, self.contrast_upper = contrast_range
        self.saturation_lower, self.saturation_upper = saturation_range
        self.hue_delta = hue_delta

    @staticmethod
    def _convert(img, alpha=1.0, beta=0.0):
        return np.clip(img.astype(np.float32) * alpha + beta, 0, 255
                       ).astype(np.uint8)

    def _brightness(self, img):
        if np.random.randint(2):
            return self._convert(
                img, beta=np.random.uniform(-self.brightness_delta,
                                            self.brightness_delta))
        return img

    def _contrast(self, img):
        if np.random.randint(2):
            return self._convert(
                img, alpha=np.random.uniform(self.contrast_lower,
                                             self.contrast_upper))
        return img

    def _saturation(self, img):
        if np.random.randint(2):
            hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
            hsv[:, :, 1] = self._convert(
                hsv[:, :, 1],
                alpha=np.random.uniform(self.saturation_lower,
                                        self.saturation_upper))
            img = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
        return img

    def _hue(self, img):
        if np.random.randint(2):
            hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
            hsv[:, :, 0] = (hsv[:, :, 0].astype(int) +
                            np.random.randint(-self.hue_delta,
                                              self.hue_delta)) % 180
            img = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
        return img

    def __call__(self, results: Dict) -> Dict:
        img = results['img']
        img = self._brightness(img)
        mode = np.random.randint(2)
        if mode == 1:
            img = self._contrast(img)
        img = self._saturation(img)
        img = self._hue(img)
        if mode == 0:
            img = self._contrast(img)
        results['img'] = img
        return results


@TRANSFORMS.register_module()
class CLAHE:
    def __init__(self, clip_limit=40.0, tile_grid_size=(8, 8)):
        self.clip_limit = clip_limit
        self.tile_grid_size = tuple(tile_grid_size)

    def __call__(self, results: Dict) -> Dict:
        img = results['img']
        clahe = cv2.createCLAHE(self.clip_limit, self.tile_grid_size)
        for c in range(img.shape[2]):
            img[:, :, c] = clahe.apply(np.array(img[:, :, c], np.uint8))
        results['img'] = img
        return results


@TRANSFORMS.register_module()
class AdjustGamma:
    def __init__(self, gamma=1.0):
        self.gamma = gamma
        inv = 1.0 / gamma
        self.table = np.array([(i / 255.0) ** inv * 255
                               for i in range(256)]).astype(np.uint8)

    def __call__(self, results: Dict) -> Dict:
        results['img'] = cv2.LUT(np.array(results['img'], np.uint8), self.table)
        return results


@TRANSFORMS.register_module()
class Rerange:
    def __init__(self, min_value=0, max_value=255):
        self.min_value, self.max_value = min_value, max_value

    def __call__(self, results: Dict) -> Dict:
        img = results['img'].astype(np.float32)
        lo, hi = np.min(img), np.max(img)
        img = (img - lo) / (hi - lo)
        results['img'] = img * (self.max_value - self.min_value) + self.min_value
        return results


@TRANSFORMS.register_module()
class RGB2Gray:
    def __init__(self, out_channels=None, weights=(0.299, 0.587, 0.114)):
        self.out_channels = out_channels
        self.weights = weights

    def __call__(self, results: Dict) -> Dict:
        img = results['img'].astype(np.float32)
        gray = (img * np.array(self.weights)).sum(2, keepdims=True)
        reps = self.out_channels or img.shape[2]
        results['img'] = np.tile(gray, (1, 1, reps))
        return results


@TRANSFORMS.register_module()
class SegRescale:
    def __init__(self, scale_factor=1):
        self.scale_factor = scale_factor

    def __call__(self, results: Dict) -> Dict:
        if self.scale_factor != 1:
            for key in results.get('seg_fields', []):
                h, w = results[key].shape[:2]
                results[key] = _imresize(
                    results[key], (int(w * self.scale_factor),
                                   int(h * self.scale_factor)), 'nearest')
        return results


@TRANSFORMS.register_module()
class GenerateEdge:
    """STDC boundary ground truth via morphological gradient of the label
    (reference ``transforms.py:1394``: per-class edge union, dilated)."""

    def __init__(self, edge_width=3, ignore_index=255):
        self.edge_width = edge_width
        self.ignore_index = ignore_index

    def __call__(self, results: Dict) -> Dict:
        seg = results['gt_seg_map']
        edge = np.zeros_like(seg, dtype=np.uint8)
        # pixel differs from a 4-neighbour -> boundary
        diff = np.zeros_like(seg, dtype=bool)
        diff[1:, :] |= (seg[1:, :] != seg[:-1, :])
        diff[:-1, :] |= (seg[1:, :] != seg[:-1, :])
        diff[:, 1:] |= (seg[:, 1:] != seg[:, :-1])
        diff[:, :-1] |= (seg[:, 1:] != seg[:, :-1])
        diff &= (seg != self.ignore_index)
        edge[diff] = 1
        if self.edge_width > 1:
            kernel = np.ones((self.edge_width, self.edge_width), np.uint8)
            edge = cv2.dilate(edge, kernel)
        results['gt_edge_map'] = edge
        results.setdefault('seg_fields', []).append('gt_edge_map')
        return results


@TRANSFORMS.register_module()
class ResizeShortestEdge:
    """Scale the short edge to one of ``scale`` capping the long edge at
    ``max_size`` (reference ``transforms.py:1472``, detectron2 semantics)."""

    def __init__(self, scale, max_size):
        self.scale = scale if isinstance(scale, (list, tuple)) else [scale]
        self.max_size = max_size

    def __call__(self, results: Dict) -> Dict:
        h, w = results['img'].shape[:2]
        short = int(np.random.choice(self.scale))
        f = short / min(h, w)
        if max(h, w) * f > self.max_size:
            f = self.max_size / max(h, w)
        new_w, new_h = int(w * f + 0.5), int(h * f + 0.5)
        results['img'] = _imresize(results['img'], (new_w, new_h))
        results['img_shape'] = (new_h, new_w)
        results['scale_factor'] = (new_w / w, new_h / h)
        for key in results.get('seg_fields', []):
            results[key] = _imresize(results[key], (new_w, new_h), 'nearest')
        return results


@TRANSFORMS.register_module()
class RandomMosaic:
    """4-image mosaic (reference ``transforms.py:1102``): paste four samples
    around a jittered center on a 2x-canvas. Requires the dataset wrapper to
    expose ``results['dataset']`` (MultiImageMixDataset)."""

    def __init__(self, prob, img_scale=(640, 640), center_ratio_range=(0.5, 1.5),
                 pad_val=0, seg_pad_val=255):
        self.prob = prob
        self.img_scale = img_scale  # (h, w)
        self.center_ratio_range = center_ratio_range
        self.pad_val = pad_val
        self.seg_pad_val = seg_pad_val

    def __call__(self, results: Dict) -> Dict:
        if np.random.rand() >= self.prob or 'dataset' not in results:
            return results
        dataset = results['dataset']
        mh, mw = self.img_scale
        canvas = np.full((2 * mh, 2 * mw, 3), self.pad_val, np.uint8)
        seg_canvas = np.full((2 * mh, 2 * mw), self.seg_pad_val, np.uint8)
        cy = int(np.random.uniform(*self.center_ratio_range) * mh)
        cx = int(np.random.uniform(*self.center_ratio_range) * mw)
        samples = [results]
        from lednet_tpu.datasets.transforms.loading import (LoadAnnotations,
                                                            LoadImageFromFile)
        loader_i, loader_a = LoadImageFromFile(), LoadAnnotations()
        for _ in range(3):
            info = dataset.get_data_info(np.random.randint(len(dataset)))
            info = loader_a(loader_i(info))
            samples.append(info)
        quads = [(slice(0, cy), slice(0, cx)),
                 (slice(0, cy), slice(cx, 2 * mw)),
                 (slice(cy, 2 * mh), slice(0, cx)),
                 (slice(cy, 2 * mh), slice(cx, 2 * mw))]
        for samp, (ys, xs) in zip(samples, quads):
            th = ys.stop - ys.start
            tw = xs.stop - xs.start
            if th <= 0 or tw <= 0:
                continue
            img = _imresize(samp['img'], (tw, th))
            canvas[ys, xs] = img
            if 'gt_seg_map' in samp:
                seg_canvas[ys, xs] = _imresize(samp['gt_seg_map'], (tw, th),
                                               'nearest')
        results['img'] = canvas
        results['img_shape'] = canvas.shape[:2]
        if 'gt_seg_map' in results:
            results['gt_seg_map'] = seg_canvas
        return results


@TRANSFORMS.register_module()
class Albu:
    """Albumentations bridge (reference ``transforms.py:2300``). Gated: if
    the albumentations package is unavailable the transform is a no-op with
    a one-time warning (the package is not part of this image)."""

    def __init__(self, transforms, keymap=None, update_pad_shape=False,
                 additional_targets=None, bgr_to_rgb=False, **kwargs):
        self.transforms = transforms
        # keymap: results key -> albumentations target name (reference
        # transforms.py keymap_to_albu; default img/gt_seg_map mapping)
        self.keymap = dict(keymap) if keymap else {'img': 'image',
                                                   'gt_seg_map': 'mask'}
        self._warned = False
        try:
            import albumentations
        except ImportError:
            self._compose = None
            return
        # build errors (typo'd type, bad kwarg) must propagate, not silently
        # disable augmentation
        built = []
        for t in transforms:
            t = dict(t)
            cls = getattr(albumentations, t.pop('type'))
            built.append(cls(**t))
        self._compose = albumentations.Compose(
            built, additional_targets=additional_targets)

    def __call__(self, results: Dict) -> Dict:
        if self._compose is None:
            if not self._warned:
                import warnings
                warnings.warn('albumentations not installed; Albu is a no-op')
                self._warned = True
            return results
        # map every keymap'd key present (img2 etc. ride additional_targets)
        inputs = {albu_k: results[k] for k, albu_k in self.keymap.items()
                  if results.get(k) is not None}
        out = self._compose(**inputs)
        for k, albu_k in self.keymap.items():
            if out.get(albu_k) is not None:
                results[k] = out[albu_k]
        results['img_shape'] = results['img'].shape[:2]
        return results
