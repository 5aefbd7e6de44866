"""Loading transforms.

Behavioral spec: reference ``mmseg/datasets/transforms/loading.py`` —
``LoadImageFromFile`` reads BGR uint8 via cv2 (mmcv's imfrombytes default),
``LoadAnnotations`` reads the label map, applies ``label_map`` remapping and
``reduce_zero_label`` (0->255, x->x-1), ``LoadImageFromNDArray`` wraps an
in-memory array for the inference APIs.
"""
from __future__ import annotations

from typing import Dict, Optional

import cv2
import numpy as np

from lednet_tpu.registry import TRANSFORMS


@TRANSFORMS.register_module()
class LoadImageFromFile:
    def __init__(self, to_float32: bool = False, color_type: str = 'color',
                 imdecode_backend: str = 'cv2', backend_args=None,
                 ignore_empty: bool = False):
        self.to_float32 = to_float32
        self.color_type = color_type

    def __call__(self, results: Dict) -> Dict:
        flag = cv2.IMREAD_COLOR if self.color_type == 'color' else \
            cv2.IMREAD_GRAYSCALE
        img = cv2.imread(results['img_path'], flag)
        if img is None:
            raise FileNotFoundError(results['img_path'])
        if self.to_float32:
            img = img.astype(np.float32)
        results['img'] = img
        results['img_shape'] = img.shape[:2]
        results['ori_shape'] = img.shape[:2]
        return results


@TRANSFORMS.register_module()
class LoadImageFromNDArray(LoadImageFromFile):
    """Reference ``loading.py:138`` — array passed as ``results['img']``."""

    def __call__(self, results: Dict) -> Dict:
        img = results['img']
        if self.to_float32:
            img = img.astype(np.float32)
        results['img_path'] = None
        results['img'] = img
        results['img_shape'] = img.shape[:2]
        results['ori_shape'] = img.shape[:2]
        return results


@TRANSFORMS.register_module()
class LoadAnnotations:
    def __init__(self, reduce_zero_label=None, imdecode_backend: str = 'pillow',
                 backend_args=None):
        self.reduce_zero_label = reduce_zero_label
        self.imdecode_backend = imdecode_backend

    def __call__(self, results: Dict) -> Dict:
        # pillow is the mmseg default for labels: palettized PNGs decode to
        # their palette *indices* (cv2 would expand them to colors).
        if self.imdecode_backend == 'pillow':
            from PIL import Image
            with Image.open(results['seg_map_path']) as im:
                seg = np.array(im)
        else:
            seg = cv2.imread(results['seg_map_path'], cv2.IMREAD_UNCHANGED)
        if seg is None:
            raise FileNotFoundError(results['seg_map_path'])
        if seg.ndim == 3:  # color-encoded labels: take one plane
            seg = seg[:, :, 0]
        reduce_zero = self.reduce_zero_label
        if reduce_zero is None:
            reduce_zero = results.get('reduce_zero_label', False)
        if reduce_zero:
            seg = seg.astype(np.int32)
            seg[seg == 0] = 256
            seg = seg - 1
            seg[seg == 255] = 255
            seg = seg.astype(np.uint8)
        label_map = results.get('label_map')
        if label_map:
            out = seg.copy()
            for old, new in label_map.items():
                out[seg == old] = new
            seg = out
        results['gt_seg_map'] = seg
        results.setdefault('seg_fields', []).append('gt_seg_map')
        return results


@TRANSFORMS.register_module()
class LoadDepthAnnotation:
    """Depth-GT loader (reference ``loading.py:632``): reads a uint16 depth
    PNG (cv2 backend) or a .npy array, scales by ``depth_rescale_factor`` and
    registers ``gt_depth_map`` as a seg field so geometric transforms track
    it. The factor is kept in ``results`` so the metric can invert it."""

    def __init__(self, decode_backend: str = 'cv2', to_float32: bool = True,
                 depth_rescale_factor: float = 1.0, backend_args=None):
        self.decode_backend = decode_backend
        self.to_float32 = to_float32
        self.depth_rescale_factor = depth_rescale_factor

    def __call__(self, results: Dict) -> Dict:
        path = results.get('depth_map_path') or results['seg_map_path']
        if self.decode_backend == 'numpy' or path.endswith('.npy'):
            depth = np.load(path)
        else:
            depth = cv2.imread(path, cv2.IMREAD_UNCHANGED)
            if depth is None:
                raise FileNotFoundError(path)
        if self.to_float32:
            depth = depth.astype(np.float32)
        depth = depth * self.depth_rescale_factor
        results['gt_depth_map'] = depth
        results.setdefault('seg_fields', []).append('gt_depth_map')
        results['depth_rescale_factor'] = self.depth_rescale_factor
        return results


@TRANSFORMS.register_module()
class LoadMultipleRSImageFromFile:
    """Paired loader for change detection (reference ``loading.py:561``):
    reads ``img_path``/``img_path2`` into ``img``/``img2``. The reference
    hard-requires gdal; we use gdal when importable and fall back to cv2
    (LEVIR-CD ships plain PNGs), which is strictly more permissive."""

    def __init__(self, to_float32: bool = True):
        self.to_float32 = to_float32
        # resolve gdal once — a failed import is not cached by python, so
        # retrying per read would pay the import machinery on the hot path
        try:
            from osgeo import gdal
            self._gdal = gdal
        except ImportError:
            self._gdal = None

    def _read(self, path: str) -> np.ndarray:
        if self._gdal is not None:
            ds = self._gdal.Open(path)
            if ds is None:
                raise FileNotFoundError(path)
            return np.einsum('ijk->jki', ds.ReadAsArray())
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return img

    def __call__(self, results: Dict) -> Dict:
        img = self._read(results['img_path'])
        img2 = self._read(results['img_path2'])
        if self.to_float32:
            img = img.astype(np.float32)
            img2 = img2.astype(np.float32)
        if img.shape != img2.shape:
            raise ValueError(
                f'CD pair shapes differ: {img.shape} vs {img2.shape}')
        results['img'] = img
        results['img2'] = img2
        results['img_shape'] = img.shape[:2]
        results['ori_shape'] = img.shape[:2]
        return results


@TRANSFORMS.register_module()
class LoadImageFromNpyFile(LoadImageFromFile):
    """Fork-added loader for .npy imagery (reference ``loading.py:709``)."""

    def __call__(self, results: Dict) -> Dict:
        path = results['img_path']
        if path.endswith('.npy'):
            img = np.load(path)
            if img.ndim == 2:
                img = img[..., None].repeat(3, axis=-1)
            if self.to_float32:
                img = img.astype(np.float32)
            results['img'] = img
            results['img_shape'] = img.shape[:2]
            results['ori_shape'] = img.shape[:2]
            return results
        return super().__call__(results)
