"""Base segmentation dataset.

Behavioral spec from the reference ``mmseg/datasets/basesegdataset.py:15``:
suffix-pair directory scanning OR an ``ann_file`` split list; ``METAINFO``
classes/palette; ``reduce_zero_label``; lazy per-item pipeline execution.
Subclasses only set suffixes + metainfo.
"""
from __future__ import annotations

import copy
import os
import os.path as osp
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from lednet_tpu.datasets import metainfo as _metainfo
from lednet_tpu.registry import DATASETS, TRANSFORMS


def build_pipeline(pipeline) -> List[Callable]:
    out = []
    for t in pipeline or []:
        if callable(t):
            out.append(t)
        else:
            out.append(TRANSFORMS.build(dict(t)))
    return out


class Compose:
    def __init__(self, transforms):
        self.transforms = build_pipeline(transforms)

    def __call__(self, results: Dict) -> Optional[Dict]:
        for t in self.transforms:
            results = t(results)
            if results is None:
                return None
        return results


@DATASETS.register_module()
class BaseSegDataset:
    METAINFO: Dict[str, Any] = {}

    def __init__(self,
                 data_root: Optional[str] = None,
                 data_prefix: Optional[Dict[str, str]] = None,
                 ann_file: str = '',
                 img_suffix: str = '.jpg',
                 seg_map_suffix: str = '.png',
                 pipeline: Sequence = (),
                 metainfo: Optional[Dict] = None,
                 reduce_zero_label: bool = False,
                 ignore_index: int = 255,
                 test_mode: bool = False,
                 lazy_init: bool = False,
                 indices: Optional[Sequence[int]] = None,
                 serialize_data: bool = True,
                 max_refetch: int = 1000,
                 backend_args=None,
                 **kwargs):
        self.data_root = data_root
        self.data_prefix = dict(img_path='', seg_map_path='')
        if data_prefix:
            self.data_prefix.update(data_prefix)
        self.ann_file = ann_file
        self.img_suffix = img_suffix
        self.seg_map_suffix = seg_map_suffix
        self.reduce_zero_label = reduce_zero_label
        self.ignore_index = ignore_index
        self.test_mode = test_mode
        self.pipeline = Compose(pipeline)
        self._metainfo = dict(self.METAINFO)
        if metainfo:
            self._metainfo.update(metainfo)
        self._metainfo.setdefault('reduce_zero_label', self.reduce_zero_label)
        self._indices = indices
        self.data_list: List[Dict] = []
        self._fully_initialized = False
        if not lazy_init:
            self.full_init()

    # -- metainfo ----------------------------------------------------------
    @property
    def metainfo(self) -> Dict:
        return copy.deepcopy(self._metainfo)

    # -- index building ----------------------------------------------------
    def full_init(self):
        if self._fully_initialized:
            return
        self.data_list = self.load_data_list()
        if self._indices is not None:
            self.data_list = [self.data_list[i] for i in self._indices]
        self._fully_initialized = True

    def _join(self, prefix: str) -> str:
        if self.data_root and not osp.isabs(prefix):
            return osp.join(self.data_root, prefix)
        return prefix

    def load_data_list(self) -> List[Dict]:
        img_dir = self._join(self.data_prefix.get('img_path', ''))
        ann_dir = self._join(self.data_prefix.get('seg_map_path', ''))
        data_list = []
        if self.ann_file:
            ann_file = self._join(self.ann_file)
            with open(ann_file, encoding='utf-8') as f:
                lines = [ln.strip() for ln in f if ln.strip()]
            for stem in lines:
                item = dict(img_path=osp.join(img_dir, stem + self.img_suffix))
                if ann_dir:
                    item['seg_map_path'] = osp.join(
                        ann_dir, stem + self.seg_map_suffix)
                data_list.append(item)
        else:
            if not osp.isdir(img_dir):
                return []
            for root, _, files in sorted(os.walk(img_dir)):
                for fn in sorted(files):
                    if not fn.endswith(self.img_suffix):
                        continue
                    rel = osp.relpath(osp.join(root, fn), img_dir)
                    item = dict(img_path=osp.join(img_dir, rel))
                    if ann_dir:
                        seg_rel = rel[:-len(self.img_suffix)] + self.seg_map_suffix
                        item['seg_map_path'] = osp.join(ann_dir, seg_rel)
                    data_list.append(item)
        for item in data_list:
            item['label_map'] = None
            item['reduce_zero_label'] = self.reduce_zero_label
            item['seg_fields'] = []
        return data_list

    # -- access ------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.data_list)

    def get_data_info(self, idx: int) -> Dict:
        info = copy.deepcopy(self.data_list[idx])
        info['sample_idx'] = idx
        return info

    def __getitem__(self, idx: int) -> Dict:
        data = self.pipeline(self.get_data_info(idx))
        if data is None:
            raise RuntimeError(f'pipeline returned None for index {idx}')
        return data


@DATASETS.register_module()
class PascalVOCDataset(BaseSegDataset):
    """VOC-style dataset. The fork rewrote the class list to the 2-class
    Apple-Branch task (reference ``mmseg/datasets/voc.py:29-37``,
    ``img_suffix='.png'``)."""
    METAINFO = dict(
        classes=('background', 'branch'),
        palette=[[0, 0, 0], [128, 0, 0]])

    def __init__(self, ann_file='', img_suffix='.png',
                 seg_map_suffix='.png', **kwargs):
        super().__init__(img_suffix=img_suffix, seg_map_suffix=seg_map_suffix,
                         ann_file=ann_file, **kwargs)


@DATASETS.register_module()
class CityscapesDataset(BaseSegDataset):
    """Cityscapes (reference ``mmseg/datasets/cityscapes.py``)."""
    METAINFO = dict(
        classes=('road', 'sidewalk', 'building', 'wall', 'fence', 'pole',
                 'traffic light', 'traffic sign', 'vegetation', 'terrain',
                 'sky', 'person', 'rider', 'car', 'truck', 'bus', 'train',
                 'motorcycle', 'bicycle'),
        palette=[[128, 64, 128], [244, 35, 232], [70, 70, 70], [102, 102, 156],
                 [190, 153, 153], [153, 153, 153], [250, 170, 30],
                 [220, 220, 0], [107, 142, 35], [152, 251, 152],
                 [70, 130, 180], [220, 20, 60], [255, 0, 0], [0, 0, 142],
                 [0, 0, 70], [0, 60, 100], [0, 80, 100], [0, 0, 230],
                 [119, 11, 32]])

    def __init__(self, img_suffix='_leftImg8bit.png',
                 seg_map_suffix='_gtFine_labelTrainIds.png', **kwargs):
        super().__init__(img_suffix=img_suffix, seg_map_suffix=seg_map_suffix,
                         **kwargs)


@DATASETS.register_module()
class ADE20KDataset(BaseSegDataset):
    """ADE20K (150 classes, reduce_zero_label)."""
    METAINFO = dict(
        classes=_metainfo.ADE20K_CLASSES,
        palette=_metainfo.ADE20K_PALETTE)

    def __init__(self, img_suffix='.jpg', seg_map_suffix='.png',
                 reduce_zero_label=True, **kwargs):
        super().__init__(img_suffix=img_suffix, seg_map_suffix=seg_map_suffix,
                         reduce_zero_label=reduce_zero_label, **kwargs)
