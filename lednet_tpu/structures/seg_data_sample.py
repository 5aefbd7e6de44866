"""SegDataSample — the per-image result/annotation container.

Lightweight analogue of the reference's mmengine-based structure
(``mmseg/structures/seg_data_sample.py``): named fields ``gt_sem_seg`` /
``pred_sem_seg`` / ``seg_logits`` (each a dict-like PixelData with a
``data`` array) plus a ``metainfo`` dict. Arrays are NHWC/HW numpy or jax;
no torch dependency.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


class PixelData:
    def __init__(self, data=None, **kwargs):
        self.data = data
        for k, v in kwargs.items():
            setattr(self, k, v)

    @property
    def shape(self):
        return None if self.data is None else tuple(self.data.shape)

    def numpy(self):
        return np.asarray(self.data)


class SegDataSample:
    FIELDS = ('gt_sem_seg', 'pred_sem_seg', 'seg_logits', 'gt_edge_map',
              'gt_depth_map', 'pred_depth_map')

    def __init__(self, metainfo: Optional[Dict[str, Any]] = None):
        self._metainfo: Dict[str, Any] = dict(metainfo or {})
        self._fields: Dict[str, PixelData] = {}

    # -- metainfo ----------------------------------------------------------
    @property
    def metainfo(self) -> Dict[str, Any]:
        return dict(self._metainfo)

    def set_metainfo(self, metainfo: Dict[str, Any]) -> 'SegDataSample':
        self._metainfo.update(metainfo)
        return self

    def get(self, key, default=None):
        if key in self._fields:
            return self._fields[key]
        return self._metainfo.get(key, default)

    # -- field access ------------------------------------------------------
    def __setattr__(self, name, value):
        if name.startswith('_'):
            super().__setattr__(name, value)
        elif name in self.FIELDS:
            if not isinstance(value, PixelData):
                value = PixelData(data=value)
            self._fields[name] = value
        else:
            self._metainfo[name] = value

    def __getattr__(self, name):
        if name.startswith('_'):
            raise AttributeError(name)
        fields = object.__getattribute__(self, '_fields')
        if name in fields:
            return fields[name]
        meta = object.__getattribute__(self, '_metainfo')
        if name in meta:
            return meta[name]
        raise AttributeError(name)

    def __contains__(self, name) -> bool:
        return name in self._fields or name in self._metainfo

    def keys(self):
        return list(self._fields) + list(self._metainfo)

    def __repr__(self):
        return (f'SegDataSample(fields={list(self._fields)}, '
                f'metainfo={self._metainfo})')
