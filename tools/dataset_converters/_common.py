"""Shared helpers for the dataset-preparation CLIs.

The reference converters (``tools/dataset_converters/*.py``) all build the
same ``images|annotations / training|validation`` tree and binarize vessel
masks with the ``value // 128`` rule; those pieces live here once.
"""
from __future__ import annotations

import os
import os.path as osp


def make_split_dirs(out_dir: str, splits=('training', 'validation'),
                    kinds=('images', 'annotations')) -> None:
    for kind in kinds:
        for split in splits:
            os.makedirs(osp.join(out_dir, kind, split), exist_ok=True)


def write_binary_mask(img, path: str) -> None:
    """Reference rule (e.g. ``chase_db1.py:63-68``): masks are nominally
    {0, 255} but some are nonstandard, so threshold at 128 via ``// 128``."""
    import cv2
    if img.ndim == 3:
        img = img[:, :, 0]
    cv2.imwrite(path, img // 128)


def read_gif_frame(path: str):
    """The DRIVE manual labels ship as .gif, which cv2.imread won't open;
    the reference reads the first frame via VideoCapture
    (``drive.py:55-66``). PIL is the simpler host-side tool."""
    import numpy as np
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert('RGB'))[:, :, ::-1]  # BGR like cv2
