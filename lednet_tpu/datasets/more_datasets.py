"""The wider dataset registry (reference ``mmseg/datasets/*.py`` — 27 dataset
classes; each is METAINFO + suffix conventions over BaseSegDataset)."""
from __future__ import annotations

import os.path as osp

from lednet_tpu.datasets.basesegdataset import BaseSegDataset
from lednet_tpu.registry import DATASETS
from lednet_tpu.datasets import metainfo as _mi


@DATASETS.register_module()
class COCOStuffDataset(BaseSegDataset):
    METAINFO = dict(classes=_mi.COCOSTUFF_CLASSES,
                    palette=_mi.COCOSTUFF_PALETTE)

    def __init__(self, img_suffix='.jpg', seg_map_suffix='_labelTrainIds.png',
                 **kwargs):
        super().__init__(img_suffix=img_suffix, seg_map_suffix=seg_map_suffix,
                         **kwargs)


@DATASETS.register_module()
class PascalContextDataset(BaseSegDataset):
    METAINFO = dict(classes=_mi.PASCAL_CONTEXT_CLASSES,
                    palette=_mi.PASCAL_CONTEXT_PALETTE)

    def __init__(self, img_suffix='.jpg', seg_map_suffix='.png', **kwargs):
        super().__init__(img_suffix=img_suffix, seg_map_suffix=seg_map_suffix,
                         **kwargs)


@DATASETS.register_module()
class LoveDADataset(BaseSegDataset):
    METAINFO = dict(
        classes=('background', 'building', 'road', 'water', 'barren',
                 'forest', 'agricultural'),
        palette=[[255, 255, 255], [255, 0, 0], [255, 255, 0], [0, 0, 255],
                 [159, 129, 183], [0, 255, 0], [255, 195, 128]])

    def __init__(self, img_suffix='.png', seg_map_suffix='.png',
                 reduce_zero_label=True, **kwargs):
        super().__init__(img_suffix=img_suffix, seg_map_suffix=seg_map_suffix,
                         reduce_zero_label=reduce_zero_label, **kwargs)


@DATASETS.register_module()
class PotsdamDataset(BaseSegDataset):
    METAINFO = dict(
        classes=('impervious_surface', 'building', 'low_vegetation', 'tree',
                 'car', 'clutter'),
        palette=[[255, 255, 255], [0, 0, 255], [0, 255, 255], [0, 255, 0],
                 [255, 255, 0], [255, 0, 0]])

    def __init__(self, img_suffix='.png', seg_map_suffix='.png',
                 reduce_zero_label=True, **kwargs):
        super().__init__(img_suffix=img_suffix, seg_map_suffix=seg_map_suffix,
                         reduce_zero_label=reduce_zero_label, **kwargs)


@DATASETS.register_module()
class VaihingenDataset(PotsdamDataset):
    pass


@DATASETS.register_module()
class ISPRSDataset(PotsdamDataset):
    pass


@DATASETS.register_module()
class iSAIDDataset(BaseSegDataset):
    METAINFO = dict(classes=_mi.ISAID_CLASSES,
                    palette=_mi.ISAID_PALETTE)

    def __init__(self, img_suffix='.png',
                 seg_map_suffix='_instance_color_RGB.png', **kwargs):
        super().__init__(img_suffix=img_suffix, seg_map_suffix=seg_map_suffix,
                         **kwargs)


@DATASETS.register_module()
class MapillaryDataset_v1(BaseSegDataset):
    METAINFO = dict(classes=_mi.MAPILLARY_V1_CLASSES,
                    palette=_mi.MAPILLARY_V1_PALETTE)

    def __init__(self, img_suffix='.jpg', seg_map_suffix='.png', **kwargs):
        super().__init__(img_suffix=img_suffix, seg_map_suffix=seg_map_suffix,
                         **kwargs)


@DATASETS.register_module()
class BDD100KDataset(BaseSegDataset):
    METAINFO = dict(classes=_mi.CITYSCAPES_CLASSES,
                    palette=_mi.CITYSCAPES_PALETTE)

    def __init__(self, img_suffix='.jpg', seg_map_suffix='.png', **kwargs):
        super().__init__(img_suffix=img_suffix, seg_map_suffix=seg_map_suffix,
                         **kwargs)


@DATASETS.register_module()
class LIPDataset(BaseSegDataset):
    METAINFO = dict(classes=_mi.LIP_CLASSES,
                    palette=_mi.LIP_PALETTE)

    def __init__(self, img_suffix='.jpg', seg_map_suffix='.png', **kwargs):
        super().__init__(img_suffix=img_suffix, seg_map_suffix=seg_map_suffix,
                         **kwargs)


@DATASETS.register_module()
class DarkZurichDataset(BaseSegDataset):
    METAINFO = dict(classes=_mi.CITYSCAPES_CLASSES,
                    palette=_mi.CITYSCAPES_PALETTE)

    def __init__(self, img_suffix='_rgb_anon.png',
                 seg_map_suffix='_gt_labelTrainIds.png', **kwargs):
        super().__init__(img_suffix=img_suffix, seg_map_suffix=seg_map_suffix,
                         **kwargs)


@DATASETS.register_module()
class NightDrivingDataset(BaseSegDataset):
    METAINFO = dict(classes=_mi.CITYSCAPES_CLASSES,
                    palette=_mi.CITYSCAPES_PALETTE)

    def __init__(self, img_suffix='_leftImg8bit.png',
                 seg_map_suffix='_gtCoarse_labelTrainIds.png', **kwargs):
        super().__init__(img_suffix=img_suffix, seg_map_suffix=seg_map_suffix,
                         **kwargs)


class _RetinaDataset(BaseSegDataset):
    METAINFO = dict(classes=('background', 'vessel'),
                    palette=[[120, 120, 120], [6, 230, 230]])

    def __init__(self, img_suffix='.png', seg_map_suffix='.png', **kwargs):
        super().__init__(img_suffix=img_suffix, seg_map_suffix=seg_map_suffix,
                         **kwargs)


@DATASETS.register_module()
class DRIVEDataset(_RetinaDataset):
    def __init__(self, img_suffix='.png',
                 seg_map_suffix='_manual1.png', **kwargs):
        super().__init__(img_suffix=img_suffix, seg_map_suffix=seg_map_suffix,
                         **kwargs)


@DATASETS.register_module()
class STAREDataset(_RetinaDataset):
    def __init__(self, img_suffix='.png', seg_map_suffix='.ah.png', **kwargs):
        super().__init__(img_suffix=img_suffix, seg_map_suffix=seg_map_suffix,
                         **kwargs)


@DATASETS.register_module()
class ChaseDB1Dataset(_RetinaDataset):
    def __init__(self, img_suffix='.png', seg_map_suffix='_1stHO.png',
                 **kwargs):
        super().__init__(img_suffix=img_suffix, seg_map_suffix=seg_map_suffix,
                         **kwargs)


@DATASETS.register_module()
class HRFDataset(_RetinaDataset):
    pass


@DATASETS.register_module()
class SynapseDataset(BaseSegDataset):
    METAINFO = dict(classes=_mi.SYNAPSE_CLASSES,
                    palette=_mi.SYNAPSE_PALETTE)

    def __init__(self, img_suffix='.jpg', seg_map_suffix='.png', **kwargs):
        super().__init__(img_suffix=img_suffix, seg_map_suffix=seg_map_suffix,
                         **kwargs)


@DATASETS.register_module()
class REFUGEDataset(BaseSegDataset):
    METAINFO = dict(classes=_mi.REFUGE_CLASSES,
                    palette=_mi.REFUGE_PALETTE)

    def __init__(self, img_suffix='.png', seg_map_suffix='.png', **kwargs):
        super().__init__(img_suffix=img_suffix, seg_map_suffix=seg_map_suffix,
                         **kwargs)


@DATASETS.register_module()
class LEVIRCDDataset(BaseSegDataset):
    """Change-detection pairs: ``data_prefix.img_path2`` points at the
    second-epoch imagery; every item gains ``img_path2`` for
    ``LoadMultipleRSImageFromFile`` (reference ``mmseg/datasets/levir.py``)."""
    METAINFO = dict(classes=('unchanged', 'changed'),
                    palette=[[0, 0, 0], [255, 255, 255]])

    def __init__(self, img_suffix='.png', seg_map_suffix='.png', **kwargs):
        super().__init__(img_suffix=img_suffix, seg_map_suffix=seg_map_suffix,
                         **kwargs)

    def load_data_list(self):
        data_list = super().load_data_list()
        prefix2 = self.data_prefix.get('img_path2')
        if prefix2:
            dir1 = self._join(self.data_prefix.get('img_path', ''))
            dir2 = self._join(prefix2)
            for item in data_list:
                rel = osp.relpath(item['img_path'], dir1)
                item['img_path2'] = osp.join(dir2, rel)
        return data_list


@DATASETS.register_module()
class NYUDataset(BaseSegDataset):
    """Depth-estimation layout (reference ``mmseg/datasets/nyu.py``):
    ``data_prefix.depth_map_path`` is accepted as an alias of
    ``seg_map_path`` and items expose ``depth_map_path`` for
    ``LoadDepthAnnotation``."""
    METAINFO = dict(classes=('depth',), palette=[[0, 0, 0]])

    def __init__(self, data_prefix=None, img_suffix='.jpg',
                 seg_map_suffix='.png', **kwargs):
        if data_prefix and 'depth_map_path' in data_prefix:
            data_prefix = dict(data_prefix)
            data_prefix['seg_map_path'] = data_prefix.pop('depth_map_path')
        super().__init__(data_prefix=data_prefix, img_suffix=img_suffix,
                         seg_map_suffix=seg_map_suffix, **kwargs)

    def load_data_list(self):
        data_list = super().load_data_list()
        for item in data_list:
            if 'seg_map_path' in item:
                item['depth_map_path'] = item['seg_map_path']
            # NYU category from the parent folder name (reference keeps it
            # in the meta keys as ``category_id``)
            item['category_id'] = -1
        return data_list


def _build_dataset(dataset):
    from lednet_tpu.registry import DATASETS as _D
    return _D.build(dict(dataset)) if isinstance(dataset, dict) else dataset


@DATASETS.register_module()
class ConcatDataset:
    """Concatenation wrapper (mmengine ConcatDataset role — the reference
    uses it for VOC train+aug, ``pascal_voc12_aug.py``). Metainfo comes from
    the first child."""

    def __init__(self, datasets, lazy_init=False, ignore_keys=None, **kwargs):
        self.datasets = [_build_dataset(d) for d in datasets]

    @property
    def metainfo(self):
        return self.datasets[0].metainfo

    def __len__(self):
        return sum(len(d) for d in self.datasets)

    def _locate(self, idx):
        total = len(self)
        if idx < 0:
            idx += total
        if not 0 <= idx < total:
            raise IndexError(idx)
        for ds in self.datasets:
            if idx < len(ds):
                return ds, idx
            idx -= len(ds)
        raise IndexError(idx)

    def __getitem__(self, idx):
        ds, local = self._locate(idx)
        return ds[local]

    def get_data_info(self, idx):
        ds, local = self._locate(idx)
        return ds.get_data_info(local)


@DATASETS.register_module()
class RepeatDataset:
    """Repeat wrapper (mmengine RepeatDataset role — the reference's retina
    datasets train with ``times=40000`` over ~20 images)."""

    def __init__(self, dataset, times=1, lazy_init=False, **kwargs):
        self.dataset = _build_dataset(dataset)
        self.times = times

    @property
    def metainfo(self):
        return self.dataset.metainfo

    def __len__(self):
        return self.times * len(self.dataset)

    def __getitem__(self, idx):
        return self.dataset[idx % len(self.dataset)]

    def get_data_info(self, idx):
        return self.dataset.get_data_info(idx % len(self.dataset))


@DATASETS.register_module()
class MultiImageMixDataset:
    """Wrapper enabling mix-style transforms (reference
    ``mmseg/datasets/dataset_wrappers.py:12``)."""

    def __init__(self, dataset, pipeline, skip_type_keys=None, **kwargs):
        from lednet_tpu.datasets.basesegdataset import Compose
        from lednet_tpu.registry import DATASETS as _D
        self.dataset = _D.build(dict(dataset)) if isinstance(dataset, dict) \
            else dataset
        self.pipeline = Compose(pipeline)

    @property
    def metainfo(self):
        return self.dataset.metainfo

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        results = self.dataset.get_data_info(idx)
        results['dataset'] = self.dataset
        out = self.pipeline(results)
        out.pop('dataset', None)
        return out


@DATASETS.register_module()
class PascalContextDataset59(BaseSegDataset):
    """59-class PascalContext (reference ``pascal_context.py:64``):
    ``reduce_zero_label`` fixed True (class 0 = background dropped)."""
    METAINFO = dict(classes=_mi.PASCAL_CONTEXT_59_CLASSES,
                    palette=_mi.PASCAL_CONTEXT_59_PALETTE)

    def __init__(self, ann_file='', img_suffix='.jpg', seg_map_suffix='.png',
                 reduce_zero_label=True, **kwargs):
        super().__init__(img_suffix=img_suffix, seg_map_suffix=seg_map_suffix,
                         ann_file=ann_file,
                         reduce_zero_label=reduce_zero_label, **kwargs)


@DATASETS.register_module()
class MapillaryDataset_v2(BaseSegDataset):
    """Mapillary Vistas v2.0, 124 classes (reference ``mapillary.py:69``)."""
    METAINFO = dict(classes=_mi.MAPILLARY_V2_CLASSES,
                    palette=_mi.MAPILLARY_V2_PALETTE)

    def __init__(self, img_suffix='.jpg', seg_map_suffix='.png', **kwargs):
        super().__init__(img_suffix=img_suffix, seg_map_suffix=seg_map_suffix,
                         **kwargs)


@DATASETS.register_module()
class HSIDrive20Dataset(BaseSegDataset):
    """HSI-Drive v2.0 hyperspectral driving dataset (reference
    ``hsi_drive.py:14``): 25-band .npy images, 11 classes."""
    METAINFO = dict(
        classes=('unlabelled', 'road', 'road marks', 'vegetation',
                 'painted metal', 'sky', 'concrete', 'pedestrian', 'water',
                 'unpainted metal', 'glass'),
        palette=[[0, 0, 0], [77, 77, 77], [255, 255, 255], [0, 255, 0],
                 [255, 0, 0], [0, 0, 255], [102, 51, 0], [255, 255, 0],
                 [0, 207, 250], [255, 166, 0], [0, 204, 204]])

    def __init__(self, img_suffix='.npy', seg_map_suffix='.png', **kwargs):
        super().__init__(img_suffix=img_suffix, seg_map_suffix=seg_map_suffix,
                         **kwargs)


@DATASETS.register_module()
class DecathlonDataset(BaseSegDataset):
    """Medical Segmentation Decathlon (reference ``decathlon.py:13``):
    file list + labels come from the task's ``dataset.json``; its extra
    fields (modality, tensorImageSize, ...) merge into metainfo."""

    def load_data_list(self):
        import copy
        import json
        import os.path as osp
        # ann_file is data_root-relative like every other dataset
        # (basesegdataset.py load_data_list resolves via _join)
        with open(self._join(self.ann_file)) as f:
            annotations = json.load(f)
        if not isinstance(annotations, dict):
            raise TypeError('dataset.json must hold a dict, got '
                            f'{type(annotations)}')
        raw = annotations['test' if self.test_mode else 'training']
        data_list = []
        for info in raw:
            if isinstance(info, dict):
                data = dict(
                    img_path=osp.join(self.data_root, info['image'][2:]),
                    seg_map_path=osp.join(self.data_root, info['label'][2:]))
            else:
                data = dict(img_path=osp.join(self.data_root, info)[2:])
            data['label_map'] = None
            data['reduce_zero_label'] = self.reduce_zero_label
            data['seg_fields'] = []
            data_list.append(data)
        annotations.pop('training')
        annotations.pop('test')
        metainfo = copy.deepcopy(annotations)
        metainfo['classes'] = [*metainfo['labels'].values()]
        for k, v in metainfo.items():
            self._metainfo.setdefault(k, v)
        return data_list


@DATASETS.register_module()
class DSDLSegDataset(BaseSegDataset):
    """DSDL-described dataset (reference ``dsdl.py:15``) — gated on the
    optional ``dsdl`` package, exactly as the reference gates it."""

    def __init__(self, *args, **kwargs):
        try:
            import dsdl  # noqa: F401
        except ImportError:
            raise RuntimeError(
                'Package dsdl is not installed. Please run "pip install '
                'dsdl".')
        raise NotImplementedError(
            'dsdl is not available in this environment; install it and file '
            'an issue if you need the DSDL loader wired up.')
