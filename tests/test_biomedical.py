"""Biomedical 3D transform tests (pure numpy path)."""
import numpy as np
import pytest

from lednet_tpu.registry import TRANSFORMS
import lednet_tpu.datasets  # noqa: F401


def _vol(rng):
    return dict(img=rng.standard_normal((2, 16, 24, 24)).astype(np.float32),
                gt_seg_map=rng.integers(0, 3, (16, 24, 24)).astype(np.int32),
                seg_fields=['gt_seg_map'])


def test_biomedical_chain(rng):
    np.random.seed(0)
    results = _vol(rng)
    for cfg in [
        dict(type='BioMedical3DRandomCrop', crop_shape=(8, 16, 16)),
        dict(type='BioMedical3DRandomFlip', prob=1.0),
        dict(type='BioMedicalGaussianNoise', prob=1.0),
        dict(type='BioMedicalGaussianBlur', prob=1.0),
        dict(type='BioMedicalRandomGamma', prob=1.0),
        dict(type='BioMedical3DPad', pad_shape=(16, 16, 16)),
    ]:
        results = TRANSFORMS.build(cfg)(results)
    assert results['img'].shape == (2, 16, 16, 16)
    assert results['gt_seg_map'].shape == (16, 16, 16)
    assert np.isfinite(results['img']).all()


def test_nifti_loader_gated():
    loader = TRANSFORMS.build(dict(type='LoadBiomedicalImageFromFile'))
    with pytest.raises(NotImplementedError):
        loader(dict(img_path='x.nii.gz'))
