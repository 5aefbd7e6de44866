"""Official Cityscapes scoring semantics vs hand-computed values.

The distinguishing case (reference ``citys_metric.py`` shells out to
cityscapesscripts for exactly this): predictions over IGNORED ground-truth
labels (e.g. 'parking', ignoreInEval) must NOT count as false positives.
A generic trainId-space IoU charges them; the official math does not.
"""
import numpy as np
import pytest

from lednet_tpu.evaluation import cityscapes_eval as cse
from lednet_tpu.evaluation.more_metrics import CityscapesMetric


def _fixture_label_ids():
    """10x10 labelId pred/gt pair with hand-computable scores."""
    gt = np.zeros((10, 10), np.uint8)
    pred = np.zeros((10, 10), np.uint8)
    gt[0:5] = 7        # road (50 px)
    gt[5:7] = 9        # parking — ignoreInEval (20 px)
    gt[7:10] = 26      # car (30 px)
    pred[0:4] = 7      # 40 px road correct
    pred[4] = 11       # 10 px building over road GT
    pred[5:7] = 26     # 20 px car over IGNORED parking GT -> free
    pred[7:9] = 26     # 20 px car correct
    pred[9, :5] = 26   # 5 px car correct
    pred[9, 5:] = 7    # 5 px road over car GT
    return pred, gt


# hand-computed officials:
#   road: tp=40 fn=10 fp=5 (car->road)            -> 40/55
#   building: tp=0 fn=0 fp=10 (road->building)    -> 0
#   car: tp=25 fn=5 fp=0 (parking row is ignored) -> 25/30
ROAD_IOU, BUILDING_IOU, CAR_IOU = 40 / 55, 0.0, 25 / 30
AVG_CLASSES = (ROAD_IOU + BUILDING_IOU + CAR_IOU) / 3


def test_class_iou_hand_computed():
    pred, gt = _fixture_label_ids()
    scores = cse.class_iou(cse.confusion(pred, gt))
    assert scores['road'] == pytest.approx(ROAD_IOU)
    assert scores['building'] == pytest.approx(BUILDING_IOU)
    assert scores['car'] == pytest.approx(CAR_IOU)
    assert np.isnan(scores['sky'])
    # the official-vs-generic distinction: with parking charged as fp,
    # car IoU would be 25/50 — assert we do NOT produce that
    assert scores['car'] != pytest.approx(25 / 50)


def test_category_iou_hand_computed():
    pred, gt = _fixture_label_ids()
    scores = cse.category_iou(cse.confusion(pred, gt))
    assert scores['flat'] == pytest.approx(40 / 55)
    assert scores['construction'] == pytest.approx(0.0)
    assert scores['vehicle'] == pytest.approx(25 / 30)
    assert np.isnan(scores['sky'])


def test_evaluate_img_lists_from_pngs(tmp_path):
    import cv2
    pred, gt = _fixture_label_ids()
    pp, gp = str(tmp_path / 'pred.png'), str(tmp_path / 'gt.png')
    cv2.imwrite(pp, pred)
    cv2.imwrite(gp, gt)
    res = cse.evaluate_img_lists([pp], [gp])
    assert res['averageScoreClasses'] == pytest.approx(AVG_CLASSES)
    assert res['classScores']['car'] == pytest.approx(CAR_IOU)
    assert np.isnan(res['averageScoreInstClasses'])


def test_instance_weighted_iou(tmp_path):
    """iIoU: two car instances (sizes 20 and 10; weights avg/size = 0.75 and
    1.5) -> iTP = .75*20 + 1.5*5 = 22.5, iFN = 1.5*5 = 7.5, fp=0 -> 0.75."""
    import cv2
    pred, gt = _fixture_label_ids()
    inst = gt.astype(np.int32) * 1000
    inst[7:9] = 26000    # instance A: 20 px, fully predicted car
    inst[9] = 26001      # instance B: 10 px, 5 predicted car
    pp, gp, ip = (str(tmp_path / n) for n in ('p.png', 'g.png', 'i.png'))
    cv2.imwrite(pp, pred)
    cv2.imwrite(gp, gt)
    cv2.imwrite(ip, inst.astype(np.uint16))
    res = cse.evaluate_img_lists([pp], [gp], inst_list=[ip])
    assert res['instClassScores']['car'] == pytest.approx(22.5 / 30)
    assert res['averageScoreInstCategories'] == pytest.approx(22.5 / 30)


def test_cityscapes_metric_end_to_end(tmp_path):
    """CityscapesMetric in trainId space: writes labelId submission PNGs and
    returns the official scores next to the trainId-space table."""
    # trainId-space mirror of the fixture (parking has no trainId -> 255)
    gt = np.full((10, 10), 255, np.uint8)
    gt[0:5] = 0      # road
    gt[7:10] = 13    # car
    pred = np.zeros((10, 10), np.uint8)
    pred[4] = 2      # building
    pred[5:7] = 13
    pred[7:9] = 13
    pred[9, :5] = 13
    pred[9, 5:] = 0
    m = CityscapesMetric(output_dir=str(tmp_path / 'subs'))
    m.process(pred[None], gt[None], num_classes=19)
    res = m.compute_metrics()
    assert res['averageScoreClasses'] == pytest.approx(
        round(100 * AVG_CLASSES, 2))
    # submission file written in labelId space
    import cv2
    sub = cv2.imread(str(tmp_path / 'subs' / 'pred_000000.png'),
                     cv2.IMREAD_UNCHANGED)
    assert set(np.unique(sub)) <= {7, 11, 26}
