"""Native COCO evaluator vs hand-computed expectations
(protocol of reference src/dagr/utils/coco_eval.py)."""
import numpy as np

from dagr_tpu.eval.buffers import DetectionBuffer, DictBuffer, targets_to_list
from dagr_tpu.eval.coco import coco_map, evaluate_detection, match_times


def img(boxes, labels, scores=None):
    d = {
        "boxes": np.asarray(boxes, np.float64).reshape(-1, 4),
        "labels": np.asarray(labels, np.int64),
    }
    if scores is not None:
        d["scores"] = np.asarray(scores, np.float64)
    return d


def test_perfect_detections():
    gt = [img([[10, 10, 50, 60]], [0]), img([[5, 5, 40, 40]], [1])]
    dt = [img([[10, 10, 50, 60]], [0], [0.9]),
          img([[5, 5, 40, 40]], [1], [0.8])]
    out = evaluate_detection(gt, dt, classes=("a", "b"))
    assert out["AP"] == 1.0
    assert out["AP_50"] == 1.0
    assert out["AP_75"] == 1.0


def test_iou_threshold_cutoff():
    # one gt 40x50; detection shifted so IoU = 0.6 exactly:
    # boxes [0,0,40,50] and [0,10,40,60]: inter 40*40=1600, union 2*2000-1600
    # = 2400 -> IoU = 0.666 -> matches at thresholds .5,.55,.6,.65 = 4/10
    gt = [img([[0, 0, 40, 50]], [0])]
    dt = [img([[0, 10, 40, 60]], [0], [0.9])]
    out = evaluate_detection(gt, dt, classes=("a",))
    np.testing.assert_allclose(out["AP"], 0.4, atol=1e-6)
    assert out["AP_50"] == 1.0
    assert out["AP_75"] == 0.0


def test_false_positive_ordering():
    # high-score FP before TP: precision at recall 1 is 1/2
    gt = [img([[0, 0, 40, 50]], [0])]
    dt = [img([[0, 0, 40, 50], [100, 100, 140, 150]], [0, 0], [0.5, 0.9])]
    out = evaluate_detection(gt, dt, classes=("a",))
    np.testing.assert_allclose(out["AP_50"], 0.5, atol=1e-6)


def test_area_ranges():
    # small gt (20x20=400 < 32^2) counts in small + all, not medium/large
    gt = [img([[0, 0, 20, 20]], [0])]
    dt = [img([[0, 0, 20, 20]], [0], [0.9])]
    out = evaluate_detection(gt, dt, classes=("a",))
    assert out["AP"] == 1.0
    assert out["AP_S"] == 1.0
    assert out["AP_M"] == 0.0  # no medium gt anywhere -> -1 -> reported 0
    assert out["AP_L"] == 0.0


def test_missed_gt_halves_recall():
    gt = [img([[0, 0, 40, 50], [100, 0, 140, 50]], [0, 0])]
    dt = [img([[0, 0, 40, 50]], [0], [0.9])]
    out = evaluate_detection(gt, dt, classes=("a",))
    # recall caps at 0.5: 51 of 101 recall points get precision 1
    np.testing.assert_allclose(out["AP_50"], 51 / 101, atol=1e-6)


def test_match_times_window():
    gt_t = np.array([100, 100, 200])
    dt_t = np.array([40, 95, 160, 260])
    gw, dw = match_times(np.array([100, 200]), gt_t, dt_t, time_tol=50)
    assert gw == [(0, 2), (2, 3)]
    # ts=100: dts within [50,150] -> idx 1 only; ts=200: [150,250] -> idx 2
    assert dw[0] == (1, 2)
    assert dw[1] == (2, 3)


def test_temporal_tolerance_end_to_end():
    # detection 40ms after the gt timestamp still matches (tol 50ms)
    gt = {"boxes": np.array([[0., 0., 40., 50.]]), "labels": np.array([0]),
          "t": np.array([100_000])}
    dt = {"boxes": np.array([[0., 0., 40., 50.]]), "labels": np.array([0]),
          "scores": np.array([0.9]), "t": np.array([140_000])}
    out = evaluate_detection([gt], [dt], classes=("a",))
    assert out["AP_50"] == 1.0
    # and 60ms after does not
    dt2 = dict(dt, t=np.array([160_000]))
    out2 = evaluate_detection([gt], [dt2], classes=("a",))
    assert out2["AP_50"] == 0.0


def test_detection_buffer_and_targets():
    targets = np.zeros((1, 5, 5), np.float32)
    targets[0, 0] = [0, 20, 25, 40, 50]   # class, cx, cy, w, h
    tl = targets_to_list(targets)
    np.testing.assert_allclose(tl[0]["boxes"], [[0, 0, 40, 50]])

    buf = DetectionBuffer(240, 304, ("a", "b"))
    buf.update([img([[0, 0, 40, 50]], [0], [0.9])], tl)
    m = buf.compute()
    assert m["mAP_50"] == 1.0
    assert len(buf.detections) == 0  # cleared


def test_dict_buffer_running_mean():
    b = DictBuffer()
    b.update({"x": 1.0})
    b.update({"x": 3.0})
    assert b.compute()["x"] == 2.0
