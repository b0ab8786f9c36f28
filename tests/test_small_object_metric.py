"""SmallObjectMetric parity tests.

The first case reproduces the reference's hand-built smoke case
(data_loader.py:418-442) whose golden output — tp=0, fp=1, fn=1 — was
obtained by executing the reference module.
"""
import numpy as np

from unina_yolo_dla_tpu.metrics import SmallObjectMetric


def test_reference_smoke_case_golden():
    metric = SmallObjectMetric(size_threshold=15, iou_threshold=0.5,
                               image_size=640)
    gts = [np.array([
        [0, 0.5, 0.5, 0.01, 0.02],   # small (6.4 x 12.8 px)
        [1, 0.2, 0.3, 0.05, 0.08],   # not small (32 x 51 px)
    ])]
    preds = [np.array([
        [0.51, 0.51, 0.012, 0.022, 0.95, 0],  # too far off -> FP (and small)
    ])]
    metric.update(preds, gts)
    r = metric.compute()
    assert r["small_object_tp"] == 0
    assert r["small_object_fp"] == 1
    assert r["small_object_fn"] == 1
    assert r["small_object_precision"] == 0.0


def test_true_positive_match():
    metric = SmallObjectMetric()
    gts = [np.array([[2, 0.5, 0.5, 0.01, 0.02]])]
    preds = [np.array([[0.5, 0.5, 0.01, 0.02, 0.9, 2]])]  # exact match
    metric.update(preds, gts)
    r = metric.compute()
    assert r["small_object_tp"] == 1
    assert r["small_object_fp"] == 0
    assert r["small_object_fn"] == 0
    assert r["small_object_f1"] == 1.0


def test_class_mismatch_is_fp_and_fn():
    metric = SmallObjectMetric()
    gts = [np.array([[1, 0.5, 0.5, 0.01, 0.02]])]
    preds = [np.array([[0.5, 0.5, 0.01, 0.02, 0.9, 0]])]  # wrong class
    metric.update(preds, gts)
    r = metric.compute()
    assert r["small_object_tp"] == 0
    assert r["small_object_fp"] == 1
    assert r["small_object_fn"] == 1


def test_large_prediction_not_counted_as_fp():
    metric = SmallObjectMetric()
    gts = [np.array([[0, 0.5, 0.5, 0.01, 0.01]])]
    # Unmatched LARGE prediction: not an FP under the small-focused metric
    preds = [np.array([[0.2, 0.2, 0.2, 0.2, 0.9, 0]])]
    metric.update(preds, gts)
    r = metric.compute()
    assert r["small_object_fp"] == 0
    assert r["small_object_fn"] == 1


def test_no_small_gts_skips_image():
    metric = SmallObjectMetric()
    gts = [np.array([[0, 0.5, 0.5, 0.5, 0.5]])]  # large only
    preds = [np.array([[0.5, 0.5, 0.01, 0.01, 0.9, 0]])]  # small pred
    metric.update(preds, gts)
    r = metric.compute()
    # reference behaviour: image skipped entirely when no small GT present
    assert (r["small_object_tp"], r["small_object_fp"],
            r["small_object_fn"]) == (0, 0, 0)


def test_empty_predictions_all_fn():
    metric = SmallObjectMetric()
    gts = [np.array([[0, 0.5, 0.5, 0.01, 0.01], [1, 0.3, 0.3, 0.015, 0.015]])]
    preds = [np.zeros((0, 6))]
    metric.update(preds, gts)
    assert metric.compute()["small_object_fn"] == 2
