"""Conformal-prediction calibration for box dilation.

Parity with ``/root/reference/unina_yolo_dla/train.py:299-520``:

- run the detector over the validation set at a very low confidence
  threshold (0.001) so recall is near-exhaustive.
- greedily match predictions to GT boxes of the same class at IoU >= 0.5
  in confidence order.
- nonconformity score per matched pair = 1 - IoU.
- q_hat = the (1 - alpha) empirical quantile of the scores (alpha = 0.10
  -> 90% coverage), with the finite-sample conformal correction
  ceil((n+1)(1-alpha))/n.
- hard error when zero matches (train.py:492-496 parity) — silence there
  would mean shipping an uncalibrated safety margin.
- artifact: ``cp_calibration.json`` with q_hat + score distribution stats;
  the runtime dilates each box side by q_hat * width/height
  (ops/decode.py q_factor, postprocess.hpp:77-85).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Iterable

import numpy as np


def match_nonconformity_scores(
    pred_boxes: np.ndarray,   # (N, 4) xyxy, conf-sorted desc
    pred_cls: np.ndarray,
    gt_boxes: np.ndarray,     # (M, 4) xyxy
    gt_cls: np.ndarray,
    iou_threshold: float = 0.5,
) -> list[float]:
    scores: list[float] = []
    taken = np.zeros(len(gt_boxes), bool)
    for i in range(len(pred_boxes)):
        same = (gt_cls == pred_cls[i]) & ~taken
        if not same.any():
            continue
        g = gt_boxes
        b = pred_boxes[i]
        lt = np.maximum(b[:2], g[:, :2])
        rb = np.minimum(b[2:], g[:, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        area_b = max((b[2] - b[0]) * (b[3] - b[1]), 0.0)
        area_g = np.prod(np.clip(g[:, 2:] - g[:, :2], 0, None), 1)
        iou = inter / np.maximum(area_b + area_g - inter, 1e-9)
        iou = np.where(same, iou, 0.0)
        j = int(np.argmax(iou))
        if iou[j] >= iou_threshold:
            scores.append(float(1.0 - iou[j]))
            taken[j] = True
    return scores


def calibrate_conformal_prediction(
    model,
    variables,
    batches: Iterable[dict[str, np.ndarray]],
    alpha: float = 0.10,
    conf_threshold: float = 0.001,
    iou_match: float = 0.5,
    max_detections: int = 300,
    output_path: str | Path | None = None,
) -> dict:
    """Returns the cp_calibration payload; optionally writes the JSON.

    ``batches``: eval batches (images/boxes/labels/mask as in training).
    Decode runs WITHOUT dilation (q=0) — we are calibrating q.
    """
    # one vmapped, jitted, compile-cached forward+decode+NMS graph over
    # the whole batch (evaluate.predict_batches) — the previous per-image
    # eager decode/NMS paid one host->device dispatch PER OP through the
    # relay, turning a 2-minute calibration into a 10-minute one. Decode
    # runs with q=0 (we are calibrating q); tail-padding slots are
    # excluded (sample_valid), fixing the 208-vs-200 num_images advisor
    # finding.
    from ..evaluate import predict_batches

    scores: list[float] = []
    n_images = 0
    for pred, gt, _idx in predict_batches(
            model, variables, batches, conf_threshold=conf_threshold,
            iou_threshold=0.45, q_factor=0.0,
            max_detections=max_detections):
        n_images += 1
        # predict_batches yields conf-sorted (top-k) rows
        scores.extend(match_nonconformity_scores(
            pred[:, :4], pred[:, 5], gt[:, 1:5], gt[:, 0], iou_match))

    if not scores:
        raise RuntimeError(
            "conformal calibration found zero matched predictions — "
            "model/validation-set mismatch (parity: train.py:492-496)")

    arr = np.asarray(scores)
    n = len(arr)
    # finite-sample conformal quantile: ceil((n+1)(1-alpha))/n
    level = min(np.ceil((n + 1) * (1 - alpha)) / n, 1.0)
    q_hat = float(np.quantile(arr, level, method="higher"))
    payload = {
        "q_hat": q_hat,
        "alpha": alpha,
        "coverage_target": 1 - alpha,
        "num_scores": n,
        "num_images": n_images,
        "score_mean": float(arr.mean()),
        "score_std": float(arr.std()),
        "score_p50": float(np.percentile(arr, 50)),
        "score_p90": float(np.percentile(arr, 90)),
        "conf_threshold": conf_threshold,
        "iou_match": iou_match,
    }
    if output_path is not None:
        Path(output_path).write_text(json.dumps(payload, indent=2))
    return payload


def load_cp_q(path: str | Path, default: float = 0.1) -> float:
    """Read q_hat from a cp_calibration.json (serving-side)."""
    p = Path(path)
    if not p.exists():
        return default
    return float(json.loads(p.read_text()).get("q_hat", default))
