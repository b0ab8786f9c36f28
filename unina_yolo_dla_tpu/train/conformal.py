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

import jax
import numpy as np

from ..ops.decode import decode_outputs
from ..ops.preprocess import ensure_normalized
from ..ops.nms import nms


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
    import jax.numpy as jnp

    cfg = model.config

    def fwd(v, images):
        return model.apply(v, ensure_normalized(images), train=False)

    fwd = jax.jit(fwd)
    v = {k: variables[k] for k in ("params", "batch_stats", "quant")
         if k in variables}

    scores: list[float] = []
    n_images = 0
    for batch in batches:
        outputs = fwd(v, jnp.asarray(batch["images"]))
        B = batch["images"].shape[0]
        # epoch-mode batches pad the tail with empty slots; counting them
        # as calibration images overstated num_images (208 vs the real
        # 200 on the r2 hard run — advisor finding)
        sample_valid = batch.get("sample_valid", np.ones(B, bool))
        n_images += int(np.sum(sample_valid))
        for b in range(B):
            if not sample_valid[b]:
                continue
            per_img = [(c[b:b + 1], r[b:b + 1]) for c, r in outputs]
            dets = decode_outputs(per_img, cfg.strides,
                                  conf_threshold=conf_threshold,
                                  q_factor=0.0,
                                  max_detections=max_detections)
            dets = nms(dets)
            valid = np.asarray(dets.valid)
            pb = np.asarray(dets.boxes)[valid]
            pc = np.asarray(dets.classes)[valid]
            m = np.asarray(batch["mask"][b])
            gb = np.asarray(batch["boxes"][b])[m]
            gc = np.asarray(batch["labels"][b])[m]
            scores.extend(match_nonconformity_scores(
                pb, pc, gb, gc, iou_match))

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
