"""Offline evaluation: mAP50 / mAP50-95 + small-object P/R/F1.

Parity with ``/root/reference/unina_yolo_dla/eval.py``: the reference runs
Ultralytics ``model.val`` for mAP then re-matches predictions.json against
label txts for the small-object metric; here both come from one pass of
the jitted decode+NMS pipeline over the validation set.
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from .metrics.map import compute_map
from .metrics.small_object import SmallObjectMetric
from .models.config import ModelConfig
from .ops.decode import decode_outputs
from .ops.nms import nms
from .ops.preprocess import ensure_normalized


def predict_batches(
    model,
    variables,
    batches: Iterable[dict[str, np.ndarray]],
    conf_threshold: float = 0.25,
    iou_threshold: float = 0.45,
    q_factor: float = 0.0,
    max_detections: int = 300,
    mesh=None,
):
    """Yields (pred (N,6) [x1,y1,x2,y2,conf,cls] px, gt (M,5) [cls,xyxy] px)
    per image.

    Decode+NMS is ``vmap``-ed over the batch: one compiled graph whose size
    is independent of B (the reference validates rank-0 through one CUDA
    graph too, trainer.py:197-286). When ``mesh`` is given and B divides
    the mesh size, images are sharded over the ``data`` axis so per-epoch
    validation rides the same devices as training.
    """
    cfg: ModelConfig = model.config
    v = {k: variables[k] for k in ("params", "batch_stats", "quant")
         if k in variables}

    def fwd(vv, images):
        outputs = model.apply(vv, ensure_normalized(images), train=False)

        def single(outs):
            dets = decode_outputs(outs, cfg.strides, conf_threshold,
                                  q_factor, max_detections)
            return nms(dets, iou_threshold)

        return jax.vmap(single)(outputs)

    fwd = jax.jit(fwd)

    for batch in batches:
        images = jnp.asarray(batch["images"])
        B = batch["images"].shape[0]
        if mesh is not None and B % mesh.size == 0:
            from .parallel.mesh import batch_sharding  # local: optional dep

            images = jax.device_put(images, batch_sharding(mesh))
        batched_dets = jax.device_get(fwd(v, images))
        sample_valid = batch.get("sample_valid",
                                 np.ones(B, bool))
        for b in range(B):
            if not sample_valid[b]:
                continue
            dets = jax.tree.map(lambda x: x[b], batched_dets)
            valid = np.asarray(dets.valid)
            pred = np.concatenate([
                np.asarray(dets.boxes)[valid],
                np.asarray(dets.scores)[valid, None],
                np.asarray(dets.classes)[valid, None].astype(np.float32),
            ], axis=1) if valid.any() else np.zeros((0, 6), np.float32)
            m = np.asarray(batch["mask"][b])
            gt = np.concatenate([
                np.asarray(batch["labels"][b])[m, None].astype(np.float32),
                np.asarray(batch["boxes"][b])[m],
            ], axis=1) if m.any() else np.zeros((0, 5), np.float32)
            yield pred, gt


def evaluate_model(
    model,
    variables,
    batches_fn,
    conf_threshold: float = 0.25,
    iou_threshold: float = 0.45,
    small_size_threshold: int = 15,
    mesh=None,
) -> dict[str, float]:
    """Full evaluation dict: mAP + small-object metrics."""
    cfg: ModelConfig = model.config
    img_size = cfg.input_size
    preds, gts = [], []
    small = SmallObjectMetric(size_threshold=small_size_threshold,
                              image_size=img_size)
    for pred, gt in predict_batches(model, variables, batches_fn(),
                                    conf_threshold, iou_threshold,
                                    mesh=mesh):
        preds.append(pred)
        gts.append(gt)
        # SmallObjectMetric consumes normalised cxcywh
        if len(pred):
            p = pred.copy()
            cx = (p[:, 0] + p[:, 2]) / 2 / img_size
            cy = (p[:, 1] + p[:, 3]) / 2 / img_size
            w = (p[:, 2] - p[:, 0]) / img_size
            h = (p[:, 3] - p[:, 1]) / img_size
            p_n = np.stack([cx, cy, w, h, p[:, 4], p[:, 5]], 1)
        else:
            p_n = np.zeros((0, 6), np.float32)
        if len(gt):
            g = gt.copy()
            gx = (g[:, 1] + g[:, 3]) / 2 / img_size
            gy = (g[:, 2] + g[:, 4]) / 2 / img_size
            gw = (g[:, 3] - g[:, 1]) / img_size
            gh = (g[:, 4] - g[:, 2]) / img_size
            g_n = np.stack([g[:, 0], gx, gy, gw, gh], 1)
        else:
            g_n = np.zeros((0, 5), np.float32)
        small.update([p_n], [g_n])

    out = compute_map(preds, gts, cfg.num_classes)
    out.update(small.compute())
    return out


def main() -> None:
    import argparse

    from .data.dataset import YoloDataset, batch_iterator, load_dataset_yaml
    from .models.detector import init_model
    from .utils.checkpoint import load_msgpack

    p = argparse.ArgumentParser(description="Evaluate a checkpoint "
                                "(mAP50/50-95 + small-object P/R/F1)")
    p.add_argument("--weights", required=True)
    p.add_argument("--data", required=True, help="dataset YAML")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--base-channels", type=int, default=32)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.45)
    args = p.parse_args()

    spec = load_dataset_yaml(args.data)
    ds = YoloDataset(spec["val"], img_size=args.imgsz)
    cfg = ModelConfig(num_classes=spec["nc"],
                      base_channels=args.base_channels,
                      input_size=args.imgsz)
    model, template = init_model(jax.random.key(0), cfg)
    variables = load_msgpack(args.weights, template)

    def batches():
        return batch_iterator(ds, args.batch, np.random.default_rng(0),
                              shuffle=False, augment=False)

    results = evaluate_model(model, variables, batches,
                             conf_threshold=args.conf,
                             iou_threshold=args.iou)
    for k, v in results.items():
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
