#!/usr/bin/env python
"""Camera-path geometry A/B: on-chip STRETCH resize vs on-chip LETTERBOX.

The reference's fused camera kernel stretches the frame square
(``cuda_preprocess.cu:144-204``), but the model is TRAINED on letterboxed
geometry (Ultralytics LetterBox; data/dataset.py:55-75) — a squashed
aspect at serve time is a silent train/serve skew. This tool measures the
skew on a camera-aspect val set and decides which geometry the camera
artifact should bake (VERDICT r2 next #7).

Both pipelines are the REAL exported camera programs
(runtime/pipeline.build_camera_serving_fn, box_space='camera' so
detections come back in camera pixels); GT is read in camera pixels from
the YOLO label txts. Make the data with the rectangular generator, e.g.:

  python -m unina_yolo_dla_tpu.data.synthetic --output runs/cam_data \
      --num-train 0 --num-val 100 --image-size 540 --image-width 960 --hard

Usage:
  python tools/camera_ab.py --data runs/cam_data/fsd_synth.yaml \
      --weights runs/xhard_run/qat/best.msgpack [--engine int8] \
      [--json out.json]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os  # noqa: E402

import jax  # noqa: E402

if os.environ.get("UNINA_FORCE_CPU"):  # sitecustomize pins axon otherwise
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from unina_yolo_dla_tpu.data.dataset import load_dataset_yaml  # noqa: E402
from unina_yolo_dla_tpu.metrics.map import compute_map  # noqa: E402
from unina_yolo_dla_tpu.metrics.small_object import SmallObjectMetric  # noqa: E402
from unina_yolo_dla_tpu.models.config import ModelConfig  # noqa: E402
from unina_yolo_dla_tpu.models.detector import UninaYoloDla  # noqa: E402
from unina_yolo_dla_tpu.quant.deploy import (  # noqa: E402
    fold_batchnorm,
    quantize_weights_int8,
)
from unina_yolo_dla_tpu.quant.fake_quant import (  # noqa: E402
    PERF_EXCLUDE,
    QuantSpec,
)
from unina_yolo_dla_tpu.runtime.pipeline import build_camera_serving_fn  # noqa: E402
from unina_yolo_dla_tpu.utils.checkpoint import load_msgpack_raw  # noqa: E402

COLS = ("map50", "map50_95", "small_object_precision",
        "small_object_recall", "small_object_f1")


def load_val_images(yaml_path: str):
    """Yields (rgb uint8 (H,W,3), gt (M,5) [cls,x1,y1,x2,y2] camera px)."""
    import cv2

    spec = load_dataset_yaml(yaml_path)
    img_dir = Path(spec["val"])
    lbl_dir = Path(str(img_dir).replace("images", "labels"))
    for img_path in sorted(img_dir.iterdir()):
        if img_path.suffix.lower() not in (".jpg", ".jpeg", ".png"):
            continue
        bgr = cv2.imread(str(img_path))
        if bgr is None:
            continue
        rgb = np.ascontiguousarray(bgr[..., ::-1])
        h, w = rgb.shape[:2]
        gt = []
        lbl = lbl_dir / (img_path.stem + ".txt")
        if lbl.exists():
            for line in lbl.read_text().splitlines():
                c, cx, cy, bw, bh = (float(v) for v in line.split())
                gt.append([c, (cx - bw / 2) * w, (cy - bh / 2) * h,
                           (cx + bw / 2) * w, (cy + bh / 2) * h])
        yield rgb, np.asarray(gt, np.float32).reshape(-1, 5)


def evaluate_mode(model, variables, images, cam_h, cam_w, letterbox,
                  conf, iou, num_classes) -> dict:
    serve = jax.jit(build_camera_serving_fn(
        model, model.config, cam_h, cam_w, camera_format="rgb",
        conf_threshold=conf, iou_threshold=iou, max_detections=300,
        letterbox=letterbox, box_space="camera"))
    v = {k: variables[k] for k in ("params", "batch_stats", "quant")
         if k in variables}
    preds, gts = [], []
    small = SmallObjectMetric(size_threshold=15, image_size=cam_h)
    for rgb, gt in images:
        dets = jax.device_get(serve(v, jnp.asarray(rgb)))
        keep = np.asarray(dets.valid)
        pred = np.concatenate([
            np.asarray(dets.boxes)[keep],
            np.asarray(dets.scores)[keep, None],
            np.asarray(dets.classes)[keep, None].astype(np.float32),
        ], 1) if keep.any() else np.zeros((0, 6), np.float32)
        preds.append(pred)
        gts.append(gt)
        # small metric consumes normalised cxcywh; normalise each axis by
        # its own extent (sizes keyed to image_size=cam_h — cones are
        # height-dominant, and both modes get identical treatment)
        def norm_p(p):
            if not len(p):
                return np.zeros((0, 6), np.float32)
            cx = (p[:, 0] + p[:, 2]) / 2 / cam_w
            cy = (p[:, 1] + p[:, 3]) / 2 / cam_h
            w = (p[:, 2] - p[:, 0]) / cam_w
            h = (p[:, 3] - p[:, 1]) / cam_h
            return np.stack([cx, cy, w, h, p[:, 4], p[:, 5]], 1)

        def norm_g(g):
            if not len(g):
                return np.zeros((0, 5), np.float32)
            cx = (g[:, 1] + g[:, 3]) / 2 / cam_w
            cy = (g[:, 2] + g[:, 4]) / 2 / cam_h
            w = (g[:, 3] - g[:, 1]) / cam_w
            h = (g[:, 4] - g[:, 2]) / cam_h
            return np.stack([g[:, 0], cx, cy, w, h], 1)

        small.update([norm_p(pred)], [norm_g(gt)])
    out = compute_map(preds, gts, num_classes)
    out.update(small.compute())
    return {k: float(out.get(k, float("nan"))) for k in COLS}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, help="camera-aspect val yaml")
    p.add_argument("--weights", required=True)
    p.add_argument("--engine", choices=("fp32", "int8"), default="fp32")
    p.add_argument("--base-channels", type=int, default=32)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--json", default=None)
    args = p.parse_args()

    spec = load_dataset_yaml(args.data)
    cfg = ModelConfig(num_classes=spec["nc"],
                      base_channels=args.base_channels,
                      input_size=args.imgsz)
    variables = load_msgpack_raw(args.weights)
    if args.engine == "int8":
        folded = fold_batchnorm(variables)
        qspec = QuantSpec(mode="int8_fused", exclude=PERF_EXCLUDE)
        variables = quantize_weights_int8(folded, qspec)
        model = UninaYoloDla(dataclasses.replace(cfg, deploy=True,
                                                 quant=qspec))
    else:
        model = UninaYoloDla(cfg)

    first = next(load_val_images(args.data))
    cam_h, cam_w = first[0].shape[:2]
    print(f"camera geometry: {cam_h}x{cam_w}, engine={args.engine}")

    results = {}
    for mode, lb in (("stretch", False), ("letterbox", True)):
        imgs = load_val_images(args.data)
        results[mode] = evaluate_mode(model, variables, imgs, cam_h, cam_w,
                                      lb, args.conf, args.iou, spec["nc"])
        print(f"{mode:10s} " + " ".join(
            f"{k}={results[mode][k]:.4f}" for k in COLS), flush=True)

    d = {k: round((results["letterbox"][k] - results["stretch"][k]) * 100, 2)
         for k in COLS}
    results["letterbox_minus_stretch_pts"] = d
    winner = ("letterbox" if results["letterbox"]["map50_95"]
              >= results["stretch"]["map50_95"] else "stretch")
    results["winner"] = winner
    print(f"letterbox - stretch: " + " ".join(
        f"{k}={v:+.2f}pts" for k, v in d.items()))
    print(f"winner: {winner}")

    if args.json:
        Path(args.json).write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
