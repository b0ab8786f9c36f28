#!/usr/bin/env python
"""Engine quality comparison: FP32 / QAT-sim / int8-unfused / int8-fused.

The measurement VERDICT r1 asked for: report mAP50, mAP50-95 and the
small-object metrics for every deployable engine on a NON-saturated set
(pair with data.synthetic --hard), so the reference's "int8 within 1 pt
of FP32" acceptance bar (README.md:34) is tested where it can fail.

Usage:
  python tools/compare_engines.py --data hard/fsd_synth.yaml \
      --fp32 runs/fp32/best.msgpack --qat runs/qat/best.msgpack \
      [--base-channels 32] [--imgsz 640] [--json out.json]
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

import numpy as np  # noqa: E402

from unina_yolo_dla_tpu.data.dataset import (  # noqa: E402
    YoloDataset,
    batch_iterator,
    load_dataset_yaml,
)
from unina_yolo_dla_tpu.evaluate import evaluate_model  # noqa: E402
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
from unina_yolo_dla_tpu.utils.checkpoint import load_msgpack_raw  # noqa: E402

COLS = ("map50", "map50_95", "small_object_precision",
        "small_object_recall", "small_object_f1")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--fp32", required=True, help="phase-1 best.msgpack")
    p.add_argument("--fp32-ft", default=None,
                   help="phase-1.5 epoch-matched FP32 fine-tune "
                        "best.msgpack (train --fp32-ft-epochs). When "
                        "given, an fp32_ft row is evaluated and all "
                        "acceptance deltas (clean AND corruption) are "
                        "computed against it — VERDICT r4 #3: the QAT "
                        "phase's extra no-augment epochs alone add "
                        "~8 mAP50-95 pts, so deltas vs the phase-1 "
                        "best flatter quantisation")
    p.add_argument("--qat", required=True,
                   help="phase-2 best.msgpack (params + quant)")
    p.add_argument("--base-channels", type=int, default=32)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--max-boxes", type=int, default=60)
    p.add_argument("--json", default=None)
    p.add_argument("--corruptions", default=None,
                   help="robustness sweep: 'all' (every corruption at "
                        "severity 2) or 'name:sev,name:sev,...' "
                        "(data/corruptions.py). Evaluates fp32 and "
                        "int8_fused under each condition and reports the "
                        "int8-vs-fp32 delta there — the regime where "
                        "quantisation typically breaks first")
    args = p.parse_args()

    spec = load_dataset_yaml(args.data)
    val_ds = YoloDataset(spec["val"], img_size=args.imgsz,
                         max_boxes=args.max_boxes)
    cfg = ModelConfig(num_classes=spec["nc"],
                      base_channels=args.base_channels,
                      input_size=args.imgsz)

    def batches():
        return batch_iterator(val_ds, min(args.batch, len(val_ds)),
                              np.random.default_rng(0), shuffle=False,
                              augment=False)

    fp32_vars = load_msgpack_raw(args.fp32)
    qat_vars = load_msgpack_raw(args.qat)
    folded = fold_batchnorm(qat_vars)

    engines = {
        "fp32": (UninaYoloDla(cfg), fp32_vars),
        **({"fp32_ft": (UninaYoloDla(cfg), load_msgpack_raw(args.fp32_ft))}
           if args.fp32_ft else {}),
        "qat_sim": (UninaYoloDla(cfg.with_quant("quantize")), qat_vars),
        "int8_unfused": (
            UninaYoloDla(dataclasses.replace(
                cfg, deploy=True, quant=QuantSpec(mode="int8"))),
            quantize_weights_int8(folded, QuantSpec(mode="int8"))),
        "int8_fused": (
            UninaYoloDla(dataclasses.replace(
                cfg, deploy=True,
                quant=QuantSpec(mode="int8_fused", exclude=PERF_EXCLUDE))),
            quantize_weights_int8(
                folded, QuantSpec(mode="int8_fused",
                                  exclude=PERF_EXCLUDE))),
    }

    results = {}
    for name, (model, variables) in engines.items():
        m = evaluate_model(model, variables, batches,
                           conf_threshold=args.conf)
        results[name] = {k: float(m.get(k, float("nan"))) for k in COLS}
        print(f"{name:14s} " + " ".join(
            f"{k}={results[name][k]:.4f}" for k in COLS), flush=True)

    # acceptance baseline: the epoch-matched fine-tuned FP32 when given
    base_name = "fp32_ft" if args.fp32_ft else "fp32"
    base = results[base_name]["map50_95"]
    base_f1 = results[base_name]["small_object_f1"]
    results["acceptance_baseline"] = base_name
    for name in ("qat_sim", "int8_unfused", "int8_fused"):
        delta = (results[name]["map50_95"] - base) * 100
        results[name]["delta_map50_95_pts"] = round(delta, 2)
        results[name]["delta_small_f1_pts"] = round(
            (results[name]["small_object_f1"] - base_f1) * 100, 2)
        print(f"{name}: mAP50-95 delta vs {base_name} = {delta:+.2f} pts")

    if args.corruptions:
        from unina_yolo_dla_tpu.data.corruptions import (
            CORRUPTIONS,
            corrupt_batches,
        )

        if args.corruptions == "all":
            conditions = [(n, 2) for n in CORRUPTIONS]
        else:
            conditions = []
            for tok in args.corruptions.split(","):
                name, _, sev = tok.partition(":")
                conditions.append((name, int(sev or 2)))

        results["corruptions"] = {}
        for cname, sev in conditions:
            row = {}
            for ename in (base_name, "int8_fused"):
                model, variables = engines[ename]
                m = evaluate_model(
                    model, variables,
                    corrupt_batches(batches, cname, sev),
                    conf_threshold=args.conf)
                row[ename] = {k: float(m.get(k, float("nan")))
                              for k in COLS}
            row["delta_map50_95_pts"] = round(
                (row["int8_fused"]["map50_95"]
                 - row[base_name]["map50_95"]) * 100, 2)
            row["delta_small_f1_pts"] = round(
                (row["int8_fused"]["small_object_f1"]
                 - row[base_name]["small_object_f1"]) * 100, 2)
            results["corruptions"][f"{cname}:{sev}"] = row
            print(f"[{cname}:{sev}] {base_name} mAP50-95="
                  f"{row[base_name]['map50_95']:.4f} "
                  f"small_f1={row[base_name]['small_object_f1']:.4f} | "
                  f"int8 mAP50-95={row['int8_fused']['map50_95']:.4f} "
                  f"small_f1={row['int8_fused']['small_object_f1']:.4f} | "
                  f"int8-{base_name} = {row['delta_map50_95_pts']:+.2f} / "
                  f"{row['delta_small_f1_pts']:+.2f} pts", flush=True)

    if args.json:
        Path(args.json).write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
