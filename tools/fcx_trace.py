#!/usr/bin/env python
"""Trace the fused-subgraph engines to explain the end-to-end loss.

Isolated probes (tools/c3k2_probe.py) measure the XLA fused forms of
stage1_block / fpn_c3k2_2 / head_p2 FASTER than both the Pallas kernels
and the standard per-conv path — yet the full-pipeline A/B
(tools/fc_probe.py, artifacts/fc_probe.json) has every fused engine
LOSING to the plain merged engine by 0.15-0.3 ms. This captures 50-iter
profiler traces of bf16_s2dm vs bf16_s2dm_fcx (the tightest-IQR pair)
and emits per-group layer tables so the regression is attributable:
either the fused regions themselves are slower in-graph (layout pressure
from dot_general vs conv), or their neighbours pay new transition costs.

Usage: python tools/fcx_trace.py [--engines bf16_s2dm bf16_s2dm_fcx ...]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--engines", nargs="+",
                    default=["bf16_s2dm", "bf16_s2dm_fcx"])
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    from bench import build_int8_fused, load_source_variables, make_loop
    from tools.layer_table import (
        find_xplane,
        parse_device_ops,
        rollup_by_group,
        build_table,
    )
    from unina_yolo_dla_tpu.models import ModelConfig
    from unina_yolo_dla_tpu.models.detector import UninaYoloDla
    from unina_yolo_dla_tpu.ops.preprocess import space_to_depth_np
    from unina_yolo_dla_tpu.quant.deploy import (
        fold_batchnorm,
        fold_downsample_space_to_depth,
        fold_stem_space_to_depth,
        merge_stem_columns,
    )
    from unina_yolo_dla_tpu.runtime.pipeline import build_serving_fn
    from unina_yolo_dla_tpu.utils.profiling import trace

    cfg = ModelConfig(num_classes=4, base_channels=32, input_size=640)
    variables, src = load_source_variables(cfg)
    print(f"weights: {src}", flush=True)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 256, (640, 640, 3), dtype=np.uint8))

    bf16_vars = fold_batchnorm(
        {k: variables[k] for k in ("params", "batch_stats")})
    s2dh_cfg = dataclasses.replace(cfg, deploy=True, stem_s2d=True,
                                   s2d_host=True, stage1_s2d=True)
    s2dm_cfg = dataclasses.replace(s2dh_cfg, s2d_merged=True)
    s2dm_bf16_vars = merge_stem_columns(fold_downsample_space_to_depth(
        fold_stem_space_to_depth(bf16_vars)))
    fs = space_to_depth_np(np.asarray(frame))
    frame_m = jnp.asarray(fs.reshape(fs.shape[0], fs.shape[1] // 2, 24))

    cfgs = {
        "bf16_s2dm": s2dm_cfg,
        "bf16_s2dm_fc": dataclasses.replace(s2dm_cfg, fused_c3k2=True,
                                            fused_head=True),
        "bf16_s2dm_fcx": dataclasses.replace(
            s2dm_cfg, fused_c3k2=True, fused_head=True, fused_impl="xla"),
        # selective sets (cfg.fused_only): fuse only where the full-fcx
        # trace showed the fused region winning
        "bf16_s2dm_fs1": dataclasses.replace(
            s2dm_cfg, fused_c3k2=True, fused_impl="xla",
            fused_only=("stage1_block",)),
        "bf16_s2dm_fs3": dataclasses.replace(
            s2dm_cfg, fused_c3k2=True, fused_impl="xla",
            fused_only=("stage1_block", "fpn_c3k2_2", "pan_c3k2_1")),
    }
    int8_needed = [e for e in args.engines if e.startswith("int8")]
    if int8_needed:
        int8_model, int8_vars = build_int8_fused(cfg, variables, frame)
        s2dm_int8_cfg = dataclasses.replace(
            int8_model.config, stem_s2d=True, s2d_host=True,
            stage1_s2d=True, s2d_merged=True)
        s2dm_int8_vars = merge_stem_columns(fold_downsample_space_to_depth(
            fold_stem_space_to_depth(int8_vars)))
        cfgs.update({
            "int8_s2dm": s2dm_int8_cfg,
            "int8_s2dm_fc": dataclasses.replace(
                s2dm_int8_cfg, fused_c3k2=True, fused_head=True),
            "int8_s2dm_fcx": dataclasses.replace(
                s2dm_int8_cfg, fused_c3k2=True, fused_head=True,
                fused_impl="xla"),
            "int8_s2dm_fs1": dataclasses.replace(
                s2dm_int8_cfg, fused_c3k2=True, fused_impl="xla",
                fused_only=("stage1_block",)),
            "int8_s2dm_fs2": dataclasses.replace(
                s2dm_int8_cfg, fused_c3k2=True, fused_impl="xla",
                fused_only=("stage1_block", "fpn_c3k2_2")),
        })

    results = {}
    for name in args.engines:
        ecfg = cfgs[name]
        v = s2dm_int8_vars if name.startswith("int8") else s2dm_bf16_vars
        serve = build_serving_fn(UninaYoloDla(ecfg), ecfg)
        loop = make_loop(serve, args.iters)
        float(loop(v, frame_m))  # warm
        tdir = f"runs/fcx_trace_{name}"
        with trace(tdir):
            float(loop(v, frame_m))
        xp = find_xplane(tdir)
        ops = parse_device_ops(xp)
        ops = [o for o in ops
               if o["category"] not in ("while", "conditional", "call")
               and o["op"].split(".")[0] not in ("while", "conditional")]
        total = sum(o["total_ms"] for o in ops)
        rows, _ = build_table(ops, 14, args.iters)
        groups = rollup_by_group(ops)
        results[name] = {
            "device_ms_per_frame": round(total / args.iters, 4),
            "top_ops": rows, "groups": groups,
        }
        print(f"\n=== {name}: {total / args.iters:.4f} ms/frame on-chip ===",
              flush=True)
        for g in groups[:14]:
            print(f"  {g['group']:<42.42} {g['pct_device_time']:>5.1f}%  "
                  f"GB/s={g['gbytes_per_s']}")

    out = Path("artifacts/fcx_trace.json")
    if out.exists():  # merge: keep engines traced in earlier sessions
        prev = json.loads(out.read_text())
        prev.update(results)
        results = prev
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("\nwritten: artifacts/fcx_trace.json")


if __name__ == "__main__":
    main()
