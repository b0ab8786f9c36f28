#!/usr/bin/env python
"""Diagnose/measure the fully-fused (_fc) engines on the live TPU.

BENCH_r03 reported ``int8_s2dm_fc: null`` — the engine FAILED inside the
driver bench (bench.py prints a warning and continues). This probe
builds exactly the bench's fc engines from the committed checkpoint and
runs them stage by stage so the real error (compile? VMEM? runtime?)
surfaces with a traceback, then — if they run — times a short
interleaved A/B against the non-fc merged engine.

Usage: python tools/fc_probe.py [--rounds N]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--loops", type=int, nargs="+", default=[100, 300, 500])
    args = ap.parse_args()

    from bench import (
        build_int8_fused,
        fit_slope,
        load_source_variables,
        make_loop,
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

    cfg = ModelConfig(num_classes=4, base_channels=32, input_size=640)
    variables, src = load_source_variables(cfg)
    print(f"weights: {src}", flush=True)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 256, (640, 640, 3), dtype=np.uint8))

    bf16_vars = fold_batchnorm(
        {k: variables[k] for k in ("params", "batch_stats")})
    int8_model, int8_vars = build_int8_fused(cfg, variables, frame)

    s2dh_cfg = dataclasses.replace(cfg, deploy=True, stem_s2d=True,
                                   s2d_host=True, stage1_s2d=True)
    s2dm_cfg = dataclasses.replace(s2dh_cfg, s2d_merged=True)
    s2dm_bf16_vars = merge_stem_columns(fold_downsample_space_to_depth(
        fold_stem_space_to_depth(bf16_vars)))
    s2dm_int8_cfg = dataclasses.replace(
        int8_model.config, stem_s2d=True, s2d_host=True, stage1_s2d=True,
        s2d_merged=True)
    s2dm_int8_vars = merge_stem_columns(fold_downsample_space_to_depth(
        fold_stem_space_to_depth(int8_vars)))
    fs = space_to_depth_np(np.asarray(frame))
    frame_m = jnp.asarray(fs.reshape(fs.shape[0], fs.shape[1] // 2, 24))

    fc_cfg = dataclasses.replace(s2dm_cfg, fused_c3k2=True, fused_head=True)
    fc_int8_cfg = dataclasses.replace(s2dm_int8_cfg, fused_c3k2=True,
                                      fused_head=True)
    # the same fused math carried by the XLA form instead of the Pallas
    # kernels (fused_impl="xla") — isolated probes (tools/c3k2_probe.py)
    # measured the XLA form faster on every fc subgraph
    fcx_cfg = dataclasses.replace(fc_cfg, fused_impl="xla")
    fcx_int8_cfg = dataclasses.replace(fc_int8_cfg, fused_impl="xla")

    engines = {
        "int8_s2dm": (build_serving_fn(UninaYoloDla(s2dm_int8_cfg),
                                       s2dm_int8_cfg), s2dm_int8_vars),
        "bf16_s2dm": (build_serving_fn(UninaYoloDla(s2dm_cfg), s2dm_cfg),
                      s2dm_bf16_vars),
        "int8_s2dm_fc": (build_serving_fn(UninaYoloDla(fc_int8_cfg),
                                          fc_int8_cfg), s2dm_int8_vars),
        "bf16_s2dm_fc": (build_serving_fn(UninaYoloDla(fc_cfg), fc_cfg),
                         s2dm_bf16_vars),
        "int8_s2dm_fcx": (build_serving_fn(UninaYoloDla(fcx_int8_cfg),
                                           fcx_int8_cfg), s2dm_int8_vars),
        "bf16_s2dm_fcx": (build_serving_fn(UninaYoloDla(fcx_cfg), fcx_cfg),
                          s2dm_bf16_vars),
    }

    # stage 1: single-call compile + execute per engine, full traceback
    live = {}
    for name, (serve, v) in engines.items():
        t0 = time.perf_counter()
        try:
            d = jax.jit(serve)(v, frame_m)
            nvalid = int(np.asarray(d.valid).sum())
            print(f"[{name}] single-call OK in {time.perf_counter()-t0:.1f}s"
                  f" valid={nvalid}", flush=True)
            live[name] = (serve, v)
        except Exception:
            print(f"[{name}] FAILED after {time.perf_counter()-t0:.1f}s:",
                  flush=True)
            traceback.print_exc()

    if "int8_s2dm_fc" not in live:
        print("fc engine failed at single-call stage — fix before timing")
        return

    # stage 2: interleaved slope A/B across the live engines
    loops = {}
    for name, (serve, v) in live.items():
        ls = {n: make_loop(serve, n) for n in args.loops}
        try:
            for loop in ls.values():
                float(loop(v, frame_m))
                float(loop(v, frame_m))
            loops[name] = ls
        except Exception:
            print(f"[{name}] FAILED in loop warmup:", flush=True)
            traceback.print_exc()

    per_round = {k: [] for k in loops}
    order_rng = np.random.default_rng(7)
    for r in range(args.rounds):
        order = list(loops)
        order_rng.shuffle(order)
        for name in order:
            _, v = live[name]
            mins = {}
            for n in args.loops:
                t0 = time.perf_counter()
                float(loops[name][n](v, frame_m))
                mins[n] = time.perf_counter() - t0
            per_round[name].append(round(fit_slope(mins)[0], 3))
        print(f"round {r}: " + " ".join(
            f"{k}={per_round[k][-1]}" for k in loops), flush=True)

    out = {}
    for name, slopes in per_round.items():
        good = [s for s in slopes if s > 0]
        med = float(np.median(good)) if good else None
        q1, q3 = (np.percentile(good, [25, 75]) if good else (None, None))
        out[name] = {"median_ms": med,
                     "iqr_ms": (float(q3 - q1) if good else None),
                     "rounds": slopes}
    print(json.dumps(out, indent=1))
    with open("artifacts/fc_probe.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
