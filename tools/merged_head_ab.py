"""Merged-head A/B: does full-lane head restructuring win end-to-end?

``ModelConfig.merged_head`` rewrites each float-path head level's two
branches as channel-concat / block-diagonal convs (models/head.py
_merged): N=64 half-lane MXU passes become N=128 full-lane passes and
the shared activations are read once. head_p2 (always float in the
deployed engine) is 17.5% of b1 device time
(artifacts/layer_table_s2dm.json). This measures the full serving
pipeline (preprocess+forward+decode+NMS, batch 1) for the default
engine and its bf16 comparator with the flag off/on — interleaved
rounds, salted dispatches, Theil-Sen slope (bench.py methodology).

    python tools/merged_head_ab.py [rounds]

Writes artifacts/merged_head_ab.json.
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench
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

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 7
OUT = pathlib.Path(__file__).resolve().parents[1] / "artifacts" / \
    "merged_head_ab.json"


def main():
    cfg = ModelConfig(num_classes=4, base_channels=32, input_size=640)
    s = cfg.input_size
    variables, src = bench.load_source_variables(cfg)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 256, (s, s, 3), dtype=np.uint8))

    bf16_vars = fold_batchnorm(
        {k: variables[k] for k in ("params", "batch_stats")})
    _, int8_vars = bench.build_int8_fused(cfg, variables, frame)

    def merged(v):
        return merge_stem_columns(
            fold_downsample_space_to_depth(fold_stem_space_to_depth(v)))

    s2dm_bf16_vars = merged(bf16_vars)
    s2dm_int8_vars = merged(int8_vars)
    fs = np.asarray(space_to_depth_np(np.asarray(frame)))
    frame_s2dm = jnp.asarray(fs.reshape(fs.shape[0], fs.shape[1] // 2, 24))

    s2dm = dict(deploy=True, stem_s2d=True, s2d_host=True, stage1_s2d=True,
                s2d_merged=True)
    base_bf16 = dataclasses.replace(cfg, **s2dm)
    base_int8 = dataclasses.replace(
        cfg, **s2dm, fused_stem=True,
        quant=bench.QuantSpec(mode="int8_fused",
                              exclude=bench.PERF_EXCLUDE))

    engines = {}
    for mh in (False, True):
        ecfg = dataclasses.replace(base_int8, merged_head=mh)
        engines[f"int8_s2dm_fs{'_mh' if mh else ''}"] = (
            build_serving_fn(UninaYoloDla(ecfg), ecfg), s2dm_int8_vars,
            frame_s2dm)
        bcfg = dataclasses.replace(base_bf16, merged_head=mh)
        engines[f"bf16_s2dm{'_mh' if mh else ''}"] = (
            build_serving_fn(UninaYoloDla(bcfg), bcfg), s2dm_bf16_vars,
            frame_s2dm)

    loops = {}
    for name, (serve, v, f) in engines.items():
        t0 = time.monotonic()
        ls = {n: bench.make_loop(serve, n) for n in bench.LOOP_LENGTHS}
        for lp in ls.values():
            float(lp(v, f, bench.next_salt()))
            float(lp(v, f, bench.next_salt()))
        loops[name] = ls
        print(f"{name}: compiled+warm in {time.monotonic() - t0:.0f}s",
              flush=True)

    per_round = {k: [] for k in loops}
    order_rng = np.random.default_rng(5)
    for r in range(ROUNDS):
        order = list(loops)
        order_rng.shuffle(order)
        for name in order:
            _, v, f = engines[name]
            mins = {}
            for n in bench.LOOP_LENGTHS:
                salt = bench.next_salt()
                t0 = time.perf_counter()
                float(loops[name][n](v, f, salt))
                mins[n] = time.perf_counter() - t0
            slope = bench.fit_slope(mins)[0]
            if slope > 0:
                per_round[name].append(slope)
        print(f"round {r + 1}/{ROUNDS}: " + "  ".join(
            f"{k}={np.median(v):.3f}" for k, v in per_round.items() if v),
            flush=True)

    result = {"rounds": ROUNDS, "weights": src,
              "device": str(jax.devices()[0]),
              "pipeline": "preprocess+forward+decode+nms, batch 1",
              "engines": {}}
    for name, slopes in per_round.items():
        med = float(np.median(slopes)) if slopes else None
        q1, q3 = (np.percentile(slopes, [25, 75]) if slopes else (0, 0))
        result["engines"][name] = {
            "ms": med and round(med, 3),
            "iqr_ms": round(float(q3 - q1), 3),
            "per_round_ms": [round(x, 3) for x in slopes],
        }

    def delta(a, b):
        ea, eb = result["engines"][a], result["engines"][b]
        if not (ea["ms"] and eb["ms"]):
            return None
        d = ea["ms"] - eb["ms"]
        return {"delta_ms": round(d, 3), "faster": a if d < 0 else b,
                "significant": bool(abs(d) > (ea["iqr_ms"]
                                              + eb["iqr_ms"]) / 2)}

    result["ab"] = {
        "int8_mh_vs_base": delta("int8_s2dm_fs_mh", "int8_s2dm_fs"),
        "bf16_mh_vs_base": delta("bf16_s2dm_mh", "bf16_s2dm"),
    }
    OUT.write_text(json.dumps(result, indent=1))
    print(json.dumps(result["ab"], indent=1))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
