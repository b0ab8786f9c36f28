"""Batch-8 FORWARD A/B: can int8 beat bf16's achieved TFLOP/s? (VERDICT r4 #6)

BENCH_r03 measured the int8 engine's achieved throughput ~= bf16's
(50.0 vs 49.2 TFLOP/s at b8) — int8 was winning on bytes (smaller
inter-layer activations), not on the 2x MXU rate the int8 premise
promises (reference DLA int8 premise, gpu_postprocess.cu /
export_trt.py int8 path). Two candidate explanations:

  (a) the deployed engine's PERF_EXCLUDE list keeps every 160^2 stage
      in bf16 (measured bandwidth-bound there), so a large slice of the
      FLOPs never runs on the int8 MXU path at all;
  (b) even the quantised P3/P4 stages are bandwidth/latency-bound at
      these shapes, so the 2x MXU rate is not reachable regardless.

This probe separates them: FORWARD-ONLY (normalise + model.apply, no
decode/NMS) at batch 8 over three merged-stem engines —

  bf16_s2dm      deploy bf16
  int8_s2dm      int8 with PERF_EXCLUDE (the deployed mix)
  int8_s2dm_min  int8 with DEFAULT_EXCLUDE only (stem + stage1_conv +
                 head_p2 excluded for accuracy parity with the
                 reference's FP16 list, train.py:779-781 — every other
                 160^2 stage QUANTISED)

interleaved + salted (relay memoization defeated), Theil-Sen slope over
loop lengths, achieved TFLOP/s from XLA cost analysis per engine
against the per-dtype v5e peak. Run on the live TPU:

    python tools/int8_b8_ab.py [rounds] [--trace]

Writes artifacts/int8_b8_ab.json (and with --trace, per-engine xplane
rollups naming where the int8 graphs spend their time).
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
from jax import lax

import bench
from unina_yolo_dla_tpu.models import ModelConfig
from unina_yolo_dla_tpu.models.detector import UninaYoloDla
from unina_yolo_dla_tpu.ops.preprocess import space_to_depth_np
from unina_yolo_dla_tpu.quant.deploy import (
    fold_batchnorm,
    fold_downsample_space_to_depth,
    fold_stem_space_to_depth,
    merge_stem_columns,
    quantize_weights_int8,
)
from unina_yolo_dla_tpu.quant.fake_quant import (
    DEFAULT_EXCLUDE,
    PERF_EXCLUDE,
    QuantSpec,
)
from unina_yolo_dla_tpu.runtime.pipeline import _normalize_for

B = 8
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 7
TRACE = "--trace" in sys.argv
LOOPS = (10, 30)
OUT = pathlib.Path(__file__).resolve().parents[1] / "artifacts" / \
    "int8_b8_ab.json"


def make_fwd_loop(model, cfg, n):
    @jax.jit
    def loop(v, frames, salt):
        def body(i, acc):
            f = frames ^ ((i + salt) % 7).astype(jnp.uint8)
            x = _normalize_for(cfg, f)
            outs = model.apply(v, x, train=False)
            return acc + sum(o.sum().astype(jnp.float32)
                             for pair in outs for o in pair)
        return lax.fori_loop(0, n, body, jnp.float32(0.0))
    return loop


def engine_flops(model, cfg, variables):
    s = cfg.input_size
    if getattr(cfg, "s2d_merged", False):
        shape = (B, s // 2, s // 4, 24)
    elif getattr(cfg, "s2d_host", False):
        shape = (B, s // 2, s // 2, 12)
    else:
        shape = (B, s, s, 3)
    frames = jnp.zeros(shape, jnp.uint8)
    try:
        compiled = jax.jit(
            lambda v, f: model.apply(v, _normalize_for(cfg, f),
                                     train=False)).lower(
            variables, frames).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def main():
    cfg = ModelConfig(num_classes=4, base_channels=32, input_size=640)
    s = cfg.input_size
    variables, src = bench.load_source_variables(cfg)
    rng = np.random.default_rng(0)
    frame1 = jnp.asarray(rng.integers(0, 256, (s, s, 3), dtype=np.uint8))

    # ---- variable sets --------------------------------------------------
    bf16_vars = fold_batchnorm(
        {k: variables[k] for k in ("params", "batch_stats")})

    def int8_engine(exclude):
        if "quant" not in variables:
            raise SystemExit("needs the committed trained checkpoint "
                             "(artifacts/engine_source.msgpack)")
        folded = fold_batchnorm(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"],
             "quant": variables["quant"]})
        spec = QuantSpec(mode="int8_fused", exclude=exclude)
        return spec, quantize_weights_int8(folded, spec)

    spec_perf, int8_vars_perf = int8_engine(PERF_EXCLUDE)
    spec_min, int8_vars_min = int8_engine(DEFAULT_EXCLUDE)

    def merged(v):
        return merge_stem_columns(
            fold_downsample_space_to_depth(fold_stem_space_to_depth(v)))

    s2dm = dict(deploy=True, stem_s2d=True, s2d_host=True, stage1_s2d=True,
                s2d_merged=True)
    cfg_bf16 = dataclasses.replace(cfg, **s2dm)
    cfg_perf = dataclasses.replace(cfg, **s2dm, quant=spec_perf)
    cfg_min = dataclasses.replace(cfg, **s2dm, quant=spec_min)

    frames_np = np.stack([np.asarray(frame1)] * B)
    fs = space_to_depth_np(frames_np)
    frames = jnp.asarray(fs.reshape(fs.shape[0], fs.shape[1],
                                    fs.shape[2] // 2, 24))

    engines = {
        "bf16_s2dm": (UninaYoloDla(cfg_bf16), cfg_bf16, merged(bf16_vars)),
        "int8_s2dm": (UninaYoloDla(cfg_perf), cfg_perf,
                      merged(int8_vars_perf)),
        "int8_s2dm_min": (UninaYoloDla(cfg_min), cfg_min,
                          merged(int8_vars_min)),
    }

    # ---- compile + warm up ---------------------------------------------
    loops, flops = {}, {}
    for name, (model, ecfg, v) in engines.items():
        t0 = time.monotonic()
        ls = {n: make_fwd_loop(model, ecfg, n) for n in LOOPS}
        for lp in ls.values():
            float(lp(v, frames, bench.next_salt()))
            float(lp(v, frames, bench.next_salt()))
        loops[name] = ls
        flops[name] = engine_flops(model, ecfg, v)
        print(f"{name}: compiled+warm in {time.monotonic() - t0:.0f}s, "
              f"fwd flops {flops[name] and flops[name] / 1e9:.1f} GFLOP",
              flush=True)

    # ---- interleaved measurement ---------------------------------------
    per_round = {k: [] for k in loops}
    order_rng = np.random.default_rng(11)
    for r in range(ROUNDS):
        order = list(loops)
        order_rng.shuffle(order)
        for name in order:
            _, _, v = engines[name]
            mins = {}
            for n in LOOPS:
                salt = bench.next_salt()
                t0 = time.perf_counter()
                float(loops[name][n](v, frames, salt))
                mins[n] = time.perf_counter() - t0
            slope = bench.fit_slope(mins)[0]
            if slope > 0:
                per_round[name].append(slope)
        print(f"round {r + 1}/{ROUNDS}: " + "  ".join(
            f"{k}={np.median(v):.3f}ms" for k, v in per_round.items() if v),
            flush=True)

    kind = jax.devices()[0].device_kind
    peaks = next((v for k, v in bench.PEAK_FLOPS.items() if k in kind), None)
    result = {"batch": B, "rounds": ROUNDS, "loops": list(LOOPS),
              "weights": src, "device": str(jax.devices()[0]),
              "pipeline": "normalize+forward only (no decode/NMS)",
              "engines": {}}
    for name, slopes in per_round.items():
        med = float(np.median(slopes)) if slopes else None
        q1, q3 = (np.percentile(slopes, [25, 75]) if slopes else (0, 0))
        dtype = "int8" if "int8" in name else "bf16"
        ach = (flops[name] / (med * 1e-3) if (med and flops[name])
               else None)
        result["engines"][name] = {
            "per_batch_ms": med and round(med, 3),
            "iqr_ms": round(float(q3 - q1), 3),
            "per_frame_ms": med and round(med / B, 4),
            "fps": med and round(B / (med * 1e-3), 0),
            "achieved_tflops": ach and round(ach / 1e12, 2),
            "mfu_pct_vs_own_peak": (round(100 * ach / peaks[dtype], 2)
                                    if (ach and peaks) else None),
            "counted_against": dtype,
            "per_round_ms": [round(x, 3) for x in slopes],
        }

    e = result["engines"]
    if e["bf16_s2dm"]["per_batch_ms"] and e["int8_s2dm_min"]["per_batch_ms"]:
        result["verdict"] = {
            "int8_min_vs_bf16_ms": round(
                e["int8_s2dm_min"]["per_batch_ms"]
                - e["bf16_s2dm"]["per_batch_ms"], 3),
            "int8_perf_vs_bf16_ms": round(
                e["int8_s2dm"]["per_batch_ms"]
                - e["bf16_s2dm"]["per_batch_ms"], 3),
            "int8_exceeds_bf16_achieved_tflops": bool(
                (e["int8_s2dm_min"]["achieved_tflops"] or 0)
                > (e["bf16_s2dm"]["achieved_tflops"] or 0)
                or (e["int8_s2dm"]["achieved_tflops"] or 0)
                > (e["bf16_s2dm"]["achieved_tflops"] or 0)),
        }

    # ---- optional traces naming where each engine spends time ----------
    if TRACE:
        from tools.layer_table import (
            find_xplane, parse_device_ops, rollup_by_group)
        from unina_yolo_dla_tpu.utils.profiling import trace as jtrace

        for name in ("bf16_s2dm", "int8_s2dm_min"):
            v = engines[name][2]
            run_dir = f"runs/int8_b8_ab_{name}"
            with jtrace(run_dir) as d:
                float(loops[name][30](v, frames, bench.next_salt()))
            try:
                ops = parse_device_ops(find_xplane(d))
                result.setdefault("traces", {})[name] = {
                    "dir": run_dir,
                    "groups": rollup_by_group(ops)[:12],
                }
            except Exception as ex:
                print(f"WARNING: trace rollup {name}: {ex}", flush=True)

    OUT.write_text(json.dumps(result, indent=1))
    print(json.dumps({k: {kk: vv for kk, vv in v.items()
                          if kk != "per_round_ms"}
                      for k, v in result["engines"].items()}, indent=1))
    print("verdict:", json.dumps(result.get("verdict")), flush=True)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
