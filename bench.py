#!/usr/bin/env python
"""Headline benchmark: frame-to-boxes latency, 640x640 batch-1.

Measures the full fused serving path — ImageNet-normalise preprocess +
UNINA-YOLO-DLA forward + 3-level decode + exact greedy NMS (MXU fixpoint,
K=1024) — as ONE jitted XLA program on the TPU, for THREE engines:

  bf16      BatchNorm folded (`export --fold-bn` graph)
  int8      fused int8 chain (int8 MXU + int8 inter-layer activations,
            `export --int8` graph; quant/qtensor.py)
  pallas    bf16 graph with the hand-written Pallas preprocess/decode/NMS
            kernels instead of the XLA-fused ops

The headline value is the best engine's latency (the engine `export
--int8` ships for deployment); every engine's number is in extras, plus
analytic FLOPs/frame (XLA cost analysis), achieved TFLOP/s and MFU at
batch 1 and 8, and a saved jax.profiler trace artifact.

Baseline to beat: the reference's <15 ms design target on Jetson Orin DLA
(BASELINE.md); vs_baseline = baseline_ms / value (>1 is better).

Methodology: the TPU here sits behind a network relay that adds a LARGE,
VARIABLE fixed cost per dispatch+fetch (tens to hundreds of ms), so the
pipeline is iterated inside jitted ``lax.fori_loop``s of several lengths
(input varied per iteration to defeat CSE) and per-frame latency is the
least-squares SLOPE of min-total-time vs loop length — fixed overhead of
any size drops out, min() suppresses relay noise. Device execution itself
is deterministic (static-shape program).

Prints exactly one JSON line.
"""
from __future__ import annotations

import dataclasses
import json
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from unina_yolo_dla_tpu.models import ModelConfig, init_model
from unina_yolo_dla_tpu.models.detector import UninaYoloDla
from unina_yolo_dla_tpu.quant.calibrate import select_amax
from unina_yolo_dla_tpu.quant.deploy import fold_batchnorm, quantize_weights_int8
from unina_yolo_dla_tpu.ops.preprocess import ensure_normalized
from unina_yolo_dla_tpu.quant.fake_quant import PERF_EXCLUDE, QuantSpec
from unina_yolo_dla_tpu.runtime.pipeline import build_serving_fn

BASELINE_MS = 15.0
LOOP_LENGTHS = (100, 300, 500, 700)
REPEATS = 5

# Peak dense-matmul throughput per chip, FLOP/s (public spec sheets);
# int8 engines count int8 MACs against the int8 peak.
PEAK_FLOPS = {
    "TPU v5e": {"bf16": 197e12, "int8": 394e12},
    "TPU v5 lite": {"bf16": 197e12, "int8": 394e12},
    "TPU v4": {"bf16": 275e12, "int8": 275e12},
    "TPU v6e": {"bf16": 918e12, "int8": 1836e12},
}


def make_loop(serve, n: int):
    @jax.jit
    def loop(variables, frame):
        def body(i, acc):
            f = frame ^ (i % 7).astype(jnp.uint8)  # defeat CSE across iters
            d = serve(variables, f)
            return acc + d.scores.sum() + d.valid.sum()
        return lax.fori_loop(0, n, body, jnp.float32(0.0))
    return loop


def measure_slope(serve, variables, frame) -> tuple[float, float]:
    """(ms/frame, harness spread ms) via the loop-length slope fit."""
    loops = {n: make_loop(serve, n) for n in LOOP_LENGTHS}
    for loop in loops.values():          # compile + relay warm-up
        float(loop(variables, frame))
        float(loop(variables, frame))
    mins = {}
    for n, loop in loops.items():
        ts = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            float(loop(variables, frame))
            ts.append(time.perf_counter() - t0)
        mins[n] = min(ts)
    ns = np.array(list(mins.keys()), dtype=np.float64)
    ys = np.array([mins[int(n)] for n in ns])
    slope, intercept = np.polyfit(ns, ys, 1)
    resid = ys - (slope * ns + intercept)
    return float(slope) * 1e3, float(np.abs(resid).max() / ns.mean()) * 1e3


def measure_throughput(model, variables, rng, batch: int = 8) -> float:
    """Model-forward frames/sec at the given batch (multi-stream mode)."""
    x = jnp.asarray(rng.normal(0, 1, (batch, 640, 640, 3)).astype(np.float32))

    def make(n):
        @jax.jit
        def loop(v, xx):
            def it(i, acc):
                outs = model.apply(v, xx + i * 1e-6, train=False)
                return acc + sum(o.sum() for pair in outs for o in pair)
            return lax.fori_loop(0, n, it, jnp.float32(0.0))
        return loop

    l1, l2 = make(10), make(60)
    float(l1(variables, x))
    float(l2(variables, x))
    dts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(l1(variables, x))
        a = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(l2(variables, x))
        b = time.perf_counter() - t0
        dts.append((b - a) / 50)
    dts = [d for d in dts if d > 0]  # relay noise can flip the quotient
    if not dts:
        return float("nan")
    return batch / float(np.median(dts))


def forward_flops(model, variables, batch: int) -> float | None:
    """Analytic FLOPs of one forward via XLA cost analysis."""
    x = jnp.zeros((batch, 640, 640, 3), jnp.float32)
    try:
        compiled = jax.jit(
            lambda v, xx: model.apply(v, xx, train=False)).lower(
                variables, x).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def build_int8_fused(cfg, variables, frame) -> tuple[Any, dict]:
    """Calibrate (1-batch max) + BN-fold + weight-quantise -> fused engine."""
    calib_model = UninaYoloDla(cfg.with_quant("calib_max"))
    # calibrate on what the model actually sees: the serving pipeline's
    # ImageNet-normalised input, not bare [0,1] pixels
    x = ensure_normalized(frame[None])
    _, mut = jax.jit(
        lambda v, xx: calib_model.apply(v, xx, train=False,
                                        mutable=["quant_calib"])
    )({k: variables[k] for k in ("params", "batch_stats")}, x)
    quant = select_amax(jax.device_get(mut["quant_calib"]), method="max")
    folded = fold_batchnorm(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"], "quant": quant})
    # deployed engine uses the measured-on-v5e mixed-precision list:
    # int8 where it wins (P3/P4), bf16 at the data-movement-bound 160^2
    # stages (see PERF_EXCLUDE rationale in quant/fake_quant.py)
    spec = QuantSpec(mode="int8_fused", exclude=PERF_EXCLUDE)
    int8_vars = quantize_weights_int8(folded, spec)
    model = UninaYoloDla(dataclasses.replace(cfg, deploy=True, quant=spec))
    return model, int8_vars


def main() -> None:
    cfg = ModelConfig(num_classes=4, base_channels=32, input_size=640)
    _, variables = init_model(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 256, (640, 640, 3), dtype=np.uint8))

    # --- engines ---
    bf16_model = UninaYoloDla(dataclasses.replace(cfg, deploy=True))
    bf16_vars = fold_batchnorm(
        {k: variables[k] for k in ("params", "batch_stats")})
    int8_model, int8_vars = build_int8_fused(cfg, variables, frame)

    engines = {
        "bf16_folded": (build_serving_fn(bf16_model, cfg), bf16_vars),
        "int8_fused": (build_serving_fn(int8_model, cfg), int8_vars),
        "pallas_bf16": (build_serving_fn(bf16_model, cfg,
                                         use_pallas_kernels=True), bf16_vars),
    }
    results, spreads = {}, {}
    for name, (serve, v) in engines.items():
        try:
            results[name], spreads[name] = measure_slope(serve, v, frame)
        except Exception as e:  # a failing engine must not kill the bench
            results[name], spreads[name] = None, None
            print(f"WARNING: engine {name} failed: {e}", flush=True)

    ok = {k: v for k, v in results.items() if v is not None}
    best_name = min(ok, key=ok.get)
    value = ok[best_name]

    # --- throughput + MFU ---
    fps8 = measure_throughput(bf16_model, bf16_vars, rng)
    flops1 = forward_flops(bf16_model, bf16_vars, 1)
    kind = jax.devices()[0].device_kind
    peaks = next((v for k, v in PEAK_FLOPS.items() if k in kind), None)
    mfu = {}
    if flops1:
        for name, dt in ok.items():
            dtype = "int8" if "int8" in name else "bf16"
            achieved = flops1 / (dt * 1e-3)
            mfu[name] = {
                "achieved_tflops": round(achieved / 1e12, 2),
                "mfu_pct": (round(100 * achieved / peaks[dtype], 2)
                            if peaks else None),
            }
        if fps8 == fps8:  # not NaN
            achieved8 = flops1 * fps8
            mfu["batch8_forward"] = {
                "achieved_tflops": round(achieved8 / 1e12, 2),
                "mfu_pct": (round(100 * achieved8 / peaks["bf16"], 2)
                            if peaks else None),
            }

    # --- profiler trace artifact (tolerate relay/profiler unavailability) ---
    trace_dir = None
    try:
        from unina_yolo_dla_tpu.utils.profiling import trace

        serve, v = engines["bf16_folded"]
        loop = make_loop(serve, 50)
        with trace("runs/bench_trace") as d:
            float(loop(v, frame))
        trace_dir = d
    except Exception as e:
        print(f"WARNING: profiler trace failed: {e}", flush=True)

    print(json.dumps({
        "metric": "frame_to_boxes_latency",
        "value": round(value, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / value, 3),
        "extra": {"repeats": REPEATS, "loop_lengths": list(LOOP_LENGTHS),
                  "engine": best_name,
                  "engines_ms": {k: (round(v, 3) if v else None)
                                 for k, v in results.items()},
                  "harness_spread_ms": {k: (round(v, 3) if v else None)
                                        for k, v in spreads.items()},
                  "baseline_ms": BASELINE_MS, "batch": 1, "input": 640,
                  "batch8_fps": round(fps8, 0),
                  "forward_gflops_per_frame": (round(flops1 / 1e9, 2)
                                               if flops1 else None),
                  "mfu": mfu,
                  "profiler_trace": trace_dir,
                  "pipeline": "preprocess+forward+decode+"
                              "fixpoint_greedy_nms",
                  "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()
