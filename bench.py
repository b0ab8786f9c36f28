#!/usr/bin/env python
"""Headline benchmark: frame-to-boxes latency, 640x640 batch-1.

Measures the full fused serving path — ImageNet-normalise preprocess +
UNINA-YOLO-DLA forward + 3-level decode + exact greedy NMS (MXU fixpoint,
K=1024) — as ONE jitted XLA program on the TPU.

DEFAULT mode (what the driver runs) measures TWO engines and stays
inside a wall-clock budget (UNINA_BENCH_BUDGET_S, default 540 s):

  int8_s2dm_fs_mh  the DEFAULT-EXPORT engine (export --int8
                --s2d-merged --fused-stem --merged-head): int8 MXU
                chain, column-merged space-to-depth view, stem+stage1
                as one fused Pallas VMEM pass (stem_kernel.py), and
                the float head levels' cls/reg branches merged into
                full-MXU-lane convs (models/head.py _merged; r5 A/B
                artifacts/merged_head_ab.json: 0.468 vs 0.791 ms,
                significant). HEADLINE.
  bf16_s2dm_mh  the bf16 comparator on the same merged view + merged
                head — the int8-vs-bf16 A/B lives in every run.

UNINA_BENCH_FULL=1 restores the full 8-engine sweep (bf16_folded,
bf16_s2dh, int8_fused, int8_s2dh, int8_s2dm, bf16_s2dm_fs, + the two
defaults), the batch-8 forward throughput probe and the profiler trace
set. Engine docs for the full set: see ENGINE_NOTES below.

Evidence budget discipline (round-5 fix): BENCH_r04 was rc=124 — the
full sweep blew the driver's timeout and left NO perf record; BENCH_r03
printed a final line so large the driver's tail capture truncated it.
So this bench now (a) writes every detail INCREMENTALLY to
artifacts/bench_r5.json (a kill still leaves evidence), (b) prints one
COMPACT final JSON line (~400 bytes), and (c) checks a soft wall-clock
budget between phases and between measurement rounds, emitting the
final line with whatever finished. A persistent XLA compilation cache
(.jax_cache/) makes repeat runs skip the ~20-40 s/engine compiles.

Engine weights: when the committed trained checkpoint
(artifacts/engine_source.msgpack: params + batch_stats + phase-2-
calibrated quant collection with out_q/add_q amaxes) is present, every
engine is built from it — the int8 engine benched IS the deployed
engine's numerics. Without it the bench falls back to random weights
with 1-batch max calibration and says so in the artifact.

A/B methodology: engines are measured in N_ROUNDS interleaved rounds
(engine order shuffled per round) so slow drift in the relay/host hits
all engines equally; per engine the reported value is the MEDIAN of the
per-round slope fits and the spread is the IQR across rounds. Each
per-round measurement iterates the pipeline inside jitted
``lax.fori_loop``s of several lengths (input salted per iteration AND
per dispatch to defeat CSE and relay memoization) and takes the
Theil-Sen SLOPE of total-time vs loop length — fixed dispatch overhead
of any size drops out.

Baseline to beat: the reference's <15 ms design target on Jetson Orin
DLA (BASELINE.md); vs_baseline = baseline_ms / value (>1 is better).

Prints exactly one JSON line (compact); full detail in the artifact.
"""
from __future__ import annotations

import dataclasses
import itertools
import json
import os
import time
from pathlib import Path
from typing import Any

import jax

_REPO = Path(__file__).resolve().parent
# Persistent compilation cache: the second run of any engine skips its
# compile entirely. This is what lets the driver's bench run (a fresh
# process) finish inside its budget after the builder has run it once.
try:
    jax.config.update("jax_compilation_cache_dir", str(_REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass  # older jax without these knobs: cache is an optimisation only

import jax.numpy as jnp
import numpy as np
from jax import lax

from unina_yolo_dla_tpu.models import ModelConfig, init_model
from unina_yolo_dla_tpu.models.detector import UninaYoloDla
from unina_yolo_dla_tpu.quant.calibrate import select_amax
from unina_yolo_dla_tpu.quant.deploy import (
    fold_batchnorm,
    fold_stem_space_to_depth,
    quantize_weights_int8,
)
from unina_yolo_dla_tpu.ops.preprocess import ensure_normalized
from unina_yolo_dla_tpu.quant.fake_quant import PERF_EXCLUDE, QuantSpec
from unina_yolo_dla_tpu.runtime.pipeline import build_serving_fn

BASELINE_MS = 15.0
LOOP_LENGTHS = (100, 300, 500, 700)
# The engine the committed default export ships (export --int8
# --s2d-merged --fused-stem --merged-head): the headline reports the
# product, not the session's (possibly noise-favoured) fastest row.
HEADLINE_ENGINE = "int8_s2dm_fs_mh"
FULL = bool(os.environ.get("UNINA_BENCH_FULL"))
N_ROUNDS = 5 if FULL else 3
# UNINA_BENCH_SMOKE=1: tiny config / short loops so the full bench code
# path (all engines, interleaving, artifact round-trip) runs in CI on CPU;
# numbers from smoke mode are meaningless
SMOKE = bool(os.environ.get("UNINA_BENCH_SMOKE"))
if SMOKE:
    LOOP_LENGTHS = (4, 8)
    N_ROUNDS = 2
ENGINE_SOURCE = _REPO / "artifacts" / "engine_source.msgpack"
ARTIFACT = Path(os.environ.get("UNINA_BENCH_ARTIFACT",
                               str(_REPO / "artifacts" / "bench_r5.json")))

# Soft wall-clock budget: checked between phases and between rounds —
# when it expires, the final line is emitted with whatever finished.
BUDGET_S = float(os.environ.get("UNINA_BENCH_BUDGET_S", "540"))
_T0 = time.monotonic()


def time_left() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


# Peak dense-matmul throughput per chip, FLOP/s (public spec sheets);
# int8 engines count int8 MACs against the int8 peak.
PEAK_FLOPS = {
    "TPU v5e": {"bf16": 197e12, "int8": 394e12},
    "TPU v5 lite": {"bf16": 197e12, "int8": 394e12},
    "TPU v4": {"bf16": 275e12, "int8": 275e12},
    "TPU v6e": {"bf16": 918e12, "int8": 1836e12},
}

ENGINE_NOTES = """full-sweep engine glossary:
  bf16_folded  BatchNorm folded (`export --fold-bn` graph)
  bf16_s2dh    + host-blocked space-to-depth stem: stem is one MXU
               matmul over (S/2,S/2,12) blocked frames
  int8_fused   fused int8 chain (int8 MXU + int8 inter-layer
               activations; quant/qtensor.py)
  int8_s2dh    int8 chain + the host-s2d stem
  *_s2dm       column-MERGED engines: same host bytes viewed
               (S/2,S/4,24), stem matmul emits merged columns, stage1
               is one fused Pallas VMEM pass (stage1_kernel.py)
  *_s2dm_fs    + stem itself fused into that Pallas pass
  *_mh         + float head levels' cls/reg branches merged into
               full-MXU-lane convs (models/head.py _merged; DEFAULT)
  *_fc         retired fused-subgraph engines (UNINA_BENCH_FC=1)
  pallas_bf16  retired Pallas decode/NMS (UNINA_BENCH_PALLAS_OPS=1)"""


def make_loop(serve, n: int):
    @jax.jit
    def loop(variables, frame, salt):
        def body(i, acc):
            # XOR with i defeats CSE across loop iterations; XOR with the
            # per-call salt makes every dispatch's args unique, defeating
            # the relay's result memoization of identical (executable,
            # args) calls (discovered r4: repeated identical timed calls
            # return in ~1 ms without touching the chip)
            f = frame ^ ((i + salt) % 7).astype(jnp.uint8)
            d = serve(variables, f)
            return acc + d.scores.sum() + d.valid.sum()
        return lax.fori_loop(0, n, body, jnp.float32(0.0))
    return loop


_SALT = itertools.count(1)


def next_salt() -> jnp.ndarray:
    """A fresh device scalar per timed call — no two dispatches share
    identical args, so a caching relay cannot short-circuit them. The
    4-byte upload is a per-call constant the slope fit cancels."""
    return jnp.int32(next(_SALT))


def fit_slope(mins: dict[int, float]) -> tuple[float, float]:
    """(ms/frame, residual ms) Theil-Sen over min-total vs loop length.

    Median of the pairwise slopes, not least squares: one relay spike on
    a single loop-length measurement skews an L2 fit arbitrarily (r3
    evidence: a -0.415 ms/frame "latency" in one round), while the
    pairwise-slope median tolerates it. Residual is against the
    median-slope line through the median point."""
    ns = np.array(sorted(mins), dtype=np.float64)
    ys = np.array([mins[int(n)] for n in ns])
    pair = [(ys[j] - ys[i]) / (ns[j] - ns[i])
            for i in range(len(ns)) for j in range(i + 1, len(ns))]
    slope = float(np.median(pair))
    intercept = float(np.median(ys - slope * ns))
    resid = ys - (slope * ns + intercept)
    return slope * 1e3, float(np.abs(resid).max() / ns.mean()) * 1e3


def measure_interleaved(engines: dict[str, tuple[Any, Any, Any]],
                        rng: np.random.Generator,
                        flush=lambda **kw: None,
                        ) -> tuple[dict, dict, dict]:
    """Interleaved repeated A/B over all engines in one invocation.

    ``engines[name] = (serve_fn, variables, frame)`` — each engine brings
    its own input (s2d_host engines consume blocked frames). Round r
    measures every engine once (order shuffled per round); per engine the
    value is the median of per-round slope fits, the spread the IQR
    across rounds — the evidence standard VERDICT r2 set for the
    int8-vs-bf16 ordering. Budget-aware: compiles stop when <60 s remain
    (keeping whatever engines are warm), rounds stop when <20 s remain;
    ``flush`` is called with partial results after every round so a hard
    kill still leaves evidence on disk.
    """
    loops, failed = {}, {}
    for name, (serve, v, frame) in engines.items():
        if loops and time_left() < 60:
            # keep at least one engine; further compiles don't fit
            print(f"WARNING: budget: skipping compile of {name} "
                  f"({time_left():.0f}s left)", flush=True)
            failed[name] = None
            continue
        try:
            ls = {n: make_loop(serve, n) for n in LOOP_LENGTHS}
            for loop in ls.values():      # compile + relay warm-up
                float(loop(v, frame, next_salt()))
                float(loop(v, frame, next_salt()))
            loops[name] = ls
        except Exception as e:  # a failing engine must not kill the bench
            failed[name] = None
            print(f"WARNING: engine {name} failed: {e}", flush=True)

    def summarize(per_round):
        medians, iqrs = {}, {}
        for name, slopes in per_round.items():
            # a slope <= 0 is physically impossible (negative per-frame
            # latency) — it means the relay corrupted that round's timings
            # beyond what Theil-Sen can absorb; exclude it rather than let
            # garbage pull the median (seen: bf16 round fits of -0.9 ms)
            good = [s for s in slopes if s > 0]
            if not good:
                medians[name] = None
                iqrs[name] = None
                continue
            medians[name] = float(np.median(good))
            q1, q3 = np.percentile(good, [25, 75])
            iqrs[name] = float(q3 - q1)
        return medians, iqrs

    per_round: dict[str, list[float]] = {k: [] for k in loops}
    rounds_done = 0
    for r in range(N_ROUNDS):
        if rounds_done and time_left() < 20:
            print(f"WARNING: budget: stopping after round {rounds_done}",
                  flush=True)
            break
        order = list(loops)
        rng.shuffle(order)
        for name in order:
            _, v, frame = engines[name]
            mins = {}
            for n in LOOP_LENGTHS:
                salt = next_salt()
                t0 = time.perf_counter()
                float(loops[name][n](v, frame, salt))
                mins[n] = time.perf_counter() - t0
            per_round[name].append(fit_slope(mins)[0])
        rounds_done = r + 1
        m, i = summarize(per_round)
        flush(engines_ms=m, iqr_ms=i, per_round_ms=per_round,
              rounds_done=rounds_done)

    medians, iqrs = summarize(per_round)
    medians.update(failed)
    iqrs.update(failed)
    return medians, iqrs, {k: [round(s, 3) for s in v]
                           for k, v in per_round.items()}


def measure_batch8_artifact(model, variables, cfg, tmpdir) -> dict | None:
    """Frames/sec + per-stream latency THROUGH the exported --batch 8
    artifact (VERDICT r2 next #8): the multi-stream program is serialized
    with jax.export, re-loaded, and the deserialized call is what runs in
    the timing loop — the same bytes a deployment would load."""
    from unina_yolo_dla_tpu.runtime.aot import (
        ServingArtifact,
        export_serving_artifact,
    )

    committed = _REPO / "artifacts" / "serving_artifact_b8"
    try:
        # SMOKE must NOT load the committed 640^2 artifact: at smoke
        # scale the rest of the run is tiny, and serving the full-size
        # b8 engine on the CPU backend takes tens of minutes
        if committed.exists() and not SMOKE:
            art, source = ServingArtifact(committed), "committed"
        else:
            out = Path(tmpdir) / "b8_artifact"
            export_serving_artifact(model, variables, out, batch=8,
                                    strict=False)
            art, source = ServingArtifact(out), "session-export"
        b = int(art.config.get("batch") or 8)
        s = int(art.config["input_size"])
        rng = np.random.default_rng(3)
        frames_np = rng.integers(0, 256, (b, s, s, 3), dtype=np.uint8)
        if art.config.get("s2d_host"):
            # the artifact consumes blocked frames; the timing loop
            # calls the exported program directly, so block here (the
            # host-side shuffle is NOT part of the on-device number)
            from unina_yolo_dla_tpu.ops.preprocess import space_to_depth_np

            frames_np = space_to_depth_np(frames_np)
            if art.config.get("s2d_merged"):
                bb, hh, hw, c = frames_np.shape
                frames_np = frames_np.reshape(bb, hh, hw // 2, 2 * c)
        frames = jnp.asarray(frames_np)

        def serve(v, f):
            return art._exported.call(v, f)

        loops = {n: make_loop_batch(serve, n) for n in (10, 30)}
        for loop in loops.values():
            # fetch with float(): block_until_ready on a fori_loop scalar
            # can return through the relay without the computation having
            # run (r4: it produced a 17M-fps fantasy slope here)
            float(loop(art.variables, frames, next_salt()))
            float(loop(art.variables, frames, next_salt()))
        mins = {n: float("inf") for n in loops}
        for _ in range(5):
            for n, loop in loops.items():
                salt = next_salt()
                t0 = time.perf_counter()
                float(loop(art.variables, frames, salt))
                mins[n] = min(mins[n], time.perf_counter() - t0)
        slope_ms = fit_slope(mins)[0]
        return {"fps": round(b / (slope_ms * 1e-3), 0),
                "per_batch_latency_ms": round(slope_ms, 3),
                "batch": b, "source": source,
                "pipeline": "artifact: preprocess+forward+decode+nms x8"}
    except Exception as e:
        print(f"WARNING: batch-8 artifact bench failed: {e}", flush=True)
        return None


def make_loop_batch(serve, n: int):
    @jax.jit
    def loop(variables, frames, salt):
        def body(i, acc):
            f = frames ^ ((i + salt) % 7).astype(jnp.uint8)
            d = serve(variables, f)
            return acc + d.scores.sum() + d.valid.sum()
        return lax.fori_loop(0, n, body, jnp.float32(0.0))
    return loop


def measure_throughput(model, variables, rng, batch: int = 8) -> float:
    """Model-forward frames/sec at the given batch (forward-only ceiling)."""
    s = model.config.input_size
    x = jnp.asarray(rng.normal(0, 1, (batch, s, s, 3)).astype(np.float32))

    def make(n):
        @jax.jit
        def loop(v, xx, salt):
            def it(i, acc):
                outs = model.apply(v, xx + (i + salt) * 1e-6, train=False)
                return acc + sum(o.sum() for pair in outs for o in pair)
            return lax.fori_loop(0, n, it, jnp.float32(0.0))
        return loop

    l1, l2 = make(10), make(60)
    float(l1(variables, x, next_salt()))
    float(l2(variables, x, next_salt()))
    dts = []
    for _ in range(5):
        s1, s2 = next_salt(), next_salt()
        t0 = time.perf_counter()
        float(l1(variables, x, s1))
        a = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(l2(variables, x, s2))
        b = time.perf_counter() - t0
        dts.append((b - a) / 50)
    dts = [d for d in dts if d > 0]  # relay noise can flip the quotient
    if not dts:
        return float("nan")
    return batch / float(np.median(dts))


def forward_flops(model, variables, batch: int) -> float | None:
    """Analytic FLOPs of one forward via XLA cost analysis."""
    s = model.config.input_size
    x = jnp.zeros((batch, s, s, 3), jnp.float32)
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


def load_source_variables(cfg) -> tuple[dict, str]:
    """Trained committed checkpoint when present, else random init.

    artifacts/engine_source.msgpack is the phase-2-calibrated QAT
    checkpoint (params + batch_stats + quant incl. out_q/add_q) committed
    by the round-3 training run — benching from it makes the int8 A/B run
    on the DEPLOYED engine's calibration instead of a random-weight proxy
    (VERDICT r2 weak #2).
    """
    if ENGINE_SOURCE.exists() and not SMOKE:
        from unina_yolo_dla_tpu.utils.checkpoint import load_msgpack_raw

        v = load_msgpack_raw(ENGINE_SOURCE)
        if ("quant" in v and v.get("params") is not None):
            return v, "trained_committed"
    _, variables = init_model(jax.random.key(0), cfg)
    return variables, "random_proxy"


def build_int8_fused(cfg, variables, frame) -> tuple[Any, dict]:
    """Trained path: fold BN + quantise using the checkpoint's calibrated
    quant collection. Proxy path (no quant collection): 1-batch max calib
    on the serving pipeline's normalised input first."""
    if "quant" not in variables:
        calib_model = UninaYoloDla(cfg.with_quant("calib_max"))
        x = ensure_normalized(frame[None])
        _, mut = jax.jit(
            lambda v, xx: calib_model.apply(v, xx, train=False,
                                            mutable=["quant_calib"])
        )({k: variables[k] for k in ("params", "batch_stats")}, x)
        quant = select_amax(jax.device_get(mut["quant_calib"]), method="max")
        variables = dict(variables, quant=quant)
    folded = fold_batchnorm(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"],
         "quant": variables["quant"]})
    # deployed engine uses the measured-on-v5e mixed-precision list:
    # int8 where it wins (P3/P4), bf16 at the data-movement-bound 160^2
    # stages (see PERF_EXCLUDE rationale in quant/fake_quant.py)
    spec = QuantSpec(mode="int8_fused", exclude=PERF_EXCLUDE)
    int8_vars = quantize_weights_int8(folded, spec)
    model = UninaYoloDla(dataclasses.replace(cfg, deploy=True, quant=spec))
    return model, int8_vars


def build_engines(cfg, variables, frame, rng) -> dict:
    """Engine table. Default: headline + bf16 comparator; FULL: all."""
    from unina_yolo_dla_tpu.ops.preprocess import space_to_depth_np
    from unina_yolo_dla_tpu.quant.deploy import (
        fold_downsample_space_to_depth,
        merge_stem_columns,
    )

    bf16_model = UninaYoloDla(dataclasses.replace(cfg, deploy=True))
    bf16_vars = fold_batchnorm(
        {k: variables[k] for k in ("params", "batch_stats")})
    int8_model, int8_vars = build_int8_fused(cfg, variables, frame)

    s2dh_cfg = dataclasses.replace(cfg, deploy=True, stem_s2d=True,
                                   s2d_host=True, stage1_s2d=True)
    s2dh_bf16_vars = fold_downsample_space_to_depth(
        fold_stem_space_to_depth(bf16_vars))
    s2dh_int8_cfg = dataclasses.replace(
        int8_model.config, stem_s2d=True, s2d_host=True, stage1_s2d=True)
    s2dh_int8_vars = fold_downsample_space_to_depth(
        fold_stem_space_to_depth(int8_vars))
    frame_s2d = jnp.asarray(space_to_depth_np(np.asarray(frame)))

    # column-MERGED engines (s2d_merged): same host bytes viewed
    # (S/2,S/4,24); the stem matmul emits merged columns and stage1 is
    # the fused Pallas VMEM pass (ops/pallas/stage1_kernel.py)
    s2dm_cfg = dataclasses.replace(s2dh_cfg, s2d_merged=True)
    s2dm_bf16_vars = merge_stem_columns(s2dh_bf16_vars)
    s2dm_int8_cfg = dataclasses.replace(s2dh_int8_cfg, s2d_merged=True)
    s2dm_int8_vars = merge_stem_columns(s2dh_int8_vars)
    fs = np.asarray(frame_s2d)
    frame_s2dm = jnp.asarray(fs.reshape(fs.shape[0], fs.shape[1] // 2, 24))

    # fused-STEM merged engines (_fs): stem + stage1 in ONE Pallas VMEM
    # pass over the merged frame (ops/pallas/stem_kernel.py) — wins both
    # regimes in-graph on v5e (artifacts/fstem_b8.json: b8 6.83 -> 5.76
    # ms/batch, b1 0.710 -> 0.689 ms on-chip), graph-exact.
    s2dm_fs_cfg = dataclasses.replace(s2dm_cfg, fused_stem=True)
    s2dm_fs_int8_cfg = dataclasses.replace(s2dm_int8_cfg, fused_stem=True)
    # merged-head twins (the r5 default export; models/head.py _merged)
    s2dm_mh_cfg = dataclasses.replace(s2dm_cfg, merged_head=True)
    s2dm_fs_mh_int8_cfg = dataclasses.replace(s2dm_fs_int8_cfg,
                                              merged_head=True)

    # order matters: the budget guard keeps a PREFIX of this dict, so the
    # headline engine compiles first, its comparator second
    engines = {
        "int8_s2dm_fs_mh": (build_serving_fn(
            UninaYoloDla(s2dm_fs_mh_int8_cfg), s2dm_fs_mh_int8_cfg),
            s2dm_int8_vars, frame_s2dm),
        "bf16_s2dm_mh": (build_serving_fn(UninaYoloDla(s2dm_mh_cfg),
                                          s2dm_mh_cfg),
                         s2dm_bf16_vars, frame_s2dm),
    }
    if FULL or SMOKE:
        engines.update({
            "int8_s2dm_fs": (build_serving_fn(
                UninaYoloDla(s2dm_fs_int8_cfg), s2dm_fs_int8_cfg),
                s2dm_int8_vars, frame_s2dm),
            "bf16_s2dm": (build_serving_fn(UninaYoloDla(s2dm_cfg),
                                           s2dm_cfg),
                          s2dm_bf16_vars, frame_s2dm),
            "int8_s2dm": (build_serving_fn(UninaYoloDla(s2dm_int8_cfg),
                                           s2dm_int8_cfg),
                          s2dm_int8_vars, frame_s2dm),
            "bf16_s2dm_fs": (build_serving_fn(UninaYoloDla(s2dm_fs_cfg),
                                              s2dm_fs_cfg),
                             s2dm_bf16_vars, frame_s2dm),
            "int8_fused": (build_serving_fn(int8_model, cfg), int8_vars,
                           frame),
            "bf16_folded": (build_serving_fn(bf16_model, cfg), bf16_vars,
                            frame),
            "int8_s2dh": (build_serving_fn(
                UninaYoloDla(s2dh_int8_cfg), s2dh_int8_cfg),
                s2dh_int8_vars, frame_s2d),
            "bf16_s2dh": (build_serving_fn(
                UninaYoloDla(s2dh_cfg), s2dh_cfg),
                s2dh_bf16_vars, frame_s2d),
        })
    if os.environ.get("UNINA_BENCH_FC"):
        # fused-subgraph (_fc) engines: measured and retired in r4 —
        # every form LOSES end-to-end (artifacts/fcx_trace.json: bf16
        # 0.711 -> 0.813 ms XLA form / 1.134 Pallas; even the best
        # selective set is net neutral, the fused output layout costing
        # downstream convs what the fused region saves)
        s2dm_fc_cfg = dataclasses.replace(s2dm_cfg, fused_c3k2=True,
                                          fused_head=True)
        s2dm_fc_int8_cfg = dataclasses.replace(
            s2dm_int8_cfg, fused_c3k2=True, fused_head=True)
        engines["int8_s2dm_fc"] = (build_serving_fn(
            UninaYoloDla(s2dm_fc_int8_cfg), s2dm_fc_int8_cfg),
            s2dm_int8_vars, frame_s2dm)
        engines["bf16_s2dm_fc"] = (build_serving_fn(
            UninaYoloDla(s2dm_fc_cfg), s2dm_fc_cfg),
            s2dm_bf16_vars, frame_s2dm)
    if os.environ.get("UNINA_BENCH_PALLAS_OPS"):
        # retired on evidence (BENCH_r02: 2.79 vs 1.18 ms — the Pallas
        # decode/NMS variants lose to the XLA-fused ops); keep the
        # code path drivable without paying ~2 min every driver run
        engines["pallas_bf16"] = (build_serving_fn(
            bf16_model, cfg, use_pallas_kernels=True), bf16_vars, frame)
    return engines, bf16_model, bf16_vars, int8_model, int8_vars


def run_traces(engines, bf16_model, bf16_vars, rng, s) -> str | None:
    """Profiler trace set (FULL mode only — ~6 extra compiles)."""
    from unina_yolo_dla_tpu.utils.profiling import trace

    trace_dir = None
    for name, run_dir in (("bf16_folded", "runs/bench_trace"),
                          ("int8_fused", "runs/bench_trace_int8"),
                          ("bf16_s2dh", "runs/bench_trace_s2d"),
                          ("int8_s2dm", "runs/bench_trace_s2dm"),
                          ("int8_s2dm_fs", "runs/bench_trace_s2dm_fs")):
        if name not in engines or time_left() < 40:
            continue
        serve, v, f = engines[name]
        loop = make_loop(serve, 50)
        with trace(run_dir) as d:
            float(loop(v, f, next_salt()))
        trace_dir = trace_dir or d
    if time_left() > 60:
        # batch-8 forward trace: the per-op bytes/flops behind the
        # "HBM-saturated past b8" claim (analyse with tools/layer_table.py)
        xb = jnp.asarray(rng.normal(0, 1, (8, s, s, 3)).astype(np.float32))

        @jax.jit
        def loop8(v, xx, salt):
            def it(i, acc):
                outs = bf16_model.apply(v, xx + (i + salt) * 1e-6,
                                        train=False)
                return acc + sum(o.sum() for pr in outs for o in pr)
            return lax.fori_loop(0, 10, it, jnp.float32(0.0))

        float(loop8(bf16_vars, xb, next_salt()))
        with trace("runs/bench_trace_b8") as _:
            float(loop8(bf16_vars, xb, next_salt()))
    return trace_dir


def main() -> None:
    import tempfile

    cfg = ModelConfig(num_classes=4, base_channels=32, input_size=640)
    if SMOKE:
        cfg = ModelConfig(num_classes=4, base_channels=16, input_size=64)
    s = cfg.input_size
    variables, weights_source = load_source_variables(cfg)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 256, (s, s, 3), dtype=np.uint8))

    detail: dict[str, Any] = {
        "mode": "full" if FULL else ("smoke" if SMOKE else "default"),
        "weights": weights_source, "budget_s": BUDGET_S,
        "rounds": N_ROUNDS, "loop_lengths": list(LOOP_LENGTHS),
        "baseline_ms": BASELINE_MS, "batch": 1, "input": s,
        "device": str(jax.devices()[0]),
        "pipeline": "preprocess+forward+decode+fixpoint_greedy_nms",
    }

    def flush(**kw):
        detail.update(kw)
        detail["elapsed_s"] = round(time.monotonic() - _T0, 1)
        try:
            ARTIFACT.parent.mkdir(parents=True, exist_ok=True)
            ARTIFACT.write_text(json.dumps(detail, indent=1))
        except Exception as e:
            print(f"WARNING: artifact flush failed: {e}", flush=True)

    flush()
    engines, bf16_model, bf16_vars, int8_model, int8_vars = build_engines(
        cfg, variables, frame, rng)
    results, iqrs, rounds = measure_interleaved(
        engines, np.random.default_rng(7), flush)
    flush(engines_ms={k: (round(v, 3) if v else None)
                      for k, v in results.items()},
          iqr_ms={k: (round(v, 3) if v is not None else None)
                  for k, v in iqrs.items()},
          per_round_ms=rounds)

    ok = {k: v for k, v in results.items() if v is not None}
    if not ok:
        print(json.dumps({"metric": "frame_to_boxes_latency", "value": None,
                          "unit": "ms", "vs_baseline": None,
                          "extra": {"error": "no engine measured",
                                    "detail": str(ARTIFACT)}}))
        return
    fastest_name = min(ok, key=ok.get)
    # Headline = the engine the committed default export ships (see
    # module docstring); session-fastest is recorded alongside.
    best_name = HEADLINE_ENGINE if ok.get(HEADLINE_ENGINE) else fastest_name
    value = ok[best_name]

    # int8-vs-bf16 ordering with a significance call: the orderings only
    # count when the two engines' IQR intervals do not overlap
    def pair_ab(a, b):
        if not (results.get(a) and results.get(b)):
            return None
        d = results[a] - results[b]
        sep = abs(d) > (iqrs[a] + iqrs[b]) / 2
        return {"delta_ms": round(d, 3), "faster": a if d < 0 else b,
                "significant": bool(sep)}

    flush(ab={"mh_vs_bf16_mh": pair_ab("int8_s2dm_fs_mh", "bf16_s2dm_mh"),
              "mh_vs_fs_int8": pair_ab("int8_s2dm_fs_mh", "int8_s2dm_fs"),
              "int8_vs_bf16": pair_ab("int8_fused", "bf16_folded"),
              "int8_vs_bf16_s2dh": pair_ab("int8_s2dh", "bf16_s2dh"),
              "s2dh_vs_std_stem": pair_ab("bf16_s2dh", "bf16_folded"),
              "s2dm_vs_s2dh_int8": pair_ab("int8_s2dm", "int8_s2dh"),
              "fs_vs_s2dm_int8": pair_ab("int8_s2dm_fs", "int8_s2dm"),
              "fc_vs_s2dm_int8": pair_ab("int8_s2dm_fc", "int8_s2dm")})

    # --- batch-8 serving through the exported artifact ---
    b8 = None
    if time_left() > 45 or SMOKE:
        with tempfile.TemporaryDirectory() as td:
            b8 = measure_batch8_artifact(int8_model, int8_vars, cfg, td)
        flush(batch8_artifact=b8)

    # --- analytic FLOPs + MFU of the measured engines ---
    mfu, flops1, fps8 = {}, None, float("nan")
    if time_left() > 45 or SMOKE:
        flops1 = forward_flops(bf16_model, bf16_vars, 1)
        kind = jax.devices()[0].device_kind
        peaks = next((v for k, v in PEAK_FLOPS.items() if k in kind), None)
        if flops1:
            for name, dt in ok.items():
                dtype = "int8" if "int8" in name else "bf16"
                achieved = flops1 / (dt * 1e-3)
                mfu[name] = {
                    "achieved_tflops": round(achieved / 1e12, 2),
                    "mfu_pct": (round(100 * achieved / peaks[dtype], 2)
                                if peaks else None),
                }
        flush(forward_gflops_per_frame=(round(flops1 / 1e9, 2)
                                        if flops1 else None), mfu=mfu)
    if FULL and time_left() > 60:
        # model-forward throughput ceiling (no decode/NMS), batch 8
        fps8 = measure_throughput(bf16_model, bf16_vars, rng)
        if flops1 and fps8 == fps8:
            kind = jax.devices()[0].device_kind
            peaks = next((v for k, v in PEAK_FLOPS.items() if k in kind),
                         None)
            mfu["batch8_forward"] = {
                "achieved_tflops": round(flops1 * fps8 / 1e12, 2),
                "mfu_pct": (round(100 * flops1 * fps8 / peaks["bf16"], 2)
                            if peaks else None),
            }
        flush(batch8_forward_fps=(round(fps8, 0) if fps8 == fps8 else None),
              mfu=mfu)

    # --- profiler trace artifacts (FULL mode; tolerate unavailability) ---
    trace_dir = None
    if FULL and time_left() > 60:
        try:
            trace_dir = run_traces(engines, bf16_model, bf16_vars, rng, s)
        except Exception as e:
            print(f"WARNING: profiler trace failed: {e}", flush=True)
        flush(profiler_trace=trace_dir)

    hl_mfu = mfu.get(best_name) or {}
    flush(headline={"engine": best_name, "ms": round(value, 3)},
          fastest_measured={"engine": fastest_name,
                            "ms": round(ok[fastest_name], 3)})
    # COMPACT final line (~400 bytes): the driver's tail capture truncated
    # r3's kitchen-sink line; everything else lives in the artifact file.
    print(json.dumps({
        "metric": "frame_to_boxes_latency",
        "value": round(value, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / value, 3),
        "extra": {"engine": best_name,
                  "iqr_ms": (round(iqrs[best_name], 3)
                             if iqrs.get(best_name) is not None else None),
                  "engines_ms": {k: (round(v, 3) if v else None)
                                 for k, v in results.items()},
                  "rounds": len(next(iter(rounds.values()), [])),
                  "weights": weights_source,
                  "batch8_artifact_fps": (b8 or {}).get("fps"),
                  "mfu_pct": hl_mfu.get("mfu_pct"),
                  "elapsed_s": round(time.monotonic() - _T0, 1),
                  "detail": str(ARTIFACT.relative_to(_REPO)
                                if ARTIFACT.is_relative_to(_REPO)
                                else ARTIFACT)},
    }))


if __name__ == "__main__":
    main()
