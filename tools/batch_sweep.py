"""Throughput-vs-batch sweep for the default (fused-stem) engine.

Round 4 reclaimed the batched regime: the column-merged view needs no
on-device transpose and the fused stem removes the batched pad-fusion
cost (committed b8 artifact: 1,388 fps). This sweep asks the next
question — is batch 8 actually the throughput-optimal point, or does
the curve keep rising? Measures the DEFAULT-EXPORT engine (int8 merged
+ fused stem) at B in {1,2,4,8,16,32} through build_batch_serving_fn
(preprocess+forward+decode+NMS per frame), salted fori_loop + slope
fit, interleaved rounds. Reference role: the multi-camera deployment
premise (SURVEY §2 #24) — pick the batch that maximises frames/sec at
acceptable per-batch latency.
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
    fold_downsample_space_to_depth,
    fold_stem_space_to_depth,
    merge_stem_columns,
)
from unina_yolo_dla_tpu.runtime.pipeline import build_batch_serving_fn

BATCHES = tuple(int(x) for x in (sys.argv[1].split(",") if len(sys.argv) > 1
                                 else ("1", "2", "4", "8", "16", "32")))
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
LOOPS = (10, 30, 50)


def make_loop(serve, n):
    # mirrors bench.make_loop: the per-call salt makes every dispatch's
    # args unique so the caching relay cannot memoize repeated timed
    # calls (ADVICE r4: the unsalted sweep showed the corruption
    # signature — b1 slope 0.005 ms, negative slopes, b8 38% below the
    # salted shipped number)
    @jax.jit
    def loop(v, frames, salt):
        def body(i, acc):
            f = frames ^ ((i + salt) % 7).astype(jnp.uint8)
            d = serve(v, f)
            return acc + d.scores.sum() + d.valid.sum()
        return lax.fori_loop(0, n, body, jnp.float32(0.0))
    return loop


def main():
    cfg = ModelConfig(num_classes=4, base_channels=32, input_size=640)
    s = cfg.input_size
    variables, src = bench.load_source_variables(cfg)
    rng = np.random.default_rng(0)

    int8_model, int8_vars = bench.build_int8_fused(
        cfg, variables, jnp.asarray(
            rng.integers(0, 256, (s, s, 3), dtype=np.uint8)))
    fcfg = dataclasses.replace(
        int8_model.config, stem_s2d=True, s2d_host=True, stage1_s2d=True,
        s2d_merged=True, fused_stem=True)
    fvars = merge_stem_columns(fold_downsample_space_to_depth(
        fold_stem_space_to_depth(int8_vars)))
    serve = build_batch_serving_fn(UninaYoloDla(fcfg), fcfg)

    frames = {}
    for b in BATCHES:
        raw = rng.integers(0, 256, (b, s, s, 3), dtype=np.uint8)
        merged = space_to_depth_np(raw).reshape(b, s // 2, s // 4, 24)
        frames[b] = jnp.asarray(merged)

    loops = {}
    for b in BATCHES:
        ls = {n: make_loop(serve, n) for n in LOOPS}
        for l in ls.values():
            float(l(fvars, frames[b], bench.next_salt()))
            float(l(fvars, frames[b], bench.next_salt()))
        loops[b] = ls

    per_round = {b: [] for b in BATCHES}
    order_rng = np.random.default_rng(5)
    for _ in range(ROUNDS):
        order = list(BATCHES)
        order_rng.shuffle(order)
        for b in order:
            mins = {}
            for n in LOOPS:
                salt = bench.next_salt()
                t0 = time.perf_counter()
                float(loops[b][n](fvars, frames[b], salt))
                mins[n] = time.perf_counter() - t0
            per_round[b].append(bench.fit_slope(mins)[0])

    out = {"weights": src, "engine": "int8_s2dm_fstem", "rounds": ROUNDS}
    for b, slopes in per_round.items():
        good = [x for x in slopes if x > 0]
        med = float(np.median(good)) if good else None
        q1, q3 = (np.percentile(good, [25, 75]) if good else (0, 0))
        out[f"b{b}"] = {
            "ms_per_batch": round(med, 3) if med else None,
            "iqr": round(float(q3 - q1), 3),
            "fps": round(b / (med * 1e-3), 0) if med else None,
            "ms_per_frame": round(med / b, 3) if med else None,
            "per_round": [round(x, 3) for x in slopes]}
    path = pathlib.Path(__file__).resolve().parents[1] / "artifacts" / \
        "batch_sweep_r5.json"
    path.write_text(json.dumps(out))
    print(json.dumps(out))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
