"""On-chip trace of the shipped merged-head engine (b1, full pipeline).

The merged-head A/B (`artifacts/merged_head_ab.json`) measured a
bigger end-to-end win (−0.32 ms) than head_p2's 17.5% device share
predicted (~0.12 ms) — through a noisy relay. This traces the shipped
engine (int8 + s2d-merged + fused-stem + merged-head) on-chip and
rolls up per-group device time, superseding
`artifacts/layer_table_s2dm.json` as the current-engine profile and
settling how much of the A/B delta is device time vs transport luck.

    python tools/mh_trace.py [iters]

Writes artifacts/layer_table_mh.json.
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import bench
from tools.layer_table import find_xplane, parse_device_ops, rollup_by_group
from unina_yolo_dla_tpu.models import ModelConfig
from unina_yolo_dla_tpu.models.detector import UninaYoloDla
from unina_yolo_dla_tpu.ops.preprocess import space_to_depth_np
from unina_yolo_dla_tpu.quant.deploy import (
    fold_downsample_space_to_depth,
    fold_stem_space_to_depth,
    merge_stem_columns,
)
from unina_yolo_dla_tpu.runtime.pipeline import build_serving_fn
from unina_yolo_dla_tpu.utils.profiling import trace

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 50


def main():
    cfg = ModelConfig(num_classes=4, base_channels=32, input_size=640)
    s = cfg.input_size
    variables, src = bench.load_source_variables(cfg)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 256, (s, s, 3), dtype=np.uint8))

    _, int8_vars = bench.build_int8_fused(cfg, variables, frame)
    mvars = merge_stem_columns(fold_downsample_space_to_depth(
        fold_stem_space_to_depth(int8_vars)))
    ecfg = dataclasses.replace(
        cfg, deploy=True, stem_s2d=True, s2d_host=True, stage1_s2d=True,
        s2d_merged=True, fused_stem=True, merged_head=True,
        quant=bench.QuantSpec(mode="int8_fused",
                              exclude=bench.PERF_EXCLUDE))
    serve = build_serving_fn(UninaYoloDla(ecfg), ecfg)
    fs = np.asarray(space_to_depth_np(np.asarray(frame)))
    fm = jnp.asarray(fs.reshape(fs.shape[0], fs.shape[1] // 2, 24))

    @jax.jit
    def loop(v, f, salt):
        def body(i, acc):
            d = serve(v, f ^ ((i + salt) % 7).astype(jnp.uint8))
            return acc + d.scores.sum() + d.valid.sum()
        return lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(loop(mvars, fm, bench.next_salt()))
    tdir = "runs/mh_trace"
    with trace(tdir):
        float(loop(mvars, fm, bench.next_salt()))

    ops = parse_device_ops(find_xplane(tdir))
    ops = [o for o in ops
           if o["category"] not in ("while", "conditional", "call")
           and o["op"].split(".")[0] not in ("while", "conditional")]
    total = sum(o["total_ms"] for o in ops)
    groups = rollup_by_group(ops)
    print(f"=== merged-head engine: {total / ITERS:.4f} ms/frame "
          "on-chip ===", flush=True)
    for g in groups[:16]:
        print(g, flush=True)
    out = {"iters": ITERS, "weights": src, "engine": "int8_s2dm_fs_mh",
           "device_ms_per_frame": round(total / ITERS, 4),
           "groups": groups}
    path = pathlib.Path("artifacts/layer_table_mh.json")
    path.write_text(json.dumps(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
