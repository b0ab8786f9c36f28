"""Name the op behind the b16 step regression.

`tools/batch_sweep.py` (artifacts/batch_sweep_r4.json) measured the
default fused-stem engine's per-frame cost REVERSING past batch 8:
b16 = 14.9 ms/batch (0.93 ms/frame) vs b8 = 5.8 (0.72). Round 3 caught
the same class at b8 with the standard stem (`backbone/stage1_conv`
re-tiling, layer_table_b8.json) — this probe traces the b16 batched
serving graph and rolls up per-group device time so the regressing
lowering is named rather than guessed. Run on the live TPU:

    python tools/b16_trace.py [batch] [iters]
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
from tools.layer_table import (
    build_table,
    find_xplane,
    parse_device_ops,
    rollup_by_group,
)
from unina_yolo_dla_tpu.models import ModelConfig
from unina_yolo_dla_tpu.models.detector import UninaYoloDla
from unina_yolo_dla_tpu.ops.preprocess import space_to_depth_np
from unina_yolo_dla_tpu.quant.deploy import (
    fold_downsample_space_to_depth,
    fold_stem_space_to_depth,
    merge_stem_columns,
)
from unina_yolo_dla_tpu.runtime.pipeline import build_batch_serving_fn
from unina_yolo_dla_tpu.utils.profiling import trace

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 30


def main():
    cfg = ModelConfig(num_classes=4, base_channels=32, input_size=640)
    s = cfg.input_size
    variables, src = bench.load_source_variables(cfg)
    print(f"weights: {src}  batch: {B}", flush=True)
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

    raw = rng.integers(0, 256, (B, s, s, 3), dtype=np.uint8)
    frames = jnp.asarray(space_to_depth_np(raw).reshape(B, s // 2,
                                                        s // 4, 24))

    # salt threaded per call (ADVICE r4): an unsalted traced call repeats
    # the warm-up call's byte-identical args, so the caching relay can
    # short-circuit it and the xplane rollup would profile a no-op
    @jax.jit
    def loop(v, f, salt):
        def body(i, acc):
            d = serve(v, f ^ ((i + salt) % 7).astype(jnp.uint8))
            return acc + d.scores.sum() + d.valid.sum()
        return lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(loop(fvars, frames, bench.next_salt()))  # warm/compile
    tdir = f"runs/b{B}_fstem_trace"
    with trace(tdir):
        float(loop(fvars, frames, bench.next_salt()))

    xp = find_xplane(tdir)
    ops = parse_device_ops(xp)
    ops = [o for o in ops
           if o["category"] not in ("while", "conditional", "call")
           and o["op"].split(".")[0] not in ("while", "conditional")]
    total = sum(o["total_ms"] for o in ops)
    rows, _ = build_table(ops, 14, ITERS)
    groups = rollup_by_group(ops)
    print(f"\n=== b{B}: {total / ITERS:.4f} ms/batch on-chip "
          f"({total / ITERS / B:.4f} ms/frame) ===", flush=True)
    for g in groups[:14]:
        print(g, flush=True)
    out = {"batch": B, "iters": ITERS, "weights": src,
           "device_ms_per_batch": round(total / ITERS, 4),
           "top_ops": rows, "groups": groups}
    path = pathlib.Path(f"artifacts/b{B}_trace_r5.json")
    path.write_text(json.dumps(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
