"""lite_p2 x s2d variant session (RESULTS variant-table refresh)."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import dataclasses, time
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from unina_yolo_dla_tpu.models import ModelConfig
from unina_yolo_dla_tpu.models.detector import UninaYoloDla, init_model
from unina_yolo_dla_tpu.quant.deploy import (fold_batchnorm,
    fold_stem_space_to_depth, fold_downsample_space_to_depth)
from unina_yolo_dla_tpu.runtime.pipeline import build_serving_fn
from unina_yolo_dla_tpu.ops.preprocess import space_to_depth_np

rng = np.random.default_rng(0)
frame = jnp.asarray(rng.integers(0, 256, (640, 640, 3), np.uint8))
frame_b = jnp.asarray(space_to_depth_np(np.asarray(frame)))

def slope(serve, v, f):
    def mk(n):
        @jax.jit
        def loop(vv, ff):
            def body(i, acc):
                d = serve(vv, ff ^ (i % 7).astype(jnp.uint8))
                return acc + d.scores.sum() + d.valid.sum()
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        return loop
    ts = {}
    for n in (100, 300, 500):
        l = mk(n); float(l(v, f)); float(l(v, f))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter(); float(l(v, f)); best = min(best, time.perf_counter()-t0)
        ts[n] = best
    ns = sorted(ts)
    return float(np.median([(ts[b]-ts[a])/(b-a) for i,a in enumerate(ns) for b in ns[i+1:]]))*1e3

for lite in (False, True):
    cfg = ModelConfig(num_classes=4, base_channels=32, input_size=640, lite_p2=lite)
    _, variables = init_model(jax.random.key(0), cfg)
    folded = fold_batchnorm(variables)
    dep = dataclasses.replace(cfg, deploy=True)
    s = slope(build_serving_fn(UninaYoloDla(dep), dep), folded, frame)
    s2dh = dataclasses.replace(cfg, deploy=True, stem_s2d=True, s2d_host=True, stage1_s2d=True)
    v2 = fold_downsample_space_to_depth(fold_stem_space_to_depth(folded))
    s2 = slope(build_serving_fn(UninaYoloDla(s2dh), s2dh), v2, frame_b)
    print(f"lite_p2={lite}: bf16 std {s:.3f} ms | bf16 s2d(stem+stage1) {s2:.3f} ms", flush=True)
