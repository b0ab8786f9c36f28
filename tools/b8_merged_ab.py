"""Batch-8 A/B: standard stem vs the column-MERGED engine.

The s2d_host+stage1_s2d transforms LOSE at batch 8 (9.2 vs 7.5 ms/batch
— the on-device transpose's bytes scale with batch, RESULTS.md), which
is why the committed b8 artifact ships the standard stem. The merged
engine has NO on-device transpose at all (host bytes arrive merged, the
fused stage1 reads them once in VMEM), so it may reclaim the batched
regime. Measures forward+decode+NMS per batch through build_batch_
serving_fn for four engines: std / s2dh / s2dm / s2dm_fc (int8
variants), slope method, interleaved rounds.
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

B = 8
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 7
LOOPS = (10, 30, 50)


def make_loop(serve, n):
    @jax.jit
    def loop(v, frames):
        def body(i, acc):
            f = frames ^ (i % 7).astype(jnp.uint8)
            d = serve(v, f)
            return acc + d.scores.sum() + d.valid.sum()
        return lax.fori_loop(0, n, body, jnp.float32(0.0))
    return loop


def main():
    cfg = ModelConfig(num_classes=4, base_channels=32, input_size=640)
    s = cfg.input_size
    variables, src = bench.load_source_variables(cfg)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (B, s, s, 3), dtype=np.uint8)

    frame_std = jnp.asarray(frames)
    fs = space_to_depth_np(frames)
    frame_s2d = jnp.asarray(fs)
    frame_s2dm = jnp.asarray(fs.reshape(B, s // 2, s // 4, 24))

    int8_model, int8_vars = bench.build_int8_fused(
        cfg, variables, jnp.asarray(frames[0]))
    s2dh_cfg = dataclasses.replace(int8_model.config, stem_s2d=True,
                                   s2d_host=True, stage1_s2d=True)
    s2dh_vars = fold_downsample_space_to_depth(
        fold_stem_space_to_depth(int8_vars))
    s2dm_cfg = dataclasses.replace(s2dh_cfg, s2d_merged=True)
    s2dm_vars = merge_stem_columns(s2dh_vars)
    # fully-fused variant: the float-path C3k2s/head as one VMEM pass
    # EACH SAMPLE (the primitive's batch rule vmaps the unbatched kernel)
    # — at b8 that is 8 sequential VMEM passes vs XLA's batched convs,
    # so the batched regime needs its own measurement.
    s2dm_fc_cfg = dataclasses.replace(s2dm_cfg, fused_c3k2=True,
                                      fused_head=True)

    engines = {
        "int8_std_b8": (build_batch_serving_fn(int8_model,
                                               int8_model.config),
                        int8_vars, frame_std),
        "int8_s2dh_b8": (build_batch_serving_fn(UninaYoloDla(s2dh_cfg),
                                                s2dh_cfg),
                         s2dh_vars, frame_s2d),
        "int8_s2dm_b8": (build_batch_serving_fn(UninaYoloDla(s2dm_cfg),
                                                s2dm_cfg),
                         s2dm_vars, frame_s2dm),
        "int8_s2dm_fc_b8": (build_batch_serving_fn(
            UninaYoloDla(s2dm_fc_cfg), s2dm_fc_cfg),
                            s2dm_vars, frame_s2dm),
    }

    loops = {}
    for name, (serve, v, f) in engines.items():
        ls = {n: make_loop(serve, n) for n in LOOPS}
        for l in ls.values():
            float(l(v, f)); float(l(v, f))
        loops[name] = ls

    per_round = {k: [] for k in engines}
    order_rng = np.random.default_rng(5)
    for _ in range(ROUNDS):
        order = list(engines)
        order_rng.shuffle(order)
        for name in order:
            _, v, f = engines[name]
            mins = {}
            for n in LOOPS:
                t0 = time.perf_counter()
                float(loops[name][n](v, f))
                mins[n] = time.perf_counter() - t0
            per_round[name].append(bench.fit_slope(mins)[0])

    out = {"weights": src, "batch": B, "rounds": ROUNDS}
    for name, slopes in per_round.items():
        good = [x for x in slopes if x > 0]
        med = float(np.median(good)) if good else None
        q1, q3 = (np.percentile(good, [25, 75]) if good else (0, 0))
        out[name] = {"ms_per_batch": round(med, 3) if med else None,
                     "iqr": round(float(q3 - q1), 3),
                     "fps": round(B / (med * 1e-3), 0) if med else None,
                     "per_round": [round(x, 3) for x in slopes]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
