"""Focused interleaved A/B: the four s2d engines (s2dh/s2dm x bf16/int8),
more rounds than bench.py, same harness — settles the merged-engine
ordering with tighter spreads than the 7-engine bench run.

Prints one JSON line (engines_ms / iqr_ms / per_round_ms).
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import dataclasses
import json

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

bench.N_ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 9


def main():
    cfg = ModelConfig(num_classes=4, base_channels=32, input_size=640)
    s = cfg.input_size
    variables, src = bench.load_source_variables(cfg)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 256, (s, s, 3), dtype=np.uint8))

    bf16_vars = fold_batchnorm(
        {k: variables[k] for k in ("params", "batch_stats")})
    int8_model, int8_vars = bench.build_int8_fused(cfg, variables, frame)

    s2dh_cfg = dataclasses.replace(cfg, deploy=True, stem_s2d=True,
                                   s2d_host=True, stage1_s2d=True)
    s2dh_bf16_vars = fold_downsample_space_to_depth(
        fold_stem_space_to_depth(bf16_vars))
    s2dh_int8_cfg = dataclasses.replace(
        int8_model.config, stem_s2d=True, s2d_host=True, stage1_s2d=True)
    s2dh_int8_vars = fold_downsample_space_to_depth(
        fold_stem_space_to_depth(int8_vars))
    s2dm_cfg = dataclasses.replace(s2dh_cfg, s2d_merged=True)
    s2dm_int8_cfg = dataclasses.replace(s2dh_int8_cfg, s2d_merged=True)

    fs = space_to_depth_np(np.asarray(frame))
    frame_s2d = jnp.asarray(fs)
    frame_s2dm = jnp.asarray(fs.reshape(fs.shape[0], fs.shape[1] // 2, 24))

    # fused-C3k2 variants: the same merged engines with every float-path
    # C3k2 as one VMEM pass (ops/pallas/c3k2_kernel.py) — in the int8
    # engine that is exactly the PERF_EXCLUDE 160^2 blocks
    s2dm_fc_cfg = dataclasses.replace(s2dm_cfg, fused_c3k2=True,
                                      fused_head=True)
    s2dm_fc_int8_cfg = dataclasses.replace(s2dm_int8_cfg, fused_c3k2=True,
                                           fused_head=True)

    engines = {
        "bf16_s2dh": (build_serving_fn(UninaYoloDla(s2dh_cfg), s2dh_cfg),
                      s2dh_bf16_vars, frame_s2d),
        "bf16_s2dm": (build_serving_fn(UninaYoloDla(s2dm_cfg), s2dm_cfg),
                      merge_stem_columns(s2dh_bf16_vars), frame_s2dm),
        "int8_s2dh": (build_serving_fn(UninaYoloDla(s2dh_int8_cfg),
                                       s2dh_int8_cfg),
                      s2dh_int8_vars, frame_s2d),
        "int8_s2dm": (build_serving_fn(UninaYoloDla(s2dm_int8_cfg),
                                       s2dm_int8_cfg),
                      merge_stem_columns(s2dh_int8_vars), frame_s2dm),
        "bf16_s2dm_fc": (build_serving_fn(UninaYoloDla(s2dm_fc_cfg),
                                          s2dm_fc_cfg),
                         merge_stem_columns(s2dh_bf16_vars), frame_s2dm),
        "int8_s2dm_fc": (build_serving_fn(UninaYoloDla(s2dm_fc_int8_cfg),
                                          s2dm_fc_int8_cfg),
                         merge_stem_columns(s2dh_int8_vars), frame_s2dm),
    }
    medians, iqrs, rounds = bench.measure_interleaved(
        engines, np.random.default_rng(11))
    print(json.dumps({"weights": src, "rounds": bench.N_ROUNDS,
                      "engines_ms": medians, "iqr_ms": iqrs,
                      "per_round_ms": rounds}))


if __name__ == "__main__":
    main()
