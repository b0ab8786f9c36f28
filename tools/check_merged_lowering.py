import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import dataclasses
import jax, jax.numpy as jnp, numpy as np
from unina_yolo_dla_tpu.models import ModelConfig, init_model
from unina_yolo_dla_tpu.models.detector import UninaYoloDla
from unina_yolo_dla_tpu.quant.deploy import (
    fold_batchnorm, fold_downsample_space_to_depth,
    fold_stem_space_to_depth, merge_stem_columns)
from unina_yolo_dla_tpu.runtime.pipeline import build_serving_fn

print("default_backend:", jax.default_backend())
cfg = ModelConfig(num_classes=4, base_channels=32, input_size=640)
_, variables = init_model(jax.random.key(0), cfg)
m_vars = merge_stem_columns(fold_downsample_space_to_depth(
    fold_stem_space_to_depth(fold_batchnorm(
        {k: variables[k] for k in ("params", "batch_stats")}))))
m_cfg = dataclasses.replace(cfg, deploy=True, stem_s2d=True, s2d_host=True,
                            stage1_s2d=True, s2d_merged=True)
serve = build_serving_fn(UninaYoloDla(m_cfg), m_cfg)
frame = jnp.zeros((320, 160, 24), jnp.uint8)
txt = jax.jit(serve).lower(m_vars, frame).as_text()
n = txt.count("tpu_custom_call")
print("tpu_custom_call count in lowered serve:", n)
