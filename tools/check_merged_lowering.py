"""Confirm the Pallas fused kernels are IN the lowered tpu serve graph.

Two modes:
  - live (default on a tpu/axon session): jit-lower for the current
    backend and count `tpu_custom_call` sites.
  - cross (`--export`, works relay-free on the CPU backend): lower the
    SAME serving fn through jax.export with platforms=("tpu",) — the
    per-platform primitives (fused_stage1_p, fused_c3k2_p,
    fused_c3k2_cat_p, fused_head_p) take their tpu lowering, so the
    count proves which form ships in the artifact's tpu branch without
    needing the relay.

Expected counts (int8 engine, base_channels=32):
  s2dm     : 1  (fused stage1)
  s2dm_fc  : 1 + 2 fused C3k2 (stage1_block, fpn_c3k2_2) + 1 fused head
             (head_p2) = 4  — the PERF/DEFAULT_EXCLUDE float subgraphs.
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import dataclasses
import jax, jax.numpy as jnp
from unina_yolo_dla_tpu.models import ModelConfig
from unina_yolo_dla_tpu.models.detector import UninaYoloDla
from unina_yolo_dla_tpu.quant.deploy import (
    fold_batchnorm, fold_downsample_space_to_depth,
    fold_stem_space_to_depth, merge_stem_columns, quantize_weights_int8)
from unina_yolo_dla_tpu.quant.fake_quant import PERF_EXCLUDE, QuantSpec
from unina_yolo_dla_tpu.runtime.pipeline import build_serving_fn
from unina_yolo_dla_tpu.utils.checkpoint import load_msgpack_raw

cross = "--export" in sys.argv
print("default_backend:", jax.default_backend(), "mode:",
      "cross-export(tpu)" if cross else "live")

cfg = ModelConfig(num_classes=4, base_channels=32, input_size=640)
variables = load_msgpack_raw("artifacts/engine_source.msgpack")
qspec = QuantSpec(mode="int8_fused", exclude=PERF_EXCLUDE)
int8 = quantize_weights_int8(fold_batchnorm(variables), qspec)
m_vars = merge_stem_columns(fold_downsample_space_to_depth(
    fold_stem_space_to_depth(int8)))
base = dataclasses.replace(cfg, deploy=True, quant=qspec, stem_s2d=True,
                           s2d_host=True, stage1_s2d=True, s2d_merged=True)
frame = jnp.zeros((320, 160, 24), jnp.uint8)

for name, m_cfg in (
        ("int8_s2dm", base),
        ("int8_s2dm_fc", dataclasses.replace(base, fused_c3k2=True,
                                             fused_head=True))):
    serve = build_serving_fn(UninaYoloDla(m_cfg), m_cfg)
    if cross:
        from jax import export as jexport
        exp = jexport.export(jax.jit(serve), platforms=("tpu",))(
            m_vars, frame)
        txt = exp.mlir_module()
    else:
        txt = jax.jit(serve).lower(m_vars, frame).as_text()
    print(f"{name}: tpu_custom_call count = {txt.count('tpu_custom_call')}")
