"""Merged decoupled head (``ModelConfig.merged_head``) equivalence tests.

The merged form rewrites each float-path head level's two branches as
channel-concat / block-diagonal convs (models/head.py:_merged) — the
same math with full MXU-lane occupancy and single reads of the shared
activations. The param tree is unchanged, so these tests build BOTH
forms from the same folded checkpoint and require equal outputs up to
accumulation-order rounding (the zero blocks contribute exact zeros,
but a K=2h reduction tree may round differently than K=h — measured
max |delta| ~5e-7 on f32 logits of scale ~5).

Reference role: the decoupled head contract is model.py:274-303; the
merged form must be indistinguishable at the output level.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unina_yolo_dla_tpu.models import ModelConfig, init_model
from unina_yolo_dla_tpu.models.detector import UninaYoloDla
from unina_yolo_dla_tpu.quant.deploy import fold_batchnorm

IMG = 64


@pytest.fixture(scope="module")
def folded_setup():
    cfg = ModelConfig(num_classes=4, base_channels=16, input_size=IMG,
                      compute_dtype=jnp.float32)
    model, variables = init_model(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, IMG, IMG, 3)) * 2 + 0.5
    for _ in range(2):
        _, upd = model.apply(variables, x, train=True,
                             mutable=["batch_stats"])
        variables = {**variables, "batch_stats": upd["batch_stats"]}
    folded = fold_batchnorm(
        {k: variables[k] for k in ("params", "batch_stats")})
    return cfg, folded


def test_merged_head_matches_standard_float(folded_setup):
    """Float deploy graph: merged and standard heads agree to
    accumulation-order rounding (~1e-6 on logits of scale ~5)."""
    cfg, folded = folded_setup
    std = UninaYoloDla(dataclasses.replace(cfg, deploy=True))
    mrg = UninaYoloDla(dataclasses.replace(cfg, deploy=True,
                                           merged_head=True))
    x = jax.random.normal(jax.random.key(2), (1, IMG, IMG, 3))
    ref = std.apply(folded, x, train=False)
    out = mrg.apply(folded, x, train=False)
    for (rc, rr), (mc, mr) in zip(ref, out):
        np.testing.assert_allclose(np.asarray(rc), np.asarray(mc),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rr), np.asarray(mr),
                                   rtol=1e-5, atol=1e-5)


def test_merged_head_param_tree_identical(folded_setup):
    """init under merged_head yields the standard head param tree —
    checkpoints load either way."""
    cfg, folded = folded_setup
    mrg = UninaYoloDla(dataclasses.replace(cfg, deploy=True,
                                           merged_head=True))
    x = jnp.zeros((1, IMG, IMG, 3))
    init_vars = mrg.init(jax.random.key(0), x, train=False)

    def names(tree, prefix=""):
        out = set()
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out |= names(v, p)
            else:
                out.add(p)
        return out

    got = {n for n in names(init_vars["params"]) if "head" in n}
    want = {n for n in names(folded["params"]) if "head" in n}
    assert got == want


def test_merged_head_int8_engine_respects_quant_exclusion(folded_setup):
    """In the PERF_EXCLUDE int8 engine only head_p2 is float — merged
    applies there, quantized p3/p4 keep the standard path; detector
    outputs must match the unmerged engine (same tolerance as the
    float test — only the float head_p2 path differs)."""
    from unina_yolo_dla_tpu.quant.calibrate import select_amax
    from unina_yolo_dla_tpu.quant.deploy import quantize_weights_int8
    from unina_yolo_dla_tpu.quant.fake_quant import PERF_EXCLUDE, QuantSpec

    cfg, folded = folded_setup
    calib_model = UninaYoloDla(cfg.with_quant("calib_max"))
    _, variables = init_model(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(3), (1, IMG, IMG, 3))
    _, mut = calib_model.apply(
        {k: variables[k] for k in ("params", "batch_stats")}, x,
        train=False, mutable=["quant_calib"])
    quant = select_amax(jax.device_get(mut["quant_calib"]), method="max")
    folded_q = fold_batchnorm(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"], "quant": quant})
    spec = QuantSpec(mode="int8_fused", exclude=PERF_EXCLUDE)
    int8_vars = quantize_weights_int8(folded_q, spec)

    base_cfg = dataclasses.replace(cfg, deploy=True, quant=spec)
    std = UninaYoloDla(base_cfg)
    mrg = UninaYoloDla(dataclasses.replace(base_cfg, merged_head=True))
    ref = std.apply(int8_vars, x, train=False)
    out = mrg.apply(int8_vars, x, train=False)
    for (rc, rr), (mc, mr) in zip(ref, out):
        np.testing.assert_allclose(np.asarray(rc), np.asarray(mc),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rr), np.asarray(mr),
                                   rtol=1e-5, atol=1e-5)
