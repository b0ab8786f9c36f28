"""True-int8 engine tests: weight quantisation transform + integer
forward vs QAT fake-quant simulation."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unina_yolo_dla_tpu.models import ModelConfig, init_model
from unina_yolo_dla_tpu.models.detector import UninaYoloDla
from unina_yolo_dla_tpu.quant import prepare_qat_variables
from unina_yolo_dla_tpu.quant.deploy import fold_batchnorm, quantize_weights_int8
from unina_yolo_dla_tpu.quant.fake_quant import QuantSpec

IMG = 32


@pytest.fixture(scope="module")
def int8_setup():
    cfg = ModelConfig(num_classes=4, base_channels=16, input_size=IMG,
                      compute_dtype=jnp.float32)
    model, variables = init_model(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    batches = [
        {"images": rng.normal(0, 1, (2, IMG, IMG, 3)).astype(np.float32)}
        for _ in range(3)
    ]
    qat_model, qat_vars = prepare_qat_variables(
        model, variables, lambda: iter(batches), method="max",
        max_batches=3, min_images=0)

    deploy_vars = fold_batchnorm(qat_vars)
    spec = QuantSpec(mode="int8")
    int8_vars = quantize_weights_int8(deploy_vars, spec)
    int8_cfg = dataclasses.replace(cfg, deploy=True, quant=spec)
    int8_model = UninaYoloDla(int8_cfg)
    return cfg, model, variables, qat_model, qat_vars, int8_model, int8_vars


def test_int8_weight_dtypes(int8_setup):
    *_, int8_model, int8_vars = int8_setup
    p = int8_vars["params"]
    # quantized conv: int8 kernel + scale
    conv = p["backbone"]["stage2_conv"]["conv"]
    assert conv["kernel"].dtype == np.int8
    assert "w_scale" in conv and conv["w_scale"].dtype == np.float32
    # excluded stem: float kernel, no scale
    stem = p["backbone"]["stem"]["conv"]
    assert stem["kernel"].dtype == np.float32
    assert "w_scale" not in stem
    # excluded P2 head too
    assert p["head_p2"]["cls_conv1"]["conv"]["kernel"].dtype == np.float32
    # quantized P3 head pred
    assert p["head_p3"]["cls_pred"]["kernel"].dtype == np.int8


def test_int8_forward_runs_and_tracks_qat(int8_setup):
    cfg, model, variables, qat_model, qat_vars, int8_model, int8_vars = \
        int8_setup
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (1, IMG, IMG, 3)).astype(np.float32))

    int8_out = jax.jit(
        lambda v, xx: int8_model.apply(v, xx, train=False))(int8_vars, x)
    qat_out = qat_model.apply(qat_vars, x, train=False)

    for (ic, ir), (qc, qr) in zip(int8_out, qat_out):
        ic, qc = np.asarray(ic), np.asarray(qc)
        assert np.isfinite(ic).all()
        # int8 engine approximates the fake-quant QAT forward: weight
        # quantisation is identical (per-tensor max), activation quant
        # matches, BN folding exact -> outputs should be close
        assert np.abs(ic - qc).mean() < 0.2, np.abs(ic - qc).mean()


def test_int8_structure_matches_model_init(int8_setup):
    *_, int8_model, int8_vars = int8_setup
    ref = int8_model.init(jax.random.key(0),
                          jnp.zeros((1, IMG, IMG, 3)), train=False)

    def paths(tree):
        return {tuple(str(getattr(k, "key", k)) for k in p)
                for p, _ in jax.tree_util.tree_flatten_with_path(tree)[0]}

    assert paths(ref["params"]) == paths(int8_vars["params"])
    # quant collection: amax only on non-excluded in_q scopes
    qpaths = paths(int8_vars["quant"])
    ref_q = paths(ref["quant"])
    assert ref_q <= qpaths  # calibration may carry extra (e.g. residual_q)


def test_int8_artifact_export(int8_setup, tmp_path):
    from unina_yolo_dla_tpu.runtime.aot import (
        ServingArtifact,
        export_serving_artifact,
    )

    *_, int8_model, int8_vars = int8_setup
    out = tmp_path / "int8_artifact"
    export_serving_artifact(int8_model, int8_vars, out, max_detections=64)
    art = ServingArtifact(out)
    dets = jax.device_get(art(np.zeros((IMG, IMG, 3), np.uint8)))
    assert dets[0].shape == (64, 4)


@pytest.fixture(scope="module")
def fused_setup(int8_setup):
    cfg, *_ , int8_model, int8_vars = int8_setup
    spec = QuantSpec(mode="int8_fused")
    fused_cfg = dataclasses.replace(cfg, deploy=True, quant=spec)
    return UninaYoloDla(fused_cfg), int8_vars


def test_int8_fused_tracks_unfused_engine(int8_setup, fused_setup):
    """The fused chain (int8 activations between layers) must approximate
    the unfused engine: same weights/scales, extra inter-layer requant
    rounding only."""
    *_, int8_model, int8_vars = int8_setup
    fused_model, fused_vars = fused_setup
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (1, IMG, IMG, 3)).astype(np.float32))

    unfused = jax.jit(
        lambda v, xx: int8_model.apply(v, xx, train=False))(int8_vars, x)
    fused = jax.jit(
        lambda v, xx: fused_model.apply(v, xx, train=False))(fused_vars, x)

    for (uc, ur), (fc, fr) in zip(unfused, fused):
        for u, f in ((uc, fc), (ur, fr)):
            u, f = np.asarray(u), np.asarray(f)
            assert np.isfinite(f).all()
            assert np.abs(u - f).mean() < 0.25, np.abs(u - f).mean()
            # logits correlate strongly despite the extra rounding
            cc = np.corrcoef(u.ravel(), f.ravel())[0, 1]
            assert cc > 0.98, cc


def test_int8_fused_structure_loads_calibration(int8_setup, fused_setup):
    """Every quant variable the fused model creates (in_q at float->int8
    boundaries, out_q per ConvBlock, add_q per shortcut) must exist in the
    calibrated collection — one calibration serves both engines."""
    *_, int8_vars = int8_setup
    fused_model, _ = fused_setup

    def paths(tree):
        return {tuple(str(getattr(k, "key", k)) for k in p)
                for p, _ in jax.tree_util.tree_flatten_with_path(tree)[0]}

    ref = fused_model.init(jax.random.key(0),
                           jnp.zeros((1, IMG, IMG, 3)), train=False)
    ref_q = paths(ref["quant"])
    assert any(p[-2] == "out_q" for p in ref_q)   # requant points exist
    assert any(p[-2] == "add_q" for p in ref_q)   # residual adds covered
    assert ref_q <= paths(int8_vars["quant"]), \
        ref_q - paths(int8_vars["quant"])


def test_int8_fused_artifact_export(fused_setup, tmp_path):
    from unina_yolo_dla_tpu.runtime.aot import (
        ServingArtifact,
        export_serving_artifact,
    )

    fused_model, fused_vars = fused_setup
    out = tmp_path / "fused_artifact"
    export_serving_artifact(fused_model, fused_vars, out, max_detections=64)
    art = ServingArtifact(out)
    dets = jax.device_get(art(np.zeros((IMG, IMG, 3), np.uint8)))
    assert dets[0].shape == (64, 4)
