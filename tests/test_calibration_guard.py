"""Calibration-data sufficiency guard (VERDICT r4 missing #1).

The reference hard-fails int8 engine builds on short calibration data
(export_trt.py:155-157 empty, :547-551 >=50 images) — the "silent
wrongness" class: a 2-image calibration exports a confidently-wrong
engine. Two enforcement points here:

1. calibration time — quant/calibrate.py counts images across the
   pass-1 forwards and raises below ``min_images`` (default 50);
2. export time — the train CLI stamps ``calib_meta = {"images": N}``
   into quantised checkpoints and ``export --int8`` refuses checkpoints
   below ``--calib-min-images``.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unina_yolo_dla_tpu.models import ModelConfig, init_model
from unina_yolo_dla_tpu.quant import prepare_qat_variables
from unina_yolo_dla_tpu.utils.checkpoint import save_msgpack

IMG = 64


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(num_classes=4, base_channels=16, input_size=IMG,
                      compute_dtype=jnp.float32)
    model, variables = init_model(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    batches = [
        {"images": rng.normal(0, 1, (2, IMG, IMG, 3)).astype(np.float32)}
        for _ in range(3)
    ]
    return cfg, model, variables, batches


def test_short_calibration_raises(setup):
    # 3 batches x 2 images = 6 < the default 50-image floor
    _, model, variables, batches = setup
    with pytest.raises(ValueError, match="calibration saw only 6 images"):
        prepare_qat_variables(model, variables, lambda: iter(batches),
                              method="max", max_batches=3)


def test_explicit_floor_and_override(setup):
    _, model, variables, batches = setup
    with pytest.raises(ValueError, match=">= 4 required"):
        prepare_qat_variables(model, variables, lambda: iter(batches),
                              method="max", max_batches=1, min_images=4)
    # min_images=0 is the deliberate smoke-run escape hatch
    _, qat_vars = prepare_qat_variables(
        model, variables, lambda: iter(batches), method="max",
        max_batches=1, min_images=0)
    assert "quant" in qat_vars


def _quantised_checkpoint(setup, tmp_path, n_calib_images):
    _, model, variables, batches = setup
    _, qat_vars = prepare_qat_variables(
        model, variables, lambda: iter(batches), method="max",
        max_batches=3, min_images=0)
    path = tmp_path / "qat.msgpack"
    save_msgpack(dict(qat_vars, calib_meta={"images": n_calib_images}),
                 path)
    return path


def test_export_int8_refuses_short_calib_meta(setup, tmp_path):
    from unina_yolo_dla_tpu.export import main

    ckpt = _quantised_checkpoint(setup, tmp_path, n_calib_images=2)
    with pytest.raises(SystemExit, match="calibrated on only 2 images"):
        main(["--weights", str(ckpt), "--output", str(tmp_path / "a"),
              "--imgsz", str(IMG), "--base-channels", "16",
              "--int8", "--int8-unfused", "--max-detections", "64"])


def test_export_int8_override_and_sufficient_meta(setup, tmp_path):
    from unina_yolo_dla_tpu.export import main

    # --calib-min-images 0 lets the short checkpoint through ...
    ckpt = _quantised_checkpoint(setup, tmp_path, n_calib_images=2)
    out = tmp_path / "smoke"
    main(["--weights", str(ckpt), "--output", str(out),
          "--imgsz", str(IMG), "--base-channels", "16",
          "--int8", "--int8-unfused", "--calib-min-images", "0",
          "--max-detections", "64"])
    assert (out / "serving.stablehlo").exists()

    # ... and a sufficiently-calibrated checkpoint needs no override
    ckpt2 = _quantised_checkpoint(setup, tmp_path, n_calib_images=64)
    out2 = tmp_path / "ok"
    main(["--weights", str(ckpt2), "--output", str(out2),
          "--imgsz", str(IMG), "--base-channels", "16",
          "--int8", "--int8-unfused", "--max-detections", "64"])
    assert (out2 / "serving.stablehlo").exists()
