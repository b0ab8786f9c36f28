"""Committed trained-artifact regression tests: the round-1 int8 engine
checkpoint must keep loading and producing detections as the code evolves."""
import dataclasses
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
ARTIFACTS = REPO / "artifacts"


@pytest.mark.skipif(not (ARTIFACTS / "int8_engine_vars.msgpack").exists(),
                    reason="trained artifacts not present")
def test_int8_engine_artifact_loads_and_detects():
    from unina_yolo_dla_tpu.models import ModelConfig
    from unina_yolo_dla_tpu.models.detector import UninaYoloDla
    from unina_yolo_dla_tpu.quant.fake_quant import QuantSpec
    from unina_yolo_dla_tpu.runtime.pipeline import build_serving_fn
    from unina_yolo_dla_tpu.utils.checkpoint import load_msgpack_raw

    cfg = ModelConfig(num_classes=4, base_channels=32, input_size=640,
                      compute_dtype=jnp.float32)
    model = UninaYoloDla(dataclasses.replace(
        cfg, deploy=True, quant=QuantSpec(mode="int8")))
    variables = load_msgpack_raw(ARTIFACTS / "int8_engine_vars.msgpack")

    # int8 kernels present
    k = variables["params"]["backbone"]["stage2_conv"]["conv"]["kernel"]
    assert k.dtype == np.int8

    # serve a synthetic cone scene; the trained model must fire on it.
    # generate_image emits BGR (cv2 convention) — the pipeline wants RGB.
    from unina_yolo_dla_tpu.data import SynthConfig, generate_image

    frame, labels = generate_image(
        np.random.default_rng(3), SynthConfig(image_size=640, seed=3))
    rgb = np.ascontiguousarray(frame[..., ::-1])
    serve = jax.jit(build_serving_fn(model, cfg, conf_threshold=0.5,
                                     q_factor=0.0))
    dets = serve(variables, jnp.asarray(rgb))
    valid = np.asarray(dets.valid)
    n = int(valid.sum())
    assert n >= 1, "trained int8 engine found no cones in a synthetic scene"
    assert n <= len(labels) + 3  # no detection explosion
    # detected class set must be a subset of the GT class set
    gt_classes = {int(lbl[0]) for lbl in labels}
    det_classes = {int(c) for c in np.asarray(dets.classes)[valid]}
    assert det_classes <= gt_classes, (det_classes, gt_classes)


@pytest.mark.skipif(not (ARTIFACTS / "cp_calibration.json").exists(),
                    reason="trained artifacts not present")
def test_cp_calibration_artifact():
    payload = json.loads((ARTIFACTS / "cp_calibration.json").read_text())
    assert 0.0 < payload["q_hat"] < 1.0
    assert payload["alpha"] == 0.1


@pytest.mark.skipif(
    not (ARTIFACTS / "serving_artifact" / "variables.msgpack").exists(),
    reason="serving artifact not present")
def test_serving_artifact_weights_are_device_resident():
    """Weights must be committed to device at load, not re-uploaded per
    call (the 10x relay-latency defect fixed in round 2)."""
    from unina_yolo_dla_tpu.runtime.aot import ServingArtifact

    art = ServingArtifact(ARTIFACTS / "serving_artifact")
    leaves = jax.tree_util.tree_leaves(art.variables)
    assert leaves, "artifact has no weight leaves"
    for leaf in leaves:
        assert isinstance(leaf, jax.Array), type(leaf)
