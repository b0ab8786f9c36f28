"""End-to-end two-phase CLI dry run on synthetic data (CPU backend).

The run_local_debug.sh equivalent (reference: generate synthetic set, 2
epochs, assert the pipeline completes): phase-1 FP32 -> calibration ->
phase-2 QAT -> CP calibration -> AOT export, all through the real CLI
entry point.
"""
import json

import numpy as np
import pytest

from unina_yolo_dla_tpu.data import SynthConfig, generate_dataset


@pytest.fixture(scope="module")
def synth_yaml(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_synth")
    return generate_dataset(
        root, num_train=8, num_val=4,
        cfg=SynthConfig(image_size=64, seed=9, min_height=6, max_height=28,
                        min_cones=2, max_cones=5))


def test_two_phase_cli_dry_run(synth_yaml, tmp_path):
    from unina_yolo_dla_tpu.train.train import main

    out_dir = tmp_path / "runs"
    results = main([
        "--data", str(synth_yaml),
        "--epochs", "2",
        "--qat-epochs", "1",
        "--batch", "4",
        "--imgsz", "64",
        "--base-channels", "16",
        "--calib-batches", "2",
        "--calib-min-images", "0",
        "--calib-method", "max",
        "--calibrate-cp",
        "--export",
        "--output-dir", str(out_dir),
        "--max-boxes", "16",
    ])

    # phase artifacts
    assert (out_dir / "fp32" / "best.msgpack").exists()
    assert (out_dir / "calibration.cache").exists()
    assert (out_dir / "qat_init_calibrated.msgpack").exists()
    assert (out_dir / "qat" / "best.msgpack").exists()
    assert (out_dir / "results.json").exists()

    assert "fp32" in results and "qat" in results
    assert np.isfinite(results["fp32"]["loss"])
    assert np.isfinite(results["qat"]["loss"])

    # export artifact is loadable and serves a frame
    art_dir = out_dir / "serving_artifact"
    assert (art_dir / "serving.stablehlo").exists()
    from unina_yolo_dla_tpu.runtime.serving import PerceptionServer

    srv = PerceptionServer(art_dir, expected_input=64, expected_classes=4,
                           log_fn=lambda s: None)
    srv.configure()
    srv.activate()
    dets = srv.process_frame(np.zeros((64, 64, 3), np.uint8))
    assert dets is not None

    # CP calibration: either succeeded (file) or warned non-fatally
    cp = out_dir / "cp_calibration.json"
    if cp.exists():
        payload = json.loads(cp.read_text())
        assert 0 <= payload["q_hat"] <= 1


def test_skip_flags(synth_yaml, tmp_path):
    from unina_yolo_dla_tpu.train.train import main

    out_dir = tmp_path / "runs_skip"
    results = main([
        "--data", str(synth_yaml),
        "--epochs", "1", "--qat-epochs", "1",
        "--batch", "4", "--imgsz", "64", "--base-channels", "16",
        "--skip-qat",
        "--output-dir", str(out_dir),
        "--max-boxes", "16",
    ])
    assert "fp32" in results and "qat" not in results
