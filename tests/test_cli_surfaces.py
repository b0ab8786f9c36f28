"""CLI surface tests: export + evaluate + serve entry points."""
import json
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unina_yolo_dla_tpu.data import SynthConfig, generate_dataset
from unina_yolo_dla_tpu.models import ModelConfig, init_model
from unina_yolo_dla_tpu.utils.checkpoint import save_msgpack

IMG = 64
REPO = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    cfg = ModelConfig(num_classes=4, base_channels=16, input_size=IMG,
                      compute_dtype=jnp.float32)
    model, variables = init_model(jax.random.key(0), cfg)
    path = tmp_path_factory.mktemp("ckpt") / "w.msgpack"
    save_msgpack({k: variables[k] for k in ("params", "batch_stats")}, path)
    return path


def test_export_cli(checkpoint, tmp_path):
    from unina_yolo_dla_tpu.export import main

    out = tmp_path / "artifact"
    main(["--weights", str(checkpoint), "--output", str(out),
          "--imgsz", str(IMG), "--base-channels", "16",
          "--max-detections", "64"])
    assert (out / "serving.stablehlo").exists()
    cfg = json.loads((out / "config.json").read_text())
    assert cfg["quantized"] is False
    assert cfg["q_factor"] == 0.1


def test_export_cli_with_cp_calibration(checkpoint, tmp_path):
    from unina_yolo_dla_tpu.export import main

    cp = tmp_path / "cp.json"
    cp.write_text(json.dumps({"q_hat": 0.0625, "alpha": 0.1}))
    out = tmp_path / "artifact_cp"
    main(["--weights", str(checkpoint), "--output", str(out),
          "--imgsz", str(IMG), "--base-channels", "16",
          "--cp-calibration", str(cp), "--max-detections", "64"])
    cfg = json.loads((out / "config.json").read_text())
    assert cfg["q_factor"] == 0.0625


def test_evaluate_cli(checkpoint, tmp_path):
    from unina_yolo_dla_tpu.evaluate import main

    yaml_path = generate_dataset(
        tmp_path / "data", num_train=2, num_val=2,
        cfg=SynthConfig(image_size=IMG, seed=1))
    # argparse-level smoke: runs end to end and prints metrics
    sys_argv = ["--weights", str(checkpoint), "--data", str(yaml_path),
                "--imgsz", str(IMG), "--base-channels", "16",
                "--batch", "2"]
    main_argv_backup = sys.argv
    try:
        sys.argv = ["evaluate"] + sys_argv
        main()
    finally:
        sys.argv = main_argv_backup


def test_serve_cli_batch_mode(checkpoint, tmp_path):
    import cv2

    from unina_yolo_dla_tpu.export import main as export_main
    from unina_yolo_dla_tpu.runtime.serve_cli import main as serve_main

    art = tmp_path / "artifact"
    export_main(["--weights", str(checkpoint), "--output", str(art),
                 "--imgsz", str(IMG), "--base-channels", "16",
                 "--max-detections", "64"])

    cfg_file = tmp_path / "serving.yaml"
    cfg_file.write_text(
        f"artifact_dir: {art}\ninput_size: {IMG}\nnum_classes: 4\n"
        "class_names:\n  0: yellow_cone\n")
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    cv2.imwrite(str(img_dir / "a.jpg"),
                rng.integers(0, 255, (IMG, IMG, 3)).astype(np.uint8))

    serve_main(["--config", str(cfg_file), "--images", str(img_dir)])


def test_export_cli_fold_bn(checkpoint, tmp_path):
    from unina_yolo_dla_tpu.export import main

    out = tmp_path / "artifact_folded"
    main(["--weights", str(checkpoint), "--output", str(out),
          "--imgsz", str(IMG), "--base-channels", "16",
          "--fold-bn", "--max-detections", "64"])
    # artifact serves
    from unina_yolo_dla_tpu.runtime.aot import ServingArtifact

    art = ServingArtifact(out)
    frame = np.zeros((IMG, IMG, 3), np.uint8)
    boxes, scores, classes, valid = jax.device_get(art(frame))
    assert boxes.shape == (64, 4)
    # no batch_stats in the folded artifact
    assert "batch_stats" not in art.variables
