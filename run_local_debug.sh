#!/usr/bin/env bash
# Local dry run on the CPU backend — the run_local_debug.sh equivalent:
# generate a deterministic synthetic dataset, run 2 FP32 epochs + 1 QAT
# epoch at reduced resolution, calibrate conformal prediction, export the
# AOT artifact, and serve a frame through it. Success = the whole pipeline
# completes and the artifact serves.
set -euo pipefail
cd "$(dirname "$0")"

export JAX_PLATFORMS=cpu
export UNINA_FORCE_CPU=1
WORK="${1:-/tmp/unina_dryrun}"
IMGSZ=128

echo ">>> [1/4] generating synthetic FSD dataset"
python -m unina_yolo_dla_tpu.data.synthetic \
  --output "$WORK/synth" --num-train 16 --num-val 8 \
  --image-size $IMGSZ --seed 42

echo ">>> [2/4] two-phase training (FP32 -> QAT) on CPU"
python - <<EOF
import jax
jax.config.update("jax_platforms", "cpu")
from unina_yolo_dla_tpu.train.train import main
main([
    "--data", "$WORK/synth/fsd_synth.yaml",
    "--epochs", "2", "--qat-epochs", "1",
    "--batch", "4", "--imgsz", "$IMGSZ", "--base-channels", "16",
    "--calib-batches", "2", "--calib-min-images", "0",
    "--calib-method", "entropy",
    "--calibrate-cp", "--export",
    "--output-dir", "$WORK/runs", "--max-boxes", "32",
])
EOF

echo ">>> [3/4] standalone eval of the QAT checkpoint"
python - <<EOF
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from unina_yolo_dla_tpu.data.dataset import YoloDataset, batch_iterator, load_dataset_yaml
from unina_yolo_dla_tpu.evaluate import evaluate_model
from unina_yolo_dla_tpu.models.config import ModelConfig
from unina_yolo_dla_tpu.quant.qat import make_qat_model
from unina_yolo_dla_tpu.utils.checkpoint import load_msgpack_raw

spec = load_dataset_yaml("$WORK/synth/fsd_synth.yaml")
ds = YoloDataset(spec["val"], img_size=$IMGSZ, max_boxes=32)
variables = load_msgpack_raw("$WORK/runs/qat/best.msgpack")
model = make_qat_model(ModelConfig(num_classes=4, base_channels=16,
                                   input_size=$IMGSZ))
res = evaluate_model(model, variables,
                     lambda: batch_iterator(ds, 4, np.random.default_rng(0),
                                            shuffle=False))
print({k: round(v, 4) for k, v in res.items() if isinstance(v, float)})
EOF

echo ">>> [4/4] serving one frame through the exported artifact"
python - <<EOF
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from unina_yolo_dla_tpu.runtime.serving import PerceptionServer
srv = PerceptionServer("$WORK/runs/serving_artifact",
                       expected_input=$IMGSZ, expected_classes=4)
srv.configure(); srv.activate()
out = srv.process_frame(np.zeros(($IMGSZ, $IMGSZ, 3), np.uint8))
assert out is not None
print("served:", out["count"], "detections;", srv.stats())
EOF

echo ">>> dry run complete"
