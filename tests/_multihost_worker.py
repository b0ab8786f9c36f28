"""Subprocess worker for the multi-host DP test (tests/test_multihost.py).

Runs the REAL two-phase train CLI under jax.distributed with 2 virtual CPU
devices per process, writes the results dict to a JSON file for the parent
test to compare across ranks.

Usage: python _multihost_worker.py <pid> <nproc> <port> <data_yaml>
       <out_dir> <result_json>
"""
import json
import os
import sys

# the script lives in tests/; the package root is its parent (the DDP
# PYTHONPATH-injection analogue, reference train.py:29-34)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force EXACTLY 2 virtual devices per process, replacing any inherited
# setting (the pytest parent exports 8 via conftest)
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
flags.append("--xla_force_host_platform_device_count=2")
os.environ["XLA_FLAGS"] = " ".join(flags)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    data_yaml, out_dir, result_path = sys.argv[4], sys.argv[5], sys.argv[6]

    from unina_yolo_dla_tpu.train.train import main as train_main

    results = train_main([
        "--data", data_yaml,
        "--epochs", "1",
        "--qat-epochs", "1",
        "--batch", "4",           # GLOBAL batch: 2 rows per process
        "--imgsz", "64",
        "--base-channels", "16",
        "--calib-batches", "2",
        "--calib-min-images", "0",  # deliberate smoke run: 8 images is
                                    # below the 50-image sufficiency floor
        "--calib-method", "max",
        "--max-boxes", "16",
        "--output-dir", out_dir,
        "--coordinator", f"127.0.0.1:{port}",
        "--num-processes", str(nproc),
        "--process-id", str(pid),
    ])

    from unina_yolo_dla_tpu.evaluate import evaluate_model

    payload = {
        # sharded validation: images THIS process predicted in the last
        # per-epoch eval (the global val set is 4 images over 2 hosts)
        "val_local_images": evaluate_model.last_local_images,
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "fp32_loss": float(results["fp32"]["loss"]),
        "fp32_fitness": float(results["fp32"]["fitness"]),
        "qat_loss": float(results["qat"]["loss"]),
    }
    with open(result_path, "w") as f:
        json.dump(payload, f)


if __name__ == "__main__":
    main()
