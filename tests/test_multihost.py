"""Multi-host data-parallel training: 2 processes x 2 virtual CPU devices.

The TPU analogue of the reference's multi-GPU DDP path
(``/root/reference/unina_yolo_dla/train.py:270-297``, ``trainer.py:288-290``):
``jax.distributed.initialize`` over a TCP coordinator, a 4-device global
mesh spanning both processes, process_index-strided per-host data loading,
and rank-0-only artifact writes — exercised end to end through the real
two-phase train CLI.
"""
import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from unina_yolo_dla_tpu.data import SynthConfig, generate_dataset

REPO = Path(__file__).resolve().parent.parent
WORKER = Path(__file__).resolve().parent / "_multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def synth_yaml(tmp_path_factory):
    root = tmp_path_factory.mktemp("multihost_synth")
    return generate_dataset(
        root, num_train=8, num_val=4,
        cfg=SynthConfig(image_size=64, seed=11, min_height=6, max_height=28,
                        min_cones=2, max_cones=5))


def test_two_process_training(synth_yaml, tmp_path):
    port = _free_port()
    procs, results, outs = [], [], []
    for pid in range(2):
        out_dir = tmp_path / f"runs_p{pid}"       # separate dirs so rank-0
        result = tmp_path / f"result_{pid}.json"  # gating is observable
        outs.append(out_dir)
        results.append(result)
        procs.append(subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), "2", str(port),
             str(synth_yaml), str(out_dir), str(result)],
            cwd=str(REPO), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))

    payloads = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"process {pid} timed out")
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
        payloads.append(json.loads(results[pid].read_text()))

    # topology: each process contributes 2 devices to a 4-device global mesh
    for pid, pl in enumerate(payloads):
        assert pl["process_index"] == pid
        assert pl["process_count"] == 2
        assert pl["local_devices"] == 2
        assert pl["global_devices"] == 4

    # lockstep: replicated state means identical metrics on every rank
    a, b = payloads
    assert np.isfinite(a["fp32_loss"]) and np.isfinite(a["qat_loss"])
    assert a["fp32_loss"] == pytest.approx(b["fp32_loss"], abs=1e-6)
    assert a["fp32_fitness"] == pytest.approx(b["fp32_fitness"], abs=1e-6)
    assert a["qat_loss"] == pytest.approx(b["qat_loss"], abs=1e-6)

    # sharded validation: each host predicted only its half of the 4-image
    # val set (the allgather put the metrics back in lockstep, asserted
    # above via identical fitness)
    assert a["val_local_images"] == 2
    assert b["val_local_images"] == 2

    # rank-0-only writes: process 0 produced every artifact, process 1 none
    assert (outs[0] / "fp32" / "best.msgpack").exists()
    assert (outs[0] / "qat" / "best.msgpack").exists()
    assert (outs[0] / "calibration.cache").exists()
    assert (outs[0] / "results.json").exists()
    assert (outs[0] / "fp32" / "history.jsonl").exists()
    assert not (outs[1] / "fp32" / "best.msgpack").exists()
    assert not (outs[1] / "calibration.cache").exists()
    assert not (outs[1] / "results.json").exists()
    assert not (outs[1] / "fp32" / "history.jsonl").exists()
