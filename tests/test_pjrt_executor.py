"""Native PJRT executor end-to-end: C++ host drives the TPU through the
PJRT C API with no Python in the per-frame loop.

Needs the axon relay plugin (/opt/axon/libaxon_pjrt.so) and the tunnel;
skipped elsewhere. The artifact is exported from THIS process (CPU
backend) with platforms=("tpu",) — jax.export cross-lowers, the plugin
compiles on its side. Flow mirrors tests/test_native_host.py: cmake
build, ring_tool producer, perception_host --executor pjrt consumer.
"""
import dataclasses
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

AXON_SO = Path("/opt/axon/libaxon_pjrt.so")
REPO = Path(__file__).resolve().parent.parent
NATIVE = REPO / "unina_yolo_dla_tpu" / "runtime" / "native"

pytestmark = pytest.mark.skipif(
    not AXON_SO.exists(), reason="axon PJRT plugin not available")


def _relay_alive() -> bool:
    """Bounded liveness probe: the relay can wedge SERVER-side for long
    stretches (stale session claims — see .claude/skills/verify/SKILL.md
    "relay-wedge recovery"), during which every client hangs at claim
    time, not at connect time. Without this gate each host run below
    burns its full 540 s subprocess timeout."""
    env = dict(os.environ,
               PYTHONPATH="/root/.axon_site",
               PALLAS_AXON_POOL_IPS="127.0.0.1",
               JAX_PLATFORMS="axon")  # undo any CPU-bypass in the parent
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=90, env=env)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


@pytest.fixture(scope="module", autouse=True)
def relay_gate():
    if AXON_SO.exists() and not _relay_alive():
        pytest.skip("axon relay unresponsive (wedged) — probe timed out")


@pytest.fixture(scope="module")
def native_build():
    build = NATIVE / "build"
    subprocess.run(["cmake", "-S", str(NATIVE), "-B", str(build),
                    "-G", "Ninja"], check=True, capture_output=True)
    subprocess.run(["cmake", "--build", str(build)], check=True,
                   capture_output=True)
    return build


@pytest.fixture(scope="module")
def tpu_artifact(tmp_path_factory):
    """Tiny TPU-lowered artifact exported from the CPU-backend test
    process (cross-platform lowering)."""
    import jax
    import jax.numpy as jnp

    from unina_yolo_dla_tpu.models import ModelConfig, init_model
    from unina_yolo_dla_tpu.runtime.aot import export_serving_artifact

    out = tmp_path_factory.mktemp("pjrt_artifact")
    cfg = ModelConfig(num_classes=4, base_channels=16, input_size=64,
                      compute_dtype=jnp.float32)
    model, variables = init_model(jax.random.key(0), cfg)
    export_serving_artifact(model, variables, out, max_detections=64,
                            platforms=("tpu",))
    # conf must point at the axon plugin for the host
    conf = (out / "pjrt_plugin.conf").read_text()
    assert "libaxon_pjrt.so" in conf, conf
    return out


def test_pjrt_host_serves_committed_artifact(native_build):
    """The COMMITTED deployable artifact (artifacts/serving_artifact) must
    configure and serve through the native PJRT host as-is — the shipped
    .engine IS the product (reference export_trt.py:497-566). Round-2's
    committed artifact predated serving_baked.stablehlo; this pins the
    round-3 format."""
    art = REPO / "artifacts" / "serving_artifact"
    if not (art / "serving_baked.stablehlo").exists():
        pytest.skip("committed artifact predates the baked-program format")

    ring = "/dev/shm/unina_pjrt_commit_frames"
    dets = "/dev/shm/unina_pjrt_commit_dets"
    for p in (ring, dets):
        if os.path.exists(p):
            os.unlink(p)

    producer = subprocess.Popen(
        [str(native_build / "ring_tool"), "produce", "--ring", ring,
         "--width", "640", "--height", "640", "--frames", "30000",
         "--fps", "30"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        host = subprocess.run(
            [str(native_build / "perception_host"),
             "--artifact", str(art), "--ring", ring,
             "--out", dets, "--input", "640", "--classes", "4",
             "--executor", "pjrt", "--max-frames", "10"],
            capture_output=True, text=True, timeout=540)
    finally:
        producer.terminate()
        producer.wait(timeout=30)

    assert host.returncode == 0, host.stderr[-4000:]
    assert "[executor_pjrt] configured" in host.stderr
    assert "frames=10" in host.stderr, host.stderr[-1000:]


def test_pjrt_host_end_to_end(native_build, tpu_artifact, tmp_path):
    ring = "/dev/shm/unina_pjrt_test_frames"
    dets = "/dev/shm/unina_pjrt_test_dets"
    for p in (ring, dets):
        if os.path.exists(p):
            os.unlink(p)

    # long-lived producer: the host's configure (remote compile) takes
    # tens of seconds; newest-frame drop handles the backlog
    producer = subprocess.Popen(
        [str(native_build / "ring_tool"), "produce", "--ring", ring,
         "--width", "64", "--height", "64", "--frames", "30000",
         "--fps", "60"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        host = subprocess.run(
            [str(native_build / "perception_host"),
             "--artifact", str(tpu_artifact), "--ring", ring,
             "--out", dets, "--input", "64", "--classes", "4",
             "--executor", "pjrt", "--max-frames", "25"],
            capture_output=True, text=True, timeout=540)
    finally:
        producer.terminate()
        producer.wait(timeout=30)

    assert host.returncode == 0, host.stderr[-4000:]
    assert "executor=pjrt" in host.stderr
    assert "[executor_pjrt] configured" in host.stderr
    # processed the requested frames and published latency stats
    assert "frames=25" in host.stderr, host.stderr[-1000:]

    # detections block exists and carries a plausible result_seq
    blob = Path(dets).read_bytes()
    assert len(blob) > 16


@pytest.fixture(scope="module")
def tpu_artifact_s2dh(tmp_path_factory):
    """Tiny s2d_host artifact: the C++ staging loop must block frames
    (in.layout=s2d) before upload."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from unina_yolo_dla_tpu.models import ModelConfig, init_model
    from unina_yolo_dla_tpu.models.detector import UninaYoloDla
    from unina_yolo_dla_tpu.quant.deploy import (
        fold_batchnorm,
        fold_stem_space_to_depth,
    )
    from unina_yolo_dla_tpu.runtime.aot import export_serving_artifact

    out = tmp_path_factory.mktemp("pjrt_artifact_s2dh")
    cfg = ModelConfig(num_classes=4, base_channels=16, input_size=64,
                      compute_dtype=jnp.float32)
    _, variables = init_model(jax.random.key(0), cfg)
    folded = fold_batchnorm(variables)
    s2dh = dataclasses.replace(cfg, deploy=True, stem_s2d=True,
                               s2d_host=True)
    export_serving_artifact(UninaYoloDla(s2dh),
                            fold_stem_space_to_depth(folded), out,
                            max_detections=64, platforms=("tpu",))
    assert "in.layout=s2d" in (out / "pjrt_plugin.conf").read_text()
    return out


def test_pjrt_host_s2d_staging(native_build, tpu_artifact_s2dh):
    """perception_host serves an s2d_host artifact from plain RGB ring
    frames — the space-to-depth shuffle runs in the C++ staging pass."""
    ring = "/dev/shm/unina_pjrt_s2d_frames"
    dets = "/dev/shm/unina_pjrt_s2d_dets"
    for p in (ring, dets):
        if os.path.exists(p):
            os.unlink(p)

    producer = subprocess.Popen(
        [str(native_build / "ring_tool"), "produce", "--ring", ring,
         "--width", "64", "--height", "64", "--frames", "30000",
         "--fps", "60"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        host = subprocess.run(
            [str(native_build / "perception_host"),
             "--artifact", str(tpu_artifact_s2dh), "--ring", ring,
             "--out", dets, "--input", "64", "--classes", "4",
             "--executor", "pjrt", "--max-frames", "20"],
            capture_output=True, text=True, timeout=540)
    finally:
        producer.terminate()
        producer.wait(timeout=30)

    assert host.returncode == 0, host.stderr[-4000:]
    assert "[executor_pjrt] configured" in host.stderr
    assert "frames=20" in host.stderr, host.stderr[-1000:]
