"""Native C++ perception-host integration test.

Builds the daemon (cmake/ninja), exports a small AOT artifact, streams
synthetic frames through the /dev/shm zero-copy ring with ring_tool, and
checks detections + latency stats come out — the MOCK_CUDA-style CI test
of the reference node, but against the real binary end to end.
"""
import os
import struct
import subprocess
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

REPO = Path(__file__).resolve().parents[1]
NATIVE = REPO / "unina_yolo_dla_tpu" / "runtime" / "native"
IMG = 64


@pytest.fixture(scope="module")
def native_build():
    build = NATIVE / "build"
    subprocess.run(["cmake", "-S", str(NATIVE), "-B", str(build),
                    "-G", "Ninja"], check=True, capture_output=True)
    subprocess.run(["cmake", "--build", str(build)], check=True,
                   capture_output=True)
    return build


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    from unina_yolo_dla_tpu.models import ModelConfig, init_model
    from unina_yolo_dla_tpu.runtime.aot import export_serving_artifact

    cfg = ModelConfig(num_classes=4, base_channels=16, input_size=IMG,
                      compute_dtype=jnp.float32)
    model, variables = init_model(jax.random.key(0), cfg)
    out = tmp_path_factory.mktemp("native_artifact")
    export_serving_artifact(model, variables, out, max_detections=64)
    return out


def test_host_end_to_end(native_build, artifact, tmp_path):
    ring = tmp_path / "frames.ring"
    dets = tmp_path / "dets.out"

    env = dict(os.environ)
    env["UNINA_FORCE_CPU"] = "1"
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"

    host = subprocess.Popen(
        [str(native_build / "perception_host"),
         "--artifact", str(artifact), "--ring", str(ring),
         "--out", str(dets), "--input", str(IMG), "--classes", "4",
         "--max-frames", "5"],
        env=env, stderr=subprocess.PIPE, text=True)

    # produce frames slowly enough to outlast host configure/compile
    producer = subprocess.Popen(
        [str(native_build / "ring_tool"), "produce",
         "--ring", str(ring), "--width", str(IMG), "--height", str(IMG),
         "--frames", "3000", "--fps", "30", "--slots", "4"],
        stderr=subprocess.PIPE, text=True)

    try:
        _, host_err = host.communicate(timeout=280)
    finally:
        producer.terminate()
        producer.wait(timeout=10)
        if host.poll() is None:
            host.kill()

    assert host.returncode == 0, f"host failed:\n{host_err}"
    assert "configured" in host_err
    assert "active" in host_err
    assert "frames=5" in host_err
    assert "p99=" in host_err

    # detection output block is well-formed
    raw = dets.read_bytes()
    magic, = struct.unpack_from("<Q", raw, 0)
    assert magic == 0x554E494E41524E47
    seq, = struct.unpack_from("<Q", raw, 8)
    count, = struct.unpack_from("<I", raw, 16)
    assert seq > 0
    assert 0 <= count <= 64

    # read-dets tool parses it too
    out = subprocess.run(
        [str(native_build / "ring_tool"), "read-dets", "--out", str(dets)],
        capture_output=True, text=True)
    assert out.returncode == 0
    assert "count=" in out.stdout


def test_host_end_to_end_nv12(native_build, artifact, tmp_path):
    """NV12 planar frames flow through the NATIVE host (channels==0 path):
    the C++ memoryview must be sized w*h*3/2, not w*h*0."""
    ring = tmp_path / "frames_nv12.ring"
    dets = tmp_path / "dets_nv12.out"

    env = dict(os.environ)
    env["UNINA_FORCE_CPU"] = "1"
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"

    host = subprocess.Popen(
        [str(native_build / "perception_host"),
         "--artifact", str(artifact), "--ring", str(ring),
         "--out", str(dets), "--input", str(IMG), "--classes", "4",
         "--max-frames", "3"],
        env=env, stderr=subprocess.PIPE, text=True)

    producer = subprocess.Popen(
        [str(native_build / "ring_tool"), "produce",
         "--ring", str(ring), "--width", str(IMG), "--height", str(IMG),
         "--frames", "3000", "--fps", "30", "--slots", "4",
         "--format", "nv12"],
        stderr=subprocess.PIPE, text=True)

    try:
        _, host_err = host.communicate(timeout=280)
    finally:
        producer.terminate()
        producer.wait(timeout=10)
        if host.poll() is None:
            host.kill()

    assert host.returncode == 0, f"host failed:\n{host_err}"
    assert "frames=3" in host_err
    # NV12 frames must be processed, not rejected by the executor
    assert "geom=0" in host_err

    raw = dets.read_bytes()
    seq, = struct.unpack_from("<Q", raw, 8)
    assert seq > 0


def test_host_geometry_mismatch_drops(native_build, artifact, tmp_path):
    """Wrong-geometry frames (any format) are dropped with accounting, not
    published as empty results (ADVICE round 1)."""
    ring = tmp_path / "frames_bad.ring"
    dets = tmp_path / "dets_bad.out"

    env = dict(os.environ)
    env["UNINA_FORCE_CPU"] = "1"
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"

    host = subprocess.Popen(
        [str(native_build / "perception_host"),
         "--artifact", str(artifact), "--ring", str(ring),
         "--out", str(dets), "--input", str(IMG), "--classes", "4",
         "--max-frames", "3"],
        env=env, stderr=subprocess.PIPE, text=True)

    # BGRA frames at the WRONG size: previously fell through the ch==3-only
    # guard into the executor sentinel path
    producer = subprocess.Popen(
        [str(native_build / "ring_tool"), "produce",
         "--ring", str(ring), "--width", str(IMG * 2),
         "--height", str(IMG * 2), "--frames", "200", "--fps", "60",
         "--slots", "4", "--format", "bgra"],
        stderr=subprocess.PIPE, text=True)

    try:
        _, host_err = host.communicate(timeout=280)
    finally:
        producer.terminate()
        producer.wait(timeout=10)
        if host.poll() is None:
            host.kill()

    assert host.returncode == 0, f"host failed:\n{host_err}"
    # every frame dropped at the geometry guard; none processed/published
    assert "frames=0" in host_err
    assert "geometry" in host_err
    raw = dets.read_bytes()
    seq, = struct.unpack_from("<Q", raw, 8)
    assert seq == 0


def test_lifecycle_configure_failure(native_build, tmp_path):
    """Bad artifact dir -> clean FATAL, nonzero exit, no crash."""
    ring = tmp_path / "r2.ring"
    # create a dummy ring so the host reaches configure
    subprocess.run(
        [str(native_build / "ring_tool"), "produce", "--ring", str(ring),
         "--width", "16", "--height", "16", "--frames", "1"],
        check=True, capture_output=True)
    env = dict(os.environ)
    env["UNINA_FORCE_CPU"] = "1"
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    res = subprocess.run(
        [str(native_build / "perception_host"),
         "--artifact", str(tmp_path / "nonexistent"),
         "--ring", str(ring), "--out", str(tmp_path / "d.out"),
         "--input", "16", "--classes", "4"],
        env=env, capture_output=True, text=True, timeout=120)
    assert res.returncode == 1
    assert "FATAL" in res.stderr


def test_embed_executor_nv12(artifact):
    """NV12 planar frames decode through the executor (channels=0 path)."""
    import numpy as np

    from unina_yolo_dla_tpu.runtime.embed import make_executor

    ex = make_executor(str(artifact), expected_input=IMG, expected_classes=4)
    y = np.full((IMG, IMG), 128, np.uint8)
    uv = np.full((IMG // 2, IMG // 2, 2), 128, np.uint8)
    buf = y.tobytes() + uv.tobytes()
    out = ex(buf, IMG, IMG, 0)
    import struct

    count, = struct.unpack_from("<I", out, 0)
    assert count != 0xFFFFFFFF
    assert len(out) == 4 + count * 24


def test_host_camera_resolution_bgra(native_build, tmp_path_factory,
                                     tmp_path):
    """Camera-path artifact end to end: raw BGRA frames at CAMERA
    resolution (80x48 != model 64) flow through the native host; the
    on-chip program does BGRA->RGB + MXU bilinear resize
    (cuda_preprocess.cu:144-204 parity), no host-side conversion."""
    from unina_yolo_dla_tpu.models import ModelConfig, init_model
    from unina_yolo_dla_tpu.runtime.aot import export_serving_artifact

    cam_w, cam_h = 80, 48
    cfg = ModelConfig(num_classes=4, base_channels=16, input_size=IMG,
                      compute_dtype=jnp.float32)
    model, variables = init_model(jax.random.key(0), cfg)
    art = tmp_path_factory.mktemp("camera_artifact")
    export_serving_artifact(model, variables, art, max_detections=64,
                            camera=(cam_h, cam_w, "bgra"))

    ring = tmp_path / "frames_cam.ring"
    dets = tmp_path / "dets_cam.out"
    env = dict(os.environ)
    env["UNINA_FORCE_CPU"] = "1"
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"

    host = subprocess.Popen(
        [str(native_build / "perception_host"),
         "--artifact", str(art), "--ring", str(ring),
         "--out", str(dets), "--input", str(IMG), "--classes", "4",
         "--frame-width", str(cam_w), "--frame-height", str(cam_h),
         "--max-frames", "3"],
        env=env, stderr=subprocess.PIPE, text=True)

    producer = subprocess.Popen(
        [str(native_build / "ring_tool"), "produce",
         "--ring", str(ring), "--width", str(cam_w),
         "--height", str(cam_h), "--frames", "3000", "--fps", "30",
         "--slots", "4", "--format", "bgra"],
        stderr=subprocess.PIPE, text=True)

    try:
        _, host_err = host.communicate(timeout=280)
    finally:
        producer.terminate()
        producer.wait(timeout=10)
        if host.poll() is None:
            host.kill()

    assert host.returncode == 0, f"host failed:\n{host_err}"
    assert "frames=3" in host_err
    assert "geom=0" in host_err, host_err[-500:]

    raw = dets.read_bytes()
    seq, = struct.unpack_from("<Q", raw, 8)
    assert seq > 0


def test_host_end_to_end_s2d_artifact(native_build, tmp_path_factory,
                                      tmp_path):
    """The native host serves an s2d_host artifact through the embedded
    Python executor from plain RGB ring frames — embed.py hands RGB to
    ServingArtifact, which blocks transparently (the C++ pjrt staging
    path has its own axon-gated test)."""
    import dataclasses

    from unina_yolo_dla_tpu.models import ModelConfig, init_model
    from unina_yolo_dla_tpu.models.detector import UninaYoloDla
    from unina_yolo_dla_tpu.quant.deploy import (
        fold_batchnorm,
        fold_downsample_space_to_depth,
        fold_stem_space_to_depth,
    )
    from unina_yolo_dla_tpu.runtime.aot import export_serving_artifact

    cfg = ModelConfig(num_classes=4, base_channels=16, input_size=IMG,
                      compute_dtype=jnp.float32)
    _, variables = init_model(jax.random.key(0), cfg)
    folded = fold_batchnorm(variables)
    s2dh = dataclasses.replace(cfg, deploy=True, stem_s2d=True,
                               s2d_host=True, stage1_s2d=True)
    v = fold_downsample_space_to_depth(fold_stem_space_to_depth(folded))
    out = tmp_path_factory.mktemp("native_s2d_artifact")
    export_serving_artifact(UninaYoloDla(s2dh), v, out, max_detections=64)

    ring = tmp_path / "frames.ring"
    dets = tmp_path / "dets.out"
    env = dict(os.environ)
    env["UNINA_FORCE_CPU"] = "1"
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"

    host = subprocess.Popen(
        [str(native_build / "perception_host"),
         "--artifact", str(out), "--ring", str(ring),
         "--out", str(dets), "--input", str(IMG), "--classes", "4",
         "--max-frames", "5"],
        env=env, stderr=subprocess.PIPE, text=True)
    producer = subprocess.Popen(
        [str(native_build / "ring_tool"), "produce",
         "--ring", str(ring), "--width", str(IMG), "--height", str(IMG),
         "--frames", "3000", "--fps", "30", "--slots", "4"],
        stderr=subprocess.PIPE, text=True)
    try:
        _, host_err = host.communicate(timeout=280)
    finally:
        producer.terminate()
        producer.wait(timeout=10)
        if host.poll() is None:
            host.kill()

    assert host.returncode == 0, f"host failed:\n{host_err}"
    assert "frames=5" in host_err
