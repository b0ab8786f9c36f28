"""AOT artifact + serving lifecycle tests (the export_trt + ROS-node
equivalents, runnable on the CPU backend like the reference's mocks)."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unina_yolo_dla_tpu.models import ModelConfig, init_model
from unina_yolo_dla_tpu.runtime.aot import (
    FallbackReport,
    ServingArtifact,
    analyze_lowered,
    export_serving_artifact,
    print_fallback_report,
    validate_artifact_shapes,
)
from unina_yolo_dla_tpu.runtime.serving import LifecycleState, PerceptionServer

IMG = 32


@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory):
    cfg = ModelConfig(num_classes=4, base_channels=16, input_size=IMG,
                      compute_dtype=jnp.float32)
    model, variables = init_model(jax.random.key(0), cfg)
    out = tmp_path_factory.mktemp("artifact")
    export_serving_artifact(model, variables, out, max_detections=64)
    return out, model, variables


def test_export_writes_artifact(artifact_dir):
    out, model, variables = artifact_dir
    assert (out / "serving.stablehlo").exists()
    assert (out / "variables.msgpack").exists()
    cfg = json.loads((out / "config.json").read_text())
    assert cfg["input_size"] == IMG
    assert cfg["max_detections"] == 64
    report = json.loads((out / "fallback_report.json").read_text())
    assert report["host_callbacks"] == []
    assert report["dynamic_shapes"] == []
    # compacted result set ~ small (boxes+scores+classes+valid for K=64)
    assert report["output_bytes"] <= 64 * (4 + 1 + 1 + 1) * 4


def test_artifact_roundtrip_matches_live_model(artifact_dir):
    out, model, variables = artifact_dir
    art = ServingArtifact(out)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (IMG, IMG, 3), dtype=np.uint8)

    got = jax.device_get(art(jnp.asarray(frame)))

    from unina_yolo_dla_tpu.runtime.pipeline import build_serving_fn

    serve = build_serving_fn(model, model.config, max_detections=64)
    v = {k: variables[k] for k in ("params", "batch_stats")}
    want = jax.device_get(serve(v, jnp.asarray(frame)))

    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(want[3]))


def test_fallback_analyzer_detects_callbacks():
    text = ('stablehlo.custom_call @xla_python_cpu_callback(...)'
            ' tensor<?x4xf32>')
    rep = analyze_lowered(text, [jnp.zeros((4,))])
    assert rep.host_callbacks
    assert rep.dynamic_shapes
    with pytest.raises(RuntimeError):
        print_fallback_report(rep, strict=True, log_fn=lambda s: None)
    print_fallback_report(rep, strict=False, log_fn=lambda s: None)  # no raise


def test_validate_artifact_shapes(artifact_dir):
    out, _, _ = artifact_dir
    art = ServingArtifact(out)
    validate_artifact_shapes(art, IMG, 4)
    with pytest.raises(ValueError):
        validate_artifact_shapes(art, 640, 4)
    with pytest.raises(ValueError):
        validate_artifact_shapes(art, IMG, 7)


def test_server_lifecycle_and_frames(artifact_dir):
    out, _, _ = artifact_dir
    logs = []
    srv = PerceptionServer(out, expected_input=IMG, expected_classes=4,
                           log_fn=logs.append, warn_throttle_s=0.0)
    assert srv.state == LifecycleState.UNCONFIGURED

    # frames before activation are dropped, not crashed
    frame = np.zeros((IMG, IMG, 3), np.uint8)
    assert srv.process_frame(frame) is None
    assert srv.frames_dropped == 1

    srv.configure()
    assert srv.state == LifecycleState.INACTIVE
    srv.activate()
    assert srv.state == LifecycleState.ACTIVE

    out_dets = srv.process_frame(frame)
    assert out_dets is not None
    assert out_dets["boxes"].shape[1] == 4
    assert out_dets["count"] == len(out_dets["boxes"])

    # geometry guard
    assert srv.process_frame(np.zeros((IMG + 2, IMG, 3), np.uint8)) is None
    assert srv.process_frame(None) is None

    stats = srv.stats()
    assert stats["frames_processed"] == 1
    assert stats["frames_dropped"] == 3
    assert stats["p99_ms"] > 0

    srv.deactivate()
    assert srv.process_frame(frame) is None
    srv.shutdown()
    assert srv.state == LifecycleState.FINALIZED


def test_configure_rejects_wrong_dims(artifact_dir):
    out, _, _ = artifact_dir
    srv = PerceptionServer(out, expected_input=640, expected_classes=4,
                           log_fn=lambda s: None)
    with pytest.raises(ValueError):
        srv.configure()


def test_s2d_host_artifact_roundtrip(tmp_path):
    """`export --stem-s2d-host` artifact: consumes blocked (S/2,S/2,12)
    frames; ServingArtifact transparently blocks a standard (S,S,3) RGB
    frame host-side; detections match the standard artifact's exactly
    (the stem matmul is the same math — RESULTS.md round 3)."""
    import dataclasses

    from unina_yolo_dla_tpu.models.detector import UninaYoloDla
    from unina_yolo_dla_tpu.ops.preprocess import space_to_depth_np
    from unina_yolo_dla_tpu.quant.deploy import (
        fold_batchnorm,
        fold_stem_space_to_depth,
    )

    cfg = ModelConfig(num_classes=4, base_channels=16, input_size=IMG,
                      compute_dtype=jnp.float32)
    _, variables = init_model(jax.random.key(0), cfg)
    folded = fold_batchnorm(variables)

    dep = dataclasses.replace(cfg, deploy=True)
    std_out = tmp_path / "std"
    export_serving_artifact(UninaYoloDla(dep), folded, std_out,
                            max_detections=64)

    s2dh = dataclasses.replace(cfg, deploy=True, stem_s2d=True,
                               s2d_host=True)
    s2d_vars = fold_stem_space_to_depth(folded)
    h_out = tmp_path / "s2dh"
    export_serving_artifact(UninaYoloDla(s2dh), s2d_vars, h_out,
                            max_detections=64)

    hcfg = json.loads((h_out / "config.json").read_text())
    assert hcfg["s2d_host"] is True
    assert "in.layout=s2d" in (h_out / "pjrt_plugin.conf").read_text()

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (IMG, IMG, 3), dtype=np.uint8)
    want = jax.device_get(ServingArtifact(std_out)(jnp.asarray(frame)))
    art = ServingArtifact(h_out)
    # standard frame: blocked transparently by __call__
    got = jax.device_get(art(jnp.asarray(frame)))
    # pre-blocked frame: passes straight through
    got_blocked = jax.device_get(art(jnp.asarray(space_to_depth_np(frame))))

    for g in (got, got_blocked):
        np.testing.assert_allclose(np.asarray(g[0]), np.asarray(want[0]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(g[3]), np.asarray(want[3]))


def test_s2d_merged_artifact_roundtrip(tmp_path):
    """`export --s2d-merged` artifact: consumes column-merged
    (S/2,S/4,24) frames — the SAME bytes as the s2d_host contract;
    ServingArtifact transparently blocks+merges a standard (S,S,3) RGB
    frame; detections match the standard artifact's (the merged stem +
    fused stage1 are the same math — RESULTS.md round 3)."""
    import dataclasses

    from unina_yolo_dla_tpu.models.detector import UninaYoloDla
    from unina_yolo_dla_tpu.quant.deploy import (
        fold_batchnorm,
        fold_downsample_space_to_depth,
        fold_stem_space_to_depth,
        merge_stem_columns,
    )

    cfg = ModelConfig(num_classes=4, base_channels=16, input_size=IMG,
                      compute_dtype=jnp.float32)
    _, variables = init_model(jax.random.key(0), cfg)
    folded = fold_batchnorm(variables)

    dep = dataclasses.replace(cfg, deploy=True)
    std_out = tmp_path / "std"
    export_serving_artifact(UninaYoloDla(dep), folded, std_out,
                            max_detections=64)

    merged = dataclasses.replace(cfg, deploy=True, stem_s2d=True,
                                 s2d_host=True, stage1_s2d=True,
                                 s2d_merged=True)
    m_vars = merge_stem_columns(fold_downsample_space_to_depth(
        fold_stem_space_to_depth(folded)))
    m_out = tmp_path / "s2dm"
    export_serving_artifact(UninaYoloDla(merged), m_vars, m_out,
                            max_detections=64)

    mcfg = json.loads((m_out / "config.json").read_text())
    assert mcfg["s2d_merged"] is True
    assert "in.layout=s2dm" in (m_out / "pjrt_plugin.conf").read_text()

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (IMG, IMG, 3), dtype=np.uint8)
    want = jax.device_get(ServingArtifact(std_out)(jnp.asarray(frame)))
    got = jax.device_get(ServingArtifact(m_out)(jnp.asarray(frame)))
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(want[3]))


def test_s2d_merged_batch_serving(tmp_path):
    """The merged engine composes with multi-stream serving: the batch
    graph consumes (B, S/2, S/4, 24) merged frames through the same
    fused-stage1 primitive (leading dims handled inside the primitive —
    the b8-regime A/B depends on this path)."""
    import dataclasses

    from unina_yolo_dla_tpu.models.detector import UninaYoloDla
    from unina_yolo_dla_tpu.ops.preprocess import space_to_depth_np
    from unina_yolo_dla_tpu.quant.deploy import (
        fold_batchnorm,
        fold_downsample_space_to_depth,
        fold_stem_space_to_depth,
        merge_stem_columns,
    )
    from unina_yolo_dla_tpu.runtime.pipeline import (
        build_batch_serving_fn,
        build_serving_fn,
    )

    cfg = ModelConfig(num_classes=4, base_channels=16, input_size=IMG,
                      compute_dtype=jnp.float32)
    _, variables = init_model(jax.random.key(0), cfg)
    merged = dataclasses.replace(cfg, deploy=True, stem_s2d=True,
                                 s2d_host=True, stage1_s2d=True,
                                 s2d_merged=True)
    m_vars = merge_stem_columns(fold_downsample_space_to_depth(
        fold_stem_space_to_depth(fold_batchnorm(variables))))
    model = UninaYoloDla(merged)

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (3, IMG, IMG, 3), dtype=np.uint8)
    fb = space_to_depth_np(frames)
    fm = fb.reshape(3, IMG // 2, IMG // 4, 24)

    batch_serve = jax.jit(build_batch_serving_fn(model, merged,
                                                 max_detections=64))
    d_batch = batch_serve(m_vars, jnp.asarray(fm))
    assert d_batch.boxes.shape == (3, 64, 4)

    single = jax.jit(build_serving_fn(model, merged, max_detections=64))
    for b in range(3):
        d1 = single(m_vars, jnp.asarray(fm[b]))
        np.testing.assert_array_equal(np.asarray(d1.valid),
                                      np.asarray(d_batch.valid[b]))
        np.testing.assert_allclose(np.asarray(d1.boxes),
                                   np.asarray(d_batch.boxes[b]),
                                   rtol=1e-3, atol=0.5)
