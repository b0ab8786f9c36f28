"""Camera-path serving pipeline tests (BGRA camera res -> boxes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unina_yolo_dla_tpu.models import ModelConfig, init_model
from unina_yolo_dla_tpu.runtime.pipeline import (
    build_camera_serving_fn,
    build_serving_fn,
)

IMG = 32


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(num_classes=4, base_channels=16, input_size=IMG,
                      compute_dtype=jnp.float32)
    model, variables = init_model(jax.random.key(0), cfg)
    v = {k: variables[k] for k in ("params", "batch_stats")}
    return cfg, model, v


def test_camera_pipeline_runs_and_is_jittable(setup):
    cfg, model, v = setup
    serve = jax.jit(build_camera_serving_fn(
        model, cfg, camera_height=48, camera_width=64,
        camera_format="bgra", max_detections=64))
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 256, (48, 64, 4), dtype=np.uint8))
    dets = serve(v, frame)
    assert dets.boxes.shape == (64, 4)
    # static-shape result; boxes in model pixel space
    assert np.isfinite(np.asarray(dets.scores)).all()


def test_camera_path_matches_direct_path_when_same_size(setup):
    """At camera res == model res and RGB input, the camera path must
    reduce to the direct 640-path (identity resize)."""
    cfg, model, v = setup
    rng = np.random.default_rng(1)
    frame = rng.integers(0, 256, (IMG, IMG, 3)).astype(np.uint8)

    direct = build_serving_fn(model, cfg, max_detections=64)
    cam = build_camera_serving_fn(model, cfg, IMG, IMG,
                                  camera_format="rgb", max_detections=64)
    d1 = jax.jit(direct)(v, jnp.asarray(frame))
    d2 = jax.jit(cam)(v, jnp.asarray(frame))
    np.testing.assert_array_equal(np.asarray(d1.valid), np.asarray(d2.valid))
    np.testing.assert_allclose(np.asarray(d1.boxes), np.asarray(d2.boxes),
                               rtol=1e-4, atol=1e-3)


def test_bgra_alpha_ignored(setup):
    cfg, model, v = setup
    rng = np.random.default_rng(2)
    bgra = rng.integers(0, 256, (40, 40, 4)).astype(np.uint8)
    bgra2 = bgra.copy()
    bgra2[..., 3] = 0  # different alpha must not change detections
    serve = jax.jit(build_camera_serving_fn(model, cfg, 40, 40,
                                            max_detections=64))
    d1 = serve(v, jnp.asarray(bgra))
    d2 = serve(v, jnp.asarray(bgra2))
    np.testing.assert_array_equal(np.asarray(d1.scores),
                                  np.asarray(d2.scores))


def test_pallas_pipeline_matches_xla_pipeline(setup):
    """Full serving pipeline with Pallas kernels (interpret on CPU) must
    match the XLA-fused default."""
    import unina_yolo_dla_tpu.ops.pallas.decode_kernel as dk
    import unina_yolo_dla_tpu.ops.pallas.nms_kernel as nk
    import unina_yolo_dla_tpu.ops.pallas.preprocess_kernel as pk
    import functools

    cfg, model, v = setup
    rng = np.random.default_rng(3)
    frame = jnp.asarray(rng.integers(0, 256, (IMG, IMG, 3), dtype=np.uint8))

    xla_serve = build_serving_fn(model, cfg, max_detections=256)
    d_xla = xla_serve(v, frame)

    # force interpret mode on the CPU backend
    orig = (dk.decode_level_pallas, nk.nms_pallas, pk.normalize_pallas)
    dk_i = functools.partial(orig[0].__wrapped__, interpret=True)
    nk_i = functools.partial(orig[1].__wrapped__, interpret=True)
    pk_i = functools.partial(orig[2].__wrapped__, interpret=True)
    import unina_yolo_dla_tpu.ops.pallas as pallas_pkg

    pallas_pkg.decode_level_pallas = dk_i
    pallas_pkg.nms_pallas = nk_i
    pallas_pkg.normalize_pallas = pk_i
    try:
        p_serve = build_serving_fn(model, cfg, max_detections=256,
                                   use_pallas_kernels=True)
        d_pal = p_serve(v, frame)
    finally:
        (pallas_pkg.decode_level_pallas, pallas_pkg.nms_pallas,
         pallas_pkg.normalize_pallas) = orig

    np.testing.assert_array_equal(np.asarray(d_xla.valid),
                                  np.asarray(d_pal.valid))
    np.testing.assert_allclose(np.asarray(d_xla.boxes),
                               np.asarray(d_pal.boxes), rtol=1e-3, atol=0.1)


def test_batch_serving_matches_single(setup):
    from unina_yolo_dla_tpu.runtime.pipeline import build_batch_serving_fn

    cfg, model, v = setup
    rng = np.random.default_rng(4)
    frames = rng.integers(0, 256, (3, IMG, IMG, 3)).astype(np.uint8)

    batch_serve = jax.jit(build_batch_serving_fn(model, cfg,
                                                 max_detections=64))
    d_batch = batch_serve(v, jnp.asarray(frames))
    assert d_batch.boxes.shape == (3, 64, 4)

    single = jax.jit(build_serving_fn(model, cfg, max_detections=64))
    for b in range(3):
        d1 = single(v, jnp.asarray(frames[b]))
        np.testing.assert_array_equal(np.asarray(d1.valid),
                                      np.asarray(d_batch.valid[b]))
        np.testing.assert_allclose(np.asarray(d1.boxes),
                                   np.asarray(d_batch.boxes[b]),
                                   rtol=1e-3, atol=0.5)


def test_nv12_camera_path_matches_rgb(setup):
    """NV12 camera pipeline == RGB pipeline on the converted frame (the
    nv12_to_rgb_normalize_kernel parity, cuda_preprocess.cu:212-253)."""
    from unina_yolo_dla_tpu.ops.preprocess import nv12_to_rgb

    cfg, model, variables = setup
    rng = np.random.default_rng(3)
    cam_h, cam_w = 48, 64
    y = rng.integers(16, 235, (cam_h, cam_w), dtype=np.uint8)
    uv = rng.integers(16, 240, (cam_h // 2, cam_w // 2, 2), dtype=np.uint8)
    planar = np.concatenate(
        [y.reshape(-1), uv.reshape(-1)]).reshape(cam_h * 3 // 2, cam_w)

    serve_nv12 = jax.jit(build_camera_serving_fn(
        model, cfg, cam_h, cam_w, "nv12"))
    d_nv12 = serve_nv12(variables, jnp.asarray(planar))

    rgb = np.asarray(nv12_to_rgb(jnp.asarray(y), jnp.asarray(uv)))
    serve_rgb = jax.jit(build_camera_serving_fn(
        model, cfg, cam_h, cam_w, "rgb"))
    d_rgb = serve_rgb(variables, jnp.asarray(rgb.astype(np.uint8)))

    # u8 rounding of the converted frame allows tiny score differences
    np.testing.assert_allclose(np.asarray(d_nv12.scores),
                               np.asarray(d_rgb.scores), atol=0.05)


def test_camera_letterbox_matches_host_letterbox(setup):
    """On-chip letterbox == host-side training letterbox (data pipeline
    geometry) followed by the direct serving path: no train/serve skew."""
    from unina_yolo_dla_tpu.ops.preprocess import letterbox

    cfg, model, v = setup
    rng = np.random.default_rng(5)
    cam_h, cam_w = 24, 48  # wide camera aspect
    frame = rng.integers(0, 256, (cam_h, cam_w, 3)).astype(np.uint8)

    cam = jax.jit(build_camera_serving_fn(
        model, cfg, cam_h, cam_w, camera_format="rgb", max_detections=64,
        letterbox=True))
    d_cam = cam(v, jnp.asarray(frame))

    boxed, _scale, _pads = letterbox(jnp.asarray(frame), cfg.input_size)
    direct = jax.jit(build_serving_fn(model, cfg, max_detections=64))
    d_host = direct(v, jnp.asarray(np.round(np.asarray(boxed))
                                   .astype(np.uint8)))
    # u8 rounding of the host letterbox allows tiny score differences
    np.testing.assert_allclose(np.asarray(d_cam.scores),
                               np.asarray(d_host.scores), atol=0.05)


def test_camera_box_space_mapping(setup):
    """box_space='camera' must equal the model-space boxes with pad/scale
    undone inside the program (letterbox) or per-axis stretch undone."""
    cfg, model, v = setup
    rng = np.random.default_rng(6)
    cam_h, cam_w = 24, 48
    frame = jnp.asarray(rng.integers(0, 256, (cam_h, cam_w, 3),
                                     dtype=np.uint8))
    for lb in (False, True):
        kw = dict(camera_format="rgb", max_detections=64, letterbox=lb)
        d_model = jax.jit(build_camera_serving_fn(
            model, cfg, cam_h, cam_w, box_space="model", **kw))(v, frame)
        d_cam = jax.jit(build_camera_serving_fn(
            model, cfg, cam_h, cam_w, box_space="camera", **kw))(v, frame)
        b = np.asarray(d_model.boxes)
        if lb:
            s = cfg.input_size
            scale = min(s / cam_h, s / cam_w)
            pad_y = (s - round(cam_h * scale)) // 2
            pad_x = (s - round(cam_w * scale)) // 2
            expect = (b - [pad_x, pad_y, pad_x, pad_y]) / scale
        else:
            expect = b * [cam_w / cfg.input_size, cam_h / cfg.input_size,
                          cam_w / cfg.input_size, cam_h / cfg.input_size]
        expect = np.clip(expect, 0, [cam_w, cam_h, cam_w, cam_h])
        np.testing.assert_allclose(np.asarray(d_cam.boxes), expect,
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_array_equal(np.asarray(d_cam.valid),
                                      np.asarray(d_model.valid))


def test_camera_artifact_export_and_load(setup, tmp_path):
    """export --camera HxW --format nv12 produces a loadable artifact
    whose program consumes the RAW planar frame."""
    from unina_yolo_dla_tpu.runtime.aot import (
        ServingArtifact,
        export_serving_artifact,
    )

    cfg, model, variables = setup
    cam_h, cam_w = 48, 64
    out = tmp_path / "cam_artifact"
    export_serving_artifact(model, variables, out, max_detections=32,
                            camera=(cam_h, cam_w, "nv12"))
    art = ServingArtifact(out)
    assert art.config["camera"] == {"height": cam_h, "width": cam_w,
                                    "format": "nv12", "letterbox": False,
                                    "box_space": "model"}
    planar = np.zeros((cam_h * 3 // 2, cam_w), np.uint8)
    boxes, scores, classes, valid = jax.device_get(art(planar))
    assert boxes.shape == (32, 4)
    conf = (out / "pjrt_plugin.conf").read_text()
    assert "in.format=nv12" in conf


def test_batch_artifact_export_and_load(setup, tmp_path):
    """export --batch N: multi-stream artifact with a leading stream
    axis on every output."""
    from unina_yolo_dla_tpu.runtime.aot import (
        ServingArtifact,
        export_serving_artifact,
    )

    cfg, model, variables = setup
    out = tmp_path / "batch_artifact"
    export_serving_artifact(model, variables, out, max_detections=32,
                            batch=2)
    art = ServingArtifact(out)
    assert art.config["batch"] == 2
    frames = np.zeros((2, cfg.input_size, cfg.input_size, 3), np.uint8)
    boxes, scores, classes, valid = jax.device_get(art(frames))
    assert boxes.shape == (2, 32, 4)
