"""AOT serving artifact: the ``.engine`` equivalent.

Replaces the reference's export pipeline (export_trt.py: ONNX opset-13 ->
TensorRT builder -> serialized DLA engine) with the XLA-native path:

  jit(serving_fn) -> lower at static 640x640x1 shapes -> StableHLO
  -> serialized ``jax.export`` artifact + msgpack variables + config JSON.

The artifact directory is self-contained: a loader reconstructs the
frame->boxes callable without the model source. Compilation for the local
chip happens once at load (cached thereafter) — the analogue of TensorRT
deserializing an engine.

Fallback analyzer (parity with analyze_engine_layers /
print_fallback_report, export_trt.py:273-369): instead of checking for
layers that fell off the DLA, we statically verify the lowered program has
(a) no host callbacks (custom_call to python), (b) no dynamic shapes, and
(c) exactly one ~1 KB-scale device->host result set — the conditions for
retrace-free, jitter-free on-chip execution. Violations hard-fail the
export in strict mode.
"""
from __future__ import annotations

import dataclasses
import json
import re
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from ..models.config import (
    DEFAULT_CONF_THRESHOLD,
    DEFAULT_CP_Q,
    DEFAULT_IOU_THRESHOLD,
    MAX_DETECTIONS,
    ModelConfig,
)
from ..utils.checkpoint import load_msgpack_raw, save_msgpack
from .pipeline import (
    build_batch_serving_fn,
    build_camera_serving_fn,
    build_serving_fn,
)
from .pjrt_conf import write_pjrt_conf

# custom_call targets that imply a host round-trip inside the graph
_HOST_CALLBACK_PATTERNS = (
    "xla_python_cpu_callback",
    "xla_ffi_python",
    "CallbackToHost",
    "io_callback",
)


@dataclasses.dataclass
class FallbackReport:
    """Static analysis of the lowered serving program."""

    host_callbacks: list[str]
    dynamic_shapes: list[str]
    output_bytes: int
    num_custom_calls: int

    @property
    def clean(self) -> bool:
        return not self.host_callbacks and not self.dynamic_shapes


def analyze_lowered(stablehlo_text: str, out_tree) -> FallbackReport:
    """The analyze_engine_layers analogue, over StableHLO text."""
    callbacks = sorted({
        pat for pat in _HOST_CALLBACK_PATTERNS if pat in stablehlo_text})
    # dynamic dims appear as '?' or 'tensor<*' in stablehlo types
    dynamic = re.findall(r"tensor<[^>]*\?[^>]*>", stablehlo_text)[:5]

    out_bytes = sum(
        int(np.prod(leaf.shape)) * np.dtype(leaf.dtype).itemsize
        for leaf in jax.tree.leaves(out_tree))
    n_cc = stablehlo_text.count("stablehlo.custom_call")
    return FallbackReport(host_callbacks=callbacks,
                          dynamic_shapes=sorted(set(dynamic)),
                          output_bytes=out_bytes,
                          num_custom_calls=n_cc)


def print_fallback_report(report: FallbackReport, strict: bool = True,
                          log_fn: Callable[[str], None] = print) -> None:
    """Hard error on any host fallback when strict (export_trt.py:336-369
    'Zero-Fallback Design' parity)."""
    log_fn("=== serving-program fallback report ===")
    log_fn(f"  host callbacks:   {report.host_callbacks or 'none'}")
    log_fn(f"  dynamic shapes:   {report.dynamic_shapes or 'none'}")
    log_fn(f"  custom calls:     {report.num_custom_calls}")
    log_fn(f"  result transfer:  {report.output_bytes} B device->host")
    if not report.clean and strict:
        raise RuntimeError(
            "serving program is not host-fallback-free: "
            f"callbacks={report.host_callbacks} "
            f"dynamic={report.dynamic_shapes}")


def export_serving_artifact(
    model,
    variables: dict[str, Any],
    output_dir: str | Path,
    conf_threshold: float = DEFAULT_CONF_THRESHOLD,
    iou_threshold: float = DEFAULT_IOU_THRESHOLD,
    q_factor: float = DEFAULT_CP_Q,
    max_detections: int = MAX_DETECTIONS,
    strict: bool = True,
    platforms: tuple[str, ...] | None = None,
    camera: tuple[int, int, str] | None = None,
    batch: int | None = None,
    camera_letterbox: bool = False,
    box_space: str = "model",
) -> Path:
    """Serialize the fused frame->boxes program + weights + config.

    ``platforms``: lowering targets, e.g. ("cpu", "tpu") for a portable
    artifact (the multi-arch engine TensorRT cannot build); None lowers
    for the current backend only.

    ``camera=(height, width, format)``: export the camera-path program
    instead — raw BGRA/RGB/NV12 at camera resolution in, on-chip colour
    convert + MXU bilinear resize baked into the graph (the
    resize_bgra_to_rgb_normalize_kernel / nv12 kernel parity,
    cuda_preprocess.cu:144-253). ``batch=N``: export the multi-stream
    program taking (N, S, S, 3) RGB frames. Mutually exclusive.
    """
    cfg: ModelConfig = model.config
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    if camera is not None and batch is not None:
        raise ValueError("camera and batch exports are mutually exclusive")
    if cfg.s2d_host and camera is not None:
        raise ValueError(
            "s2d_host is incompatible with camera exports: the camera "
            "program's frame lives on-device after the on-chip resize, so "
            "there is no host staging pass to fuse the shuffle into")

    if camera is not None:
        cam_h, cam_w, cam_fmt = camera
        if cam_fmt not in ("rgb", "bgra", "nv12"):
            raise ValueError(f"unknown camera format {cam_fmt!r}")
        if cam_fmt == "nv12" and (cam_h % 2 or cam_w % 2):
            raise ValueError("NV12 camera dims must be even")
        serve = build_camera_serving_fn(
            model, cfg, cam_h, cam_w, cam_fmt, conf_threshold,
            iou_threshold, q_factor, max_detections,
            letterbox=camera_letterbox, box_space=box_space)
        frame_shape = {
            "rgb": (cam_h, cam_w, 3),
            "bgra": (cam_h, cam_w, 4),
            "nv12": (cam_h * 3 // 2, cam_w),
        }[cam_fmt]
    # host-blocked input contracts: s2d (S/2,S/2,12), or the byte-identical
    # column-MERGED view (S/2,S/4,24) for the fused-stage1 engine
    if getattr(cfg, "s2d_merged", False):
        blocked_shape = (cfg.input_size // 2, cfg.input_size // 4, 24)
    elif cfg.s2d_host:
        blocked_shape = (cfg.input_size // 2, cfg.input_size // 2, 12)
    else:
        blocked_shape = None
    if batch is not None:
        serve = build_batch_serving_fn(model, cfg, conf_threshold,
                                       iou_threshold, q_factor,
                                       max_detections)
        frame_shape = ((batch, *blocked_shape) if blocked_shape
                       else (batch, cfg.input_size, cfg.input_size, 3))
    elif camera is None:
        serve = build_serving_fn(model, cfg, conf_threshold, iou_threshold,
                                 q_factor, max_detections)
        frame_shape = (blocked_shape if blocked_shape
                       else (cfg.input_size, cfg.input_size, 3))

    v = {k: variables[k] for k in ("params", "batch_stats", "quant")
         if k in variables}
    frame_spec = jax.ShapeDtypeStruct(frame_shape, jnp.uint8)
    v_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), v)

    fn = jax.jit(serve)
    lowered = fn.lower(v_spec, frame_spec)
    hlo_text = lowered.as_text()
    out_tree = jax.eval_shape(serve, v_spec, frame_spec)
    report = analyze_lowered(hlo_text, out_tree)
    print_fallback_report(report, strict=strict)

    exported = jax_export.export(fn, platforms=platforms)(v_spec, frame_spec)
    (output_dir / "serving.stablehlo").write_bytes(exported.serialize())
    save_msgpack(v, output_dir / "variables.msgpack")

    # Weights-baked companion program for the NATIVE PJRT executor
    # (runtime/native/src/executor_pjrt.cpp): a frame-only-input StableHLO
    # bytecode module with the variables embedded as constants, plus the
    # serialized default CompileOptions proto PJRT_Client_Compile needs.
    # This is the piece that lets C++ drive the chip with no Python in
    # the loop (the TensorRT-engine-file analogue, perception_node.cpp
    # :430-437 loads exactly one self-contained blob).
    #
    # Output is ONE packed (K, 7) f32 tensor [x1,y1,x2,y2,score,cls,valid]
    # so the native hot loop has a single device->host read — the same
    # single-sync discipline as the reference's compacted-detections copy
    # (gpu_postprocess.cu:395-442, one D2H per frame).
    # host-side numpy constants: tracing then embeds them as literals with
    # ZERO device traffic — baking must not depend on (or wedge on) a live
    # accelerator; the program is cross-lowered for its target platform
    v_const = jax.tree.map(np.asarray, v)

    def serve_packed(frame):
        dets = serve(v_const, frame)
        # (..., K, 7); batch exports gain a leading stream axis
        return jnp.concatenate([
            dets.boxes.astype(jnp.float32),
            dets.scores.astype(jnp.float32)[..., None],
            dets.classes.astype(jnp.float32)[..., None],
            dets.valid.astype(jnp.float32)[..., None],
        ], axis=-1)

    # the native executor passes exactly ONE argument, so the baked module
    # must be single-platform (multi-platform export adds an index arg):
    # prefer tpu out of a multi-platform request, else the current backend
    if platforms and len(platforms) == 1:
        baked_platforms = tuple(platforms)
    elif platforms:
        baked_platforms = (("tpu",) if "tpu" in platforms
                           else (platforms[0],))
    else:
        baked_platforms = None
    baked = jax_export.export(
        jax.jit(serve_packed), platforms=baked_platforms)(frame_spec)
    (output_dir / "serving_baked.stablehlo").write_bytes(
        baked.mlir_module_serialized)
    from jax._src.lib import xla_client as _xc

    (output_dir / "compile_options.pb").write_bytes(
        _xc.CompileOptions().SerializeAsString())
    write_pjrt_conf(output_dir, max_detections=max_detections,
                    camera=camera, batch=batch, s2d_host=cfg.s2d_host,
                    s2d_merged=getattr(cfg, "s2d_merged", False))
    (output_dir / "config.json").write_text(json.dumps({
        "num_classes": cfg.num_classes,
        "base_channels": cfg.base_channels,
        "lite_p2": cfg.lite_p2,
        "input_size": cfg.input_size,
        "stem_s2d": cfg.stem_s2d,
        "s2d_host": cfg.s2d_host,
        "stage1_s2d": cfg.stage1_s2d,
        "s2d_merged": getattr(cfg, "s2d_merged", False),
        "fused_stem": getattr(cfg, "fused_stem", False),
        "merged_head": getattr(cfg, "merged_head", False),
        "quantized": "quant" in v,
        "conf_threshold": conf_threshold,
        "iou_threshold": iou_threshold,
        "q_factor": q_factor,
        "max_detections": max_detections,
        "output_bytes": report.output_bytes,
        "platforms": list(exported.platforms),
        "camera": ({"height": camera[0], "width": camera[1],
                    "format": camera[2], "letterbox": camera_letterbox,
                    "box_space": box_space} if camera else None),
        "batch": batch,
    }, indent=2))
    (output_dir / "fallback_report.json").write_text(json.dumps(
        dataclasses.asdict(report), indent=2))
    return output_dir


class ServingArtifact:
    """Loaded artifact: a frame->Detections callable with baked weights.

    The TensorRT-engine-deserialization analogue; the first call compiles
    for the local chip (cached), subsequent calls are retrace-free.
    """

    def __init__(self, directory: str | Path) -> None:
        self.dir = Path(directory)
        required = ("config.json", "serving.stablehlo", "variables.msgpack")
        missing = [f for f in required if not (self.dir / f).exists()]
        if missing:
            raise FileNotFoundError(
                f"incomplete serving artifact at {self.dir}: missing "
                f"{', '.join(missing)} (expected {', '.join(required)} — "
                "produce one with `python -m unina_yolo_dla_tpu.export`)")
        self.config = json.loads((self.dir / "config.json").read_text())
        exported = jax_export.deserialize(
            (self.dir / "serving.stablehlo").read_bytes())
        self._exported = exported
        # weights go device-resident ONCE at load — as host numpy they
        # would be re-uploaded on every __call__ (the C++ PJRT executor
        # likewise keeps them in device buffers across frames)
        self.variables = jax.device_put(
            load_msgpack_raw(self.dir / "variables.msgpack"))
        self._call = jax.jit(exported.call)

    def __call__(self, frame: jnp.ndarray):
        if self.config.get("s2d_host") and frame.shape[-1] == 3:
            # the artifact consumes space-to-depth-blocked frames; the
            # shuffle is the HOST's job (free in the native staging pass,
            # one numpy transpose here) — on-device it costs more than
            # the layout copies it removes (RESULTS.md round 3)
            from ..ops.preprocess import space_to_depth_np

            frame = space_to_depth_np(np.asarray(frame))
            if self.config.get("s2d_merged"):
                # fused-stage1 engine: same bytes viewed with adjacent
                # column pairs merged into lanes (free reshape)
                *lead, hh, hw, c = frame.shape
                frame = frame.reshape(*lead, hh, hw // 2, 2 * c)
        return self._call(self.variables, frame)


def validate_artifact_shapes(artifact: ServingArtifact,
                             expected_input: int,
                             expected_classes: int) -> None:
    """Engine-vs-config dimension validation at configure time
    (perception_node.cpp:440-457 parity): refuse to serve on mismatch."""
    c = artifact.config
    if c["input_size"] != expected_input:
        raise ValueError(
            f"artifact input size {c['input_size']} != expected "
            f"{expected_input}")
    if c["num_classes"] != expected_classes:
        raise ValueError(
            f"artifact classes {c['num_classes']} != expected "
            f"{expected_classes}")
