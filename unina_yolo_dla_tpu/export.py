"""Export CLI: checkpoint -> AOT serving artifact.

The ``export_trt.py`` pipeline equivalent (reference export_trt.py:497-566):
load weights, bake serving thresholds (conf/IoU/conformal q from
cp_calibration.json), lower + serialize the fused frame->boxes program,
run the fallback analyzer (strict by default — export fails if the program
is not host-callback-free / static-shaped).
"""
from __future__ import annotations

import argparse

import jax
import numpy as np

import dataclasses

from .models.config import ModelConfig
from .models.detector import UninaYoloDla, init_model
from .quant.deploy import fold_batchnorm, quantize_weights_int8
from .quant.fake_quant import PERF_EXCLUDE, QuantSpec
from .quant.qat import make_qat_model
from .train.conformal import load_cp_q
from .runtime.aot import export_serving_artifact
from .utils.checkpoint import load_msgpack_raw


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        description="Export an AOT serving artifact (the .engine analogue)")
    p.add_argument("--weights", required=True, help=".msgpack variables")
    p.add_argument("--output", default="serving_artifact")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--base-channels", type=int, default=32)
    p.add_argument("--num-classes", type=int, default=4)
    p.add_argument("--lite-p2", action="store_true")
    p.add_argument("--conf", type=float, default=0.5)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--cp-calibration", default=None,
                   help="cp_calibration.json (bakes q_hat)")
    p.add_argument("--q", type=float, default=0.1,
                   help="conformal dilation factor if no calibration file")
    p.add_argument("--max-detections", type=int, default=1024)
    p.add_argument("--no-strict", action="store_true",
                   help="warn instead of fail on fallback-analyzer findings")
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering targets (e.g. cpu,tpu) "
                        "for a portable artifact; default: current backend")
    p.add_argument("--stem-s2d", action="store_true",
                   help="space-to-depth stem with the shuffle ON-DEVICE "
                        "(deploy graphs only): numerically identical, but "
                        "measured SLOWER than the standard stem — the "
                        "device-side shuffle costs more than the C=3 "
                        "layout copies it removes; kept for the A/B. Use "
                        "--stem-s2d-host for the fast variant. Implies "
                        "--fold-bn")
    p.add_argument("--stem-s2d-host", action="store_true",
                   help="space-to-depth stem with the shuffle on the "
                        "HOST: the artifact consumes (S/2,S/2,12) blocked "
                        "frames (ServingArtifact/the native host block "
                        "(S,S,3) frames transparently), and the stem "
                        "lowers to one MXU matmul — eliminates the C=3 "
                        "stem layout copies (~31%% of frame time, "
                        "RESULTS.md round 3). Implies --fold-bn and "
                        "--stage1-s2d; incompatible with --camera")
    p.add_argument("--s2d-merged", action="store_true",
                   help="column-MERGED engine: --stem-s2d-host input "
                        "bytes viewed as (S/2,S/4,24), the stem matmul "
                        "emits merged columns directly, and stage1 runs "
                        "as ONE fused Pallas VMEM pass (s2d + shift-dot "
                        "+ bias + ReLU) — the fastest measured stage1 "
                        "lowering (0.036 vs 0.082 ms isolated). Implies "
                        "--stem-s2d-host")
    p.add_argument("--fused-stem", action="store_true",
                   help="with --s2d-merged: stem AND stage1 in ONE "
                        "Pallas VMEM pass over the merged frame "
                        "(ops/pallas/stem_kernel.py). Wins BOTH regimes "
                        "in-graph on v5e (b8: 6.83 -> 5.76 ms/batch — "
                        "the batched XLA stem lowering pays 1.08 "
                        "ms/batch of pad fusions; b1: 0.710 -> 0.689 "
                        "ms), graph-exact vs the unfused chain")
    p.add_argument("--stage1-s2d", action="store_true",
                   help="blocked stage1 downsample (deploy graphs): "
                        "on-device reshape-transpose s2d + shift-dot "
                        "matmul, 2.7x the lax.conv lowering "
                        "(tools/stage1_probe.py); no input-contract "
                        "change. Implied by --stem-s2d-host")
    p.add_argument("--fused-c3k2", action="store_true",
                   help="run each float-path C3k2 as ONE fused VMEM pass "
                        "(ops/pallas/c3k2_kernel.py) instead of ~5 HBM "
                        "round-trips; covers the PERF_EXCLUDE 160^2 "
                        "blocks in the int8 engine. Implies --fold-bn")
    p.add_argument("--fused-head", action="store_true",
                   help="run each float-path decoupled head as ONE fused "
                        "VMEM pass (ops/pallas/head_kernel.py); head_p2 "
                        "(always bf16) is ~14%% of r3 device time. "
                        "Implies --fold-bn")
    p.add_argument("--merged-head", action="store_true",
                   help="merge each float-path head level's cls/reg "
                        "branches into full-MXU-lane convs (channel-"
                        "concat conv1, block-diagonal conv2/pred — same "
                        "math, activations read once; models/head.py "
                        "_merged). Implies --fold-bn")
    p.add_argument("--fold-bn", action="store_true",
                   help="fold BatchNorm into conv weights (TensorRT-style "
                        "graph optimisation; drops batch_stats from the "
                        "artifact)")
    p.add_argument("--int8", action="store_true",
                   help="export the TRUE int8 engine (fused int8 chain: "
                        "int8 weights + int8 inter-layer activations -> "
                        "int32 MXU accumulation, mixed-precision per the "
                        "measured v5e exclusion list); requires a "
                        "calibrated (QAT) checkpoint and implies --fold-bn")
    p.add_argument("--calib-min-images", type=int, default=50,
                   help="with --int8: refuse checkpoints calibrated on "
                        "fewer images (export_trt.py:547-551 parity); "
                        "0 disables for deliberate smoke exports")
    p.add_argument("--int8-unfused", action="store_true",
                   help="with --int8: round-1 engine (dequant to bf16 "
                        "between layers) instead of the fused chain")
    p.add_argument("--camera", default=None, metavar="HxW",
                   help="export the camera-path artifact: raw frames at "
                        "this resolution, on-chip convert + MXU resize "
                        "(cuda_preprocess.cu:144-253 parity)")
    p.add_argument("--format", default="bgra",
                   choices=("bgra", "rgb", "nv12"),
                   help="camera pixel format (with --camera)")
    p.add_argument("--letterbox", action="store_true", default=True,
                   help="with --camera: bake aspect-preserving resize + "
                        "gray pad on-chip (the TRAINING geometry) — the "
                        "DEFAULT: the measured A/B is +39 mAP50 pts over "
                        "stretch on a 16:9 val set (RESULTS.md round 3)")
    p.add_argument("--stretch", dest="letterbox", action="store_false",
                   help="with --camera: the reference's literal stretch "
                        "resize (cuda_preprocess.cu:144-204) instead of "
                        "letterbox — costs ~39 mAP50 pts, kept for parity "
                        "experiments")
    p.add_argument("--box-space", default="camera",
                   choices=("model", "camera"),
                   help="with --camera: coordinate space of returned "
                        "boxes; 'camera' (default) undoes resize/pad "
                        "inside the program")
    p.add_argument("--batch", type=int, default=None,
                   help="export the multi-stream artifact taking "
                        "(N, S, S, 3) RGB frames")
    args = p.parse_args(argv)

    variables = load_msgpack_raw(args.weights)
    # calibration provenance stamped by the train CLI (train.py phase 2);
    # popped before any model transform sees the tree
    calib_meta = variables.pop("calib_meta", None)
    quantized = "quant" in variables
    cfg = ModelConfig(num_classes=args.num_classes,
                      base_channels=args.base_channels,
                      lite_p2=args.lite_p2, input_size=args.imgsz)
    if args.int8 and not quantized:
        raise SystemExit("--int8 requires a calibrated checkpoint "
                         "(quant collection with activation amax; run "
                         "phase-2 QAT or prepare_qat_variables first)")
    if args.int8 and calib_meta is not None:
        n_calib = int(np.asarray(calib_meta["images"]))
        if n_calib < args.calib_min_images:
            raise SystemExit(
                f"--int8 refused: checkpoint was calibrated on only "
                f"{n_calib} images (>= {args.calib_min_images} required; "
                "parity: export_trt.py:547-551 — short calibration data "
                "exports a confidently-wrong engine). Re-calibrate with "
                "more data or pass --calib-min-images 0 for a deliberate "
                "smoke export.")
    if args.s2d_merged:
        args.stem_s2d_host = True
    if (args.fold_bn or args.int8 or args.stem_s2d or args.stem_s2d_host
            or args.stage1_s2d or args.fused_c3k2 or args.fused_head
            or args.merged_head):
        variables = fold_batchnorm(variables)
        cfg = dataclasses.replace(cfg, deploy=True)
        print(">>> BatchNorm folded into conv weights")
    if args.stem_s2d or args.stem_s2d_host:
        from .quant.deploy import fold_stem_space_to_depth

        variables = fold_stem_space_to_depth(variables)
        cfg = dataclasses.replace(cfg, stem_s2d=True,
                                  s2d_host=args.stem_s2d_host)
        where = "host" if args.stem_s2d_host else "device"
        print(f">>> stem space-to-depth folded (2x2 s1 over 12ch, "
              f"shuffle on the {where})")
    if args.stage1_s2d or args.stem_s2d_host:
        from .quant.deploy import fold_downsample_space_to_depth

        variables = fold_downsample_space_to_depth(variables)
        cfg = dataclasses.replace(cfg, stage1_s2d=True)
        print(">>> stage1 downsample blocked (2x2 s1 shift-dot, "
              "contraction 128)")
    if args.s2d_merged:
        from .quant.deploy import merge_stem_columns

        variables = merge_stem_columns(variables)
        cfg = dataclasses.replace(cfg, s2d_merged=True)
        print(">>> stem columns merged: input (S/2,S/4,24), stage1 is "
              "the fused Pallas VMEM pass")
    if args.fused_stem:
        if not args.s2d_merged:
            raise SystemExit("--fused-stem requires --s2d-merged (the "
                             "kernel consumes the column-merged frame)")
        cfg = dataclasses.replace(cfg, fused_stem=True)
        print(">>> stem+stage1 fused: one Pallas VMEM pass from the "
              "merged frame to the stage1 output")
    if args.fused_c3k2:
        cfg = dataclasses.replace(cfg, fused_c3k2=True)
        print(">>> C3k2 blocks fused: one VMEM pass per float-path block "
              "(Pallas on tpu, identical-math XLA form elsewhere)")
    if args.fused_head:
        cfg = dataclasses.replace(cfg, fused_head=True)
        print(">>> decoupled heads fused: six convs per level in one "
              "VMEM pass (float-path levels)")
    if args.merged_head:
        cfg = dataclasses.replace(cfg, merged_head=True)
        print(">>> decoupled heads merged: cls/reg branches as full-lane "
              "channel-concat/block-diagonal convs (float-path levels)")
    if args.int8:
        if not args.int8_unfused:
            flat = jax.tree_util.tree_flatten_with_path(
                variables.get("quant", {}))[0]
            has_out_q = any(
                "out_q" in "/".join(str(getattr(k, "key", k)) for k in p)
                for p, _ in flat)
            if not has_out_q:
                raise SystemExit(
                    "--int8 (fused engine) needs out_q/add_q activation "
                    "amaxes, which this checkpoint's calibration predates "
                    "— re-run phase-2 calibration (train CLI) or pass "
                    "--int8-unfused for the round-1 engine")
        if args.int8_unfused:
            spec = QuantSpec(mode="int8")
        else:
            # fused chain with the measured mixed-precision list — the
            # fastest engine on v5e (RESULTS.md)
            spec = QuantSpec(mode="int8_fused", exclude=PERF_EXCLUDE)
        variables = quantize_weights_int8(variables, spec)
        cfg = dataclasses.replace(cfg, quant=spec)
        model = UninaYoloDla(cfg)
        print(f">>> int8 engine ({spec.mode}): weights quantised, "
              "integer conv path on")
    elif quantized:
        model = make_qat_model(cfg)
        print(">>> quantized checkpoint detected: exporting int8-QAT "
              "(fake-quant) model")
    else:
        model = (UninaYoloDla(cfg) if args.fold_bn
                 else init_model(jax.random.key(0), cfg)[0])

    q = (load_cp_q(args.cp_calibration, args.q)
         if args.cp_calibration else args.q)
    platforms = (tuple(args.platforms.split(","))
                 if args.platforms else None)
    camera = None
    if args.camera:
        h, w = (int(v) for v in args.camera.lower().split("x"))
        camera = (h, w, args.format)
    out = export_serving_artifact(
        model, variables, args.output,
        conf_threshold=args.conf, iou_threshold=args.iou, q_factor=q,
        max_detections=args.max_detections, strict=not args.no_strict,
        platforms=platforms, camera=camera, batch=args.batch,
        camera_letterbox=args.letterbox, box_space=args.box_space)
    print(f">>> artifact written to {out} (q={q})")


if __name__ == "__main__":
    main()
