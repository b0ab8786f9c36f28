"""Model configuration.

Mirrors the constructor surface of the reference model
(``/root/reference/unina_yolo_dla/model.py:308-345``): ``num_classes``,
``base_channels`` (32 standard / 16 lite), ``lite_p2``. Adds TPU-specific
knobs: compute dtype (bfloat16 feeds the MXU at full rate) and input size.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

from ..quant.fake_quant import QuantSpec


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static architecture + numerics configuration.

    Attributes:
        num_classes: number of object classes (4 cone classes by default).
        base_channels: base channel width; widths are
            ``base_channels * {1, 2, 4, 8, 16}`` (reference model.py:172-176).
        lite_p2: if True the P2 stage uses a plain conv instead of C3k2
            (reference model.py:184-190; the DLA-CBUF analogue on TPU is
            VMEM footprint of the 160x160 stage).
        input_size: static square input resolution (640, batch-1 serving).
        compute_dtype: activation dtype inside the network. bfloat16 by
            default — MXU-native on TPU. Params stay float32.
        num_anchors: anchors per cell (always 1: anchor-free head).
    """

    num_classes: int = 4
    base_channels: int = 32
    lite_p2: bool = False
    input_size: int = 640
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    num_anchors: int = 1
    # int8 QAT / calibration behaviour; None == FP model (quant='off').
    quant: QuantSpec | None = None
    # deploy mode: BatchNorm pre-folded into conv weights+bias
    # (quant.deploy.fold_batchnorm produces the matching variables).
    deploy: bool = False
    # deploy-graph stem space-to-depth: the 640x640x3 stride-2 stem
    # becomes a 320x320x12 stride-1 conv (2x2 kernel), eliminating the
    # C=3 layout copies that cost ~30% of frame time on TPU (measured,
    # RESULTS.md round 3). Weights via quant.deploy.fold_stem_space_to_
    # depth; training keeps the standard stem (parity with the reference
    # graph, model.py:172-176).
    stem_s2d: bool = False
    # with stem_s2d: the graph INPUT is already space-to-depth blocked
    # (S/2, S/2, 12) — the shuffle runs on the HOST (free inside the
    # native host's per-pixel staging pass; one numpy transpose in the
    # Python path), because on-device the shuffle costs more than the
    # copies it removes in every formulation (RESULTS.md round 3). The
    # stem then lowers to four stride-1 shifted slices + one
    # (H*W, 4C) @ (4C, O) matmul — measured 8x faster than any
    # lax.conv formulation of the same math (stem_probe.py).
    s2d_host: bool = False
    # deploy-graph blocked stage1 downsample: the 3x3 stride-2
    # stage1_conv becomes on-device space-to-depth (reshape-transpose —
    # clean for bf16 C=32, unlike the u8 C=3 stem) + a 2x2 stride-1
    # shift-dot matmul with contraction 4*32=128. Measured 0.201 ->
    # 0.074 ms isolated (tools/stage1_probe.py); weights via
    # quant.deploy.fold_downsample_space_to_depth. stage1_conv is
    # quant-excluded (DEFAULT_EXCLUDE), so this composes with int8.
    stage1_s2d: bool = False
    # column-MERGED engine (deploy graphs; implies stem_s2d + s2d_host +
    # stage1_s2d): the graph input is the SAME host bytes viewed as
    # (S/2, S/4, 24) — adjacent column pairs merged into lanes — the stem
    # matmul emits its output directly in that merged layout
    # (quant.deploy.merge_stem_columns), and stage1 runs as ONE fused
    # Pallas pass (s2d shuffle + shift-dot + bias + ReLU in VMEM,
    # ops/pallas/stage1_kernel.py) instead of five HBM passes. Probed
    # 0.036 vs 0.082 ms isolated (tools/stage1_pallas_probe.py).
    s2d_merged: bool = False
    # fused C3k2 blocks (deploy graphs): each float-path C3k2 runs as ONE
    # VMEM pass (ops/pallas/c3k2_kernel.py) instead of ~5 HBM round-trips
    # — XLA fuses into conv epilogues but never across convs. In the int8
    # engine this covers exactly the PERF_EXCLUDE 160^2 blocks
    # (stage1_block 8.2% + fpn_c3k2_2 6.4% of r3 device time, both
    # movement-bound at ~640 GB/s); quantized C3k2s keep the standard
    # per-conv int8 chain.
    fused_c3k2: bool = False
    # fused decoupled head (deploy graphs): both branches' six convs in
    # ONE VMEM pass per level (ops/pallas/head_kernel.py). head_p2 —
    # always-bf16 by the reference's own exclusion list — is ~14% of r3
    # device time across six dispatch/bandwidth-bound fusions; quantized
    # head levels (p3/p4 in the int8 engine) keep the standard path.
    fused_head: bool = False
    # MERGED decoupled head (deploy graphs, float-path levels only): the
    # cls and reg branches read the SAME input, so their convs merge
    # exactly — conv1 concatenates output channels (N 64 -> 128, filling
    # the MXU's 128 lanes instead of half), conv2 and the 1x1 preds
    # become block-diagonal over the doubled channel dim (the zero
    # blocks contribute exact zeros — outputs match to accumulation-
    # order rounding, ~5e-7 measured — while
    # two half-lane convs become one full-lane pass), and the input/
    # intermediate activations are read ONCE instead of twice. Pure XLA
    # restructuring — no Pallas. The param tree is unchanged (merging
    # happens on the fly; with baked weights it constant-folds at
    # compile). head_p2 alone is 17.5% of the deployed engine's b1
    # device time (artifacts/layer_table_s2dm.json), its branches at
    # N=64 half-lane occupancy. Quantized head levels (p3/p4 in the
    # int8 engine) keep the standard path: their branch outputs carry
    # separate out_q scales that a merged tensor cannot represent.
    merged_head: bool = False
    # which implementation carries the fused C3k2/head subgraphs on TPU:
    # "pallas" = the per-platform primitive (one VMEM pass via
    # ops/pallas/{c3k2,head}_kernel.py on tpu, XLA form elsewhere);
    # "xla" = the identical-math XLA form inline on every platform (the
    # split-dot/shift-slice formulation WITHOUT a hand-written kernel).
    # Isolated r4 probes (tools/c3k2_probe.py) measured the XLA form
    # faster than the row-gridded Pallas kernels on every fc subgraph
    # (stage1_block 0.021 vs 0.099 ms, fpn_c3k2_2 0.053 vs 0.098,
    # head_p2 0.138 vs 0.218) — the grid re-streams the resident input
    # per step, where XLA schedules the same math as flat fusions.
    fused_impl: str = "pallas"
    # Selective fusion: when set, only the named blocks/heads fuse
    # (names are module names: "stage1_block", "fpn_c3k2_2", "head_p2",
    # ...); None fuses every eligible float subgraph. The r4 on-chip
    # trace A/B (artifacts/fcx_trace.json) shows fusion is a per-block
    # decision, not a global one: stage1_block wins big (80 -> 38 us,
    # movement-bound), the compute-bound heads LOSE (+25 us — the
    # shift-dot taps waste MXU at K=64 where conv lowering packs K=576),
    # and fusing everything costs +100 us of collateral layout copies
    # in downstream convs. Fuse where bytes dominate, nowhere else.
    fused_only: tuple[str, ...] | None = None
    # One Pallas VMEM pass for stem+stage1 over the merged frame
    # (ops/pallas/stem_kernel.py; requires s2d_merged). Wins BOTH
    # regimes on v5e and ships in the DEFAULT export (artifacts/
    # serving_artifact/config.json has fused_stem: true): at b8 the XLA
    # stem lowering materialises its shifted-slice patches through HBM
    # (1.08 ms/batch of pad fusions, artifacts/b8_trace.json) and the
    # kernel replaces stem+stage1's 1.71 ms with ~1.05 ms; at batch 1
    # the r4 salted A/B (artifacts/bench_r4_salted.json: 0.641 vs 0.724
    # ms) reversed the earlier read that the kernel lost there — the
    # on-chip chain is 90 us either way and the measured end-to-end
    # median favours the fused form.
    fused_stem: bool = False

    def with_quant(self, mode: str, **kw) -> "ModelConfig":
        """Same architecture with quantisation mode switched — the QAT twin
        shares this config's param tree exactly (SURVEY §7 'deterministic
        QAT-from-FP32 handoff')."""
        base = self.quant or QuantSpec()
        return dataclasses.replace(
            self, quant=dataclasses.replace(base, mode=mode, **kw))

    @property
    def widths(self) -> tuple[int, int, int, int, int]:
        bc = self.base_channels
        return (bc, bc * 2, bc * 4, bc * 8, bc * 16)

    @property
    def strides(self) -> tuple[int, int, int]:
        """Feature strides of the P2/P3/P4 heads."""
        return (4, 8, 16)

    @property
    def grid_sizes(self) -> tuple[int, int, int]:
        s = self.input_size
        return (s // 4, s // 8, s // 16)

    @property
    def num_cells(self) -> int:
        """Total decode workload per frame (33,600 cells at 640)."""
        return sum(g * g for g in self.grid_sizes)


# Cone classes of the FSD dataset (reference fsd_data.yaml:13-17).
DEFAULT_CLASS_NAMES = ("yellow_cone", "blue_cone", "orange_cone", "large_orange_cone")

# Serving defaults (reference config/params.yaml:14-15, train.py:996).
DEFAULT_CONF_THRESHOLD = 0.5
DEFAULT_IOU_THRESHOLD = 0.45
DEFAULT_CP_Q = 0.1
MAX_DETECTIONS = 1024  # static cap (reference gpu_postprocess.cu:25)

# ImageNet normalisation pinned across train/export/serve
# (reference cuda_preprocess.cu:68-85, export_trt.py:129-131).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
