"""Deploy-time graph transformations: BatchNorm folding.

TensorRT folds BN into conv weights when building the engine; XLA cannot
(params are runtime inputs to the jitted program), so we do it as a
pytree transformation before export:

  W'[..., o] = W[..., o] * gamma[o] / sqrt(var[o] + eps)
  b'[o]      = beta[o] - gamma[o] * mean[o] / sqrt(var[o] + eps)

The deploy model (``ModelConfig(deploy=True)``) is the SAME module tree
with every ConvBlock's BatchNorm removed and a conv bias added; this
function maps trained variables onto that tree. Removes ~60 elementwise
BN ops from the serving graph and drops the batch_stats collection from
the artifact.
"""
from __future__ import annotations

from typing import Any

import numpy as np


def _is_convblock(params_node: dict, stats_node: dict | None) -> bool:
    return (isinstance(params_node, dict) and "conv" in params_node
            and "bn" in params_node and stats_node is not None
            and "bn" in stats_node)


def fold_batchnorm(
    variables: dict[str, Any],
    eps: float = 1e-5,
) -> dict[str, Any]:
    """Training variables {'params', 'batch_stats', ['quant']} ->
    deploy variables {'params', ['quant']} with BN folded into convs.

    The returned params tree matches ``ModelConfig(deploy=True)`` init:
    every ConvBlock is {'conv': {'kernel', 'bias'}} with no 'bn'.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def fold(p_node: Any, s_node: Any) -> Any:
        if not isinstance(p_node, dict):
            return p_node
        if _is_convblock(p_node, s_node):
            kernel = np.asarray(p_node["conv"]["kernel"], np.float32)
            gamma = np.asarray(p_node["bn"]["scale"], np.float32)
            beta = np.asarray(p_node["bn"]["bias"], np.float32)
            mean = np.asarray(s_node["bn"]["mean"], np.float32)
            var = np.asarray(s_node["bn"]["var"], np.float32)
            inv = gamma / np.sqrt(var + eps)
            out = {"conv": {
                "kernel": kernel * inv,            # broadcast over out dim
                "bias": beta - mean * inv,
            }}
            # preserve any other submodules living beside conv/bn
            for k, v in p_node.items():
                if k not in ("conv", "bn"):
                    out[k] = fold(v, (s_node or {}).get(k))
            return out
        return {k: fold(v, (s_node or {}).get(k) if isinstance(s_node, dict)
                        else None)
                for k, v in p_node.items()}

    out = {"params": fold(params, stats)}
    if "quant" in variables:
        out["quant"] = variables["quant"]
    return out


def fold_stem_space_to_depth(deploy_variables: dict[str, Any]
                             ) -> dict[str, Any]:
    """BN-folded deploy variables -> variables for the space-to-depth stem
    (``ModelConfig(deploy=True, stem_s2d=True)``).

    Kernel math (1D, then separable in both spatial axes): the stride-2
    3-tap conv with pad 1, ``out[o] = sum_k W3[k] x[2o-1+k]``, equals a
    stride-1 2-tap conv over 2x-blocked input with a zero-padded 4-tap
    kernel ``W4 = [0, W3]``:

        out[o] = sum_{kb in {0,1}} sum_{d in {0,1}} W4[2kb+d] xb[o-1+kb, d]

    so the blocked kernel is (2, 2, 4*C, O) with the (di, dj, c) offsets
    flattened row-major — exactly ``ops.preprocess.space_to_depth``'s
    layout — and the blocked conv uses padding ((1,0),(1,0)). Numerically
    identical to the standard stem (same multiplies, same adds); only the
    data layout changes. Bias and every other layer pass through.

    This is the public MLPerf-ResNet TPU conv0 recipe, applied because the
    C=3 stem measurably costs ~30% of frame time in XLA layout copies
    (RESULTS.md round 3, layer_table on the r2 trace).
    """
    return _fold_layer_space_to_depth(deploy_variables, "stem",
                                      expect_cin=3)


def fold_downsample_space_to_depth(deploy_variables: dict[str, Any],
                                   layer: str = "stage1_conv"
                                   ) -> dict[str, Any]:
    """The same (3,3,C,O) -> (2,2,4C,O) blocking for a deeper stride-2
    downsample conv (``ModelConfig(stage1_s2d=True)`` consumes it).

    Why it also wins past the stem: stride-2 convs at large spatial sizes
    pay the same internal relayout machinery at smaller scale —
    stage1_conv (C32->64 at 320²) measured 0.201 ms as lax.conv vs
    0.074 ms as reshape-transpose s2d + shift-dot (contraction 4*32=128,
    MXU-ideal; `tools/stage1_probe.py`, RESULTS.md round 3). The C=32
    bf16 shuffle lowers cleanly, unlike the u8 C=3 stem case (which
    needs the host-side shuffle instead).
    """
    return _fold_layer_space_to_depth(deploy_variables, layer,
                                      expect_cin=None)


def _fold_layer_space_to_depth(deploy_variables: dict[str, Any],
                               layer: str,
                               expect_cin: int | None) -> dict[str, Any]:
    params = deploy_variables["params"]
    conv = params.get("backbone", {}).get(layer, {}).get("conv")
    if conv is None or "kernel" not in conv:
        raise ValueError(f"no backbone/{layer}/conv kernel in deploy "
                         "variables")
    k = np.asarray(conv["kernel"], np.float32)
    if k.ndim != 4 or k.shape[:2] != (3, 3) or (
            expect_cin is not None and k.shape[2] != expect_cin):
        raise ValueError(f"{layer} kernel is {k.shape}, expected "
                         "(3,3,C,O) — already transformed?")
    C, O = k.shape[2], k.shape[3]
    k4 = np.zeros((4, 4, C, O), np.float32)
    k4[1:, 1:] = k
    # (4,4,C,O) -> (kbi, di, kbj, dj, C, O) -> (kbi, kbj, di, dj, C, O)
    k4 = k4.reshape(2, 2, 2, 2, C, O).transpose(0, 2, 1, 3, 4, 5)
    k2 = k4.reshape(2, 2, 4 * C, O)

    out = {kk: vv for kk, vv in deploy_variables.items()}
    new_params = dict(params)
    new_backbone = dict(params["backbone"])
    new_conv = dict(conv)
    new_conv["kernel"] = k2
    new_backbone[layer] = {"conv": new_conv}
    new_params["backbone"] = new_backbone
    out["params"] = new_params
    return out


def merge_stem_columns(deploy_variables: dict[str, Any]) -> dict[str, Any]:
    """s2d-stem deploy variables -> column-MERGED stem variables
    (``ModelConfig(s2d_merged=True)``).

    The merged engine's stem consumes the SAME host bytes as the s2d_host
    stem, viewed as (S/2, S/4, 24) — adjacent column pairs merged into
    lanes (a byte-identical row-major reshape) — and emits the stem output
    directly in that merged layout, ``ym[h, w2] = [y[h,2w2]; y[h,2w2+1]]``,
    which the fused stage1 kernel (``ops.pallas.stage1_kernel``) consumes
    with zero retile. Derivation: with ``xbm[i,j] = [xb[i,2j]; xb[i,2j+1]]``
    the two interleaved outputs are 2x2 stride-1 convs over ``xbm`` whose
    taps read xb columns {2w2-1, 2w2} (left output) and {2w2, 2w2+1}
    (right), so the merged kernel (2,2,2C,2O) places the original
    (2,2,C,O) taps as

        Wm[kh, 0, C:2C, :O]  = W[kh, 0]     Wm[kh, 1, 0:C, :O]  = W[kh, 1]
        Wm[kh, 1, 0:C, O:]   = W[kh, 0]     Wm[kh, 1, C:2C, O:] = W[kh, 1]

    (rest zero), with the same ((1,0),(1,0)) padding: the left pad covers
    xb column -1 exactly as before, and xb column -2 only ever meets zero
    weights. Bias tiles 2x. Numerically identical multiplies/adds —
    2x nominal MACs against zeros, irrelevant for a bandwidth-bound stem
    (measured in ``tools/merged_engine_probe.py``).
    """
    params = deploy_variables["params"]
    conv = params.get("backbone", {}).get("stem", {}).get("conv")
    if conv is None or "kernel" not in conv or "bias" not in conv:
        raise ValueError("no backbone/stem/conv kernel+bias in deploy "
                         "variables — run fold_stem_space_to_depth first")
    k = np.asarray(conv["kernel"], np.float32)
    if k.ndim != 4 or k.shape[:2] != (2, 2):
        raise ValueError(f"stem kernel is {k.shape}, expected (2,2,C,O) "
                         "s2d-folded — run fold_stem_space_to_depth first")
    C, O = k.shape[2], k.shape[3]
    km = np.zeros((2, 2, 2 * C, 2 * O), np.float32)
    km[:, 0, C:2 * C, :O] = k[:, 0]
    km[:, 1, 0:C, :O] = k[:, 1]
    km[:, 1, 0:C, O:] = k[:, 0]
    km[:, 1, C:2 * C, O:] = k[:, 1]
    bias = np.asarray(conv["bias"], np.float32)

    out = {kk: vv for kk, vv in deploy_variables.items()}
    new_params = dict(params)
    new_backbone = dict(params["backbone"])
    new_conv = dict(conv)
    new_conv["kernel"] = km
    new_conv["bias"] = np.concatenate([bias, bias])
    new_backbone["stem"] = {"conv": new_conv}
    new_params["backbone"] = new_backbone
    out["params"] = new_params
    return out


def quantize_weights_int8(
    deploy_variables: dict[str, Any],
    spec,
    qmax: float = 127.0,
) -> dict[str, Any]:
    """BN-folded deploy variables -> int8-engine variables.

    Every conv kernel on a non-excluded path becomes {kernel: int8,
    w_scale: f32 per-tensor}; excluded layers (stem / P2 head /
    stage1_conv, train.py:779-781 parity) keep float kernels. The result
    loads into ``ModelConfig(deploy=True).with_quant("int8")`` — the true
    integer inference engine (int8 x int8 -> int32 MXU accumulation),
    completing the analogy to the reference's INT8 DLA engine rather than
    stopping at fake-quant simulation.

    ``spec``: the QuantSpec used at calibration (exclusion list must match
    the activation amax collection in deploy_variables['quant']).
    """

    def walk(node: Any, path: str) -> Any:
        if not isinstance(node, dict):
            return node
        if "kernel" in node and not spec.excluded(path):
            if np.asarray(node["kernel"]).dtype == np.int8:
                return node  # already quantised: idempotent
            kernel = np.asarray(node["kernel"], np.float32)  # HWIO
            if getattr(spec, "per_channel_weights", True):
                amax = np.abs(kernel).max(axis=(0, 1, 2))    # (O,)
            else:
                amax = np.full(kernel.shape[-1], np.abs(kernel).max())
            w_scale = np.maximum(amax, 1e-9) / qmax          # (O,)
            out = {
                "kernel": np.clip(np.round(kernel / w_scale), -qmax, qmax
                                  ).astype(np.int8),
                "w_scale": w_scale.astype(np.float32),
            }
            for k, v in node.items():
                if k != "kernel":
                    out[k] = v
            return out
        return {k: walk(v, f"{path}/{k}" if path else k)
                for k, v in node.items()}

    out = dict(deploy_variables)
    out["params"] = walk(deploy_variables["params"], "")
    return out


def folded_equivalence_report(
    model_train, model_deploy, variables, deploy_variables, x,
) -> float:
    """Max |train-mode-eval output - deploy output| — sanity helper."""
    train_out = model_train.apply(
        {k: variables[k] for k in ("params", "batch_stats")
         if k in variables}, x, train=False)
    dep_out = model_deploy.apply(deploy_variables, x, train=False)
    diffs = [
        float(abs(np.asarray(a) - np.asarray(b)).max())
        for (a1, a2), (b1, b2) in zip(train_out, dep_out)
        for a, b in ((a1, b1), (a2, b2))
    ]
    return max(diffs)
