"""Offline activation calibration: max / percentile / entropy (KL).

Replaces BOTH the reference's pytorch-quantization histogram calibration
(``collect_calibration_stats`` qat.py:171-220, entropy amax selection) and
the TensorRT ``IInt8EntropyCalibrator2`` path (export_trt.py:208-268):

1. pass 1 (``calib_max``): eval-mode forwards accumulating running max|x|
   per activation quantizer.
2. pass 2 (``calib_hist``): forwards filling a 2048-bin |x| histogram over
   [0, running_amax] per quantizer.
3. host-side amax selection per quantizer:
   - "max":        amax = running max
   - "percentile": amax at the p-th percentile of |x| mass
   - "entropy":    TensorRT-style KL(P||Q) minimisation over clip
                   thresholds, Q = P re-quantised to 128 levels.

The result is a ``quant`` variable collection (amax per quantizer) that
drops into the QAT/serving model. A calibration cache (JSON) mirrors the
reference's ``calibration.cache`` artifact.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Iterable

import jax
import numpy as np

from ..ops.preprocess import ensure_normalized


def _run_calib_pass(
    apply_fn: Callable,
    variables: dict[str, Any],
    batches: Iterable[Any],
    max_batches: int,
    count_fn: Callable[[Any], int] | None = None,
) -> tuple[dict[str, Any], int]:
    """Run eval-mode forwards with mutable quant_calib, carrying state.

    Returns (calib collection, total images seen)."""
    calib = variables.get("quant_calib", {})
    n = 0
    n_images = 0
    for batch in batches:
        v = dict(variables)
        v["quant_calib"] = calib
        _, mutated = apply_fn(v, batch)
        calib = mutated["quant_calib"]
        n += 1
        if count_fn is not None:
            n_images += count_fn(batch)
        if n >= max_batches:
            break
    if n == 0:
        raise ValueError("calibration requires at least one batch "
                         "(parity: export_trt.py:155-157 hard-fails on "
                         "empty calibration data)")
    return calib, n_images


def entropy_amax(hist: np.ndarray, upper: float,
                 num_quant_levels: int = 128,
                 start_bin: int = 128) -> float:
    """KL-minimising clip threshold from an |x| histogram.

    TensorRT-style: for each candidate bin count i, the clipped distribution
    P (outlier mass folded into the last bin) is compared to Q, the same
    distribution re-quantised to ``num_quant_levels`` uniform levels; the i
    minimising KL(P||Q) wins.
    """
    nbins = len(hist)
    hist = hist.astype(np.float64)
    # drop the zero bin: post-ReLU activations put most of their mass at
    # exactly 0, which otherwise drags the KL optimum to a catastrophically
    # low clip (pytorch-quantization's skip_zeros behaviour)
    hist = hist.copy()
    hist[0] = 0.0
    if hist.sum() <= 0 or upper <= 0:
        return float(upper)

    best_i, best_kl = nbins, np.inf
    total_tail = np.concatenate([np.cumsum(hist[::-1])[::-1][1:], [0.0]])
    for i in range(start_bin, nbins + 1):
        p = hist[:i].copy()
        p[i - 1] += total_tail[i - 1]  # clamp outliers into last bin
        psum = p.sum()
        if psum <= 0:
            continue

        # quantise first i bins into num_quant_levels groups
        idx = (np.arange(i) * num_quant_levels // i)
        q = np.zeros(num_quant_levels)
        np.add.at(q, idx, hist[:i])
        counts = np.zeros(num_quant_levels)
        np.add.at(counts, idx, (hist[:i] > 0).astype(np.float64))
        # expand Q back to i bins, spreading mass over occupied bins
        q_expanded = np.where(
            (counts[idx] > 0) & (hist[:i] > 0),
            q[idx] / np.maximum(counts[idx], 1), 0.0)

        mask = (p > 0) & (q_expanded > 0)
        if not mask.any():
            continue
        pm = p[mask] / psum
        qm = q_expanded[mask] / q_expanded.sum()
        kl = float(np.sum(pm * np.log(pm / qm)))
        if kl < best_kl:
            best_kl, best_i = kl, i

    return float(upper * best_i / nbins)


def percentile_amax(hist: np.ndarray, upper: float,
                    percentile: float = 99.99) -> float:
    if hist.sum() <= 0 or upper <= 0:
        return float(upper)
    cdf = np.cumsum(hist) / hist.sum()
    i = int(np.searchsorted(cdf, percentile / 100.0)) + 1
    return float(upper * min(i, len(hist)) / len(hist))


def select_amax(
    calib_tree: dict[str, Any],
    method: str = "entropy",
    percentile: float = 99.99,
) -> dict[str, Any]:
    """quant_calib collection -> quant collection (amax leaves).

    Each quantizer's calib subtree holds {'amax': running_max,
    'hist': (2048,)}. Returns the same tree shape with a single 'amax'.
    """
    flat = jax.tree_util.tree_flatten_with_path(calib_tree)[0]
    # group leaves by parent path
    groups: dict[tuple, dict[str, np.ndarray]] = {}
    for path, leaf in flat:
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        groups.setdefault(keys[:-1], {})[keys[-1]] = np.asarray(leaf)

    out: dict[str, Any] = {}
    for parent, leaves in groups.items():
        upper = float(leaves.get("amax", np.zeros(())))
        hist = leaves.get("hist")
        if method == "max" or hist is None:
            amax = upper
        elif method == "percentile":
            amax = percentile_amax(hist, upper, percentile)
        else:
            # KL optimum, floored at the p99.9 mass point: guards against
            # pathological over-clipping on spiky/multimodal activation
            # distributions, where ~60 cascaded hard clips compound into
            # large accuracy loss
            amax = max(entropy_amax(hist, upper),
                       percentile_amax(hist, upper, 99.9))
        node = out
        for k in parent:
            node = node.setdefault(k, {})
        node["amax"] = np.float32(amax)
    return out


def calibrate(
    model,
    variables: dict[str, Any],
    batches_fn: Callable[[], Iterable[Any]],
    get_images: Callable[[Any], Any] = lambda b: b["images"],
    method: str = "entropy",
    max_batches: int = 30,
    min_images: int = 50,
) -> dict[str, Any]:
    """Full two-pass calibration. Returns a ``quant`` collection.

    ``model`` must be built with quant mode "calib_max"/"calib_hist"
    switchable — pass the calib_max model; a calib_hist twin is derived
    from its config. ``max_batches`` defaults to 30
    (train.py:809 lightweight-calibration parity).

    ``min_images`` is a hard floor on total calibration images: the
    reference refuses to build an int8 engine from short calibration
    data (export_trt.py:547-551, >=50 images — the "silent wrongness"
    class: a 2-image calibration exports a confidently-wrong engine).
    Pass 0 only in unit tests / deliberate smoke runs.
    """
    from ..models.detector import UninaYoloDla  # deferred: circular import

    cfg = model.config
    m_max = UninaYoloDla(cfg.with_quant("calib_max"))
    m_hist = UninaYoloDla(cfg.with_quant("calib_hist"))

    def apply(m):
        def f(v, batch):
            return m.apply(v, ensure_normalized(get_images(batch)),
                           train=False, mutable=["quant_calib"])
        return jax.jit(f)

    base = {k: v for k, v in variables.items() if k != "quant_calib"}

    def count(batch) -> int:
        return int(np.shape(get_images(batch))[0])

    # pass 1: running amax
    calib1, n_images = _run_calib_pass(apply(m_max), base, batches_fn(),
                                       max_batches, count)
    if n_images < min_images:
        raise ValueError(
            f"calibration saw only {n_images} images; >= {min_images} "
            "required for a trustworthy int8 engine (parity: "
            "export_trt.py:547-551 hard-fails short calibration data). "
            "Add data / raise --calib-batches, or pass min_images=0 "
            "(--calib-min-images 0) for a deliberate smoke run.")
    if method == "max":
        return select_amax(calib1, method="max")

    # pass 2: histogram over [0, amax] (entropy / percentile only)
    v2 = dict(base)
    v2["quant_calib"] = calib1
    calib2, _ = _run_calib_pass(apply(m_hist), v2, batches_fn(),
                                max_batches)

    return select_amax(calib2, method=method)


def save_calibration_cache(quant_tree: dict[str, Any],
                           path: str | Path) -> None:
    """JSON calibration cache (the ``calibration.cache`` artifact analogue,
    export_trt.py:256-268)."""
    flat = jax.tree_util.tree_flatten_with_path(quant_tree)[0]
    data = {"/".join(getattr(k, "key", str(k)) for k in p): float(v)
            for p, v in flat}
    Path(path).write_text(json.dumps(data, indent=2, sort_keys=True))


def load_calibration_cache(path: str | Path) -> dict[str, Any]:
    data = json.loads(Path(path).read_text())
    tree: dict[str, Any] = {}
    for key, val in data.items():
        node = tree
        parts = key.split("/")
        for k in parts[:-1]:
            node = node.setdefault(k, {})
        node[parts[-1]] = np.float32(val)
    return tree
