"""Probe: the s2d_merged engine (merged-column stem + fused Pallas stage1)
against the committed s2d_host engine, through the REAL model modules.

Validates, at full 640² scale with the actual fold chain:
  1. equivalence — merged forward outputs == s2dh forward outputs
     (same multiplies/adds, bf16-tolerance diffs only)
  2. forward latency A/B — s2dh vs merged, slope method

Run on the TPU (the merged engine's stage1 is a Pallas kernel there; on
CPU it takes the identical-math XLA form automatically).
"""
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from unina_yolo_dla_tpu.models import ModelConfig, init_model
from unina_yolo_dla_tpu.models.detector import UninaYoloDla
from unina_yolo_dla_tpu.ops.preprocess import space_to_depth_np
from unina_yolo_dla_tpu.quant.deploy import (
    fold_batchnorm,
    fold_downsample_space_to_depth,
    fold_stem_space_to_depth,
    merge_stem_columns,
)
from unina_yolo_dla_tpu.runtime.pipeline import _normalize_for


def slope(fn, v, x):
    def mk(n):
        @jax.jit
        def r(v, x):
            def it(i, acc):
                outs = fn(v, x + (i % 3).astype(x.dtype))
                return acc + sum(jnp.abs(o).mean().astype(jnp.float32)
                                 for pair in outs for o in pair)
            return lax.fori_loop(0, n, it, jnp.float32(0.))
        return r
    ts = {}
    for n in (30, 90, 150):
        r = mk(n)
        float(r(v, x)); float(r(v, x))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter(); float(r(v, x))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    ns = sorted(ts)
    return float(np.median([(ts[b] - ts[a]) / (b - a)
                            for i, a in enumerate(ns) for b in ns[i + 1:]
                            ])) * 1e3


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    cfg = ModelConfig(num_classes=4, base_channels=32, input_size=size)
    _, variables = init_model(jax.random.key(0), cfg)
    bf16 = fold_batchnorm(
        {k: variables[k] for k in ("params", "batch_stats")})
    s2dh_vars = fold_downsample_space_to_depth(
        fold_stem_space_to_depth(bf16))
    merged_vars = merge_stem_columns(s2dh_vars)

    cfg_s2dh = dataclasses.replace(cfg, deploy=True, stem_s2d=True,
                                   s2d_host=True, stage1_s2d=True)
    cfg_m = dataclasses.replace(cfg_s2dh, s2d_merged=True)
    m_s2dh = UninaYoloDla(cfg_s2dh)
    m_m = UninaYoloDla(cfg_m)

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
    blocked = space_to_depth_np(frame)                       # (S/2,S/2,12)
    merged = blocked.reshape(size // 2, size // 4, 24)       # same bytes

    x_s = _normalize_for(cfg_s2dh, jnp.asarray(blocked))[None]
    x_m = _normalize_for(cfg_m, jnp.asarray(merged))[None]

    out_s = jax.jit(lambda v, x: m_s2dh.apply(v, x, train=False))(
        s2dh_vars, x_s)
    out_m = jax.jit(lambda v, x: m_m.apply(v, x, train=False))(
        merged_vars, x_m)
    worst = 0.0
    for (a1, a2), (b1, b2) in zip(out_s, out_m):
        for a, b in ((a1, b1), (a2, b2)):
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            d = np.abs(a - b).max()
            rel = d / max(np.abs(a).max(), 1e-6)
            worst = max(worst, rel)
            print(f"  head {a.shape}: max|diff|={d:.5f} rel={rel:.5f}")
    print(f"equivalence: worst rel diff = {worst:.5f} "
          f"({'OK' if worst < 0.02 else 'FAIL'})")

    t_s = slope(lambda v, x: m_s2dh.apply(v, x, train=False), s2dh_vars, x_s)
    t_m = slope(lambda v, x: m_m.apply(v, x, train=False), merged_vars, x_m)
    print(f"forward s2dh  : {t_s:.4f} ms")
    print(f"forward merged: {t_m:.4f} ms  ({100 * (t_s - t_m) / t_s:+.1f}%)")


if __name__ == "__main__":
    main()
