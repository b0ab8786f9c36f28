"""Probe the stem's layout-copy cost and candidate formulations.

Round-3 layer table (`artifacts/layer_table_bf16.json`): the stem is
41.5% of device time and ~31% of the frame is three pure layout copies
around the C=3 input (reference has no analogue — TensorRT consumes
NCHW natively, `cuda_preprocess.cu` writes planar float). This probe
(a) dumps the optimized-HLO copy ops with shapes so the copies are
identified, not guessed, and (b) micro-benches stem formulations that
could avoid them:

  nhwc_u8    u8 (S,S,3) NHWC -> normalize -> 3x3/s2 conv (the deploy graph)
  nhwc_f32   f32 input (isolates the u8->f32 convert from the relayout)
  nchw_u8    u8 (3,S,S) planar input, conv with NCHW dimension_numbers
  nchw_f32   f32 planar
  patches    dot_general over conv_general_dilated_patches (im2col)

Each variant runs inside a jitted fori_loop (relay-robust slope, same
methodology as bench.py) and reports ms/iter.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

S = 640
CO = 32
MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32) * 255.0
STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32) * 255.0


def loop(fn, n):
    @jax.jit
    def run(w, x):
        def it(i, acc):
            return acc + jnp.abs(fn(w, x + i.astype(x.dtype))).mean()
        return lax.fori_loop(0, n, it, jnp.float32(0.0))
    return run


def slope(run, w, x):
    ts = {}
    for n in (20, 60, 100):
        r = loop(run, n)
        float(r(w, x)); float(r(w, x))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(r(w, x))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    ns = sorted(ts)
    pair = [(ts[b] - ts[a]) / (b - a)
            for i, a in enumerate(ns) for b in ns[i + 1:]]
    return float(np.median(pair)) * 1e3


def main():
    rng = np.random.default_rng(0)
    frame_u8 = jnp.asarray(rng.integers(0, 256, (S, S, 3), np.uint8))
    frame_f32 = (frame_u8.astype(jnp.float32) - MEAN) / STD
    frame_u8_p = jnp.transpose(frame_u8, (2, 0, 1))
    frame_f32_p = jnp.transpose(frame_f32, (2, 0, 1))
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, CO)), jnp.bfloat16)

    def conv_nhwc(w, x4):
        return lax.conv_general_dilated(
            x4[None], w, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)[0]

    def nhwc_u8(w, x):
        xf = (x.astype(jnp.float32) - MEAN) / STD
        return conv_nhwc(w, xf.astype(jnp.bfloat16)).astype(jnp.bfloat16)

    def nhwc_f32(w, x):
        return conv_nhwc(w, x.astype(jnp.bfloat16)).astype(jnp.bfloat16)

    def nchw_u8(w, x):
        xf = (x.astype(jnp.float32) - MEAN[:, None, None]) / STD[:, None, None]
        y = lax.conv_general_dilated(
            xf.astype(jnp.bfloat16)[None], w, (2, 2), "SAME",
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            preferred_element_type=jnp.float32)[0]
        return y.astype(jnp.bfloat16)

    def nchw_f32(w, x):
        y = lax.conv_general_dilated(
            x.astype(jnp.bfloat16)[None], w, (2, 2), "SAME",
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            preferred_element_type=jnp.float32)[0]
        return y.astype(jnp.bfloat16)

    def patches(w, x):
        xf = ((x.astype(jnp.float32) - MEAN) / STD).astype(jnp.bfloat16)
        p = lax.conv_general_dilated_patches(
            xf[None], (3, 3), (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]  # (320,320,27)
        return lax.dot_general(
            p, w.reshape(27, CO), (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    # equivalence vs the NHWC oracle
    ref = np.asarray(nhwc_u8(w, frame_u8), np.float32)
    for name, fn, x in (
        ("nchw_u8", nchw_u8, frame_u8_p),
        ("patches", patches, frame_u8),
    ):
        got = np.asarray(fn(w, x), np.float32)
        if name == "nchw_u8":
            got = np.transpose(got, (1, 2, 0))
        err = np.abs(got - ref).max()
        print(f"equiv {name}: max|diff|={err:.4f}")

    for name, fn, x in (
        ("nhwc_u8 (deploy graph)", nhwc_u8, frame_u8),
        ("nhwc_f32", nhwc_f32, frame_f32),
        ("nchw_u8 planar", nchw_u8, frame_u8_p),
        ("nchw_f32 planar", nchw_f32, frame_f32_p),
        ("patches+dot", patches, frame_u8),
    ):
        print(f"{name:26s} {slope(fn, w, x):8.4f} ms/iter", flush=True)

    # (a) what ARE the copies: optimized-HLO copy/transpose ops + shapes
    lowered = jax.jit(lambda w, x: nhwc_u8(w, x)).lower(w, frame_u8)
    hlo = lowered.compile().as_text()
    print("\noptimized-HLO copy/convert ops in the NHWC u8 stem:")
    for ln in hlo.splitlines():
        t = ln.strip()
        if t.startswith("%copy") or " = copy(" in t or "transpose(" in t:
            print("  ", t[:160])


if __name__ == "__main__":
    main()
