"""Probe stage1_conv formulations (the post-stem wall).

After the s2d-host stem fix, `backbone/stage1_conv` (3x3 stride-2,
C32->64 at 320²) is the new top cost: 17.3% of device time at 263 GB/s
and ~7 TFLOP/s (`artifacts/layer_table_s2dh.json`) — the stride-2 conv
disease at one level deeper. Candidates measured here:

  conv_s2      the current lowering (3x3 s2 conv on (320,320,32) bf16)
  s2d_rt       on-device s2d via reshape/6D-transpose of the bf16 C=32
               tensor (moves contiguous 64 B channel vectors — may lower
               fine, unlike the u8 C=3 case) + 2x2 s1 conv over C=128
  s2d_rt_dot   same s2d + shift-dot matmul (contraction 4*32=128+128pad,
               MXU-ideal)
  s2d_slice_dot strided-slice s2d (4 slices stride 2 + concat) + shift-dot
  full_dot     no pre-shuffle: 9 stride-2 strided slices + concat C=288
               + one (160²,288)@(288,64) matmul

All are the same math as conv_s2 (equivalence asserted below).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

H = 320
CI = 32
CO = 64


def slope(fn, w, x):
    def mk(n):
        @jax.jit
        def r(w, x):
            def it(i, acc):
                return acc + jnp.abs(fn(w, x + i.astype(x.dtype) * 1e-6)).mean()
            return lax.fori_loop(0, n, it, jnp.float32(0.))
        return r
    ts = {}
    for n in (20, 60, 100):
        r = mk(n)
        float(r(w, x)); float(r(w, x))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(r(w, x))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    ns = sorted(ts)
    return float(np.median([(ts[b] - ts[a]) / (b - a)
                            for i, a in enumerate(ns) for b in ns[i + 1:]
                            ])) * 1e3


def s2d_rt(x):
    """reshape/6D-transpose space-to-depth of (H,W,C) -> (H/2,W/2,4C)."""
    h, w, c = x.shape
    y = x.reshape(h // 2, 2, w // 2, 2, c)
    return jnp.transpose(y, (0, 2, 1, 3, 4)).reshape(h // 2, w // 2, 4 * c)


def s2d_slice(x):
    parts = [x[di::2, dj::2, :] for di in range(2) for dj in range(2)]
    return jnp.concatenate(parts, axis=-1)


def fold_w(w3):
    """(3,3,C,O) stride-2 kernel -> (2,2,4C,O) blocked kernel, the
    quant/deploy.fold_stem_space_to_depth math for any C."""
    C, O = w3.shape[2], w3.shape[3]
    w4 = np.zeros((4, 4, C, O), w3.dtype)
    w4[1:, 1:] = np.asarray(w3)  # W4 = [0, W3] in both axes
    wb = np.zeros((2, 2, 4 * C, O), w3.dtype)
    for kb in range(2):
        for lb in range(2):
            for d1 in range(2):
                for d2 in range(2):
                    wb[kb, lb, (d1 * 2 + d2) * C:(d1 * 2 + d2 + 1) * C] = \
                        w4[2 * kb + d1, 2 * lb + d2]
    return jnp.asarray(wb)


def shift_dot(xb, wb):
    """2x2 s1 pad((1,0),(1,0)) conv as slices + one matmul."""
    h, w, c = xb.shape
    o = wb.shape[-1]
    xp = jnp.pad(xb, ((1, 0), (1, 0), (0, 0)))
    parts = [xp[kh:kh + h, kw:kw + w, :]
             for kh in range(2) for kw in range(2)]
    p = jnp.concatenate(parts, axis=-1).reshape(h * w, 4 * c)
    y = lax.dot_general(p, wb.reshape(4 * c, o), (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    return y.reshape(h, w, o).astype(xb.dtype)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (H, H, CI)), jnp.bfloat16)
    w3 = jnp.asarray(rng.normal(0, .05, (3, 3, CI, CO)), jnp.bfloat16)
    wb = fold_w(w3)

    def conv_s2(w, x):
        return lax.conv_general_dilated(
            x[None], w, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)[0].astype(jnp.bfloat16)

    def v_s2d_rt(w, x):
        return lax.conv_general_dilated(
            s2d_rt(x)[None], w, (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)[0].astype(jnp.bfloat16)

    def v_s2d_rt_dot(w, x):
        return shift_dot(s2d_rt(x), w)

    def v_s2d_slice_dot(w, x):
        return shift_dot(s2d_slice(x), w)

    def v_full_dot(w, x):
        # 9 taps of the 3x3 s2 conv directly as strided slices
        xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
        parts = [xp[di:di + 2 * (H // 2):2, dj:dj + 2 * (H // 2):2, :]
                 for di in range(3) for dj in range(3)]
        p = jnp.concatenate(parts, axis=-1).reshape((H // 2) ** 2, 9 * CI)
        y = lax.dot_general(
            p, w.reshape(9 * CI, CO), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y.reshape(H // 2, H // 2, CO).astype(x.dtype)

    ref = np.asarray(conv_s2(w3, x), np.float32)
    for name, fn, w in (("s2d_rt", v_s2d_rt, wb),
                        ("s2d_rt_dot", v_s2d_rt_dot, wb),
                        ("s2d_slice_dot", v_s2d_slice_dot, wb),
                        ("full_dot", v_full_dot, w3)):
        got = np.asarray(fn(w, x), np.float32)
        err = np.abs(got - ref).max()
        print(f"equiv {name}: max|diff|={err:.4f}")

    for name, fn, w in (("conv_s2 (current)", conv_s2, w3),
                        ("s2d_rt + conv", v_s2d_rt, wb),
                        ("s2d_rt + dot", v_s2d_rt_dot, wb),
                        ("s2d_slice + dot", v_s2d_slice_dot, wb),
                        ("full 9-slice dot", v_full_dot, w3)):
        print(f"{name:22s} {slope(fn, w, x):8.4f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
