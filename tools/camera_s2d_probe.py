"""Probe: phase-split camera resize emitting the s2d-blocked layout.

The camera program's stem is 15.5% of on-chip time (runs/cam_trace) —
the C=3 disease again, downstream of the on-chip resize. But the resize
is two interpolation matmuls, and s2d of its OUTPUT equals slicing the
interpolation matrices at trace time: (Ry@X@Rx^T)[di::2, dj::2] ==
Ry[di::2] @ X @ Rx[dj::2]^T, exactly. So the resize can emit the
blocked (320,320,12) layout for the SAME total FLOPs, feeding the
matmul stem directly — no (640,640,3) f32 ever materialises.
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from unina_yolo_dla_tpu.ops.preprocess import (
    resize_bilinear_mxu, _interp_matrix, IMAGENET_MEAN, IMAGENET_STD)

CH, CW, S = 1080, 1920, 640
M3 = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255
S3 = jnp.asarray(IMAGENET_STD, jnp.float32) * 255
M12, S12 = jnp.tile(M3, 4), jnp.tile(S3, 4)
HP = jax.lax.Precision.HIGHEST

def cur(w, frame):
    rgb = frame[..., 2::-1].astype(jnp.float32)
    x = resize_bilinear_mxu(rgb, S, S)
    x = ((x - M3) / S3).astype(jnp.bfloat16)
    return lax.conv_general_dilated(
        x[None], w, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)[0].astype(jnp.bfloat16)

RY = jnp.asarray(_interp_matrix(S, CH))
RX = jnp.asarray(_interp_matrix(S, CW))

def blocked(w48, frame):
    rgb = frame[..., 2::-1].astype(jnp.float32)
    rows = jnp.einsum("dh,hwc->dwc", RY, rgb,
                      preferred_element_type=jnp.float32, precision=HP)
    phases = []
    for di in range(2):
        r = rows[di::2]
        for dj in range(2):
            phases.append(jnp.einsum("ew,dwc->dec", RX[dj::2], r,
                                     preferred_element_type=jnp.float32,
                                     precision=HP))
    xb = jnp.concatenate(phases, axis=-1)           # (320,320,12)
    xb = ((xb - M12) / S12).astype(jnp.bfloat16)
    xp = jnp.pad(xb, ((1, 0), (1, 0), (0, 0)))
    parts = [xp[kh:kh + 320, kw:kw + 320, :]
             for kh in range(2) for kw in range(2)]
    p = jnp.concatenate(parts, -1).reshape(320 * 320, 48)
    y = lax.dot_general(p, w48, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    return y.reshape(320, 320, 32).astype(jnp.bfloat16)

def fold48(w3):
    C, O = 3, w3.shape[-1]
    k4 = np.zeros((4, 4, C, O), np.float32)
    k4[1:, 1:] = np.asarray(w3, np.float32)
    k4 = k4.reshape(2, 2, 2, 2, C, O).transpose(0, 2, 1, 3, 4, 5)
    return jnp.asarray(k4.reshape(2, 2, 4 * C, O).reshape(48, O))

def slope(fn, w, x):
    def mk(n):
        @jax.jit
        def r(w, x):
            def it(i, acc):
                return acc + jnp.abs(fn(w, x ^ (i % 5).astype(x.dtype))).mean()
            return lax.fori_loop(0, n, it, jnp.float32(0.))
        return r
    ts = {}
    for n in (20, 60, 100):
        r = mk(n); float(r(w, x)); float(r(w, x))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter(); float(r(w, x))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    ns = sorted(ts)
    return float(np.median([(ts[b] - ts[a]) / (b - a)
                            for i, a in enumerate(ns) for b in ns[i + 1:]
                            ])) * 1e3

def main():
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 256, (CH, CW, 4), np.uint8))
    w3 = jnp.asarray(rng.normal(0, .1, (3, 3, 3, 32)), jnp.bfloat16)
    w48 = fold48(w3)

    a = np.asarray(cur(w3, frame), np.float32)
    b = np.asarray(blocked(w48, frame), np.float32)
    print(f"equiv: max|diff|={np.abs(a - b).max():.4f}")
    print(f"current resize+stem : {slope(cur, w3, frame):.4f} ms")
    print(f"blocked resize+stem : {slope(blocked, w48, frame):.4f} ms")

if __name__ == "__main__":
    main()
