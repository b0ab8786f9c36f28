"""Probe: FUSED Pallas stage1 downsample (s2d + 2x2 shift-dot, one pass).

The committed stage1 path (`space_to_depth_rt` + `ShiftDot2x2`) costs
~0.18 ms in-pipeline: two transpose copies (9.2% of device time) + the
patches-concat + dot (11.6%) — five full passes over ~6.5-26 MB for an
op whose speed of light is ONE 6.5 MB read + one 3.3 MB write + a
1.7 GFLOP dot ≈ 0.02-0.04 ms.

Key layout insight: in the column-merged view xm = x.reshape(H, W/2, 2C)
(byte-identical row-major view), every tap of the folded 2x2 blocked
conv becomes a PLAIN slice after a free leading-dim split
xmp.reshape(Hp/2, 2, Wp', 2C) — no strided access, no gather, no 6D
transpose. The Pallas kernel reads each input block once into VMEM and
accumulates 4 kw-packed dots (K=2C=64, N=2*O=128) in f32.

Variants:
  committed      s2d_rt + shift_dot on (320,320,32)  [current pipeline]
  xla_merged     same plain-slice formulation, no Pallas (8 dots + adds)
  pallas[HB]     the fused kernel, input already (320,160,64)
  pallas_r[HB]   + the (320,320,32)->(320,160,64) reshape on-device
                 (measures the retile cost a producer-side fix removes)

All equivalence-asserted against lax.conv 3x3 s2.
"""
from __future__ import annotations

import sys
import pathlib
import time
import functools

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = 320
CI = 32
CO = 64
HO = H // 2          # 160
CM = 2 * CI          # 64 merged lanes
WP = 176             # padded merged-col count (sublane tile 16 for bf16;
                     # cols [161:176] are garbage, never sliced into out)


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


def fold_w(w3):
    """(3,3,C,O) stride-2 kernel -> (2,2,4C,O) blocked kernel
    (quant/deploy.fold_downsample_space_to_depth math)."""
    C, O = w3.shape[2], w3.shape[3]
    w4 = np.zeros((4, 4, C, O), w3.dtype)
    w4[1:, 1:] = np.asarray(w3)
    wb = np.zeros((2, 2, 4 * C, O), w3.dtype)
    for kb in range(2):
        for lb in range(2):
            for d1 in range(2):
                for d2 in range(2):
                    wb[kb, lb, (d1 * 2 + d2) * C:(d1 * 2 + d2 + 1) * C] = \
                        w4[2 * kb + d1, 2 * lb + d2]
    return jnp.asarray(wb)


def pack_w(wb):
    """(2,2,4C,O) blocked kernel -> (kh, di, K=2C, kw*O) kw-packed:
    wp[kh, di, j, kw*O+o] = wb[kh, kw, di*2C+j, o]."""
    wb = np.asarray(wb)
    wp = np.zeros((2, 2, CM, 2 * CO), wb.dtype)
    for kh in range(2):
        for di in range(2):
            for kw in range(2):
                wp[kh, di, :, kw * CO:(kw + 1) * CO] = \
                    wb[kh, kw, di * CM:(di + 1) * CM, :]
    return jnp.asarray(wp)


def s2d_rt(x):
    h, w, c = x.shape
    y = x.reshape(h // 2, 2, w // 2, 2, c)
    return jnp.transpose(y, (0, 2, 1, 3, 4)).reshape(h // 2, w // 2, 4 * c)


def shift_dot(xb, wb):
    h, w, c = xb.shape
    o = wb.shape[-1]
    xp = jnp.pad(xb, ((1, 0), (1, 0), (0, 0)))
    parts = [xp[kh:kh + h, kw:kw + w, :]
             for kh in range(2) for kw in range(2)]
    p = jnp.concatenate(parts, axis=-1).reshape(h * w, 4 * c)
    y = lax.dot_general(p, wb.reshape(4 * c, o), (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    return y.reshape(h, w, o).astype(xb.dtype)


def v_committed(wb, x):
    return shift_dot(s2d_rt(x), wb)


def _merged_padded(xm):
    """(H, HO, CM) merged view -> padded 4D (HO+1, 2, WP, CM)."""
    xmp = jnp.pad(xm, ((2, 0), (1, WP - HO - 1), (0, 0)))  # (322, WP, 64)
    return xmp.reshape(HO + 1, 2, WP, CM)


def v_xla_merged(wp, xm):
    """Plain-slice 8-dot formulation, straight XLA (no Pallas)."""
    x4 = _merged_padded(xm)
    acc = jnp.zeros((HO, HO, CO), jnp.float32)
    for kh in range(2):
        for di in range(2):
            xs = x4[kh:kh + HO, di]                       # (HO, WP, CM)
            z = lax.dot_general(xs, wp[kh, di],
                                (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            acc = acc + z[:, 0:HO, 0:CO] + z[:, 1:HO + 1, CO:2 * CO]
    return acc.astype(xm.dtype)


def _kern(xm_ref, xh_ref, w_ref, o_ref, *, hb):
    x = jnp.concatenate([xm_ref[:], xh_ref[:]], axis=0)   # (hb+1,2,WP,CM)
    acc = jnp.zeros((hb, HO, CO), jnp.float32)
    for kh in range(2):
        for di in range(2):
            xs = x[kh:kh + hb, di]                        # (hb, WP, CM)
            z = lax.dot_general(xs, w_ref[kh, di],
                                (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            acc = acc + z[:, 0:HO, 0:CO] + z[:, 1:HO + 1, CO:2 * CO]
    o_ref[:] = acc.astype(o_ref.dtype)


def make_pallas(hb):
    kern = functools.partial(_kern, hb=hb)

    def fn(wp, xm):
        x4 = _merged_padded(xm)                           # (161,2,WP,CM)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((HO, HO, CO), xm.dtype),
            grid=(HO // hb,),
            in_specs=[
                pl.BlockSpec((hb, 2, WP, CM), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, WP, CM),
                             lambda i: (i * hb + hb, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 2, CM, 2 * CO), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((hb, HO, CO), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(x4, x4, wp)
    return fn


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (H, H, CI)), jnp.bfloat16)
    w3 = jnp.asarray(rng.normal(0, .05, (3, 3, CI, CO)), jnp.bfloat16)
    wb = fold_w(w3)
    wp = pack_w(wb)
    xm = jnp.asarray(np.asarray(x).reshape(H, HO, CM))    # merged on host

    ref = np.asarray(lax.conv_general_dilated(
        x[None], w3, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)[0], np.float32)

    for name, got in (
            ("committed", v_committed(wb, x)),
            ("xla_merged", v_xla_merged(wp, xm)),
            ("pallas16", make_pallas(16)(wp, xm))):
        err = np.abs(np.asarray(got, np.float32) - ref).max()
        print(f"equiv {name}: max|diff|={err:.4f}")

    rows = [("committed (s2d_rt+dot)", v_committed, wb, x),
            ("xla_merged 8-dot", v_xla_merged, wp, xm)]
    for hb in (8, 16, 32):
        rows.append((f"pallas hb={hb}", make_pallas(hb), wp, xm))
    rows.append(("pallas16 + reshape", lambda w, t: make_pallas(16)(
        w, t.reshape(H, HO, CM)), wp, x))
    for name, fn, w, inp in rows:
        print(f"{name:24s} {slope(fn, w, inp):8.4f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
