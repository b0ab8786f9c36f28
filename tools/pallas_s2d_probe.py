"""Probe: Pallas space-to-depth reorder kernel vs the XLA 6D transpose.

The stage1 s2d shuffle (reshape/6D-transpose of the bf16 (320,320,32)
stem output) costs 9.2% of the b1 frame and ~12% at b8 — it is pure
data movement at 329 GB/s, ~3.5x off the HBM ceiling. The shapes map
well onto a hand-written reorder kernel: output channel dim 4*32 = 128
lanes exactly, input blocks need NO halo (stride == block), and the
(di, dj) selects are leading-dim picks + one sublane-stride-2 slice.
Round-2 lesson applies (Pallas kernels lost to XLA fusion for compute
ops); this one is a pure copy kernel, where the competition is a bad
relayout, not a fused epilogue.

OUTCOME (measured, v5e): the reorder kernel LOSES — 0.062 ms vs the XLA
6D transpose's 0.019 ms in isolation. A hand-written pure-movement
kernel cannot beat the compiler's copy; the win only appears when the
movement is fused INTO the consuming dot (ops/pallas/stage1_kernel.py:
0.036 ms for shuffle+conv+bias+relu together). Kept as the record.
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, C = 320, 32
HB = 16  # output rows per grid step


def s2d_kernel(x_ref, o_ref):
    # x_ref: (2*HB, H//2, 2C) column-merged rows; o_ref: (HB, H//2, 4C)
    x = x_ref[:].reshape(HB, 2, H // 2, 2 * C)   # leading-dim split: free
    o_ref[:, :, : 2 * C] = x[:, 0]               # even input rows (di=0)
    o_ref[:, :, 2 * C:] = x[:, 1]                # odd input rows  (di=1)


def s2d_pallas(x):
    # Merge adjacent column pairs into lanes: (H, W, C) -> (H, W/2, 2C).
    # Minor-dims-only reshape — byte layout unchanged, no shuffle. After
    # this view, s2d is purely an even/odd ROW interleave into lanes, and
    # the required output channel order (di major, dj, c minor) falls out.
    xm = x.reshape(H, H // 2, 2 * C)
    return pl.pallas_call(
        s2d_kernel,
        out_shape=jax.ShapeDtypeStruct((H // 2, H // 2, 4 * C), x.dtype),
        grid=(H // 2 // HB,),
        in_specs=[pl.BlockSpec((2 * HB, H // 2, 2 * C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((HB, H // 2, 4 * C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(xm)


def s2d_rt(x):
    y = x.reshape(H // 2, 2, H // 2, 2, C)
    return jnp.transpose(y, (0, 2, 1, 3, 4)).reshape(H // 2, H // 2, 4 * C)


def slope(fn, x):
    def mk(n):
        @jax.jit
        def r(x):
            def it(i, acc):
                return acc + jnp.abs(fn(x + i.astype(x.dtype) * 1e-6)).mean()
            return lax.fori_loop(0, n, it, jnp.float32(0.))
        return r
    ts = {}
    for n in (50, 150, 250):
        r = mk(n)
        float(r(x)); float(r(x))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter(); float(r(x))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    ns = sorted(ts)
    return float(np.median([(ts[b] - ts[a]) / (b - a)
                            for i, a in enumerate(ns) for b in ns[i + 1:]
                            ])) * 1e3


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (H, H, C)), jnp.bfloat16)
    a = np.asarray(s2d_rt(x), np.float32)
    b = np.asarray(s2d_pallas(x), np.float32)
    print(f"equiv: max|diff|={np.abs(a - b).max()}")
    print(f"xla 6D transpose : {slope(s2d_rt, x):.4f} ms")
    print(f"pallas reorder   : {slope(s2d_pallas, x):.4f} ms")


if __name__ == "__main__":
    main()
