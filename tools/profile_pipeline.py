#!/usr/bin/env python
"""Per-stage serving-latency breakdown on the current accelerator.

Prints marginal per-frame cost of each pipeline stage (preprocess, model
forward, decode+top-k, NMS) using the same regression-slope methodology as
bench.py — the trtexec-profile analogue for this stack.

    python tools/profile_pipeline.py [--base-channels 32] [--lite-p2]
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def slope_ms(fn, args, lengths=(100, 300, 500), repeats=4):
    """Least-squares slope (ms/iteration) of min total time vs loop length."""
    def make(n):
        @jax.jit
        def loop(*a):
            def it(i, acc):
                return acc + fn(i, *a)
            return lax.fori_loop(0, n, it, jnp.float32(0.0))
        return loop

    mins = []
    for n in lengths:
        loop = make(n)
        float(loop(*args))
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(loop(*args))
            ts.append(time.perf_counter() - t0)
        mins.append(min(ts))
    sl, _ = np.polyfit(np.asarray(lengths, np.float64), np.asarray(mins), 1)
    return float(sl) * 1e3


def main() -> None:
    from unina_yolo_dla_tpu.models import ModelConfig, init_model
    from unina_yolo_dla_tpu.models.detector import UninaYoloDla
    from unina_yolo_dla_tpu.ops.decode import decode_outputs
    from unina_yolo_dla_tpu.ops.nms import nms
    from unina_yolo_dla_tpu.ops.preprocess import normalize
    from unina_yolo_dla_tpu.quant.deploy import fold_batchnorm

    p = argparse.ArgumentParser()
    p.add_argument("--base-channels", type=int, default=32)
    p.add_argument("--lite-p2", action="store_true")
    p.add_argument("--imgsz", type=int, default=640)
    args = p.parse_args()

    cfg = ModelConfig(num_classes=4, base_channels=args.base_channels,
                      lite_p2=args.lite_p2, input_size=args.imgsz)
    _, variables = init_model(jax.random.key(0), cfg)
    model = UninaYoloDla(dataclasses.replace(cfg, deploy=True))
    v = fold_batchnorm({k: variables[k] for k in ("params", "batch_stats")})

    rng = np.random.default_rng(0)
    s = args.imgsz
    frame = jnp.asarray(rng.integers(0, 256, (s, s, 3), dtype=np.uint8))

    def pre(i, vv, f):
        x = normalize((f ^ (i % 7).astype(jnp.uint8)).astype(jnp.float32)
                      / 255.0)
        return x.sum()

    def fwd(i, vv, f):
        x = normalize((f ^ (i % 7).astype(jnp.uint8)).astype(jnp.float32)
                      / 255.0)[None]
        outs = model.apply(vv, x, train=False)
        return sum(o.sum() for pair in outs for o in pair)

    def dec(i, vv, f):
        x = normalize((f ^ (i % 7).astype(jnp.uint8)).astype(jnp.float32)
                      / 255.0)[None]
        outs = model.apply(vv, x, train=False)
        d = decode_outputs(outs, cfg.strides)
        return d.scores.sum() + d.valid.sum()

    def full(i, vv, f):
        x = normalize((f ^ (i % 7).astype(jnp.uint8)).astype(jnp.float32)
                      / 255.0)[None]
        outs = model.apply(vv, x, train=False)
        d = nms(decode_outputs(outs, cfg.strides))
        return d.scores.sum() + d.valid.sum()

    t_pre = slope_ms(pre, (v, frame))
    t_fwd = slope_ms(fwd, (v, frame))
    t_dec = slope_ms(dec, (v, frame))
    t_full = slope_ms(full, (v, frame))

    print(f"device: {jax.devices()[0]}")
    print(f"config: base_channels={args.base_channels} "
          f"lite_p2={args.lite_p2} imgsz={s}")
    print(f"  preprocess only:        {t_pre:7.3f} ms")
    print(f"  + model forward:        {t_fwd:7.3f} ms "
          f"(forward ~ {t_fwd - t_pre:.3f})")
    print(f"  + decode/top-k:         {t_dec:7.3f} ms "
          f"(decode ~ {t_dec - t_fwd:.3f})")
    print(f"  + greedy NMS (full):    {t_full:7.3f} ms "
          f"(nms ~ {t_full - t_dec:.3f})")


if __name__ == "__main__":
    main()
