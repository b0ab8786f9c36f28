"""Probe: fused C3k2 kernel vs the standard per-conv block, isolated.

Targets the two 160^2 blocks that stay bf16 in the int8 engine
(PERF_EXCLUDE) and are movement-bound on the r3 trace
(artifacts/layer_table_s2dh.json):

  stage1_block   C3k2(64, n=1)  on (160,160,64)   8.2% of device time
  fpn_c3k2_2     C3k2(64, n=1)  on (160,160,128)  6.4%

Variants per instance:
  standard      the deploy-mode flax block (per-conv, XLA epilogue fusion)
  xla_fused     the kernel's identical-math XLA form (split dot, no concat)
  pallas        the one-VMEM-pass Pallas kernel

Slope-timing (loop-count regression; jnp.abs inside the loop so XLA can't
algebraically collapse it; float() fetch per the relay measurement rules).
Equivalence asserted standard-vs-fused before timing. One JSON line out.
"""
from __future__ import annotations

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from unina_yolo_dla_tpu.models.blocks import C3k2
from unina_yolo_dla_tpu.ops.pallas.c3k2_kernel import fused_c3k2


def slope(fn, vs, x):
    def mk(n):
        @jax.jit
        def r(vs, x):
            def it(i, acc):
                return acc + jnp.abs(
                    fn(vs, x + i.astype(x.dtype) * 1e-6)).mean()
            return lax.fori_loop(0, n, it, jnp.float32(0.))
        return r
    ts = {}
    for n in (20, 60, 100):
        r = mk(n)
        float(r(vs, x)); float(r(vs, x))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(r(vs, x))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    ns = sorted(ts)
    return float(np.median([(ts[b] - ts[a]) / (b - a)
                            for i, a in enumerate(ns) for b in ns[i + 1:]
                            ])) * 1e3


def weights_from_tree(p, n):
    cv = lambda d: (d["conv"]["kernel"], d["conv"]["bias"])  # noqa: E731
    bns = [(cv(p[f"bottleneck_{i}"]["cv1"]),
            cv(p[f"bottleneck_{i}"]["cv2"])) for i in range(n)]
    return cv(p["cv1"]), cv(p["cv2"]), cv(p["cv3"]), bns


def probe(name, cin, feats, n, size=160):
    x = jax.random.normal(jax.random.key(1), (size, size, cin),
                          jnp.bfloat16)
    std = C3k2(feats, n=n, deploy=True)
    vs = std.init(jax.random.key(0), x[None])
    vs = jax.tree.map(
        lambda a: jax.random.normal(jax.random.key(3), a.shape, a.dtype)
        * 0.05, vs)
    cv1, cv2, cv3, bns = weights_from_tree(vs["params"], n)

    def run_std(vs, xx):
        return std.apply(vs, xx[None])[0]

    def run_xla(vs, xx):
        c1, c2, c3, bb = weights_from_tree(vs["params"], n)
        return fused_c3k2(xx, c1, c2, c3, bb, use_pallas=False)

    def run_pl(vs, xx):
        c1, c2, c3, bb = weights_from_tree(vs["params"], n)
        return fused_c3k2(xx, c1, c2, c3, bb, use_pallas=True)

    # non-interpret Pallas needs a TPU; NB the live axon session reports
    # default_backend() == "axon", not "tpu" (verify SKILL platform trap)
    variants = [("standard", run_std), ("xla_fused", run_xla)]
    if jax.default_backend() != "cpu":
        variants.append(("pallas", run_pl))

    y0 = np.asarray(jax.jit(run_std)(vs, x), np.float32)
    for tag, f in variants[1:]:
        y = np.asarray(jax.jit(f)(vs, x), np.float32)
        err = np.abs(y - y0).max()
        assert err < 0.05, (name, tag, err)

    out = {}
    for tag, f in variants:
        out[tag] = round(slope(f, vs, x), 4)
    return out


def probe_pair(name, ca, cb, feats, n, size=160):
    """The neck fusion pattern C3k2(concat([upsample2x(a), b])): standard
    path (materialised upsample + concat) vs the pair-form fused kernel
    (fused_c3k2_cat — upsample/concat folded into the first dots, the
    lateral dot at coarse resolution)."""
    from unina_yolo_dla_tpu.ops.pallas.c3k2_kernel import fused_c3k2_cat

    xa = jax.random.normal(jax.random.key(1), (size // 2, size // 2, ca),
                           jnp.bfloat16)
    xb = jax.random.normal(jax.random.key(2), (size, size, cb),
                           jnp.bfloat16)
    std = C3k2(feats, n=n, deploy=True)
    vs = std.init(jax.random.key(0), xa[None], x2=xb[None], up_x=True)
    vs = jax.tree.map(
        lambda a: jax.random.normal(jax.random.key(3), a.shape, a.dtype)
        * 0.05, vs)

    def run_std(vs, xx):
        return std.apply(vs, xx[None], x2=xb[None], up_x=True)[0]

    def run_xla(vs, xx):
        c1, c2, c3, bb = weights_from_tree(vs["params"], n)
        return fused_c3k2_cat(xx, xb, c1, c2, c3, bb, upsample_a=True,
                              use_pallas=False)

    def run_pl(vs, xx):
        c1, c2, c3, bb = weights_from_tree(vs["params"], n)
        return fused_c3k2_cat(xx, xb, c1, c2, c3, bb, upsample_a=True,
                              use_pallas=True)

    variants = [("standard", run_std), ("xla_fused", run_xla)]
    if jax.default_backend() != "cpu":
        variants.append(("pallas", run_pl))
    y0 = np.asarray(jax.jit(run_std)(vs, xa), np.float32)
    for tag, f in variants[1:]:
        y = np.asarray(jax.jit(f)(vs, xa), np.float32)
        assert np.abs(y - y0).max() < 0.05, (name, tag)
    return {tag: round(slope(f, vs, xa), 4) for tag, f in variants}


def probe_head(name, ch, ncls, size=160):
    """The decoupled head (head_p2 shape by default): standard six-conv
    path vs the one-VMEM-pass fused kernel."""
    import dataclasses

    from unina_yolo_dla_tpu.models import ModelConfig
    from unina_yolo_dla_tpu.models.head import DetectionHead
    from unina_yolo_dla_tpu.ops.pallas.head_kernel import fused_head

    cfg = ModelConfig(num_classes=ncls, base_channels=ch,
                      input_size=size * 4, deploy=True)
    x = jax.random.normal(jax.random.key(1), (size, size, ch),
                          jnp.bfloat16)
    std = DetectionHead(cfg)
    vs = std.init(jax.random.key(0), x[None])
    vs = jax.tree.map(
        lambda a: jax.random.normal(jax.random.key(3), a.shape, a.dtype)
        * 0.05, vs)

    def wts(p):
        cc = [(p[n]["conv"]["kernel"], p[n]["conv"]["bias"])
              for n in ("cls_conv1", "cls_conv2")]
        rc = [(p[n]["conv"]["kernel"], p[n]["conv"]["bias"])
              for n in ("reg_conv1", "reg_conv2")]
        return (cc, (p["cls_pred"]["kernel"], p["cls_pred"]["bias"]),
                rc, (p["reg_pred"]["kernel"], p["reg_pred"]["bias"]))

    # concat both branches so neither is dead code under the abs-mean
    def run_std(vs, xx):
        c, r = std.apply(vs, xx[None])
        return jnp.concatenate([c[0], r[0]], axis=-1)

    def run_xla(vs, xx):
        cc, cp, rc, rp = wts(vs["params"])
        c, r = fused_head(xx, cc, cp, rc, rp, use_pallas=False)
        return jnp.concatenate([c, r], axis=-1)

    def run_pl(vs, xx):
        cc, cp, rc, rp = wts(vs["params"])
        c, r = fused_head(xx, cc, cp, rc, rp, use_pallas=True)
        return jnp.concatenate([c, r], axis=-1)

    variants = [("standard", run_std), ("xla_fused", run_xla)]
    if jax.default_backend() != "cpu":
        variants.append(("pallas", run_pl))
    y0 = np.asarray(jax.jit(run_std)(vs, x), np.float32)
    for tag, f in variants[1:]:
        y = np.asarray(jax.jit(f)(vs, x), np.float32)
        assert np.abs(y - y0).max() < 0.05, (name, tag)
    return {tag: round(slope(f, vs, x), 4) for tag, f in variants}


def main():
    res = {
        "backend": jax.default_backend(),
        "head_p2": probe_head("head_p2", 64, 4),
        "stage1_block": probe("stage1_block", 64, 64, 1),
        "fpn_c3k2_2": probe("fpn_c3k2_2", 128, 64, 1),
        # the REAL fpn_c3k2_2 pipeline pattern: 80^2 lateral upsampled +
        # 160^2 skip, upsample/concat folded into the fused kernel
        "fpn_fuse2": probe_pair("fpn_fuse2", 64, 64, 64, 1),
        # the quantized-int8 80^2 instance, run here in bf16 for scale
        "stage2_c3k2_bf16": probe("stage2_c3k2", 128, 128, 2, size=80),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
