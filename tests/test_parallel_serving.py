"""Sharded multi-stream serving on the 8-device virtual mesh.

The serving-side DP story (parallel/serving.py): a camera-fleet batch
sharded over the mesh must produce EXACTLY the single-device batch
program's detections — XLA partitions the independent per-stream work
with zero collectives, so this is a pure-placement transform.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unina_yolo_dla_tpu.models import ModelConfig, init_model
from unina_yolo_dla_tpu.models.detector import UninaYoloDla
from unina_yolo_dla_tpu.parallel import (
    create_mesh,
    make_sharded_batch_serving_fn,
    shard_streams,
)
from unina_yolo_dla_tpu.quant.deploy import fold_batchnorm
from unina_yolo_dla_tpu.runtime.pipeline import build_batch_serving_fn

IMG = 64


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(num_classes=4, base_channels=16, input_size=IMG,
                      compute_dtype=jnp.float32)
    _, variables = init_model(jax.random.key(0), cfg)
    dep = dataclasses.replace(cfg, deploy=True)
    return dep, UninaYoloDla(dep), fold_batchnorm(variables)


def test_sharded_fleet_matches_single_device(setup):
    cfg, model, v = setup
    mesh = create_mesh(8)
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (8, IMG, IMG, 3), dtype=np.uint8)

    sharded = make_sharded_batch_serving_fn(model, cfg, mesh,
                                            max_detections=64)
    d_sharded = jax.device_get(
        sharded(v, shard_streams(jnp.asarray(frames), mesh)))

    single = jax.jit(build_batch_serving_fn(model, cfg, max_detections=64))
    d_single = jax.device_get(single(v, jnp.asarray(frames)))

    np.testing.assert_array_equal(np.asarray(d_sharded.valid),
                                  np.asarray(d_single.valid))
    np.testing.assert_allclose(np.asarray(d_sharded.boxes),
                               np.asarray(d_single.boxes),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(d_sharded.classes),
                                  np.asarray(d_single.classes))


def test_sharded_fleet_no_collectives(setup):
    """Per-stream work is independent — the partitioned program must
    contain ZERO cross-device collectives (the scaling argument:
    linear throughput in slice size)."""
    cfg, model, v = setup
    mesh = create_mesh(8)
    sharded = make_sharded_batch_serving_fn(model, cfg, mesh,
                                            max_detections=64)
    frames = jnp.zeros((8, IMG, IMG, 3), jnp.uint8)
    txt = sharded.lower(v, shard_streams(frames, mesh)).compile().as_text()
    for coll in ("all-reduce", "all-gather", "collective-permute",
                 "all-to-all", "reduce-scatter"):
        # channel-bearing collective ops would appear by these names
        assert coll not in txt, f"unexpected collective {coll}"
