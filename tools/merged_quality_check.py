"""Quality parity check: the merged int8 engine vs the s2dh int8 engine
on the committed xhard val set.

The merged engine is the same multiplies/adds by construction
(fold-equivalence tests pin it to 1e-4 in f32), but the committed
default engine deserves committed metric evidence, not an argument:
both engines evaluated with the standard eval path on the 200-image
xhard val split must agree on every headline metric.

Runs on the CPU backend (the merged engine's stage1 takes the
identical-math XLA lowering there).
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import dataclasses
import json

import numpy as np

from unina_yolo_dla_tpu.data.dataset import (
    YoloDataset,
    batch_iterator,
    load_dataset_yaml,
)
from unina_yolo_dla_tpu.evaluate import evaluate_model
from unina_yolo_dla_tpu.models.config import ModelConfig
from unina_yolo_dla_tpu.models.detector import UninaYoloDla
from unina_yolo_dla_tpu.quant.deploy import (
    fold_batchnorm,
    fold_downsample_space_to_depth,
    fold_stem_space_to_depth,
    merge_stem_columns,
    quantize_weights_int8,
)
from unina_yolo_dla_tpu.quant.fake_quant import PERF_EXCLUDE, QuantSpec
from unina_yolo_dla_tpu.utils.checkpoint import load_msgpack_raw

COLS = ("map50", "map50_95", "small_object_precision",
        "small_object_recall", "small_object_f1")


def main():
    spec = load_dataset_yaml("runs/xhard_data/fsd_synth.yaml")
    val_ds = YoloDataset(spec["val"], img_size=640, max_boxes=60)
    # optional image cap for CPU runs (full 200-image eval x2 engines is
    # ~1 h on this 1-CPU box): same images for both engines either way
    limit = int(sys.argv[1]) if len(sys.argv) > 1 else len(val_ds)
    n_batches = max(1, limit // 8)
    cfg = ModelConfig(num_classes=spec["nc"], base_channels=32,
                      input_size=640)

    def batches():
        it = batch_iterator(val_ds, 8, np.random.default_rng(0),
                            shuffle=False, augment=False)
        for i, b in enumerate(it):
            if i >= n_batches:
                break
            yield b

    variables = load_msgpack_raw("artifacts/engine_source.msgpack")
    qspec = QuantSpec(mode="int8_fused", exclude=PERF_EXCLUDE)
    int8_vars = quantize_weights_int8(fold_batchnorm(variables), qspec)

    s2dh_cfg = dataclasses.replace(cfg, deploy=True, quant=qspec,
                                   stem_s2d=True, s2d_host=True,
                                   stage1_s2d=True)
    s2dh_vars = fold_downsample_space_to_depth(
        fold_stem_space_to_depth(int8_vars))
    s2dm_cfg = dataclasses.replace(s2dh_cfg, s2d_merged=True)
    s2dm_vars = merge_stem_columns(s2dh_vars)
    # fully-fused engine: + fused C3k2 blocks and fused heads on the
    # float-path subgraphs (same variables — the param tree is identical)
    s2dm_fc_cfg = dataclasses.replace(s2dm_cfg, fused_c3k2=True,
                                      fused_head=True)

    # the eval path normalizes standard (B,S,S,3) frames before apply;
    # the s2d engines consume blocked/merged inputs. Normalisation is
    # per-channel pointwise, so shuffling AFTER it is identical to the
    # serving order (tiled constants after the host shuffle) — the
    # adapter blocks/merges inside the traced graph (quality run; the
    # latency A/B lives in bench.py with the real host contract).
    from unina_yolo_dla_tpu.ops.preprocess import space_to_depth

    class InputAdapter:
        """Model facade: blocks/merges the eval batch in-graph."""

        def __init__(self, model, mode):
            self.model = model
            self.config = model.config
            self.mode = mode

        def apply(self, variables, x, train=False, **kw):
            xb = space_to_depth(x, 2)
            if self.mode == "merged":
                b, hh, hw, c = xb.shape
                xb = xb.reshape(b, hh, hw // 2, 2 * c)
            return self.model.apply(variables, xb, train=train, **kw)

    engines = {
        "int8_s2dh": InputAdapter(UninaYoloDla(s2dh_cfg), "blocked"),
        "int8_s2dm": InputAdapter(UninaYoloDla(s2dm_cfg), "merged"),
        "int8_s2dm_fc": InputAdapter(UninaYoloDla(s2dm_fc_cfg), "merged"),
    }
    evars = {"int8_s2dh": s2dh_vars, "int8_s2dm": s2dm_vars,
             "int8_s2dm_fc": s2dm_vars}

    # optional engine filter (argv[2], substring) so an interrupted run
    # can resume with just the missing engine
    only = sys.argv[2] if len(sys.argv) > 2 else ""
    results = {}
    for name, model in engines.items():
        if only and only not in name:
            continue
        m = evaluate_model(model, evars[name], batches, conf_threshold=0.25)
        results[name] = {k: round(float(m.get(k, float("nan"))), 5)
                         for k in COLS}
        print(name, results[name], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
