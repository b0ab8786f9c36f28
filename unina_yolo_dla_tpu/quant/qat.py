"""QAT orchestration: FP32 -> calibrated int8 QAT handoff.

High-level parity with the reference phase-2 flow (train.py:689-901):
quant init -> weight transfer -> FP16 layer exclusions -> lightweight
calibration -> QAT fine-tune setup. Because the FP32 and QAT models share
one module/param tree, "weight transfer" (qat.py:521-673's 150-line
name-normalising porter) reduces to attaching the calibrated ``quant``
collection to the existing variables.
"""
from __future__ import annotations

from typing import Any, Callable, Iterable

from .calibrate import calibrate
from .fake_quant import DEFAULT_EXCLUDE


def make_qat_model(
    cfg,
    exclude: tuple[str, ...] = DEFAULT_EXCLUDE,
    num_bits: int = 8,
):
    """The QAT twin: same tree, quantizers on, exclusions applied
    (set_layer_precision_fp16 parity, qat.py:700-753 / train.py:779-781)."""
    from ..models.detector import UninaYoloDla  # deferred: avoid circular import

    qcfg = cfg.with_quant("quantize", exclude=exclude, num_bits=num_bits)
    return UninaYoloDla(qcfg)


def prepare_qat_variables(
    fp32_model,
    fp32_variables: dict[str, Any],
    batches_fn: Callable[[], Iterable[Any]],
    method: str = "entropy",
    max_batches: int = 30,
    exclude: tuple[str, ...] = DEFAULT_EXCLUDE,
    num_bits: int = 8,
    min_images: int = 50,
):
    """FP32 (model, variables) -> (qat_model, qat_variables).

    Runs the two-pass entropy calibration on eval-mode forwards
    (collect_calibration_stats parity: 30 batches, qat.py:171-220 +
    train.py:809) and attaches the resulting ``quant`` collection. Params
    and batch stats are passed through untouched — the deterministic
    handoff the reference could not have (its model.py/qat.py trees
    diverge; ours are one tree).
    """
    from ..models.detector import UninaYoloDla  # deferred: circular import

    cfg = fp32_model.config
    calib_cfg = cfg.with_quant("calib_max", exclude=exclude,
                               num_bits=num_bits)
    calib_model = UninaYoloDla(calib_cfg)
    quant_tree = calibrate(calib_model, fp32_variables, batches_fn,
                           method=method, max_batches=max_batches,
                           min_images=min_images)
    qat_model = make_qat_model(cfg, exclude=exclude, num_bits=num_bits)
    qat_variables = dict(fp32_variables)
    qat_variables["quant"] = quant_tree
    return qat_model, qat_variables
