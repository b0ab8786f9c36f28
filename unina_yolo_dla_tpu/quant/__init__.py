from .calibrate import (
    calibrate,
    entropy_amax,
    load_calibration_cache,
    percentile_amax,
    save_calibration_cache,
    select_amax,
)
from .fake_quant import (
    DEFAULT_EXCLUDE,
    ActQuant,
    QuantConv,
    QuantSpec,
    fake_quant_tensor,
    ste_round,
)
from .qat import make_qat_model, prepare_qat_variables

__all__ = [
    "ActQuant", "QuantConv", "QuantSpec", "DEFAULT_EXCLUDE",
    "fake_quant_tensor", "ste_round",
    "calibrate", "entropy_amax", "percentile_amax", "select_amax",
    "save_calibration_cache", "load_calibration_cache",
    "make_qat_model", "prepare_qat_variables",
]
