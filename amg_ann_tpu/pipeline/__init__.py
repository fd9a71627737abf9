"""Sweep harness, preprocessing, and evaluation pipeline."""

from .constants import TEST_VARIABLES
from .datagen import SweepConfig, generate_dataset, run_config
from .evaluate import (
    DEFAULT_TEST_CONFIG, get_summary_perf, interp1d_tgt, pred_theta,
    test_model,
)
from .preprocess import (
    add_rho_column, best_theta, calc_rho, interp_rho, normalize_rho_t,
    preprocess_data, split_train_validation_test,
)

__all__ = [
    "TEST_VARIABLES", "SweepConfig", "run_config", "generate_dataset",
    "preprocess_data", "split_train_validation_test", "calc_rho",
    "interp_rho", "add_rho_column", "normalize_rho_t", "best_theta",
    "pred_theta", "test_model", "get_summary_perf", "interp1d_tgt",
    "DEFAULT_TEST_CONFIG",
]
