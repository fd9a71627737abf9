"""Sweep harness, preprocessing, and evaluation pipeline."""

from .constants import TEST_VARIABLES
from .configs import tc1_configs, tc21_configs, tc2_configs, tc3_configs
from .datagen import (
    APP_TC1, APP_TC2, APP_TC21, APP_TC3, SweepConfig, generate_dataset,
    run_config,
)
from .evaluate import (
    DEFAULT_TEST_CONFIG, get_summary_perf, interp1d_tgt, pred_theta,
    test_model,
)
from .analysis import eval_model, spectrum_table, theta_proxy_table
from .preprocess import (
    add_rho_column, best_theta, calc_rho, interp_rho, normalize_rho_t,
    preprocess_data, split_train_validation_test,
)

__all__ = [
    "TEST_VARIABLES", "SweepConfig", "run_config", "generate_dataset",
    "tc1_configs", "tc2_configs", "tc21_configs", "tc3_configs",
    "APP_TC1", "APP_TC2", "APP_TC21", "APP_TC3",
    "preprocess_data", "split_train_validation_test", "calc_rho",
    "interp_rho", "add_rho_column", "normalize_rho_t", "best_theta",
    "pred_theta", "test_model", "get_summary_perf", "interp1d_tgt",
    "DEFAULT_TEST_CONFIG", "eval_model", "theta_proxy_table", "spectrum_table",
]
