"""θ-predicting ANN: models, losses, normalization, training, persistence."""

from .checkpoint import load_model, save_model
from .models import (
    ClassicCNN, ThetaCostModel, mae, mse, mse_mvar, mse_var,
)
from .normalize import (
    NORMALIZATION_MODES, VIEW_TYPE_CHANNELS, norm_view, stack_channels,
)
from .train import FitResult, create_state, fit, predict

__all__ = [
    "ClassicCNN", "ThetaCostModel", "mse", "mse_var", "mse_mvar", "mae",
    "norm_view", "stack_channels", "NORMALIZATION_MODES",
    "VIEW_TYPE_CHANNELS", "fit", "predict", "create_state", "FitResult",
    "save_model", "load_model",
]
