"""Sparse-matrix pooling ("view") featurizer for the θ-predicting ANN."""

from .pooling import View, bin_index, make_view, make_view_device, make_view_host

__all__ = ["View", "bin_index", "make_view", "make_view_device",
           "make_view_host"]
