from .convolve import (convolve_separable, compute_smoothed_image,
                       compute_gradients, to_float_image)
from .pyramid import build_pyramid, build_image_pyramids
from .interp import bilinear_sample, window_offsets
from .selection import corner_response, candidate_points
from .lk import track_features_pyramid

__all__ = [
    "convolve_separable", "compute_smoothed_image", "compute_gradients",
    "to_float_image", "build_pyramid", "build_image_pyramids",
    "bilinear_sample", "window_offsets", "corner_response",
    "candidate_points", "track_features_pyramid",
]
