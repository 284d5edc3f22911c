"""Visualization: field comparisons, line plots, training curves."""

from .fields import collapse_to_2d, compare_fields, field_magnitude, normalized_error
from .lines import extract_line_data, plot_line_comparison
from .training import plot_field_errors_detailed, plot_training_curves

__all__ = [
    "collapse_to_2d",
    "compare_fields",
    "field_magnitude",
    "normalized_error",
    "extract_line_data",
    "plot_line_comparison",
    "plot_training_curves",
    "plot_field_errors_detailed",
]
