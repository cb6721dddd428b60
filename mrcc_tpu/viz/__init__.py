"""Offline analysis/visualization suite (reference ``visualization/``).

Headless matplotlib + TSV exports (Open3D viewers are not applicable on a
TPU host); every function writes files and returns the computed data so
tests can assert on substance, not just file existence.
"""

from .analysis import (  # noqa: F401
    confidence_plots,
    embedding_export,
    error_histograms,
)
from .html_viewer import write_html_viewer  # noqa: F401
