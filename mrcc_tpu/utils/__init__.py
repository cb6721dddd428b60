"""Host-side utilities (logging)."""

from .logger import get_logger  # noqa: F401
