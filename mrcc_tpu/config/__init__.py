"""YAML config system (reference-schema compatible, explicit object)."""

from .config import DEFAULT_CONFIG, Config  # noqa: F401
