"""Query surface: importing this package populates the registry."""

from . import extensions, relational, timeseries_q  # noqa: F401
from .registry import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE"]
