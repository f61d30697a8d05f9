"""Query surface: importing this package populates the registry."""

# Import order IS registration order IS the driver's verification
# order: the time-series engine path (the reason this repo exists)
# registers first, then the relational surface, then the
# training-data-pipeline extensions.
from . import timeseries_q  # noqa: F401  isort: skip
from . import relational  # noqa: F401  isort: skip
from . import extensions  # noqa: F401  isort: skip
from .registry import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE"]
