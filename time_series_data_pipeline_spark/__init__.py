"""PySpark-native analytics engine with the query + data-processing
capabilities of rahulkorpe/time-series-data-pipeline (see SURVEY.md).

Brand-new Spark-first design — NOT a port. The reference's Airflow/Dask/
InfluxDB pipeline (reference: dags/ETL.py, dags/transform.py) collapses
into declarative DataFrame plans: ingestion is one streaming/batch scan →
transform → partitioned-parquet "bucket" write; the query layer is
Catalyst-optimized DataFrame/SQL over that bucket plus the driver-mandated
extension operators (dedup, similarity search, text analysis, multimodal).
"""

__version__ = "0.1.0"

from .catalog import load_tables, register_views, table  # noqa: E402,F401
from .session import get_spark  # noqa: E402,F401

__all__ = ["get_spark", "table", "load_tables", "register_views"]
