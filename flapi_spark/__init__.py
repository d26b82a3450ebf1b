"""flapi_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of DataZooDE/flapi (reference studied at
/root/reference), re-architected Spark-first.

Core pipeline: YAML endpoint config → mustache SQL template → typed
parameter validation → Spark parameterized SQL → DataFrame, with
pagination, response shaping, and an incremental snapshot cache.
"""

from flapi_spark.session import get_spark
from flapi_spark.templates import render_template
from flapi_spark.validation import validate_params, ValidationError
from flapi_spark.executor import QueryExecutor

__all__ = [
    "get_spark",
    "render_template",
    "validate_params",
    "ValidationError",
    "QueryExecutor",
]

__version__ = "0.1.0"
