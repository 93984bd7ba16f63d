"""bubbles_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the Stiivi/bubbles ETL framework (virtual data objects + a catalog of
composable operations), rebuilt from scratch on the Spark DataFrame
API.  Nothing here is a port: every operator is a pure
``DataFrame -> DataFrame`` function whose logical plan Catalyst
optimizes (predicate pushdown, column pruning, broadcast joins, AQE),
and the surface is extended with window functions, batch event-time
windows, and LLM-data-pipeline operators (dedup, vector similarity,
text analysis, multimodal columns) designed for 100 TB scale.

Reference parity map: see SURVEY.md §2 (citations of the form
``bubbles/<module>.py::<symbol>`` refer to the public Stiivi/bubbles
repository; /root/reference was empty at survey time).
"""

from bubbles_spark.schema import Field, FieldList, FieldFilter, to_field
from bubbles_spark.session import get_spark
from bubbles_spark.pipeline import ExecutionContext, Pipeline
from bubbles_spark import io, ops, probes

__version__ = "0.1.0"

__all__ = [
    "Field",
    "FieldList",
    "FieldFilter",
    "to_field",
    "get_spark",
    "Pipeline",
    "ExecutionContext",
    "io",
    "ops",
    "probes",
    "__version__",
]
