"""big_data_ml_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference `SiddiqueDataEng/big-data-ml-pipeline`
(a PySpark+MLlib config-driven ML pipeline), extended with the
operators a large-scale (100 TB) training-data pipeline needs:
deduplication, similarity search, multimodal column plumbing and
text analysis.

Design principles (see SURVEY.md §7):
 - DataFrame/SQL only; Catalyst is the sole optimizer.
 - Single-pass multi-aggregations; no driver-side loops or per-column jobs.
 - Broadcast hints for dimension tables; AQE everywhere.
 - Pandas UDFs (Arrow) only where built-in expressions cannot express
   the semantics; row-at-a-time Python UDFs never in the hot path.
"""

__version__ = "0.1.0"

from .orchestrator import PipelineOrchestrator, load_config  # noqa: E402
from .serving import ServingService  # noqa: E402

__all__ = ["PipelineOrchestrator", "ServingService", "load_config"]
