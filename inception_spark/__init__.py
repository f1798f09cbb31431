"""inception_spark — a PySpark-native engine with the query and
data-processing capabilities of freelawproject/inception, built Spark-first.

See SURVEY.md for the blueprint, OPERATORS.md for the operator map, and
SCALING.md for the 100 TB design notes; reference citations live in each
module's docstring."""

from inception_spark.config import DEFAULT_CONFIG, EngineConfig
from inception_spark.engine import EmbeddingEngine, register_sql_functions
from inception_spark.session import build_session

__all__ = [
    "DEFAULT_CONFIG",
    "EngineConfig",
    "EmbeddingEngine",
    "build_session",
    "register_sql_functions",
]
__version__ = "0.2.0"
