"""inception_spark — a PySpark-native engine with the query and
data-processing capabilities of freelawproject/inception, built Spark-first.

See SURVEY.md for the blueprint; reference citations live in each module's
docstring."""

from inception_spark.config import DEFAULT_CONFIG, EngineConfig
from inception_spark.engine import EmbeddingEngine

__all__ = ["DEFAULT_CONFIG", "EngineConfig", "EmbeddingEngine"]
__version__ = "0.1.0"
