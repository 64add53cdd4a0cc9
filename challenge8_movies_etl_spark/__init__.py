"""challenge8_movies_etl_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of plin112/Challenge8_Movies-ETL,
re-expressed Spark-first (DataFrame/SQL on Catalyst + Structured Streaming)
and extended with LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis). See SURVEY.md for the blueprint.
"""

from .session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
