from pharmacodi_spark.sources.record_text import parse_record_text
from pharmacodi_spark.sources.api import fetch_batched

__all__ = ["parse_record_text", "fetch_batched"]
