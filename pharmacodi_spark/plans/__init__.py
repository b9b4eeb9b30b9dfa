from pharmacodi_spark.plans.queries import QUERIES, spark_queries, oracle_queries
import pharmacodi_spark.plans.extensions  # noqa: F401  (registers extension queries)
import pharmacodi_spark.plans.extensions2  # noqa: F401  (registers second batch)
import pharmacodi_spark.plans.pipeline_q  # noqa: F401  (registers pipeline composition)
import pharmacodi_spark.plans.analytics  # noqa: F401  (registers subquery/decorrelation kit)

from pyspark.sql import DataFrame, SparkSession


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver's smoke-check query (SURVEY §7.1 step 2)."""
    return QUERIES["experiment_join"][0](spark, sf_dir)


__all__ = ["QUERIES", "spark_queries", "oracle_queries", "flagship"]
