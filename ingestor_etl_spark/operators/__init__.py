from ingestor_etl_spark.operators.correlate import correlate_full_outer  # noqa: F401
from ingestor_etl_spark.operators.enrich import propagate_group_value  # noqa: F401
from ingestor_etl_spark.operators.sessionize import sessionize  # noqa: F401
