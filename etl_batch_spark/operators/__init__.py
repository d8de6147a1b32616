from etl_batch_spark.operators.joins import (  # noqa: F401
    bucketed_join_tables,
    salted_join,
    write_bucketed,
)
