from etl_batch_spark.sources.io import (  # noqa: F401
    read_csv,
    read_json,
    read_parquet,
    resolve_loader_paths,
    write_partitioned,
)
