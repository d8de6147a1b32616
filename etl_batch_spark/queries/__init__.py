"""Query registry — single source of truth for the engine's query surface.

``__spark_entry__.py`` (driver contract), ``bench.py`` and the test suite
all consume :data:`QUERIES`.  Importing this package registers every
query module.
"""

from etl_batch_spark.queries.registry import QUERIES, Query, query  # noqa: F401

# import for registration side effects
from etl_batch_spark.queries import (  # noqa: E402,F401
    etlq,
    eventsq,
    llmq,
    relational,
    scalarq,
    streamq,
)

# Reorder the registry so the external driver's bounded per-round
# verification window (first 50 entries) lands on not-yet-verified and
# changed-this-round queries first; see rotation.py.
from etl_batch_spark.queries import rotation as _rotation  # noqa: E402

_rotation.reorder(QUERIES)
