"""Aggregating (GROUPED_AGG) pandas UDFs.

NOTE: deliberately NO ``from __future__ import annotations`` here —
``pandas_udf`` infers the UDF kind from the evaluated signature types,
and stringified annotations break that inspection.

Scale note (also on q96): a pandas UDAF ships each group's full value
set to one task — no partial aggregation — so these are for
aggregations with no native-expression form or for API parity; when a
native form exists (e.g. geometric mean = exp(avg(ln(x)))), that plan
map-side combines and is the one to run at 100 TB.
"""

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geo_mean(v: pd.Series) -> float:
    """Geometric mean of a positive series: exp(mean(log(x))).

    NULLs are dropped first — the SQL twin AVG(LN(x)) ignores NULLs,
    while a bare to_numpy() would turn them into NaN and poison the
    whole group's mean; an all-NULL group returns NULL like AVG does."""
    vals = v.dropna().to_numpy(dtype=np.float64)
    if len(vals) == 0:
        return None
    return float(np.exp(np.log(vals).mean()))
