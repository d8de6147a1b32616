"""Custom Python data source (Spark 4 ``pyspark.sql.datasource``): a
partitioned calendar generator.

The engine's gap-fill and control-date machinery needs dense date
spines (q51's densification, DAILY000's control date); this source
generates one WITHOUT a driver-side ``spark.range`` + date arithmetic
detour, and doubles as the repo's reference implementation of the
DataSource API — the extension point a user follows to wrap any
external system (REST endpoint, queue, proprietary format) as a
first-class ``spark.read.format(...)`` citizen.

Scale shape: the date span splits into one :class:`InputPartition` per
year, so a century-long spine materializes on 100 executors in
parallel; each partition yields plain Python date rows (tiny data —
a spine is bounded by days-per-span, never by fact volume).

Usage::

    spark.dataSource.register(CalendarDataSource)
    spark.read.format("calendar")
         .option("start", "2024-01-01").option("end", "2026-12-31")
         .load()
    # columns: day date, year int, quarter int, month int, dom int,
    #          dow int (1=Mon..7=Sun), iso_week int, is_weekend boolean
"""

from __future__ import annotations

from datetime import date, timedelta

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("day", T.DateType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("quarter", T.IntegerType()),
        T.StructField("month", T.IntegerType()),
        T.StructField("dom", T.IntegerType()),
        T.StructField("dow", T.IntegerType()),
        T.StructField("iso_week", T.IntegerType()),
        T.StructField("is_weekend", T.BooleanType()),
    ]
)


class _YearPartition(InputPartition):
    def __init__(self, start: date, end: date):
        self.start = start
        self.end = end


class CalendarReader(DataSourceReader):
    def __init__(self, options: dict):
        self.start = date.fromisoformat(options.get("start", "2024-01-01"))
        self.end = date.fromisoformat(options.get("end", "2024-12-31"))
        if self.end < self.start:
            raise ValueError(f"end {self.end} before start {self.start}")

    def partitions(self):
        parts = []
        for year in range(self.start.year, self.end.year + 1):
            lo = max(self.start, date(year, 1, 1))
            hi = min(self.end, date(year, 12, 31))
            parts.append(_YearPartition(lo, hi))
        return parts

    def read(self, partition: _YearPartition):
        d = partition.start
        one = timedelta(days=1)
        while d <= partition.end:
            iso = d.isocalendar()
            yield (
                d,
                d.year,
                (d.month - 1) // 3 + 1,
                d.month,
                d.day,
                iso[2],
                iso[1],
                iso[2] >= 6,
            )
            d += one


class CalendarDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "calendar"

    def schema(self):
        return SCHEMA

    def reader(self, schema) -> CalendarReader:
        return CalendarReader(self.options)
