"""Property-based parity: the Spark column forms of the reference's
scalar functions must agree with their pure-Python forms on arbitrary
inputs, not just the curated fixtures (SURVEY.md §5 — edge semantics
are the point of these functions).

Hypothesis drives the input space; each property collects a batch of
generated rows into ONE DataFrame evaluation, so the suite stays a few
Spark jobs, not thousands.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from etl_batch_spark.functions import scalars

# printable text without surrogates; keep regex metachars in scope
_text = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
    max_size=40,
)
_delims = st.sampled_from([",", "|", ";", ".", "*", "\t"])


def _eval_batch(spark, rows, col_builder, schema="s string"):
    df = spark.createDataFrame([(r,) for r in rows], schema)
    return [r["out"] for r in df.select(col_builder(F.col("s")).alias("out")).collect()]


class TestFieldCounterProperty:
    @settings(max_examples=30, deadline=None)
    @given(st.lists(_text | st.none(), min_size=1, max_size=20), _delims,
           st.booleans())
    def test_matches_python(self, spark, strings, delim, unterminated):
        got = _eval_batch(
            spark, strings,
            lambda c: scalars.field_counter_col(c, unterminated=unterminated, delim=delim),
        )
        want = [scalars.field_counter(s, unterminated=unterminated, delim=delim)
                for s in strings]
        assert got == want


class TestNthFieldProperty:
    @settings(max_examples=30, deadline=None)
    @given(st.lists(_text | st.none(), min_size=1, max_size=20), _delims,
           st.integers(min_value=1, max_value=6))
    def test_matches_python(self, spark, strings, delim, n):
        got = _eval_batch(
            spark, strings, lambda c: scalars.nth_field_col(c, n, delim=delim)
        )
        want = [scalars.get_nth_field(s, n, delim=delim) for s in strings]
        assert got == want


class TestStringToNumberProperty:
    @settings(max_examples=30, deadline=None)
    @given(st.lists(
        st.one_of(
            _text,
            st.none(),
            st.integers(min_value=-10**12, max_value=10**12).map(str),
            st.from_regex(r"\A *[+-]?[0-9]{1,12}[a-z,.]{0,3}\Z"),
        ),
        min_size=1, max_size=20,
    ))
    def test_matches_python(self, spark, strings):
        got = _eval_batch(spark, strings, scalars.string_to_number_col)
        want = [scalars.string_to_number(s) for s in strings]
        assert got == want


class TestDatediffHmsProperty:
    @settings(max_examples=20, deadline=None)
    @given(st.lists(
        st.tuples(
            st.datetimes(min_value=dt.datetime(1990, 1, 1),
                         max_value=dt.datetime(2030, 1, 1)),
            st.timedeltas(min_value=dt.timedelta(0),
                          max_value=dt.timedelta(days=30)),
        ),
        min_size=1, max_size=20,
    ))
    def test_matches_python(self, spark, pairs):
        pairs = [(a.replace(microsecond=0), a.replace(microsecond=0) + d)
                 for a, d in pairs]
        df = spark.createDataFrame(pairs, "a timestamp, b timestamp")
        got = [r["out"] for r in df.select(
            scalars.datediff_hms_col(F.col("a"), F.col("b")).alias("out")
        ).collect()]
        want = [scalars.datediff_hms(a, b) for a, b in pairs]
        assert got == want
