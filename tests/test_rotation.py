"""Rotation invariants: the driver verifies only the first 50 registry
entries per round, so the ordering mechanism itself needs a contract."""

from __future__ import annotations

from etl_batch_spark.queries import QUERIES
from etl_batch_spark.queries.rotation import DRIVER_GREEN, DRIVER_WINDOW


def test_window_is_exactly_the_first_fifty():
    names = list(QUERIES)
    assert len(DRIVER_WINDOW) == 50
    assert names[: len(DRIVER_WINDOW)] == DRIVER_WINDOW


def test_window_and_green_reference_real_queries():
    unknown = [n for n in (*DRIVER_WINDOW, *DRIVER_GREEN) if n not in QUERIES]
    assert unknown == []


def test_green_queries_are_deprioritized_to_the_back():
    names = list(QUERIES)
    green = [n for n in DRIVER_GREEN if n not in DRIVER_WINDOW]
    assert names[-len(green):] == [n for n in names if n in set(green)]


def test_new_queries_land_in_the_middle_tier():
    # anything in neither list (e.g. queries added mid-round) must sit
    # after the window and before the green tail, so the NEXT rotation
    # update picks it up for driver verification
    names = list(QUERIES)
    green = {n for n in DRIVER_GREEN if n not in DRIVER_WINDOW}
    middle = names[50 : len(names) - len(green)]
    assert all(n not in green and n not in DRIVER_WINDOW for n in middle)
    assert len(DRIVER_WINDOW) + len(middle) + len(green) == len(names)


def test_every_window_query_has_an_oracle_or_documented_rows_only():
    # the point of the window is driver-green rows; rows-only entries
    # burn a slot for a weaker check, so they must be deliberate
    rows_only = [n for n in DRIVER_WINDOW if QUERIES[n].oracle is None]
    assert rows_only == ["q38_approx_aggregates"]  # approximate by design
