"""Exact-parity unit tests for the reference's scalar surface
(SURVEY.md §2.B / §5 item 2), including the ugly edges."""

from __future__ import annotations

from datetime import datetime

import pytest

from etl_batch_spark.functions.scalars import (
    atol,
    check_date,
    datediff_hms,
    field_counter,
    get_nth_field,
    string_to_number,
)


class TestDatediffHms:
    def test_basic(self):
        # body.sql:17-36 — unpadded H:M:S
        assert datediff_hms(datetime(2020, 1, 1, 0, 0, 0), datetime(2020, 1, 1, 1, 3, 7)) == "1:3:7"

    def test_zero(self):
        t = datetime(2020, 1, 1)
        assert datediff_hms(t, t) == "0:0:0"

    def test_hours_accumulate_past_24(self):
        # hours are total hours, no day component
        assert datediff_hms(datetime(2020, 1, 1), datetime(2020, 1, 2, 2, 0, 5)) == "26:0:5"

    def test_negative_is_invalid(self):
        assert datediff_hms(datetime(2020, 1, 2), datetime(2020, 1, 1)) == "INVALID DATE"


class TestCheckDate:
    # body.sql:90-123 return codes
    def test_null(self):
        assert check_date(None)[0] == -1

    def test_too_short(self):
        assert check_date("1-JAN-20")[0] == -1  # len < 10
        assert check_date("1-JAN-2020")[0] == 0  # len 10 parses fine

    def test_len10_valid(self):
        code, canon, _ = check_date("01-JAN-202")  # len 10 but unparseable year
        assert code == 2

    def test_too_long(self):
        assert check_date("01-JANUARY-2020")[0] == 1

    def test_unparseable(self):
        assert check_date("99-XXX-2020")[0] == 2

    def test_valid_canonicalises(self):
        code, canon, err = check_date("01-jan-2020")
        assert code == 0
        assert canon == "01-JAN-2020"
        assert err is None


class TestFieldCounter:
    # body.sql:729-762 — counts delimiters; +1 when unterminated
    def test_terminated(self):
        assert field_counter("a,b,c,", unterminated=False) == 3

    def test_unterminated(self):
        assert field_counter("a,b,c", unterminated=True) == 3

    def test_empty(self):
        assert field_counter("", unterminated=True) == 0
        assert field_counter(None, unterminated=True) == 0

    def test_multichar_delim_rejected(self):
        with pytest.raises(ValueError):
            field_counter("a::b", delim="::")


class TestGetNthField:
    # body.sql:768-814 — only delimiter-terminated fields exist
    def test_unterminated_appends(self):
        assert get_nth_field("a,b,c", 3, unterminated=True) == "c"

    def test_terminated_last_not_a_field(self):
        assert get_nth_field("a,b,c", 3, unterminated=False) is None
        assert get_nth_field("a,b,c", 2, unterminated=False) == "b"

    def test_past_end(self):
        assert get_nth_field("a,b,", 5, unterminated=False) is None

    def test_empty_fields_preserved(self):
        assert get_nth_field("a,,c,", 2, unterminated=False) == ""


class TestStringToNumber:
    # body.sql:817-857 — C atoi clone, digits only, no sign
    def test_plain(self):
        assert string_to_number("123") == 123

    def test_stops_at_nondigit(self):
        assert string_to_number("12ab7") == 12

    def test_no_sign_support(self):
        assert string_to_number("-5") == 0

    def test_trims(self):
        assert string_to_number("  42  ") == 42

    def test_empty_and_null(self):
        assert string_to_number("") == 0
        assert string_to_number(None) == 0
        assert string_to_number("abc") == 0

    def test_atol_alias(self):
        assert atol("77x") == 77


class TestSqlRegistration:
    def test_registered_names_callable_from_sql(self, spark):
        from etl_batch_spark.functions.scalars import register_sql_functions

        names = register_sql_functions(spark)
        assert names == [
            "func_atol",
            "func_check_date",
            "func_datediff",
            "func_field_counter",
            "func_get_nth_field",
            "func_string_to_number",
        ]
        row = spark.sql(
            """
            SELECT func_string_to_number('12ab7') AS a,
                   func_atol('  42  ') AS b,
                   func_check_date('01-JAN-2024') AS c,
                   func_check_date('bad') AS c_bad,
                   func_field_counter('a,b,c', false, ',') AS d,
                   func_get_nth_field('a,b,c', 2, true, ',') AS e,
                   func_datediff(TIMESTAMP '2024-01-01 00:00:00',
                                 TIMESTAMP '2024-01-02 01:02:03') AS f
            """
        ).collect()[0]
        assert row["a"] == 12
        assert row["b"] == 42
        assert row["c"] == 0
        assert row["c_bad"] == -1
        assert row["d"] == 2
        assert row["e"] == "b"
        assert row["f"] == "25:2:3"


class TestSplitFieldsUdtf:
    def test_one_based_empties_and_null(self, spark):
        from etl_batch_spark.functions.udtfs import register_udtfs

        assert "split_fields" in register_udtfs(spark)
        rows = spark.sql("SELECT * FROM split_fields('a,,c', ',')").collect()
        assert [(r["pos"], r["field"]) for r in rows] == [(1, "a"), (2, ""), (3, "c")]
        assert spark.sql("SELECT * FROM split_fields(CAST(NULL AS STRING), ',')").count() == 0
