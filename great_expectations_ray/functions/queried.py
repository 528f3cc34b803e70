"""QueryExpectation contrib family (``expect_queried_*``) — SQL templated
over ``{batch}``.

All nine ports ride the engine's ONE shared stream->DuckDB materialization
(the same pass as ``unexpected_rows_expectation(scope="table")``), so a suite
with any number of queried rules loads the asset exactly once.  Template
substitution is raw string formatting, exactly as the reference's
QueryExpectation contract (``{col}``/``{filter}``/... are trusted suite
config, not user data — the reference has the same injection surface).

Reference files (contrib/experimental/.../expectations/):
- expect_queried_column_value_frequency_to_meet_threshold.py:31-107
- expect_queried_table_row_count_to_be.py:44-141
- expect_queried_column_list_to_be_unique.py:20-64
- expect_query_to_have_no_duplicate_value_combinations.py:21-55
- expect_queried_column_to_have_n_distinct_values_with_condition.py:22-68
- expect_queried_custom_query_to_return_num_rows.py:25-63
- expect_query_count_with_filter_to_meet_threshold.py:28-71
- expect_queried_slowly_changing_table_to_have_no_gaps.py:32-84
- expect_queried_column_pair_values_to_be_both_filled_or_null.py:34-103
"""

from __future__ import annotations

from typing import Any

QUERIED_TYPES = {
    "expect_queried_column_value_frequency_to_meet_threshold",
    "expect_queried_table_row_count_to_be",
    "expect_queried_column_list_to_be_unique",
    "expect_query_to_have_no_duplicate_value_combinations",
    "expect_queried_column_to_have_n_distinct_values_with_condition",
    "expect_queried_custom_query_to_return_num_rows",
    "expect_query_count_with_filter_to_meet_threshold",
    "expect_queried_slowly_changing_table_to_have_no_gaps",
    "expect_queried_column_pair_values_to_be_both_filled_or_null",
    "expect_queried_column_to_be_unique_with_condition",
    "expect_queried_column_pair_values_to_have_diff",
    "expect_queried_column_values_to_exist_in_second_table_column",
    "expect_column_values_to_be_present_in_other_table",
}


def evaluate_queried_rule(con, cfg, asset: str, register_other=None) -> tuple[bool, dict]:
    """(success, result) for one queried rule against the registered DuckDB
    table ``asset``.  ``con`` is the suite-shared connection.
    ``register_other(name)`` streams the named other table (from
    ``validate(..., other_tables=...)``) into DuckDB on first use and
    returns its registered table name."""
    t = cfg.expectation_type
    k = cfg.kwargs
    td: dict = k.get("template_dict") or {}

    def q(sql: str, **fmt: Any):
        return con.execute(sql.format(batch=asset, **fmt)).fetchall()

    if t == "expect_queried_column_value_frequency_to_meet_threshold":
        col = k["column"]
        rows = q(
            "SELECT {col}, CAST(COUNT({col}) AS float) /"
            " (SELECT COUNT({col}) FROM {batch})"
            " FROM {batch} GROUP BY {col}",
            col=col,
        )
        freq = {r[0]: r[1] for r in rows}
        value, threshold = k["value"], k.get("threshold", 1)
        if isinstance(value, list):
            ths = threshold if isinstance(threshold, list) else [threshold] * len(value)
            obs = [freq.get(v, 0.0) for v in value]
            return all(o >= th for o, th in zip(obs, ths)), {"observed_value": obs}
        obs = freq.get(value, 0.0)
        return obs >= threshold, {"observed_value": obs}

    if t == "expect_queried_table_row_count_to_be":
        sql = k.get("query", "SELECT COUNT(*) FROM {batch}")
        n = q(sql)[0][0]
        return n == k["value"], {"observed_value": n}

    if t == "expect_queried_column_list_to_be_unique":
        cols = ", ".join(td["column_list"])
        n_dup = q(
            "SELECT COUNT(1) FROM (SELECT {column_list}, COUNT(1)"
            " FROM {batch} GROUP BY {column_list} HAVING COUNT(1) > 1)",
            column_list=cols,
        )[0][0]
        if n_dup == 0:
            return True, {"observed_value": 0}
        return False, {"observed_value": n_dup}

    if t == "expect_query_to_have_no_duplicate_value_combinations":
        cols = ", ".join(k["columns"])
        rows = q(
            "SELECT {cols}, COUNT(*) n FROM {batch}"
            " GROUP BY {cols} HAVING COUNT(*) > 1",
            cols=cols,
        )
        return not rows, {"observed_value": [list(r) for r in rows[:20]]}

    if t == "expect_queried_column_to_have_n_distinct_values_with_condition":
        rows = q(
            "SELECT {column_to_check} FROM {batch} WHERE {condition}"
            " GROUP BY {column_to_check}",
            column_to_check=td["column_to_check"],
            condition=td["condition"],
        )
        expected = td["num_of_distinct_values"]
        if len(rows) == expected:
            return True, {"observed_value": [list(r) for r in rows]}
        return False, {
            "observed_value": [list(r) for r in rows[:10]],
            "info": (
                f"Expected {expected} but found {len(rows)} distinct values"
            ),
        }

    if t == "expect_queried_custom_query_to_return_num_rows":
        n = q(
            "SELECT COUNT(1) FROM ({user_query}) AS main",
            user_query=td["user_query"].format(batch=asset),
        )[0][0]
        return n == k["value"], {"observed_value": n}

    if t == "expect_query_count_with_filter_to_meet_threshold":
        n = q(
            "SELECT COUNT(*) FROM {batch} WHERE {col} = {filter}",
            col=td["col"],
            filter=td["filter"],
        )[0][0]
        return n >= k["threshold"], {"observed_value": n}

    if t == "expect_queried_slowly_changing_table_to_have_no_gaps":
        holes, total = q(
            "SELECT SUM(CASE WHEN {close_date_column} !="
            " COALESCE(next_start_date, {close_date_column})"
            " THEN 1 ELSE 0 END), COUNT(1)"
            " FROM (SELECT {primary_key}, {close_date_column},"
            " LEAD({open_date_column}) OVER (PARTITION BY {primary_key}"
            " ORDER BY {open_date_column}) AS next_start_date FROM {batch})",
            primary_key=td["primary_key"],
            open_date_column=td["open_date_column"],
            close_date_column=td["close_date_column"],
        )[0]
        threshold = k.get("threshold", 0)
        rate = float(holes or 0) / total if total else 0.0
        return rate <= threshold, {
            "observed_value": rate,
            "threshold": threshold,
        }

    if t == "expect_queried_column_pair_values_to_be_both_filled_or_null":
        n = q(
            "SELECT COUNT(1) FROM {batch}"
            " WHERE ({column_a} IS NOT NULL AND {column_b} IS NULL)"
            " OR ({column_a} IS NULL AND {column_b} IS NOT NULL)",
            column_a=td["column_a"],
            column_b=td["column_b"],
        )[0][0]
        return (not n or n == 0), {
            "info": f"Row count with inconsistent values: {n}",
            "observed_value": n,
        }

    if t == "expect_queried_column_to_be_unique_with_condition":
        rows = q(
            "SELECT {column_to_check}, COUNT(1) FROM {batch}"
            " WHERE {condition} GROUP BY {column_to_check}"
            " HAVING COUNT(1) > 1",
            column_to_check=td["column_to_check"],
            condition=td["condition"],
        )
        if not rows:
            return True, {
                "info": "The column values are unique, under the condition",
                "observed_value": 0,
            }
        return False, {"observed_value": [list(r) for r in rows[:10]]}

    if t == "expect_queried_column_pair_values_to_have_diff":
        # mostly-fraction of rows where |A - B| == diff, folded to ONE scalar
        # inside DuckDB — per-row rows never reach the driver
        # (expect_queried_column_pair_values_to_have_diff.py:27-81; a null
        # diff counts against the fraction, as in the contrib's sum/len)
        diff, mostly = k["diff"], k.get("mostly", 1.0)
        frac = q(
            "SELECT AVG(CASE WHEN ABS({column_A} - {column_B}) = {diff}"
            " THEN 1.0 ELSE 0.0 END) FROM {batch}",
            column_A=k["column_A"], column_B=k["column_B"], diff=float(diff),
        )[0][0]
        if frac is None:  # empty asset
            return True, {"observed_value": []}
        return frac >= mostly, {"observed_value": frac}

    if t == "expect_queried_column_values_to_exist_in_second_table_column":
        if register_other is None:
            raise ValueError(
                "pass other_tables={name: Dataset} to validate() for "
                "second-table queried rules"
            )
        second = register_other(td["second_table_full_name"])
        n_missing = q(
            "SELECT COUNT(1) FROM ("
            " SELECT a.{first_table_column} FROM {batch} a"
            " LEFT JOIN {second_table} b"
            " ON a.{first_table_column} = b.{second_table_column}"
            " WHERE b.{second_table_column} IS NULL AND {condition}"
            " GROUP BY 1)",
            first_table_column=td["first_table_column"],
            second_table_column=td["second_table_column"],
            second_table=second,
            condition=td.get("condition", "1=1"),
        )[0][0]
        return n_missing == 0, {
            "Rows with IDs in first table missing in second table": n_missing,
            "observed_value": n_missing,
        }

    if t == "expect_column_values_to_be_present_in_other_table":
        # expect_column_values_to_be_present_in_other_table.py:72-78,274-289
        if register_other is None:
            raise ValueError(
                "pass other_tables={name: Dataset} to validate() for "
                "cross-table queried rules"
            )
        fk = td.get("foreign_key_column") or k["foreign_key_column"]
        ftab = td.get("foreign_table") or k["foreign_table"]
        fkey = td.get("foreign_table_key_column") or k["foreign_table_key_column"]
        rows = q(
            "SELECT a.{fk} FROM {batch} a LEFT JOIN {ftab} b"
            " ON a.{fk} = b.{fkey} WHERE b.{fkey} IS NULL",
            fk=fk, ftab=register_other(ftab), fkey=fkey,
        )
        n = len(rows)
        return n == 0, {
            "observed_value": f"{n} missing value{'s' if n != 1 else ''}.",
            "unexpected_index_list": [r[0] for r in rows[:200]],
        }

    raise NotImplementedError(t)
