"""SQL-dialect datasources (sources/sql_dialects.py) — live integration on
sqlite (stdlib) and duckdb; SQL-generation parity for postgres / snowflake /
databricks / mssql / fabric.  Reference surface:
datasource/fluent/{postgres,snowflake,databricks_sql,fabric,sqlite}_datasource.py
+ sqlalchemy_execution_engine.py dialect handling."""

from __future__ import annotations

import hashlib
import sqlite3

import pytest

from great_expectations_ray.sources.sql_dialects import (
    DIALECTS,
    DatabricksSQLDatasource,
    DuckDBDatasource,
    FabricDatasource,
    PostgresDatasource,
    SnowflakeDatasource,
    SqlDatasource,
    SqliteDatasource,
    compile_sql_pushdown,
    get_dialect,
    partitioner_to_sql,
    sampler_to_sql,
)


# ----------------------------------------------------------------------- #
# live: sqlite + duckdb
# ----------------------------------------------------------------------- #

@pytest.fixture()
def sqlite_db(tmp_path):
    p = str(tmp_path / "t.db")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE ev (id INTEGER, grp TEXT, val REAL, ts TEXT)")
    con.executemany(
        "INSERT INTO ev VALUES (?, ?, ?, ?)",
        [(i, f"g{i % 3}", float(i) / 2, f"2024-0{1 + i % 9}-15")
         for i in range(60)])
    con.commit()
    con.close()
    return p


def test_sqlite_read_table_with_pushdown(ray_session, sqlite_db):
    src = SqliteDatasource(sqlite_db)
    out = src.read_table(
        "ev", columns=["id", "grp"],
        row_condition='col("grp") == "g1" and col("id") > 10',
        override_num_blocks=1,
    ).to_pandas().sort_values("id").reset_index(drop=True)
    assert list(out.columns) == ["id", "grp"]
    assert (out["grp"] == "g1").all() and (out["id"] > 10).all()
    assert len(out) == len([i for i in range(60) if i % 3 == 1 and i > 10])


def test_sqlite_partitioner_and_sampler(ray_session, sqlite_db):
    src = SqliteDatasource(sqlite_db)
    # date_parts via strftime
    out = src.read_table(
        "ev", partitioner={"type": "date_parts", "column": "ts",
                           "parts": {"month": 3}},
        override_num_blocks=1).to_pandas()
    assert len(out) > 0
    assert all(t.split("-")[1] == "03" for t in out["ts"])
    # mod sampler
    out2 = src.read_table(
        "ev", sampler={"type": "mod", "column": "id", "mod": 10, "value": 7},
        override_num_blocks=1).to_pandas()
    assert sorted(out2["id"]) == [7, 17, 27, 37, 47, 57]
    # limit sampler
    out3 = src.read_table("ev", sampler={"type": "limit", "n": 5},
                          override_num_blocks=1).to_pandas()
    assert len(out3) == 5


def test_sqlite_hash_sampler_raises_with_guidance(sqlite_db):
    src = SqliteDatasource(sqlite_db)
    with pytest.raises(NotImplementedError, match="md5"):
        src.compile("SELECT * FROM ev",
                    sampler={"type": "hash", "column": "id"})


def test_duckdb_hashed_partitioner_matches_python(ray_session):
    """The hashed partitioner's SQL (md5 hex tail mod N) must agree with the
    in-Ray implementation's contract: md5(str(value)) last-8-hex mod N."""
    import duckdb

    d = get_dialect("duckdb")
    pred = partitioner_to_sql(d, {"type": "hashed", "column": "k",
                                  "n_buckets": 4, "value": 2})
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT range AS k FROM range(200)")
    got = sorted(r[0] for r in
                 con.execute(f"SELECT k FROM t WHERE {pred}").fetchall())
    want = sorted(
        i for i in range(200)
        if int(hashlib.md5(str(i).encode()).hexdigest()[-8:], 16) % 4 == 2)
    assert got == want and got


def test_duckdb_datasource_read_query(ray_session, tmp_path):
    db = str(tmp_path / "d.duckdb")
    import duckdb

    con = duckdb.connect(db)
    con.execute("CREATE TABLE nums AS SELECT range AS n FROM range(100)")
    con.close()
    src = DuckDBDatasource(db, read_only=True)
    out = src.read_query(
        "SELECT n, n * 2 AS dbl FROM nums",
        row_condition='col("n") >= 95', override_num_blocks=1,
    ).to_pandas().sort_values("n")
    assert out["n"].tolist() == [95, 96, 97, 98, 99]
    assert (out["dbl"] == out["n"] * 2).all()


# ----------------------------------------------------------------------- #
# generation-level: the four remote dialects
# ----------------------------------------------------------------------- #

def test_identifier_quoting_per_dialect():
    assert get_dialect("postgres").quote("a col") == '"a col"'
    assert get_dialect("databricks").quote("a col") == "`a col`"
    assert get_dialect("mssql").quote("a col") == "[a col]"
    assert get_dialect("fabric").quote("a]b") == "[a]]b]"


def test_limit_style_top_vs_limit():
    sql = compile_sql_pushdown(get_dialect("mssql"), "SELECT * FROM t",
                               sampler={"type": "limit", "n": 7})
    assert sql.startswith("SELECT TOP 7 *") and "LIMIT" not in sql
    sql2 = compile_sql_pushdown(get_dialect("snowflake"), "SELECT * FROM t",
                                sampler={"type": "limit", "n": 7})
    assert sql2.endswith("LIMIT 7")


def test_date_part_styles():
    spec = {"type": "date_parts", "column": "ts", "parts": {"year": 2024}}
    assert partitioner_to_sql(get_dialect("postgres"), spec) == \
        'EXTRACT(year FROM "ts") = 2024'
    assert partitioner_to_sql(get_dialect("mssql"), spec) == \
        "DATEPART(year, [ts]) = 2024"
    assert partitioner_to_sql(get_dialect("sqlite"), spec) == \
        "CAST(strftime('%Y', \"ts\") AS INTEGER) = 2024"


def test_hashed_partitioner_per_dialect():
    spec = {"type": "hashed", "column": "k", "n_buckets": 8, "value": 3}
    pg = partitioner_to_sql(get_dialect("postgres"), spec)
    assert "md5(CAST(\"k\" AS VARCHAR))" in pg and "::bit(32)::bigint" in pg
    db = partitioner_to_sql(get_dialect("databricks"), spec)
    assert "CONV(" in db and "md5(CAST(`k` AS STRING))" in db
    ms = partitioner_to_sql(get_dialect("mssql"), spec)
    assert "HASHBYTES('MD5'" in ms and "VARBINARY(4)" in ms
    sf = partitioner_to_sql(get_dialect("snowflake"), spec)
    assert "TO_NUMBER(" in sf and "'XXXXXXXX'" in sf


def test_row_condition_requoted_per_dialect():
    sql = compile_sql_pushdown(
        get_dialect("databricks"), "SELECT * FROM t",
        row_condition='col("name") == "it\'s" and col("n") > 3')
    assert "`name` = 'it''s'" in sql and "`n` > 3" in sql
    sql2 = compile_sql_pushdown(
        get_dialect("mssql"), "SELECT * FROM t",
        row_condition='col("name") != "x"')
    assert "[name] <> 'x'" in sql2


def test_column_projection_quoted():
    sql = compile_sql_pushdown(get_dialect("mssql"), "SELECT * FROM t",
                               columns=["a", "b c"])
    assert sql.startswith("SELECT [a], [b c] FROM")


def test_factories_are_import_gated():
    src = PostgresDatasource(host="h", dbname="d")
    with pytest.raises(ImportError, match="psycopg2"):
        src.connection_factory()
    for cls, pat in ((SnowflakeDatasource, "snowflake"),
                     (DatabricksSQLDatasource, "databricks"),
                     (FabricDatasource, "pyodbc")):
        with pytest.raises(ImportError, match=pat):
            cls().connection_factory()


def test_factories_pickle_to_workers():
    """The closure must carry only strings/dicts (cloudpickle to workers)."""
    from ray import cloudpickle

    src = SnowflakeDatasource(account="a", user="u")
    f = cloudpickle.loads(cloudpickle.dumps(src.connection_factory))
    with pytest.raises(ImportError):
        f()


def test_unknown_dialect_and_registry():
    with pytest.raises(ValueError, match="unknown SQL dialect"):
        SqlDatasource(dialect="oracle")
    assert set(DIALECTS) >= {"duckdb", "sqlite", "postgres", "snowflake",
                             "databricks", "mssql", "fabric"}


def test_fluent_context_sqlite_asset_end_to_end(ray_session, sqlite_db):
    """get_context -> add_sqlite -> add_asset(table=) -> get_batch ->
    validate: the reference's fluent onboarding loop over a SQL backend."""
    from great_expectations_ray import ExpectationSuite, get_context, validate

    ctx = get_context()
    src = ctx.data_sources.add_sqlite("db", sqlite_db)
    asset = src.add_asset("events", table="ev",
                          row_condition='col("id") >= 30')
    batch = asset.get_batch(override_num_blocks=1)
    suite = (ExpectationSuite("sq")
             .add("expect_column_values_to_be_between", column="id",
                  min_value=30, max_value=59)
             .add("expect_table_row_count_to_equal", value=30))
    res = validate(batch.ds, suite)
    assert res.success, res.to_json_dict()
