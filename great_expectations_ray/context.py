"""Fluent DataContext — the reference's onboarding entry point
(``great_expectations.get_context()`` → ``context.data_sources.add_*`` →
``datasource.add_*_asset`` → ``asset.get_batch()`` → validate), recast thin
over Ray Data.  The reference's context carries a large pydantic config
tree (``data_context/data_context/abstract_data_context.py``); here a
context is just (optional) filesystem stores + factories, and every object
it hands out wraps a lazy ``ray.data.Dataset``.

    import great_expectations_ray as gxr
    ctx = gxr.get_context(root_dir="gx_store")        # or ephemeral: no args
    src = ctx.data_sources.add_parquet("warehouse", "/data")
    asset = src.add_asset("orders", "orders/*.parquet")
    batch = asset.get_batch()                          # api.Batch
    suite = ctx.suites.add(
        ExpectationSuite("orders").add(
            "expect_column_values_to_not_be_null", column="id"))
    result = ctx.validate(batch, suite)                # persists when rooted
"""

from __future__ import annotations

import os
import time
from typing import Any, Optional

from great_expectations_ray.api import Batch
from great_expectations_ray.core.suite import ExpectationSuite


class Asset:
    """One logical table inside a datasource (fluent *Asset analog)."""

    def __init__(self, name: str, reader, reader_args: tuple, reader_kwargs: dict):
        self.name = name
        self._reader = reader
        self._args = reader_args
        self._kwargs = dict(reader_kwargs)

    def get_batch(self, **overrides) -> Batch:
        """Build the lazy Dataset and wrap it (build_batch_request +
        get_batch collapsed: Ray Datasets are already lazy plans)."""
        kwargs = {**self._kwargs, **overrides}
        return Batch(self._reader(*self._args, **kwargs))


class DataSource:
    """A family of assets sharing a base location / connection."""

    def __init__(self, name: str, kind: str, base: Any):
        self.name = name
        self.kind = kind
        self.base = base
        self.assets: dict[str, Asset] = {}

    def add_asset(self, name: str, path: Optional[str] = None, **kwargs) -> Asset:
        from great_expectations_ray.sources import readers

        if self.kind in ("parquet", "csv", "json"):
            # read_batch dispatches on extension (reader= overrides), so all
            # file-based kinds share one reader
            full = os.path.join(self.base, path) if path else self.base
            asset = Asset(name, readers.read_batch, (full,), kwargs)
        elif self.kind == "sql":
            # base = DBAPI connection factory; path = the query
            asset = Asset(
                name, readers.read_sql_source, (path, self.base), kwargs
            )
        elif self.kind == "dialect_sql":
            # base = a sources.sql_dialects.SqlDatasource; asset is a table
            # (table=) or a query (query= / path) with pushdown kwargs
            table = kwargs.pop("table", None)
            if table is not None:
                asset = Asset(name, self.base.read_table, (table,), kwargs)
            else:
                query = kwargs.pop("query", path)
                if not query:
                    raise ValueError(
                        "dialect SQL asset needs table= or query=")
                asset = Asset(name, self.base.read_query, (query,), kwargs)
        elif self.kind == "memory":
            asset = Asset(name, readers.from_memory, (kwargs.pop("data"),), {})
        else:  # pragma: no cover - guarded by the factory methods
            raise ValueError(f"unknown datasource kind {self.kind!r}")
        self.assets[name] = asset
        return asset

    def get_asset(self, name: str) -> Asset:
        return self.assets[name]


class _DataSourceFactories:
    """``context.data_sources`` — fluent add_* factories
    (reference: ``datasource/fluent/sources.py`` codegen; here plain
    methods, one per supported backend)."""

    def __init__(self):
        self._sources: dict[str, DataSource] = {}

    def _add(self, name: str, kind: str, base: Any) -> DataSource:
        src = DataSource(name, kind, base)
        self._sources[name] = src
        return src

    def add_parquet(self, name: str, base_dir: str) -> DataSource:
        return self._add(name, "parquet", base_dir)

    def add_csv(self, name: str, base_dir: str) -> DataSource:
        return self._add(name, "csv", base_dir)

    def add_json(self, name: str, base_dir: str) -> DataSource:
        return self._add(name, "json", base_dir)

    def add_sql(self, name: str, connection_factory) -> DataSource:
        """``connection_factory`` must import its driver inside the closure
        (see sources.readers.read_sql_source)."""
        return self._add(name, "sql", connection_factory)

    # -- dialect datasources (reference datasource/fluent/sources.py names;
    # assets take table=/query= plus pushdown kwargs) ----------------------- #
    def _add_dialect(self, name: str, cls, kwargs) -> DataSource:
        return self._add(name, "dialect_sql", cls(**kwargs))

    def add_postgres(self, name: str, **connect_kwargs) -> DataSource:
        from great_expectations_ray.sources.sql_dialects import PostgresDatasource

        return self._add_dialect(name, PostgresDatasource, connect_kwargs)

    def add_snowflake(self, name: str, **connect_kwargs) -> DataSource:
        from great_expectations_ray.sources.sql_dialects import SnowflakeDatasource

        return self._add_dialect(name, SnowflakeDatasource, connect_kwargs)

    def add_databricks_sql(self, name: str, **connect_kwargs) -> DataSource:
        from great_expectations_ray.sources.sql_dialects import (
            DatabricksSQLDatasource,
        )

        return self._add_dialect(name, DatabricksSQLDatasource, connect_kwargs)

    def add_fabric(self, name: str, **connect_kwargs) -> DataSource:
        from great_expectations_ray.sources.sql_dialects import FabricDatasource

        return self._add_dialect(name, FabricDatasource, connect_kwargs)

    def add_sqlite(self, name: str, database: str, **kw) -> DataSource:
        from great_expectations_ray.sources.sql_dialects import SqliteDatasource

        return self._add_dialect(name, SqliteDatasource,
                                 {"database": database, **kw})

    def add_duckdb(self, name: str, database: str = ":memory:",
                   **kw) -> DataSource:
        from great_expectations_ray.sources.sql_dialects import DuckDBDatasource

        return self._add_dialect(name, DuckDBDatasource,
                                 {"database": database, **kw})

    def add_memory(self, name: str) -> DataSource:
        return self._add(name, "memory", None)

    def get(self, name: str) -> DataSource:
        return self._sources[name]

    def all(self) -> list[str]:
        return sorted(self._sources)


class _SuiteFactories:
    """``context.suites`` — add/get/delete, persisted through the
    ExpectationsStore when the context has a root."""

    def __init__(self, root: Optional[str]):
        self._root = root
        self._mem: dict[str, ExpectationSuite] = {}
        self._store = None
        if root:
            from great_expectations_ray.state.stores import ExpectationsStore

            self._store = ExpectationsStore(root)

    def add(self, suite: ExpectationSuite) -> ExpectationSuite:
        self._mem[suite.name] = suite
        if self._store:
            self._store.save(suite)
        return suite

    def get(self, name: str) -> ExpectationSuite:
        if name in self._mem:
            return self._mem[name]
        if self._store:
            return self._store.load(name)
        raise KeyError(name)

    def delete(self, name: str) -> None:
        self._mem.pop(name, None)
        if self._store:
            self._store.delete(name)

    def all(self) -> list[str]:
        names = set(self._mem)
        if self._store:
            names.update(self._store.list_suites())
        return sorted(names)


class DataContext:
    """Ephemeral (no root) or filesystem-rooted context."""

    def __init__(self, root_dir: Optional[str] = None):
        self.root_dir = root_dir
        if root_dir:
            os.makedirs(root_dir, exist_ok=True)
        self.data_sources = _DataSourceFactories()
        self.suites = _SuiteFactories(root_dir)

    def validate(
        self,
        batch: Batch,
        suite: ExpectationSuite,
        *,
        run_name: Optional[str] = None,
        **validate_kwargs: Any,
    ):
        """Validate and, when rooted, persist the result to the
        ValidationResultsStore (the reference's ValidationDefinition.run
        essentials: validate + store + return)."""
        result = batch.validate(suite, **validate_kwargs)
        if self.root_dir:
            from great_expectations_ray.state.stores import ValidationResultsStore

            ValidationResultsStore(self.root_dir).save(
                result,
                run_name=run_name or "interactive",
                run_time=time.time(),
                batch_id="batch",
            )
        return result

    def build_data_docs(self) -> Optional[str]:
        """Render the static site from the stores (rooted contexts only)."""
        if not self.root_dir:
            return None
        from great_expectations_ray.pipelines.data_docs import build_site

        return build_site(self.root_dir)


def get_context(root_dir: Optional[str] = None) -> DataContext:
    """The reference's module-level entry point
    (``great_expectations.get_context``): no args → ephemeral context,
    ``root_dir`` → filesystem-rooted stores + data docs."""
    return DataContext(root_dir)
