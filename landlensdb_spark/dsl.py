"""The query DSL: ``table(...).filter(field__op=...)`` over DataFrames.

Re-expresses the reference's PostGIS query builder
(/root/reference/landlensdb/handlers/db.py:67-196) on Spark:

- ``Catalog.table(name)`` — the reference reflects a live table (db.py:77-79);
  we resolve a parquet path / registered temp view / catalog table.
- ``.filter(**kwargs)`` — identical ``field__op`` semantics (db.py:96-123):
  ops eq/gt/lt/gte/lte, bare field means eq, unknown column raises
  ``ValueError("Column '...' not found...")``, unknown op raises
  ``ValueError("Unsupported operation ...")``, predicates AND-combined.
  Predicates are Column expressions, so Catalyst pushes them into the scan
  (the Spark analog of the reference shipping WHERE to Postgres).
- ``.all()`` — executes; the reference materializes a GeoImageFrame
  (db.py:126-160); we return the lazy DataFrame (`.df`) or collected pandas.
- ``distinct_values`` — db.py:162-196 incl. the error cases.
- ``upsert`` — db.py:198-238 ``ON CONFLICT (key) DO UPDATE/NOTHING`` becomes
  a key-deduplicating merge: update = new rows win, nothing = old rows win.
  On an Iceberg catalog this is a real MERGE INTO; the parquet fallback is
  read-modify-overwrite with identical row-level semantics.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_OPS = {
    "eq": operator.eq,
    "gt": operator.gt,
    "lt": operator.lt,
    "gte": operator.ge,
    "lte": operator.le,
}


class Query:
    """Chainable filter builder over one DataFrame (lazy until ``.all()``)."""

    def __init__(self, df: DataFrame, name: str):
        self._df = df
        self._name = name

    def filter(self, **kwargs) -> "Query":
        preds = []
        for k, v in kwargs.items():
            if "__" in k:
                field, op = k.split("__", 1)
            else:
                field, op = k, "eq"
            if field not in self._df.columns:
                raise ValueError(
                    f"Column '{field}' not found in table '{self._name}'"
                )
            if op not in _OPS:
                raise ValueError(f"Unsupported operation '{op}'")
            preds.append(_OPS[op](F.col(field), F.lit(v)))
        if preds:
            self._df = self._df.filter(functools.reduce(operator.and_, preds))
        return self

    @property
    def df(self) -> DataFrame:
        return self._df

    def all(self) -> DataFrame:
        """The reference materializes here (db.py:126-160); we hand back the
        DataFrame — the driver/caller collects."""
        return self._df

    def count(self) -> int:
        return self._df.count()


class Catalog:
    """Table resolver: registered temp views, catalog tables, parquet dirs."""

    def __init__(self, spark: SparkSession, base_dir: str | None = None):
        self.spark = spark
        self.base_dir = base_dir

    def _resolve(self, name: str) -> DataFrame:
        if self.base_dir is not None:
            try:
                return self.spark.read.parquet(f"{self.base_dir}/{name}.parquet")
            except Exception:
                pass
        return self.spark.table(name)

    def table(self, name: str) -> Query:
        try:
            return Query(self._resolve(name), name)
        except Exception as e:
            raise ValueError(f"Table '{name}' not found.") from e

    def distinct_values(self, table_name: str, column_name: str) -> list:
        df = self.table(table_name).df
        if column_name not in df.columns:
            raise ValueError(
                f"Column '{column_name}' not found in table '{table_name}'"
            )
        return [r[0] for r in df.select(column_name).distinct().collect()]


def upsert(
    existing: DataFrame, incoming: DataFrame, key: str, conflict: str = "update"
) -> DataFrame:
    """Row-level upsert semantics of the reference (db.py:220-232).

    conflict='update': incoming rows replace same-key existing rows.
    conflict='nothing': same-key incoming rows are dropped.
    Equivalent SQL: MERGE INTO existing USING incoming ON key
    WHEN MATCHED [THEN UPDATE] WHEN NOT MATCHED THEN INSERT.
    """
    if conflict == "update":
        kept = existing.join(incoming.select(key), key, "left_anti")
        return kept.unionByName(incoming)
    if conflict == "nothing":
        new = incoming.join(existing.select(key), key, "left_anti")
        return existing.unionByName(new)
    raise ValueError("Invalid conflict resolution type. Choose 'update' or 'nothing'.")


def validate_frame(df: DataFrame, required: dict[str, str], unique_key: str | None = None):
    """The reference's ``_verify_structure`` + unique-url write gate
    (geoimageframe.py:89-100, :150-153) as pre-write assertion queries.

    ``required``: column -> spark type simpleString. Raises ValueError on a
    missing column, wrong type, nulls in required columns, or duplicate keys.
    """
    types = dict((f.name, f.dataType.simpleString()) for f in df.schema)
    for col, typ in required.items():
        if col not in types:
            raise ValueError(f"Missing required column: '{col}'")
        if typ and types[col] != typ:
            raise ValueError(
                f"Column '{col}' has type {types[col]}, expected {typ}"
            )
    null_checks = [
        F.sum(F.col(c).isNull().cast("long")).alias(c) for c in required
    ]
    nulls = df.agg(*null_checks).collect()[0].asDict()
    bad = {c: int(v) for c, v in nulls.items() if v}
    if bad:
        raise ValueError(f"NULLs in required columns: {bad}")
    if unique_key is not None:
        agg = df.agg(
            F.count(unique_key).alias("n"),
            F.countDistinct(unique_key).alias("d"),
        ).collect()[0]
        if agg["n"] != agg["d"]:
            raise ValueError(
                f"Duplicate values in unique column '{unique_key}': "
                f"{agg['n'] - agg['d']} duplicates"
            )
