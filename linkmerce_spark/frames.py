"""Row-batch <-> DataFrame bridge and the table registry.

The reference's universal interchange format is a ``list[dict]`` row
batch bound into SQL as an UNNEST values-scan (reference:
src/linkmerce/common/transform.py:817-819 ``expr_rows``;
src/linkmerce/common/load.py:417-430 ``execute_with_json``). In Spark
that is simply ``spark.createDataFrame(rows, schema)`` — this module
keeps that bridge plus the logical-alias table map the reference renders
into its SQL (``tables: {key: name}``, transform.py:677).
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = [
    "from_rows",
    "rows_to_df",
    "TableRegistry",
    "load_star",
    "select_paths",
    "widen_scan",
    "STAR_TABLES",
]


def widen_scan(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Round-robin repartition a narrow scan up to the session's
    default parallelism — a no-op whenever the input already has that
    many partitions (any real-scale table).

    Use inside operators whose per-row compute EXPANDS far beyond the
    input bytes (gram explodes, signature hashing, codec decode): at
    100 TB the scan splits into thousands of tasks by itself, but a
    small file is ONE split, and a 50x explode behind it then runs
    single-threaded while every other core idles. Catalyst still
    pushes filters and prunes columns through the Repartition node
    (verified: PushedFilters reaches the FileScan below it).

    Order-SENSITIVE consumers (insertion-order ``row_number``) must
    not widen — round-robin destroys file order. The partition probe
    (``df.rdd``) costs ~0.5 s of driver work, so the result is
    memoized on the DataFrame object; ``load_star``'s per-session
    table memo makes that once per session per table. The memo only
    serves the default-parallelism case: an explicit
    ``min_parallelism`` always recomputes (a cached frame widened to a
    different target must not be returned for it) and is not cached.
    """
    if min_parallelism is None:
        cached = getattr(df, "_lm_widened", None)
        if cached is not None:
            return cached
    spark = df.sparkSession
    target = min_parallelism or spark.sparkContext.defaultParallelism
    out = df if df.rdd.getNumPartitions() >= target else df.repartition(target)
    if min_parallelism is None:
        try:
            df._lm_widened = out
            out._lm_widened = out  # re-widening the widened frame is free
        except Exception:  # pragma: no cover - frozen/mocked frames
            pass
    return out

# Driver-generated TPC-H-ish star schema + pipeline tables (TESTDATA.md).
STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def from_rows(
    spark: SparkSession,
    rows: Iterable[Mapping[str, Any]],
    schema: StructType | str | None = None,
) -> DataFrame:
    """Bind a row batch (``list[dict]``) as a relation.

    This is the engine's values-scan: the Spark-native equivalent of the
    reference's ``(SELECT rows.* FROM (SELECT UNNEST($rows)))`` pattern.
    Always pass an explicit schema in production paths — inference scans
    the batch twice and widens types unpredictably.
    """
    rows = list(rows)
    if schema is not None:
        return spark.createDataFrame(rows, schema=schema)
    return spark.createDataFrame(rows)


# Alias kept for call sites that read better with the verb-first name.
rows_to_df = from_rows


class TableRegistry:
    """Logical-name -> DataFrame registry with temp-view projection.

    Mirrors the reference's ``tables`` alias map + Jinja ``{{ table }}``
    rendering (transform.py:647-650): SQL models refer to logical keys;
    the registry decides the physical name. Here the physical name is a
    temp view, so ``spark.sql`` models and DataFrame pipelines compose.
    """

    def __init__(self, spark: SparkSession, aliases: Mapping[str, str] | None = None):
        self.spark = spark
        self.aliases: dict[str, str] = dict(aliases or {})
        self._frames: dict[str, DataFrame] = {}

    def resolve(self, key: str) -> str:
        return self.aliases.get(key, key)

    def register(self, key: str, df: DataFrame, *, as_view: bool = True) -> str:
        """Register a DataFrame under a logical key; returns the physical name."""
        name = self.resolve(key)
        self._frames[key] = df
        if as_view:
            df.createOrReplaceTempView(name)
        return name

    def __getitem__(self, key: str) -> DataFrame:
        if key in self._frames:
            return self._frames[key]
        return self.spark.table(self.resolve(key))

    def __contains__(self, key: str) -> bool:
        return key in self._frames

    def keys(self):
        return self._frames.keys()


# Per-session memo of base-table DataFrames: a fresh
# ``spark.read.parquet`` costs ~100ms of driver work (footer read +
# schema resolution) EVERY call, and the catalog touches the same ten
# tables thousands of times per bench/gate run. A DataFrame is an
# immutable logical plan — reusing it is exactly what a registered
# warehouse table does; scans, pushdown, and pruning are unchanged.
# WeakKeyDictionary: entries die with their session (tests stop/start
# sessions freely and must never see a stale one).
import weakref

_STAR_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def load_star(
    spark: SparkSession,
    sf_dir: str,
    tables: Iterable[str] = STAR_TABLES,
    register_views: bool = False,
) -> dict[str, DataFrame]:
    """Load the driver's parquet star schema from ``sf_dir``.

    Plain ``spark.read.parquet`` — scans stay columnar/vectorized and
    Catalyst pushes filters and prunes columns into the parquet reader.
    Reads are memoized per (session, sf_dir, table); the test parquet
    is immutable, and a cached DataFrame is just a reusable plan.
    """
    try:
        cache = _STAR_CACHE.setdefault(spark, {})
    except TypeError:  # session not weak-referenceable (mocks)
        cache = {}
    out: dict[str, DataFrame] = {}
    base = sf_dir.rstrip("/")
    for name in tables:
        key = (base, name)
        df = cache.get(key)
        if df is None:
            try:
                # Runtime-settable SQL conf; required to read pandas-
                # written TIMESTAMP(NANOS) parquet (events.ts) on any
                # caller's session.
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            except Exception:
                pass
            df = spark.read.parquet(f"{base}/{name}.parquet")
            if name == "events" and dict(df.dtypes).get("ts") == "bigint":
                # TIMESTAMP(NANOS) parquet read as long via nanosAsLong:
                # truncate to micros (identical to DuckDB's nanos
                # handling).
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            cache[key] = df
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out


# Per-session memo of MATERIALIZED derived frames — the Spark
# equivalent of a dbt ``ref()``: in the reference's dag every mart is
# materialized once per run and downstream models read the built
# table (e.g. sabangnet__option_master selects FROM the materialized
# sabangnet__product_master, dbt_postgres/models/marts/product/), they
# never re-run the upstream SQL. ``shared_frame`` memoizes the built
# DataFrame per (session, key) behind an eager localCheckpoint, so a
# consumer pays a block read instead of the upstream chain. Policy:
# only CONSUMERS of a mart go through this — the catalog query that
# verifies mart X still builds X fresh, so its bench time measures
# real compute. On a cluster this is a cache of executor-local blocks
# (or a warehouse table), identical semantics.
_SHARED_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def shared_frame(spark: SparkSession, key: tuple, build) -> DataFrame:
    """Memoize + materialize ``build()`` per (session, ``key``).

    ``key`` must carry every input the build depends on (at minimum
    the mart name and sf_dir). The frame is localCheckpoint-ed eagerly:
    lineage is cut once, and concurrent broadcast jobs in consumers
    cannot race a lazy materialization.
    """
    try:
        cache = _SHARED_CACHE.setdefault(spark, {})
    except TypeError:  # session not weak-referenceable (mocks)
        return build()
    df = cache.get(key)
    if df is None:
        df = build()
        if cache.get(key) is not None:
            # build() self-published (a verifier query ran and called
            # publish_frame) — use its materialization.
            df = cache[key]
        else:
            df = df.localCheckpoint(eager=True)
            cache[key] = df
    return df


def publish_frame(spark: SparkSession, key: tuple, df: DataFrame) -> DataFrame:
    """Materialize ``df`` and publish it as the current build of mart
    ``key`` — the dbt "run model X" step. The publishing query itself
    always re-runs its own SQL (its bench time measures real compute);
    consumers via ``shared_frame`` read this build instead of
    re-running the upstream chain."""
    df = df.localCheckpoint(eager=True)
    try:
        _SHARED_CACHE.setdefault(spark, {})[key] = df
    except TypeError:  # session not weak-referenceable (mocks)
        pass
    return df


def select_paths(df: DataFrame, schema: Mapping[str, str], extends: Mapping[str, Any] | None = None) -> DataFrame:
    """Nested-path projection: the reference's field-selection mini-language.

    ``schema`` maps output name -> dotted path into nested structs
    (reference: select_values, src/linkmerce/utils/nested.py:84-135 —
    the whole recursive JSON-path layer collapses to ``select`` over
    StructType columns, SURVEY §1.3). ``extends`` adds derived literal/
    Column fields (the reference's ``extends`` + ``$param`` injection,
    transform.py:157-169).
    """
    cols = [F.col(path).alias(out) for out, path in schema.items()]
    for out, val in (extends or {}).items():
        from pyspark.sql import Column as _Col

        cols.append((val if isinstance(val, _Col) else F.lit(val)).alias(out))
    return df.select(*cols)


_VALUES_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def values_df(spark: SparkSession, rows: Iterable[tuple], schema: str) -> DataFrame:
    """Small literal batch as a JVM-side LocalRelation (SQL ``VALUES``).

    ``createDataFrame`` routes even a 5-row dim through a pickled RDD
    with ``defaultParallelism`` splits — every evaluation (each
    broadcast, each reuse in a multi-join plan) schedules ~32 tasks and
    Python-worker round-trips (~1 s of pure overhead). A ``VALUES``
    LocalRelation is parsed once on the JVM, costs no Python workers,
    folds into LocalTableScan, and broadcasts instantly. Use this for
    every literal dimension/config frame on a hot path; keep
    ``from_rows`` for real row batches.

    ``schema`` is a DDL string (``"name string, price int"``); every
    column is CAST to its declared type, so NULLs and mixed literals
    type correctly.
    """
    from pyspark.sql.types import StructType

    rows = [tuple(r) for r in rows]
    # Literal dims are constant plans: the same VALUES frame is rebuilt
    # for every query that joins it (the catalog pays StructType.fromDDL
    # + a spark.sql parse per call, ~15-40 ms each, hundreds of times a
    # run). Memoize the immutable DataFrame per (session, schema, rows)
    # — same rationale and lifetime rules as _STAR_CACHE above.
    # The key carries each value's Python type: 1 == 1.0 == True are
    # hash-equal but render as distinct SQL literals ('1' / '1.0' /
    # 'TRUE'), so a value-only key would return the wrong cached frame.
    try:
        cache_key = (
            schema,
            tuple(tuple((type(v).__name__, v) for v in r) for r in rows),
        )
        hash(cache_key)
        cache = _VALUES_CACHE.setdefault(spark, {})
    except TypeError:  # unhashable literal or mock session
        cache_key = cache = None
    if cache is not None and cache_key in cache:
        return cache[cache_key]
    st = StructType.fromDDL(schema)
    if not rows:
        # Empty LocalRelation, not a 0-row parallelized RDD (the latter
        # still schedules defaultParallelism tasks on every evaluation).
        nulls = ", ".join(
            f"CAST(NULL AS {f.dataType.simpleString()}) AS `{f.name}`"
            for f in st.fields
        )
        df = spark.sql(f"SELECT {nulls} WHERE FALSE")
        if cache is not None:
            cache[cache_key] = df
        return df

    def lit(v: Any) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, float):
            # repr of non-finite floats is a bare identifier ('nan',
            # 'inf') that the SQL parser reads as a column reference —
            # render the typed literal forms instead.
            if v != v:
                return "CAST('NaN' AS DOUBLE)"
            if v == float("inf"):
                return "CAST('Infinity' AS DOUBLE)"
            if v == float("-inf"):
                return "CAST('-Infinity' AS DOUBLE)"
            return repr(v)
        if isinstance(v, int):
            return repr(v)
        s = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{s}'"

    names = ", ".join(f"`{f.name}`" for f in st.fields)
    casts = ", ".join(
        f"CAST(`{f.name}` AS {f.dataType.simpleString()}) AS `{f.name}`"
        for f in st.fields
    )
    tuples = ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    df = spark.sql(f"SELECT {casts} FROM VALUES {tuples} AS t({names})")
    if cache is not None:
        cache[cache_key] = df
    return df
