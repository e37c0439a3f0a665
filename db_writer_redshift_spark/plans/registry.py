"""Query registry: name → (spark, sf_dir) -> DataFrame, plus DuckDB oracles.

Design rules (all queries obey these — they are what makes the driver's
order-insensitive value-hash comparison against DuckDB deterministic):

* Every computed column is aliased identically in the DataFrame code and the
  oracle SQL.
* Monetary / quantity aggregations cast inputs to DECIMAL before SUM so the
  aggregation is exact and order-independent, then cast the result to DOUBLE.
  Raw double SUMs are order-dependent across partitions and would flap.
* Averages and ratios are computed as exact-decimal sums divided in double
  space (bit-identical given identical operands), then rounded.
* No functions whose float behavior differs across libm implementations
  (exp/log/trig) feed hashed output unless rounded aggressively.
* Even rounded, a transcendental PER-GROUP-MEMBER term summed per group
  eventually lands on a round boundary at scale (one -p*ln(p) term in
  ~27k flipped text-entropy's 6th decimal). When an integer-exact
  formulation of the same signal exists (Gini-Simpson for entropy,
  integer moments for variance), prefer it — exactness by construction
  beats probabilistic rounding.

Persist policy (ADVICE r6 #4): an operator whose returned DataFrame
REFERENCES a persisted intermediate (shared gram/signature relations that
two legs of the returned plan both consume) cannot unpersist it — the
driver's action runs after the function returns, so an eager unpersist
would drop the cache before it is ever hit. Those persists use the
default MEMORY_AND_DISK level and rely on LRU block eviction within one
query's lifetime; operators that DO materialize internally (iterative
loops in clustering/dedup CC, kmeans) pair persist with unpersist as
usual. Long multi-query sessions bound accumulation at the harness
layer: tools/oracle_check.py and bench.py call
``spark.catalog.clearCache()`` between queries, and the external driver
runs each round in a fresh session.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str


QUERIES: dict[str, QuerySpec] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame query to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        spec = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        QUERIES[name] = spec
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# fingerprint(path) → parquet schema. Every load_table without an
# explicit schema runs an eager driver-side footer-read JOB just to
# infer it; the bench profile showed 1-6 such single-task jobs per query
# (one per table) before any real work (guide §5: the driver should do
# almost no data work). Schemas are a few KB of metadata — caching them
# is NOT result caching: every action still scans the parquet data in
# full. Keyed on (mtime, size) of every leaf data file (ADVICE r8 #1:
# a same-named part-file rewrite inside a directory dataset does not
# bump the directory mtime, and mtime granularity can be 1s — size
# catches the common rewrite) so rewritten fixtures never see a stale
# schema.
_SCHEMA_CACHE: dict = {}


def _dataset_fingerprint(path: str):
    """Hashable identity of a parquet file or directory dataset: the
    (relpath, mtime, size) of each leaf data file. Driver-side stat calls
    only — fixture datasets have few files; a directory large enough for
    this walk to matter should carry an explicit schema anyway."""
    import os

    if os.path.isfile(path):
        st = os.stat(path)
        return (path, st.st_mtime, st.st_size)
    leaves = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")):
                continue  # _SUCCESS, .crc — metadata, not data
            fp = os.path.join(root, f)
            st = os.stat(fp)
            leaves.append((os.path.relpath(fp, path), st.st_mtime, st.st_size))
    return (path, tuple(sorted(leaves)))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one of the driver-provided parquet tables.

    ``spark.read.schema(cached).parquet`` — the vectorized reader +
    Catalyst give column pruning and predicate pushdown for free; at
    cluster scale the same call fans out over file splits. The explicit
    schema (cached per leaf-file fingerprint after one inference) skips
    the per-call footer-inference job — the documented production
    practice for repeated reads of a known table.

    Special case: ``events.parquet`` stores TIMESTAMP(NANOS), which Spark's
    reader only accepts as long (spark.sql.legacy.parquet.nanosAsLong).
    Convert to micros with floor division — the same truncation DuckDB
    applies when it coerces nanos to its micro-precision TIMESTAMP, so both
    engines see identical values.
    """
    path = f"{sf_dir}/{name}.parquet"
    try:
        key = _dataset_fingerprint(path)
    except OSError:
        key = None
    schema = _SCHEMA_CACHE.get(key) if key else None
    if schema is None:
        df = spark.read.parquet(path)
        if key:
            _SCHEMA_CACHE[key] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz")
        )
    return df
