"""Property-based tests (hypothesis): invariants the example-based suite
can't sweep.

* CSV dialect round-trip: ANY text cell (quotes, newlines, tabs,
  backslashes, unicode) written in the quote-doubling dialect is read
  back byte-identically by the ingest reader.
* Merge algebra: idempotence, PK uniqueness, and the exact row-count
  identity |merged| = |target ∖ staged-keys| + |dedup(staging)|.

Example counts are capped — every example runs Spark jobs.
"""

from __future__ import annotations

import csv
import io

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from db_writer_redshift_spark.config.schema import ColumnItem, TableConfig
from db_writer_redshift_spark.operators.merge import upsert_dataframes
from db_writer_redshift_spark.sources import apply_schema, read_table_csv

# Text cells: printable ASCII + the dialect's torture characters + unicode.
# Spark's CSV reader returns None for empty strings (emptyValue default) —
# normalize by never generating the empty string (covered example-based).
cell = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=32, max_codepoint=126),
        st.sampled_from('"\n\t\\\'’é漢'),
    ),
    min_size=1,
    max_size=40,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

TWO_COL = TableConfig(
    table_id="prop",
    db_name="prop",
    items=(ColumnItem("col1", "col1", "text"), ColumnItem("col2", "col2", "text")),
)


@given(rows=st.lists(st.tuples(cell, cell), min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_csv_dialect_round_trip(spark, tmp_path_factory, rows):
    # writer side: quote-doubling dialect, quote everything (gold encoder)
    buf = io.StringIO()
    w = csv.writer(buf, quoting=csv.QUOTE_ALL, doublequote=True, lineterminator="\n")
    w.writerow(["col1", "col2"])
    # the reader decodes the literal string NULL as SQL NULL (L-3) — that's
    # dialect semantics, not corruption; exclude it from the identity check
    rows = [r for r in rows if "NULL" not in r] or [("x", "y")]
    for r in rows:
        w.writerow(r)
    p = tmp_path_factory.mktemp("prop") / "t.csv"
    p.write_text(buf.getvalue(), encoding="utf-8")

    df = apply_schema(read_table_csv(spark, str(p), TWO_COL), TWO_COL)
    got = sorted((r.col1, r.col2) for r in df.collect())
    assert got == sorted(rows)


keyed_rows = st.dictionaries(
    st.integers(min_value=0, max_value=30), cell, min_size=0, max_size=10
)


@given(target=keyed_rows, staging=keyed_rows)
@settings(**_SETTINGS)
def test_merge_algebra(spark, target, staging):
    schema = "id int, v string"
    t = spark.createDataFrame(list(target.items()) or [(None, None)], schema).filter(
        "id is not null"
    )
    s = spark.createDataFrame(list(staging.items()) or [(None, None)], schema).filter(
        "id is not null"
    )
    merged = upsert_dataframes(t, s, ["id"])
    got = {r.id: r.v for r in merged.collect()}

    # dict-merge semantics: staging wins on key collision
    assert got == {**target, **staging}

    # row-count identity and PK uniqueness
    assert merged.count() == len({**target, **staging})

    # idempotence: merging the same staging again changes nothing
    again = upsert_dataframes(merged, s, ["id"])
    assert {r.id: r.v for r in again.collect()} == got
