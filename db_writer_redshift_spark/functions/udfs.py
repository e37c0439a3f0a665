"""User-defined functions — the deliberate slow-path demonstrations.

The reference has no UDFs (SURVEY.md §2.4) and this engine keeps every
hot path in built-in JVM expressions; these exist to pin down the RIGHT
way to drop into Python when a future operator genuinely needs it:

* ``quantize_int8`` — vectorized Arrow ``pandas_udf`` (batch-columnar,
  numpy inside, ~10-100× faster than a row-at-a-time Python UDF). The
  arithmetic (floor(x·scale + 0.5), ties away from the boundary) is
  chosen to be bit-reproducible against the DuckDB oracle.
* ``split_sentences`` — a Python UDTF (table function): one document in,
  one row per sentence out with positions. Spark 4's arrow-optimized
  UDTF path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.ArrayType(T.IntegerType()))
def quantize_int8(emb: pd.Series) -> pd.Series:
    """Symmetric int8 quantization per vector: q_i = floor(x_i·s + 0.5),
    s = 127 / max|x|; zero vectors map to zeros. Arrow-batched — each call
    sees a columnar batch, numpy does the math."""

    if len(emb) == 0:
        return pd.Series([], dtype=object)
    nulls = emb.isna()
    # Fixed-dim batches stack into ONE 2-D array — a single numpy pass for
    # the whole Arrow batch (scale by row max, floor, cast); the per-vector
    # fallback below only runs for ragged batches.
    lens = {len(v) for v in emb[~nulls]}
    if len(lens) == 1 and not nulls.any():
        a = np.stack(emb.to_numpy())  # batch × dim
        m = np.abs(a).max(axis=1, keepdims=True)
        scale = np.divide(127.0, m, out=np.zeros_like(m), where=m != 0.0)
        q = np.floor(a * scale + 0.5).astype(np.int64)
        return pd.Series(list(q))

    def one(v):
        if v is None:
            return None
        a = np.asarray(v, dtype=np.float64)
        m = np.max(np.abs(a)) if a.size else 0.0
        if m == 0.0:
            return np.zeros(len(a), dtype=np.int64)
        return np.floor(a * (127.0 / m) + 0.5).astype(np.int64)

    return emb.map(one)


class SplitSentences:
    """UDTF: explode a document into (sentence_idx, sentence, n_chars)
    rows (the input's key columns stay on the lateral join's left side).
    Declarative lateral-join shape — Spark parallelizes per input
    partition; no state, no driver involvement."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        start = 0
        idx = 0
        for i, ch in enumerate(text):
            if ch in ".!?":
                sent = text[start : i + 1].strip()
                if sent:
                    yield idx, sent, len(sent)
                    idx += 1
            if ch in ".!?":
                start = i + 1
        tail = text[start:].strip()
        if tail:
            yield idx, tail, len(tail)


def split_sentences_udtf():
    from pyspark.sql.functions import udtf

    return udtf(
        SplitSentences,
        returnType="sentence_idx int, sentence string, n_chars int",
    )


def register_split_sentences(spark) -> None:
    """Register the UDTF for SQL ``... JOIN LATERAL split_sentences(col)``.
    The SQL lateral form is the one that supports LEFT OUTER semantics
    (keep rows whose text yields no sentences)."""
    spark.udtf.register("split_sentences", split_sentences_udtf())
