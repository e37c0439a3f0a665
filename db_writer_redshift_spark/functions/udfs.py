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

    def one(v):
        if v is None:
            return None
        a = np.asarray(v, dtype=np.float64)
        m = np.max(np.abs(a)) if a.size else 0.0
        if m == 0.0:
            return [0] * len(a)
        s = 127.0 / m
        return [int(x) for x in np.floor(a * s + 0.5).astype(np.int64)]

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
