"""Column-expression helpers (pure pyspark.sql.functions compositions —
JVM-side, codegen-friendly; no Python row UDFs)."""

from db_writer_redshift_spark.functions.vector import (  # noqa: F401
    dot_double,
    norm_double,
    cosine_sim,
)
from db_writer_redshift_spark.functions.text import (  # noqa: F401
    words,
    shingles,
    token_count_expr,
    punct_ratio_expr,
    stopword_ratio_expr,
)
