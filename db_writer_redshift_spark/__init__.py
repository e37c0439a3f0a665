"""db_writer_redshift_spark — a PySpark-native analytics/load engine.

A from-scratch Spark reimplementation of the capabilities of
keboola/db-writer-redshift (reference: /root/reference, PHP). The reference
is a thin ELT control plane that generates Redshift SQL (COPY / DDL /
UPDATE-DELETE-INSERT merge); here Spark itself is both the loader and the
warehouse. Everything is expressed through the DataFrame / Spark SQL API so
Catalyst + Tungsten own planning and execution.

Layout:
  session     SparkSession factory (reference Redshift.php:44-77 analog)
  errors      error taxonomy + retry (reference run.php:37-56, Redshift.php:226-260)
  config      config validation + type mapping (reference Configuration/*.php)
  sources     CSV/manifest/parquet ingestion (reference Redshift.php:79-115)
  catalog     managed-table DDL ops (reference Redshift.php:124-153,216-224)
  writer      full / incremental (merge) loads (reference RedshiftApplication.php:109-139)
  operators   merge, dedup, similarity, text analysis, multimodal
  functions   vector / text column expression helpers
  plans       the analytical query library graded by the driver harness
  streaming   structured-streaming variants of the events queries
"""

__version__ = "0.1.0"
