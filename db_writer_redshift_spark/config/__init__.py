"""Configuration layer: type mapping, config validation, exceptions.

Mirrors the reference's Symfony config trees and type whitelist
(reference: src/Keboola/DbWriter/Redshift/Configuration/*.php,
src/Keboola/DbWriter/Writer/Redshift.php:17-26) with identical
defaults/required-ness, re-expressed as plain dataclass validators.
"""

from db_writer_redshift_spark.config.errors import (  # noqa: F401
    ApplicationException,
    UserException,
)
from db_writer_redshift_spark.config.schema import (  # noqa: F401
    ALLOWED_TYPES,
    ColumnItem,
    TableConfig,
    WriterConfig,
    check_columns,
    parse_config,
    scrub_secrets,
    spark_type_for,
    struct_type_for,
)
