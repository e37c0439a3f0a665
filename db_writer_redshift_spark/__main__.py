"""``python -m db_writer_redshift_spark --data <dir>`` — CLI entry (A-1)."""

import sys

from db_writer_redshift_spark.app import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
