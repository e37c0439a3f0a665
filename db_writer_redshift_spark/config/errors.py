"""Error taxonomy — reference parity with run.php:37-56.

UserException   → operator/user mistake → CLI exit code 1
ApplicationException / anything else → engine bug → CLI exit code 2
"""

from __future__ import annotations


class UserException(Exception):
    """Bad config, bad data, bad credentials — the user can fix it."""


class ApplicationException(Exception):
    """Engine-side failure (reference: Keboola ApplicationException)."""
