"""Retry-executor tests (E-1 parity: 3 attempts, quadratic backoff,
UserExceptions never retried)."""

from __future__ import annotations

import pytest

from db_writer_redshift_spark.config.errors import UserException
from db_writer_redshift_spark.operators.retry import retrying, run_with_retry


def test_succeeds_after_transient_failures():
    calls = {"n": 0}
    sleeps: list[float] = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    assert run_with_retry(flaky, sleep=sleeps.append) == "ok"
    assert calls["n"] == 3
    assert sleeps == [1, 4]  # sleep(tries**2), Redshift.php:251


def test_exhaustion_reraises_last_error():
    def always():
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        run_with_retry(always, sleep=lambda _: None)


def test_user_exception_never_retries():
    calls = {"n": 0}

    def bad_config():
        calls["n"] += 1
        raise UserException("bad column")

    with pytest.raises(UserException):
        run_with_retry(bad_config, sleep=lambda _: None)
    assert calls["n"] == 1


def test_decorator_form():
    calls = {"n": 0}

    @retrying(attempts=2)
    def sometimes():
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("fs hiccup")
        return 42

    assert sometimes() == 42
