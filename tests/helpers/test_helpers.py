r"""Test helpers (parity: ``tests/helpers/test_helpers.py:5-31``)."""
import functools

import pytest

from vp_suite_tpu.utils.utils import PytestExpectedException


def skip_on(exception, reason="skipping due to expected exception"):
    r"""Converts an expected exception into a pytest skip (dataset tests
    degrade to skips on machines without the data)."""
    def decorator(func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            try:
                return func(*args, **kwargs)
            except exception:
                pytest.skip(reason)
        return wrapper
    return decorator
