"""Oracle-parity tests: every registered query vs its DuckDB oracle.

This mimics the driver's t2 correctness gate (row-count + schema +
order-insensitive values) so failures show up locally first.
"""

import pytest

from lakehouse_app_spark import QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(name, check_parity):
    check_parity(name)
