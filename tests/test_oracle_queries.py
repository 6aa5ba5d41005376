"""Every registered query vs its DuckDB oracle (the driver's t2 gate,
reproduced locally). Queries without an oracle get a rows-run check."""

from __future__ import annotations

import pytest

from java_iceberg_table_spark.oracle import compare
from java_iceberg_table_spark.queries import load_all

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_vs_oracle(name, spark, duck, sf_dir):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if q.oracle is None:
        # rows-only check: query must run and produce a stable schema
        assert spark_pdf is not None
        return
    duck_pdf = duck.execute(q.oracle).df()
    problems = compare(spark_pdf, duck_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)
