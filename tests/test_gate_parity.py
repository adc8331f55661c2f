"""Mirror of the driver's correctness gate at sf0.001: every queries()
entry must match its oracle_sql() on row multiset (order-insensitive)."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE, rows_set

import __spark_entry__ as entrymod


QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    qfn = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = qfn(spark, SF_SMOKE)
    spark_rows = rows_set([tuple(r) for r in sdf.collect()])
    if sql is None:
        assert len(spark_rows) >= 0  # rows-only check
        return
    duck_rows = rows_set(duck.sql(sql).fetchall())
    # align column order by name, as the driver does
    cols = sorted(sdf.columns)
    duck_cols = [d[0] for d in duck.sql(sql).description]
    assert sorted(duck_cols) == cols, f"{name}: column sets differ"
    sidx = [sdf.columns.index(c) for c in cols]
    didx = [duck_cols.index(c) for c in cols]
    spark_norm = sorted(tuple(r[i] for i in sidx) for r in spark_rows)
    duck_norm = sorted(tuple(r[i] for i in didx) for r in duck_rows)
    assert len(spark_norm) == len(duck_norm), (
        f"{name}: row counts differ spark={len(spark_norm)} duck={len(duck_norm)}"
    )
    assert spark_norm == duck_norm, f"{name}: values differ"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
