"""End-to-end golden integration test — the port of the reference's
test/integration/etl.js: run the whole ETL book, then assert golden
outputs against a DuckDB oracle over the same source parquet."""

import duckdb
import pytest

from empujar_spark.books.etl import run_etl

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def etl_wh(spark, tmp_path_factory):
    return run_etl(spark, SF, str(tmp_path_factory.mktemp("etl-wh")))


def test_tables_loaded(etl_wh):
    assert set(etl_wh.show_tables()) >= {
        "customer", "orders", "lineitem", "part", "empujar",
    }


def test_customer_goldens_vs_oracle(etl_wh):
    # etl.js:86-101 analogue: exact per-entity aggregates vs oracle
    con = duckdb.connect()
    counts = dict(
        con.execute(
            f"SELECT o_custkey, count(*) FROM '{SF}/orders.parquet' GROUP BY 1"
        ).fetchall()
    )
    spent = dict(
        con.execute(
            f"""
            SELECT o.o_custkey,
                   round(sum(CAST(l.l_extendedprice AS DECIMAL(18,6)) *
                             (CAST(1 AS DECIMAL(18,6)) - CAST(l.l_discount AS DECIMAL(18,6)))), 4)
            FROM '{SF}/orders.parquet' o
            JOIN '{SF}/lineitem.parquet' l ON l.l_orderkey = o.o_orderkey
            GROUP BY 1
            """
        ).fetchall()
    )
    exp = {ck: (counts[ck], float(spent.get(ck, 0.0))) for ck in counts}
    got = {
        r["c_custkey"]: (r["total_orders"], r["total_spent"])
        for r in etl_wh.read("customer").collect()
    }
    assert len(got) == con.execute(
        f"SELECT count(*) FROM '{SF}/customer.parquet'"
    ).fetchone()[0]
    for ck, (n, spent) in exp.items():
        assert got[ck][0] == n, f"customer {ck} order count"
        assert got[ck][1] == float(spent), f"customer {ck} total spent"
    # customers with no orders keep zeros
    for ck, (n, spent) in got.items():
        if ck not in exp:
            assert (n, spent) == (0, 0.0)


def test_part_goldens_vs_oracle(etl_wh):
    con = duckdb.connect()
    exp = {
        r[0]: (r[1], float(r[2]))
        for r in con.execute(
            f"""
            SELECT l_partkey, count(*),
                   round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 4)
            FROM '{SF}/lineitem.parquet' GROUP BY 1
            """
        ).fetchall()
    }
    got = {
        r["p_partkey"]: (r["times_ordered"], r["total_revenue"])
        for r in etl_wh.read("part").collect()
    }
    for pk, (n, rev) in exp.items():
        assert got[pk] == (n, rev)


def test_incremental_rerun_is_idempotent(spark, etl_wh):
    """Re-run the book against the SAME warehouse: watermark extract +
    upsert must leave row counts unchanged (the reference's daily-rerun
    contract)."""
    from empujar_spark.books.etl import build_etl_book

    before = {t: etl_wh.table_size(t) for t in ["customer", "orders", "lineitem", "part"]}
    book = build_etl_book(spark, SF, etl_wh)
    book.run()
    after = {t: etl_wh.table_size(t) for t in before}
    assert before == after


def test_audit_table(etl_wh):
    # etl.js:128-134: at least one book:end row in `empujar`
    audit = etl_wh.read("empujar")
    states = [r["state"] for r in audit.collect()]
    assert "book:end" in states and "book:start" in states
    assert any(s == "page:end" for s in states)
