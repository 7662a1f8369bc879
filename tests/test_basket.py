"""Market-basket pair mining (operators/basket.py): worked example,
dedup-within-basket, the mega-basket cap, lift arithmetic."""

from __future__ import annotations

from pyspark.sql import Row

from etl_ender_turing_spark.operators import basket as bk


def _df(spark, baskets):
    rows = [Row(basket=b, item=i) for b, items in baskets for i in items]
    return spark.createDataFrame(rows)


def test_worked_example_counts_and_lift(spark):
    baskets = [(1, ["a", "b", "c"]), (2, ["a", "b"]), (3, ["a", "c"]),
               (4, ["b", "c"]), (5, ["a", "b", "b"])]  # dup item once
    got = {(r.item_a, r.item_b): r for r in
           bk.frequent_pairs(_df(spark, baskets), "basket", "item",
                             min_support=2).collect()}
    ab = got[("a", "b")]
    # a,b co-occur in baskets 1,2,5; a in 4 baskets, b in 4, total 5
    assert ab.n_both == 3
    assert ab.lift6 == round(3 * 5 / (4 * 4) + 1e-12, 6) or \
        abs(ab.lift6 - 0.9375) < 1e-9
    assert got[("a", "c")].n_both == 2
    assert got[("b", "c")].n_both == 2
    assert len(got) == 3


def test_min_support_filters(spark):
    baskets = [(1, ["x", "y"]), (2, ["x", "z"])]
    got = bk.frequent_pairs(_df(spark, baskets), "basket", "item",
                            min_support=2).collect()
    assert got == []


def test_mega_basket_dropped_at_cap(spark):
    big = (1, [f"i{j}" for j in range(50)])
    small = [(2, ["p", "q"]), (3, ["p", "q"])]
    got = {(r.item_a, r.item_b) for r in
           bk.frequent_pairs(_df(spark, [big] + small), "basket", "item",
                             min_support=1, max_basket=10).collect()}
    assert got == {("p", "q")}     # the 50-item basket contributed nothing


def test_matches_duckdb_oracle(spark):
    import duckdb

    baskets = [(b, [f"i{(b * j) % 9}" for j in range(1, 6)])
               for b in range(40)]
    sdf = bk.frequent_pairs(_df(spark, baskets), "basket", "item",
                            min_support=2).toPandas()
    vals = ", ".join(f"({b}, 'i{(b * j) % 9}')"
                     for b in range(40) for j in range(1, 6))
    sql = bk.frequent_pairs_sql(
        f"(SELECT * FROM (VALUES {vals}) v(l_orderkey, l_partkey))",
        "l_orderkey", "l_partkey", min_support=2)
    odf = duckdb.connect().execute(sql).df()
    key = ["item_a", "item_b"]
    sdf = sdf.sort_values(key).reset_index(drop=True)
    odf = odf.sort_values(key).reset_index(drop=True)
    assert len(sdf) == len(odf)
    assert (sdf["n_both"].values == odf["n_both"].values).all()
    assert (abs(sdf["lift6"].values - odf["lift6"].values) == 0).all()
