"""Column-level lineage extraction (plans/lineage.py): output columns
must resolve to exactly the leaf columns they derive from, and the
documented approximations (explode opacity) must hold."""

from __future__ import annotations

from pyspark.sql import functions as F

from lightlane_spark.plans.lineage import column_lineage
from lightlane_spark.sources.parquet import read_table


def test_join_agg_lineage(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    df = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_quantity") * (1 - F.col("l_discount"))).alias("disc_qty"),
            F.countDistinct("o_custkey").alias("n_cust"),
        )
    )
    rep = column_lineage(df)
    assert rep.sources_of("disc_qty") == {
        ("leaf0", "l_quantity"),
        ("leaf0", "l_discount"),
    }
    assert rep.sources_of("n_cust") == {("leaf1", "o_custkey")}
    assert rep.sources_of("l_returnflag") == {("leaf0", "l_returnflag")}


def test_window_and_rename_chain(spark, sf_dir):
    from pyspark.sql import Window

    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    df = (
        o.withColumn("rank", F.row_number().over(w))
        .withColumnRenamed("o_totalprice", "price")
        .select("price", "rank")
    )
    rep = column_lineage(df)
    assert rep.sources_of("price") == {("leaf0", "o_totalprice")}
    # row_number derives from the window spec's partition/order cols
    assert rep.sources_of("rank") == {
        ("leaf0", "o_custkey"),
        ("leaf0", "o_orderdate"),
    }


def test_explode_resolves_to_generator_input(spark, sf_dir):
    """Generate nodes link generator-output attrs to the generator
    expression's references: an exploded token column derives from
    the text column it splits."""
    docs = read_table(spark, sf_dir, "documents")
    df = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    rep = column_lineage(df)
    assert rep.sources_of("doc_id") == {("leaf0", "doc_id")}
    assert rep.sources_of("token") == {("leaf0", "text")}


def test_posexplode_both_outputs_resolve(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    df = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    rep = column_lineage(df)
    assert rep.sources_of("pos") == {("leaf0", "text")}
    assert rep.sources_of("w") == {("leaf0", "text")}


def test_literal_column_has_no_sources_but_is_not_leaf_bound(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    df = o.select("o_orderkey", F.lit(1).alias("one"))
    rep = column_lineage(df)
    assert rep.sources_of("o_orderkey") == {("leaf0", "o_orderkey")}
    one = next(c for c in rep.columns if c.name == "one")
    assert one.sources == set()
