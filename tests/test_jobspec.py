"""Declarative job specs compile onto Pipeline and reproduce the
reference's dump / load job shapes end-to-end."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lightlane_spark.jobspec import build_pipeline, run_job
from lightlane_spark.loaders.text_sinks import read_csv
from lightlane_spark.sources.parquet import read_table


def test_dump_job_spec(spark, sf_dir, tmp_path):
    """Reference SQLDumper shape: table + columns + where + range split
    → CSV sink (dumper/sql.py:31-47 kwargs as data)."""
    out = str(tmp_path / "dump_csv")
    spec = {
        "extract": {
            "kind": "parquet",
            "sf_dir": sf_dir,
            "table": "lineitem",
            "columns": ["l_orderkey", "l_linenumber", "l_quantity"],
            "where": "l_quantity > 30",
            "splitby": "l_orderkey",
            "splits": 4,
        },
        "sinks": [{"kind": "csv", "path": out}],
    }
    metrics = run_job(spark, spec)
    assert metrics["extracted"]["rows"] > 0
    back = read_csv(
        spark, out, "l_orderkey bigint, l_linenumber int, l_quantity double"
    )
    expect = (
        read_table(spark, sf_dir, "lineitem")
        .filter("l_quantity > 30")
        .count()
    )
    assert back.count() == expect


def test_transform_and_merge_load_spec(spark, sf_dir, tmp_path):
    """Transforms + quarantine + MERGE load — the HiveLoader shape."""
    target = str(tmp_path / "orders_t")
    base = {
        "extract": {"kind": "parquet", "sf_dir": sf_dir, "table": "orders"},
        "load": {"path": target, "mode": "overwrite"},
    }
    run_job(spark, base)
    spec = {
        "extract": {"kind": "parquet", "sf_dir": sf_dir, "table": "orders"},
        "transforms": [
            {"op": "filter", "predicate": "o_orderkey % 3 = 0"},
            {"op": "with_column", "name": "o_orderpriority", "expr": "'MERGED'"},
            {"op": "dedup", "keys": ["o_orderkey"], "orderby": ["o_orderdate DESC"]},
        ],
        "load": {
            "path": target,
            "mode": "merge",
            "primary_keys": ["o_orderkey"],
        },
    }
    run_job(spark, spec)
    merged = spark.read.parquet(target)
    n_merged = merged.filter("o_orderpriority = 'MERGED'").count()
    expect = (
        read_table(spark, sf_dir, "orders").filter("o_orderkey % 3 = 0").count()
    )
    assert n_merged == expect
    assert merged.count() == read_table(spark, sf_dir, "orders").count()


def test_sql_and_quarantine_spec(spark, sf_dir, tmp_path):
    spec = {
        "extract": {"kind": "parquet", "sf_dir": sf_dir, "table": "orders"},
        "transforms": [
            {"op": "sql", "query": "SELECT o_orderkey, o_totalprice FROM __this__"},
        ],
        "quarantine": {
            "good_predicate": "o_totalprice > 1000",
            "bad_path": str(tmp_path / "bad"),
        },
        "sinks": [{"kind": "parquet", "path": str(tmp_path / "good")}],
    }
    m = run_job(spark, spec)
    good = spark.read.parquet(str(tmp_path / "good"))
    bad = spark.read.parquet(str(tmp_path / "bad"))
    total = read_table(spark, sf_dir, "orders").count()
    assert good.count() + bad.count() == total
    assert m["good"]["rows"] == good.count()
    assert good.columns == ["o_orderkey", "o_totalprice"]


def test_spec_rejects_unknown_ops(spark, sf_dir):
    with pytest.raises(ValueError, match="unknown transform op"):
        build_pipeline(
            spark,
            {
                "extract": {"kind": "parquet", "sf_dir": sf_dir, "table": "orders"},
                "transforms": [{"op": "exec_python", "code": "boom"}],
            },
        )
    with pytest.raises(ValueError, match="extract"):
        build_pipeline(spark, {})


def test_cli_run_and_explain(spark, sf_dir, tmp_path):
    """`python -m lightlane_spark run|explain spec.json` — in-process
    (reusing the session fixture; get_spark getOrCreate's it)."""
    import json as _json

    from lightlane_spark.__main__ import main

    out = str(tmp_path / "cli_out")
    spec = {
        "extract": {
            "kind": "parquet",
            "sf_dir": sf_dir,
            "table": "orders",
            "columns": ["o_orderkey", "o_totalprice"],
            "where": "o_totalprice > 100000",
        },
        "sinks": [{"kind": "parquet", "path": out}],
    }
    spec_path = str(tmp_path / "job.json")
    with open(spec_path, "w") as f:
        _json.dump(spec, f)

    assert main(["explain", spec_path]) == 0
    assert main(["run", spec_path]) == 0
    back = spark.read.parquet(out)
    assert back.count() == (
        read_table(spark, sf_dir, "orders").filter("o_totalprice > 100000").count()
    )


def test_avro_and_json_sink_specs(spark, sf_dir, tmp_path):
    """Declarative fan-out to the round-4 sink kinds: one extract,
    avro + json sinks, both read back row-complete."""
    from lightlane_spark.loaders.avro_sink import read_avro
    from lightlane_spark.loaders.text_sinks import read_json

    avro_out = str(tmp_path / "sink_avro")
    json_out = str(tmp_path / "sink_json")
    spec = {
        "extract": {
            "kind": "parquet",
            "sf_dir": sf_dir,
            "table": "lineitem",
            "columns": ["l_orderkey", "l_linenumber", "l_quantity"],
        },
        "sinks": [
            {"kind": "avro", "path": avro_out},
            {"kind": "json", "path": json_out},
        ],
    }
    run_job(spark, spec)
    ddl = "l_orderkey bigint, l_linenumber int, l_quantity double"
    n = read_table(spark, sf_dir, "lineitem").count()
    assert read_avro(spark, avro_out, ddl).count() == n
    assert read_json(spark, json_out, ddl).count() == n


def test_curation_ops_in_spec(spark, sf_dir, tmp_path):
    """The round-4 curation transforms are spec-addressable: build a
    messy-URL corpus, url_dedup it, score with the bigram LM, and cut
    on the score — all as data, no Python."""
    out = str(tmp_path / "curated")
    spec = {
        "extract": {
            "kind": "parquet",
            "sf_dir": sf_dir,
            "table": "documents",
            "columns": ["doc_id", "text", "source"],
        },
        "transforms": [
            {
                "op": "with_column",
                "name": "url",
                "expr": "concat('HTTP://', upper(source), '.EX.com:80/d/',"
                " CAST(doc_id % 9 AS STRING), '?utm_source=x')",
            },
            {"op": "url_dedup", "url_col": "url", "id_col": "doc_id"},
            {"op": "lm_score", "text_col": "text", "id_col": "doc_id"},
            {"op": "filter", "predicate": "lm_score IS NOT NULL"},
            {"op": "select", "columns": ["doc_id", "norm_url", "lm_score"]},
        ],
        "sinks": [{"kind": "parquet", "path": out}],
    }
    metrics = run_job(spark, spec)
    back = spark.read.parquet(out)
    # 9 distinct canonical urls per source-group... dedup keyed on the
    # normalized url (source x doc_id%9 buckets)
    n_groups = (
        read_table(spark, sf_dir, "documents")
        .selectExpr("lower(source) AS s", "doc_id % 9 AS m")
        .distinct()
        .count()
    )
    assert back.count() == n_groups
    assert set(back.columns) == {"doc_id", "norm_url", "lm_score"}
    assert back.where("norm_url LIKE 'http://%.ex.com/d/%?%'").count() == 0  # utm gone
    assert back.where("norm_url LIKE 'http://%.ex.com/d/%'").count() == n_groups


def test_lineage_cli_subcommand(spark, sf_dir, tmp_path, capsys):
    """`python -m lightlane_spark lineage spec.json` prints one JSON
    object mapping output columns to leaf sources, no execution."""
    import json as _json

    from lightlane_spark.__main__ import main as cli_main

    spec = {
        "extract": {
            "kind": "parquet",
            "sf_dir": sf_dir,
            "table": "lineitem",
            "columns": ["l_orderkey", "l_quantity", "l_extendedprice"],
        },
        "transforms": [
            {"op": "with_column", "name": "rev", "expr": "l_quantity * l_extendedprice"},
            {"op": "select", "columns": ["l_orderkey", "rev"]},
        ],
    }
    p = tmp_path / "spec.json"
    p.write_text(_json.dumps(spec))
    rc = cli_main(["lineage", str(p)])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["columns"]["rev"]["sources"] == [
        "leaf0.l_extendedprice",
        "leaf0.l_quantity",
    ]
    assert out["columns"]["l_orderkey"]["sources"] == ["leaf0.l_orderkey"]
