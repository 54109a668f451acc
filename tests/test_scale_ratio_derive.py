"""Derivation invariants for the scale-ratio audit corpus
(tools/scale_ratio.py, VERDICT r12 ask #1). The audit's conclusion
— "the heavy operators scale near-linearly" — is only meaningful if
the derived corpus scales the INPUT without changing its structure:
FK-valid copies in disjoint key ranges, copy-disjoint vocabulary
(duplicate pairs grow linearly, not quadratically), fixed-size probe
sets, per-copy-identical dedup fixtures."""

import os
import sys

import duckdb
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.scale_ratio import _pow10_above, derive  # noqa: E402

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def derived(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scale3x"))
    counts = derive(SRC, out, 3)
    return out, counts


def test_pow10_above():
    assert _pow10_above(5) == 10
    assert _pow10_above(10) == 100
    assert _pow10_above(999) == 1000
    assert _pow10_above(1000) == 10000


def test_row_counts_scale(derived):
    out, counts = derived
    con = duckdb.connect()
    src_counts = {
        t: con.execute(f"SELECT count(*) FROM '{SRC}/{t}.parquet'").fetchone()[0]
        for t in counts
    }
    for t, n in counts.items():
        want = src_counts[t] * (1 if t in ("region", "nation") else 3)
        assert n == want, (t, n, want)


def test_fk_integrity(derived):
    out, _ = derived
    con = duckdb.connect()
    for child, key, parent, pkey in [
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ]:
        orphans = con.execute(
            f"SELECT count(*) FROM '{out}/{child}.parquet' c "
            f"LEFT JOIN '{out}/{parent}.parquet' p ON c.{key} = p.{pkey} "
            f"WHERE p.{pkey} IS NULL"
        ).fetchone()[0]
        assert orphans == 0, (child, key, orphans)


def test_copy_vocabularies_disjoint(derived):
    # shared words across copies would bridge minhash/shingle buckets
    # and manufacture a quadratic pair blowup in the data
    out, _ = derived
    con = duckdb.connect()
    stride = _pow10_above(
        con.execute(
            f"SELECT max(doc_id) FROM '{SRC}/documents.parquet'"
        ).fetchone()[0]
    )
    shared = con.execute(
        f"""
        WITH w AS (SELECT doc_id // {stride} AS copy,
                          unnest(string_split(text, ' ')) AS w
                   FROM '{out}/documents.parquet')
        SELECT count(*) FROM
            (SELECT DISTINCT w FROM w WHERE copy = 0) a
            JOIN (SELECT DISTINCT w FROM w WHERE copy = 1) b USING (w)
        """
    ).fetchone()[0]
    assert shared == 0


def test_copy_zero_verbatim_and_probe_set_fixed(derived):
    out, _ = derived
    con = duckdb.connect()
    # copy 0 is byte-identical to the source (the 1x baseline is the
    # same writer over the same rows)
    diff = con.execute(
        f"SELECT count(*) FROM ((SELECT * FROM '{out}/documents.parquet' "
        f"WHERE doc_id < 1000) EXCEPT (SELECT * FROM "
        f"'{SRC}/documents.parquet'))"
    ).fetchone()[0]
    assert diff == 0
    # the ANN probe predicate (vec_id < 10) selects copy-0 rows only:
    # probe count is scale-invariant
    n = con.execute(
        f"SELECT count(*) FROM '{out}/embeddings.parquet' WHERE vec_id < 10"
    ).fetchone()[0]
    n_src = con.execute(
        f"SELECT count(*) FROM '{SRC}/embeddings.parquet' WHERE vec_id < 10"
    ).fetchone()[0]
    assert n == n_src


def test_embeddings_rotate_preserve_norm(derived):
    out, _ = derived
    con = duckdb.connect()
    stride = _pow10_above(
        con.execute(
            f"SELECT max(vec_id) FROM '{SRC}/embeddings.parquet'"
        ).fetchone()[0]
    )
    rows = dict(
        con.execute(
            f"SELECT vec_id, embedding FROM '{out}/embeddings.parquet' "
            f"WHERE vec_id % {stride} = 7"
        ).fetchall()
    )
    base = rows[7]
    assert rows[stride + 7] == base[1:] + base[:1]
    assert rows[2 * stride + 7] == base[2:] + base[:2]


def test_n_chars_matches_text(derived):
    out, _ = derived
    con = duckdb.connect()
    bad = con.execute(
        f"SELECT count(*) FROM '{out}/documents.parquet' "
        f"WHERE n_chars != length(text)"
    ).fetchone()[0]
    assert bad == 0


def test_dedup_fixture_identical_per_copy(derived):
    # _docs_with_dups selects doc_id % 5 = 0; power-of-10 strides are
    # 0 mod 5, so every copy contributes the same in-copy rows
    out, _ = derived
    con = duckdb.connect()
    stride = _pow10_above(
        con.execute(
            f"SELECT max(doc_id) FROM '{SRC}/documents.parquet'"
        ).fetchone()[0]
    )
    per_copy = con.execute(
        f"SELECT doc_id // {stride} AS copy, count(*) FROM "
        f"'{out}/documents.parquet' WHERE doc_id % 5 = 0 GROUP BY 1 "
        f"ORDER BY 1"
    ).fetchall()
    assert len(per_copy) == 3
    assert len({n for _, n in per_copy}) == 1
