"""Guard the driver-correctness window composition (r11).

The round driver records rows/schema/hash for the FIRST 50
``queries()`` entries only. Two past failure modes live here: the
window not rotating (r6), and semantically-changed queries landing
OUTSIDE the 50-slot slice so their driver check silently never runs
(r7). Pin the r11 invariants: the converted reds and the canary
carrier occupy the front, the SURVEY §2 relational/loader core stays
inside the window, and every window entry has an oracle (the driver's
hash check needs one).
"""

import __spark_entry__ as entry

WINDOW = 50


def _window():
    names = list(entry._queries_unordered())
    order = entry._driver_order(dict.fromkeys(names))
    return order[:WINDOW]


def test_changed_queries_front_loaded():
    w = _window()
    # r13 semantic changes: the two scale-audit-driven rewrites
    # (prefix-filter join-back shape + quality-dedup argmax agg)
    assert w[:2] == [
        "set_similarity_join",
        "neardup_dedup_quality",
    ]


def test_survey_core_pinned_in_window():
    # the 21 SURVEY §2 relational/loader pins that ride every
    # rotation (table_profile was r12's canary carrier, not a pin —
    # it rotated out once driver-green)
    w = set(_window())
    core = {
        "pricing_summary", "column_exclusion", "minmax_probe", "top1",
        "range_split", "dedup_window", "csv_roundtrip",
        "hive_text_roundtrip", "merge_load", "append_load",
        "partitioned_load", "anti_join_merge", "multi_sink_fanout",
        "quarantine_good", "quarantine_bad", "union_all",
        "json_extract", "explode",
        "flatten_json_array", "map_rows_tokens", "drop_falsy",
    }
    assert core <= w, sorted(core - w)


def test_window_entries_all_have_oracles():
    osql = entry.oracle_sql()
    missing = [n for n in _window() if n not in osql]
    assert missing == []


def test_recheck_names_exist():
    names = set(entry._queries_unordered())
    stale = [n for n in entry._RECHECK if n not in names]
    assert stale == []
