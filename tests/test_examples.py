"""The examples/ scripts must stay runnable — each main() executes at
sf0.001 and self-asserts its report."""

from __future__ import annotations

import importlib.util
import os

import pytest

_EX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")


def _run(name: str, sf_dir: str):
    spec = importlib.util.spec_from_file_location(name, os.path.join(_EX, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main(sf_dir)


@pytest.mark.parametrize(
    "name",
    [
        "curation_end_to_end",
        "dedup_walkthrough",
        "streaming_ingest",
        "retrieval_walkthrough",
        "tokenizer_and_shards",
        "plan_lint_walkthrough",
    ],
)
def test_example_runs(spark, sf_dir, name):
    report = _run(name, sf_dir)
    assert isinstance(report, dict) and report
