"""S6/S11 — result select paging + dump exports."""

from __future__ import annotations

import json
import os

import pytest

from pyspider_spark.engine.results import dump_results, select_results


@pytest.fixture()
def results_df(spark):
    rows = [
        ("p1", f"t{i:02d}", f"http://h.example/{i}", json.dumps({"n": i}), 100.0 + i)
        for i in range(30)
    ] + [("p2", "x1", "http://other.example/1", "{}", 50.0)]
    return spark.createDataFrame(
        rows, "project string, taskid string, url string, result string, updatetime double"
    )


def test_select_paging_stable(results_df):
    page1 = select_results(results_df, project="p1", offset=0, limit=10).collect()
    page2 = select_results(results_df, project="p1", offset=10, limit=10).collect()
    assert len(page1) == 10 and len(page2) == 10
    # newest first, no overlap between pages
    assert page1[0]["taskid"] == "t29"
    assert {r["taskid"] for r in page1}.isdisjoint({r["taskid"] for r in page2})
    # deterministic: same call → same page
    again = select_results(results_df, project="p1", offset=0, limit=10).collect()
    assert [r["taskid"] for r in again] == [r["taskid"] for r in page1]


def test_dump_json_csv_txt(results_df, tmp_path):
    for fmt in ("json", "csv", "txt"):
        out = str(tmp_path / fmt)
        dump_results(results_df, out, fmt=fmt, single_file=True)
        files = [f for f in os.listdir(out) if f.startswith("part-")]
        assert len(files) == 1
    with open(
        str(tmp_path / "txt") + "/" + [f for f in os.listdir(str(tmp_path / "txt")) if f.startswith("part-")][0]
    ) as f:
        lines = f.read().splitlines()
    assert len(lines) == 31
    assert all("\t" in ln for ln in lines)