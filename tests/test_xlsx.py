"""Stdlib xlsx sink: structural validity + value-level round-trip."""

from __future__ import annotations

import math
import zipfile

import pandas as pd
import pytest

from keywords4cv_spark.sources.xlsx import (
    _col_letter,
    read_xlsx,
    save_results_xlsx,
    write_xlsx,
)


def test_col_letters():
    assert [_col_letter(i) for i in (0, 1, 25, 26, 27, 701, 702)] == [
        "A", "B", "Z", "AA", "AB", "ZZ", "AAA",
    ]


def test_round_trip_types_and_escaping(tmp_path):
    df = pd.DataFrame(
        {
            "term": ["a<b", 'quote"&amp', "naïve", ""],
            "score": [1.5, -2.25, 0.1, 1e-9],
            "count": [3, 0, -7, 2**40],
            "keep": [True, False, True, False],
        }
    )
    path = str(tmp_path / "out.xlsx")
    write_xlsx(path, {"Summary": df})
    got = read_xlsx(path)["Summary"]
    assert list(got.columns) == list(df.columns)
    for c in df.columns:
        assert got[c].tolist() == df[c].tolist(), c


def test_none_and_nan_cells_round_trip_as_missing(tmp_path):
    df = pd.DataFrame({"k": ["x", "y"], "v": [float("nan"), 2.0], "s": [None, "z"]})
    path = str(tmp_path / "out.xlsx")
    write_xlsx(path, {"S": df})
    got = read_xlsx(path)["S"]
    # pandas re-infers the all-numeric column as float64, so the missing
    # cell reads back as NaN; the mixed string column keeps None.
    assert got["v"].tolist()[1] == 2.0 and math.isnan(got["v"].tolist()[0])
    assert got["s"].tolist() == [None, "z"]
    assert math.isnan(df["v"].tolist()[0])  # source really was NaN


def test_multi_sheet_order_and_names(tmp_path):
    path = str(tmp_path / "two.xlsx")
    write_xlsx(
        path,
        {
            "Summary": pd.DataFrame({"a": [1]}),
            'Det "ailed" & Scores': pd.DataFrame({"b": ["v"]}),
        },
    )
    got = read_xlsx(path)
    assert list(got) == ["Summary", 'Det "ailed" & Scores']


def test_package_parts_present(tmp_path):
    path = str(tmp_path / "p.xlsx")
    write_xlsx(path, {"S1": pd.DataFrame({"a": [1]}), "S2": pd.DataFrame({"b": [2]})})
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
    assert {
        "[Content_Types].xml",
        "_rels/.rels",
        "xl/workbook.xml",
        "xl/_rels/workbook.xml.rels",
        "xl/styles.xml",
        "xl/worksheets/sheet1.xml",
        "xl/worksheets/sheet2.xml",
    } <= names


def test_row_cap_rejected(tmp_path):
    big = pd.DataFrame({"a": range(3)})
    import keywords4cv_spark.sources.xlsx as x

    orig = x._XLSX_MAX_ROWS
    x._XLSX_MAX_ROWS = 3  # cap = 2 data rows
    try:
        with pytest.raises(ValueError, match="caps at"):
            write_xlsx(str(tmp_path / "big.xlsx"), {"S": big})
    finally:
        x._XLSX_MAX_ROWS = orig


def test_atomic_no_partial_file_on_error(tmp_path, monkeypatch):
    df = pd.DataFrame({"a": [1]})
    path = str(tmp_path / "atomic.xlsx")
    write_xlsx(path, {"S": df})  # good file in place
    before = open(path, "rb").read()

    import keywords4cv_spark.sources.xlsx as x

    def boom(_df):
        raise RuntimeError("mid-write failure")

    monkeypatch.setattr(x, "_sheet_xml", boom)
    with pytest.raises(RuntimeError):
        write_xlsx(path, {"S": df})
    assert open(path, "rb").read() == before  # old file untouched
    assert [p for p in tmp_path.iterdir()] == [tmp_path / "atomic.xlsx"]  # no tmp junk


def test_save_results_xlsx_reference_shape(spark, tmp_path):
    summary = spark.createDataFrame(
        [("python", 3, 2.5), ("spark", 1, 9.75)], "term string, tf int, score double"
    )
    details = spark.createDataFrame(
        [(0, "python", 1.5), (1, "spark", 9.75)],
        "doc_id long, term string, score double",
    )
    path = str(tmp_path / "results.xlsx")
    save_results_xlsx(summary, details, path)
    got = read_xlsx(path)
    assert list(got) == ["Summary", "Detailed Scores"]
    s = got["Summary"].sort_values("term", ignore_index=True)
    assert s["term"].tolist() == ["python", "spark"]
    assert s["score"].tolist() == [2.5, 9.75]
    d = got["Detailed Scores"].sort_values("doc_id", ignore_index=True)
    assert d["doc_id"].tolist() == [0, 1]


def test_save_results_xlsx_bounded(spark, tmp_path):
    df = spark.range(10).selectExpr("id as doc_id")
    with pytest.raises(ValueError, match="max_rows"):
        save_results_xlsx(df, df, str(tmp_path / "x.xlsx"), max_rows=5)
