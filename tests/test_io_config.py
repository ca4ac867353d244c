"""Config validation + auxiliary source/sink tests."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from keywords4cv_spark.config import EngineConfig
from keywords4cv_spark.sources.io import (
    load_synonyms_json,
    save_results_jsonl,
    summary_and_details,
)


def test_config_rejects_bad_params():
    with pytest.raises(ValueError):
        EngineConfig(k1=-1.0)
    with pytest.raises(ValueError):
        EngineConfig(b=1.5)
    with pytest.raises(ValueError):
        EngineConfig(ngram_lo=3, ngram_hi=2)
    with pytest.raises(ValueError):
        EngineConfig(block_size=1)
    with pytest.raises(ValueError):
        EngineConfig(n_salts=0)


def test_config_is_frozen():
    cfg = EngineConfig()
    with pytest.raises(Exception):
        cfg.k1 = 2.0  # type: ignore[misc]


def test_load_synonyms_json(spark, tmp_path):
    p = tmp_path / "synonyms.json"
    p.write_text(json.dumps({"ml": ["machine learning"], "db": ["database", "datastore"]}))
    rows = {(r.term, r.synonym) for r in load_synonyms_json(spark, str(p)).collect()}
    assert rows == {
        ("ml", "machine learning"),
        ("db", "database"),
        ("db", "datastore"),
    }


def test_jsonl_sink_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    out = str(tmp_path / "out_jsonl")
    save_results_jsonl(df, out)
    back = spark.read.json(out)
    assert {(r.id, r.v) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_summary_details_sink(spark, tmp_path):
    s = spark.createDataFrame([("spark", 1.5)], "term string, total double")
    d = spark.createDataFrame([("spark", 7, 0.5)], "term string, doc_id long, score double")
    out = str(tmp_path / "results")
    summary_and_details(s, d, out)
    assert spark.read.parquet(f"{out}/summary").filter(F.col("sheet") == "summary").count() == 1
    assert spark.read.parquet(f"{out}/details").count() == 1
