"""Gopher-style repetition filter (q_repetition_stats): both keep and
drop branches exercised on constructed docs, plus oracle parity on the
same parquet (the testdata corpus is repetition-free, so the driver
gate alone never fires the thresholds)."""

import duckdb
import pytest


@pytest.fixture()
def rep_dir(spark, tmp_path):
    docs = [
        # clean prose: low top-bigram share, no duplicate trigrams
        (1, "the quick brown fox jumps over the lazy dog and then "
            "walks away toward a quiet distant river bank at dusk"),
        # template spam: one bigram dominates, trigrams repeat
        (2, "click here " * 20),
        # boilerplate loop: a whole sentence repeated
        (3, "terms of service apply to all users " * 6),
        # too short for trigrams: excluded entirely
        (4, "hi there"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_branches_and_exclusion(spark, rep_dir):
    from mcp_ocr_server_spark.queries import q_repetition_stats

    rows = {r["doc_id"]: r for r in q_repetition_stats(spark, rep_dir).collect()}
    assert set(rows) == {1, 2, 3}  # doc 4 has < 3 tokens
    assert rows[1]["keep_flag"] == 1
    assert rows[1]["dup_trigram_frac"] == 0.0
    # spam: "here click" / "click here" dominate; trigrams repeat
    assert rows[2]["keep_flag"] == 0
    assert rows[2]["top_bigram_frac"] > 0.18
    assert rows[2]["dup_trigram_frac"] > 0.3
    assert rows[3]["keep_flag"] == 0
    assert rows[3]["dup_trigram_frac"] > 0.3


def test_oracle_parity_on_repetitive_docs(spark, rep_dir):
    from mcp_ocr_server_spark.queries import (
        O_REPETITION_STATS,
        q_repetition_stats,
    )

    sdf = (
        q_repetition_stats(spark, rep_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{rep_dir}/documents.parquet/*.parquet')"
    )
    odf = (
        con.execute(O_REPETITION_STATS)
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)[list(sdf.columns)]
    )
    assert sdf.astype(str).equals(odf.astype(str))
