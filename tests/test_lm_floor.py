"""LM_SAMPLE_FLOOR behavior (ADVICE r4 / VERDICT r4 next #6): a
language whose deterministic 1/LM_SAMPLE_MOD sample is thinner than
the floor must fall back to EXACT rank terciles instead of bucketing
against boundaries trained on a handful of docs (zh's 15-doc sample
bucketed at 0.64 agreement in the r4 calibration)."""

import pyspark.sql.functions as F
import pytest

import mcp_ocr_server_spark.queries as Q

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def eval_rows(spark):
    rows = Q.QUERIES["lm_bucket_eval"][0](spark, SF).collect()
    return {r["lang"]: r for r in rows}


@pytest.fixture(scope="module")
def sample_sizes(spark):
    scored = Q._lm_scored(spark, SF)
    rows = (
        scored.filter(
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.col("doc_id").cast("string")), 1, 6
                    ),
                    16, 10,
                ).cast("long"),
                Q.LM_SAMPLE_MOD,
            )
            == 0
        )
        .groupBy("lang")
        .count()
        .collect()
    )
    return {r["lang"]: r["count"] for r in rows}


def test_agreement_floor_met_for_every_language(eval_rows):
    # the directive's bar: the sampled scale path agrees with the
    # exact baseline >= 0.9 for EVERY language once the floor is in
    assert eval_rows, "eval produced no languages"
    for lang, r in eval_rows.items():
        assert r["agree_rate"] >= 0.9, (lang, r["agree_rate"])


def test_below_floor_languages_fall_back_to_exact(
    eval_rows, sample_sizes
):
    below = [
        lang for lang, m in sample_sizes.items()
        if m < Q.LM_SAMPLE_FLOOR
    ]
    at_or_above = [
        lang for lang, m in sample_sizes.items()
        if m >= Q.LM_SAMPLE_FLOOR
    ]
    # the sf0.001 corpus exercises BOTH paths: thin tail languages and
    # at least one language big enough to ride the boundary values
    assert below and at_or_above, sample_sizes
    for lang in below:
        # fallback labels ARE the exact labels — agreement is exactly 1
        assert eval_rows[lang]["agree_rate"] == 1.0, (
            lang, eval_rows[lang]["agree_rate"])
        assert eval_rows[lang]["n_agree"] == eval_rows[lang]["n_docs"]


def test_no_unsampled_sentinel_remains(spark):
    # the floor SUBSUMES the old 'unsampled' sentinel: every doc gets
    # a real tercile from one path or the other
    buckets = {
        r["bucket"]
        for r in Q.QUERIES["lm_buckets_sampled"][0](spark, SF)
        .select("bucket").distinct().collect()
    }
    assert buckets <= {"tail", "middle", "head"}, buckets
