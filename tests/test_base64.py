"""S2 base64 ingestion (operators/base64_ingest.py).

Parity target: handler.go:138-162 — base64 payloads take the same
recognize path as file-backed images, and undecodable input maps to
INVALID_INPUT (pkg/errors/errors.go).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mcp_ocr_server_spark.config import FIXTURE_JOB, INVALID_INPUT
from mcp_ocr_server_spark.operators.base64_ingest import decode_base64_media
from mcp_ocr_server_spark.sources import synthetic as S

CORPUS = S.CorpusConfig(n_docs=24)


def test_valid_rows_decode_to_original_bytes(spark):
    b64 = S.b64_media_df(spark, CORPUS)
    dec = decode_base64_media(b64)
    media = S.media_df(spark, CORPUS).select(
        "media_ref", F.col("bytes").alias("orig")
    )
    joined = (
        dec.filter(F.col("error_code").isNull())
        .join(media, "media_ref")
        .select(
            (F.sha2("bytes", 256) == F.sha2("orig", 256)).alias("same")
        )
        .collect()
    )
    assert joined and all(r["same"] for r in joined)


def test_corrupted_rows_marked_invalid_input(spark):
    b64 = S.b64_media_df(spark, CORPUS)
    dec = decode_base64_media(b64).join(
        b64.select("media_ref", "corrupted"), "media_ref"
    )
    rows = dec.collect()
    for r in rows:
        if r["corrupted"]:
            assert r["error_code"] == INVALID_INPUT and r["bytes"] is None
        else:
            assert r["error_code"] is None and r["bytes"] is not None
    assert any(r["corrupted"] for r in rows)


def test_decoded_media_feeds_extraction_identically(spark):
    """The base64 path is a drop-in media source: extraction over the
    decoded valid subset equals extraction over the binary media table
    restricted to the same refs (span-sequence equality, SURVEY.md §2.8)."""
    from mcp_ocr_server_spark.plans.pipeline import extract

    docs = S.docs_df(spark, CORPUS)
    media = S.media_df(spark, CORPUS)
    b64 = S.b64_media_df(spark, CORPUS)
    decoded = decode_base64_media(b64).filter(
        F.col("error_code").isNull()
    ).select("media_ref", "bytes")
    valid_refs = {r["media_ref"] for r in decoded.select("media_ref").collect()}

    direct = extract(
        docs, media.join(decoded.select("media_ref"), "media_ref"), FIXTURE_JOB
    ).spans
    via_b64 = extract(docs, decoded, FIXTURE_JOB).spans

    cols = ["doc_id", "order", "kind", "media_ref", "text", "error_code"]
    a = sorted(map(tuple, direct.select(*cols).collect()))
    b = sorted(map(tuple, via_b64.select(*cols).collect()))
    assert a == b
    # and the valid subset actually produced OCR text rows
    assert any(
        r[2] == "image" and r[4] and r[3] in valid_refs for r in a
    )


def test_plan_stays_jvm_side(spark):
    """decode+validate compiles to codegen'd expressions — no python
    UDF stage in the decode plan."""
    b64 = S.b64_media_df(spark, CORPUS)
    plan = decode_base64_media(b64)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_newline_wrapped_payload_decodes(spark):
    """Go's StdEncoding decoder ignores \r and \n — a line-wrapped
    payload the reference server accepts must decode here, not be
    flagged INVALID_INPUT (ADVICE r2: the old regex rejected it)."""
    import base64

    raw = b"\x89PNG-ish payload bytes for the wrap test"
    b64 = base64.b64encode(raw).decode("ascii")
    wrapped = "\r\n".join(b64[i : i + 8] for i in range(0, len(b64), 8))
    df = spark.createDataFrame(
        [("m1", wrapped), ("m2", b64), ("m3", "!!" + b64[2:])],
        "media_ref string, data_b64 string",
    )
    rows = {r["media_ref"]: r for r in decode_base64_media(df).collect()}
    assert rows["m1"]["error_code"] is None
    assert bytes(rows["m1"]["bytes"]) == raw == bytes(rows["m2"]["bytes"])
    assert rows["m3"]["error_code"] == INVALID_INPUT
