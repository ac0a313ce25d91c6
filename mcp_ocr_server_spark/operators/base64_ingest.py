"""S2: base64 media ingestion with INVALID_INPUT rows.

The reference's second recognize tool accepts base64 payloads instead of
file paths (`ocr_recognize_text_base64`, internal/tools/handler.go:138-162;
schemas.go:42-66) and maps decode failures to INVALID_INPUT
(pkg/errors/errors.go).  Spark restatement: a column-level decode over
the whole table — `unbase64` runs JVM-side inside whole-stage codegen,
no UDF.

Validity is an EXPLICIT regex applied AFTER stripping `\r`/`\n`
(canonical standard-alphabet groups of 4 with correct `=` padding):
Go's base64.StdEncoding.DecodeString ignores newline characters, so
line-wrapped payloads the reference server accepts must decode here
too.  Validation is pinned independently of the engine decoder because
Spark's unbase64 is lenient and DuckDB's from_base64 is strict — the
regex is the single cross-engine contract.  Invalid rows keep NULL
bytes and carry INVALID_INPUT, flowing through the pipeline's
fail-soft error-row semantics (P1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import INVALID_INPUT

# groups of 4 standard-alphabet chars; optional canonical padded tail.
# Applied to the \r\n-STRIPPED payload (Go decoder newline semantics).
B64_CANONICAL_RE = (
    "^([A-Za-z0-9+/]{4})*([A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"
)


def decode_base64_media(
    df: DataFrame, b64_col: str = "data_b64", ref_col: str = "media_ref"
) -> DataFrame:
    """(media_ref, bytes, error_code): decoded payloads for valid rows,
    NULL bytes + INVALID_INPUT for anything non-canonical."""
    stripped = F.regexp_replace(F.col(b64_col), "[\\r\\n]", "")
    valid = stripped.rlike(B64_CANONICAL_RE)
    return df.select(
        F.col(ref_col).alias("media_ref"),
        F.when(valid, F.unbase64(stripped)).alias("bytes"),
        F.when(~valid, F.lit(INVALID_INPUT)).alias("error_code"),
    )
