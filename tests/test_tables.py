"""Table IO abstraction: parquet fallback paths + capability probes."""

from mcp_ocr_server_spark.sources import synthetic as S
from mcp_ocr_server_spark.sources.tables import (
    iceberg_available,
    read_table,
    table_size_bytes,
    write_table,
)


def test_iceberg_probe_false_here(spark):
    # no catalog configured in this sandbox
    assert iceberg_available(spark) is False


def test_parquet_roundtrip_and_size_hint(spark, tmp_path):
    docs = S.docs_df(spark, S.CorpusConfig(n_docs=20))
    loc = str(tmp_path / "t")
    write_table(docs, loc, mode="overwrite")
    back = read_table(spark, loc)
    assert back.count() == 20
    size = table_size_bytes(spark, loc)
    assert size and size > 1000


def test_tesseract_engine_gated():
    from mcp_ocr_server_spark.ocr import tesseract_engine

    # container has no tesseract: probe is False and construction raises
    assert tesseract_engine.available() is False
    try:
        tesseract_engine.PytesseractEngine()
        raised = False
    except ImportError:
        raised = True
    assert raised


def test_stats_helpers_handle_single_parquet_file(spark):
    """testdata tables are single FILES, not directories — both stats
    helpers must return real numbers for them (review finding: os.walk
    yields nothing for a plain file, silently disabling the hints)."""
    from mcp_ocr_server_spark.sources.tables import (
        table_num_rows,
        table_size_bytes,
    )

    loc = "/root/testdata/sf0.001/embeddings.parquet"
    n = table_num_rows(spark, loc)
    assert n == spark.read.parquet(loc).count() and n > 0
    import os

    assert table_size_bytes(spark, loc) == os.path.getsize(loc)
