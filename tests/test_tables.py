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


def test_range_clustered_write_produces_disjoint_file_ranges(spark, tmp_path):
    """write_range_clustered must yield files whose per-footer [min,max]
    intervals of the cluster key are pairwise DISJOINT and ordered —
    the property min/max pruning needs.  Contrast: a plain hash-
    partitioned write of the same data produces overlapping ranges
    (asserted, so the test proves the writer adds something real).
    Content must be byte-equal to the input set, and a selective read
    through Spark must return the same rows as the unclustered copy."""
    from mcp_ocr_server_spark.sources.tables import (
        file_stats,
        write_range_clustered,
    )

    df = spark.range(0, 10_000).selectExpr(
        "id AS doc_id", "md5(cast(id AS string)) AS payload"
    )
    clustered = str(tmp_path / "clustered")
    hashed = str(tmp_path / "hashed")
    write_range_clustered(df, clustered, "doc_id", n_files=8)
    df.repartition(8).write.mode("overwrite").parquet(hashed)

    stats = file_stats(clustered, "doc_id")
    assert len(stats) == 8
    for (_, _, hi_prev), (_, lo_next, _) in zip(stats, stats[1:]):
        assert hi_prev < lo_next, stats  # disjoint AND ordered
    hstats = file_stats(hashed, "doc_id")
    overlaps = sum(
        1
        for (_, _, hi_prev), (_, lo_next, _) in zip(hstats, hstats[1:])
        if hi_prev >= lo_next
    )
    assert overlaps > 0, "hash layout unexpectedly clustered"

    back = spark.read.parquet(clustered)
    assert back.count() == 10_000
    sel = back.filter("doc_id BETWEEN 100 AND 199").collect()
    ref = df.filter("doc_id BETWEEN 100 AND 199").collect()
    assert sorted(map(tuple, sel)) == sorted(map(tuple, ref))


def test_zorder_write_prunes_on_every_dimension(spark, tmp_path):
    """write_zorder_clustered must make file-footer min/max useful on
    BOTH cluster columns at once: a selective slice on either x or y
    overlaps at most half the files (ideally ~sqrt(F)).  Contrast with
    write_range_clustered(x): perfect on x but a y slice overlaps
    EVERY file (asserted), which is exactly the gap z-order closes.
    Content and selective-read results stay identical to the input."""
    from pyspark.sql import functions as F

    from mcp_ocr_server_spark.sources.tables import (
        file_stats,
        write_range_clustered,
        write_zorder_clustered,
    )

    n = 40_000
    # x uniform; y decorrelated from x via a Weyl-sequence hash so the
    # two dimensions are independent (the hard case for 1-D layouts)
    df = spark.range(n).selectExpr(
        "id AS x",
        f"cast((id * 2654435761) % {n} AS bigint) AS y",
        "md5(cast(id AS string)) AS payload",
    )
    zloc, rloc = str(tmp_path / "zorder"), str(tmp_path / "rangex")
    write_zorder_clustered(df, zloc, ["x", "y"], n_files=16)
    write_range_clustered(df, rloc, "x", n_files=16)

    def overlapping(loc, col, lo, hi):
        return sum(
            1 for (_f, fl, fh) in file_stats(loc, col)
            if fl <= hi and fh >= lo
        )

    lo, hi = n // 2, n // 2 + n // 8 - 1  # a 1/8-of-domain slice
    zx, zy = overlapping(zloc, "x", lo, hi), overlapping(zloc, "y", lo, hi)
    # ideal 4x4 Morton grid -> ~4-5 files per slice; repartitionByRange
    # cuts by SAMPLED z quantiles (equal file sizes beat grid-aligned
    # cuts at scale), so boundary files may straddle two cells — allow
    # up to 10 of 16.  The contrast that matters: the 1-D layout below
    # overlaps ALL 16 on y.
    assert zx <= 10 and zy <= 10, (zx, zy)
    # the 1-D layout: perfect on x, useless on y
    assert overlapping(rloc, "x", lo, hi) <= 3
    assert overlapping(rloc, "y", lo, hi) == 16

    back = spark.read.parquet(zloc)
    assert back.count() == n
    sel = back.filter(F.col("y").between(lo, hi)).collect()
    ref = df.filter(F.col("y").between(lo, hi)).collect()
    assert sorted(map(tuple, sel)) == sorted(map(tuple, ref))


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Bucketing evidence (co-located joins, the pre-shuffle answer for
    repeated joins on one key at 100 TB): two tables bucketed by the
    join key into the same bucket count join WITHOUT any Exchange —
    each task reads matching buckets from both sides.  The same join
    on plain parquet copies requires two Exchanges (asserted, so the
    test proves bucketing removes them rather than AQE broadcasting)."""
    import uuid

    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{tmp_path}/wh'"
    )
    suffix = uuid.uuid4().hex[:8]
    fact, dim = f"bucketdb.fact_{suffix}", f"bucketdb.dim_{suffix}"
    n = 50_000
    facts = spark.range(n).selectExpr("id % 1000 AS k", "id AS v")
    dims = spark.range(200_000).selectExpr(
        "id % 1000 AS k", "md5(cast(id AS string)) AS payload"
    )
    try:
        facts.write.bucketBy(16, "k").sortBy("k").saveAsTable(fact)
        dims.write.bucketBy(16, "k").sortBy("k").saveAsTable(dim)
        # disable auto-broadcast so the comparison isolates bucketing
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table(fact).join(spark.table(dim), "k")
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            plain = (
                spark.read.parquet(f"{tmp_path}/wh/fact_{suffix}")
                .join(
                    spark.read.parquet(f"{tmp_path}/wh/dim_{suffix}"), "k"
                )
            )
            pplan = plain._jdf.queryExecution().executedPlan().toString()
            assert pplan.count("Exchange") >= 2, pplan
            # results identical either way
            assert j.count() == plain.count() > 0
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {fact}")
        spark.sql(f"DROP TABLE IF EXISTS {dim}")
        spark.sql("DROP DATABASE IF EXISTS bucketdb")


def test_partitioned_layout_prunes_partitions(spark, tmp_path):
    """Directory-partitioned layout (the parquet-path analogue of an
    Iceberg identity partition spec, e.g. PARTITIONED BY lang): a
    lang-filtered read must prune at the PARTITION level — the filter
    shows up as a PartitionFilter on the scan and the scan reads ONE
    partition directory, never touching the other languages' files.
    This is the third leg of the layout-pruning evidence: min/max
    range clustering (file level), bucketing (shuffle level), and
    identity partitioning (directory level)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    loc = str(tmp_path / "by_lang")
    docs.write.partitionBy("lang").parquet(loc)

    from pyspark.sql import functions as F

    q = spark.read.parquet(loc).filter(F.col("lang") == "en")
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = q._jdf.queryExecution().explainString(jmode)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and re.search(r"lang#\d+ = en", m.group(1)), plan
    # the pruned scan reads exactly the en directory
    n_parts = re.search(r"partition count: (\d+)", plan, re.IGNORECASE)
    if n_parts:  # spark prints it on the scan node's metadata
        assert n_parts.group(1) == "1", plan
    # value parity with the unpartitioned source
    want = docs.filter(F.col("lang") == "en").count()
    assert q.count() == want and want > 0


def test_compact_table_binpacks_and_preserves_content(spark, tmp_path):
    """A fragmented dataset (40 one-row-ish files from tiny appends)
    compacts to the byte-target file count with identical content; a
    keyed compaction also restores disjoint per-file ranges so min/max
    pruning works again after interleaved appends."""
    from mcp_ocr_server_spark.sources.tables import (
        compact_table,
        file_stats,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    loc = str(tmp_path / "frag")
    # simulate many tiny appends with interleaved doc_id ranges
    for lo in range(0, 200, 50):
        from pyspark.sql import functions as F

        (docs.filter((F.col("doc_id") % 200 >= lo)
                     & (F.col("doc_id") % 200 < lo + 50))
         .repartition(10).write.mode("append").parquet(loc))
    want = sorted(r["doc_id"] for r in docs.collect())

    n_before, n_after = compact_table(
        spark, loc, target_file_bytes=1 << 30, cluster_col="doc_id"
    )
    assert n_before >= 20 and n_after < n_before
    got = sorted(r["doc_id"] for r in spark.read.parquet(loc).collect())
    assert got == want
    # disjoint, ordered footer ranges after keyed compaction
    st = file_stats(loc, "doc_id")
    for (f1, _lo1, hi1), (f2, lo2, _hi2) in zip(st, st[1:]):
        assert hi1 < lo2, (f1, f2)
    # no temp/old residue
    import os
    assert not os.path.exists(loc + ".__compact_tmp")
    assert not os.path.exists(loc + ".__compact_old")


def test_compact_table_self_heals_after_crash(spark, tmp_path):
    """Crash between compact_table's two renames leaves the data at
    __compact_old and nothing at `location`; the next invocation must
    restore it, sweep stale artifacts (including a partial tmp), and
    complete the compaction with content intact."""
    import os

    from mcp_ocr_server_spark.sources.tables import compact_table

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    loc = str(tmp_path / "t")
    docs.repartition(8).write.parquet(loc)
    want = sorted(r["doc_id"] for r in docs.collect())

    # simulate the crash window + a stale partial rewrite
    os.rename(loc, loc + ".__compact_old")
    os.makedirs(loc + ".__compact_tmp")

    n_before, n_after = compact_table(spark, loc, target_file_bytes=1 << 30)
    assert n_before >= 8 and n_after < n_before
    got = sorted(r["doc_id"] for r in spark.read.parquet(loc).collect())
    assert got == want
    assert not os.path.exists(loc + ".__compact_tmp")
    assert not os.path.exists(loc + ".__compact_old")


def test_compact_table_zorder_restores_multidim_pruning(spark, tmp_path):
    """Fragmented appends destroy any clustering; compact_table with
    zorder_cols must binpack AND restore useful min/max on BOTH keys
    (the Iceberg rewrite_data_files sort-strategy-zorder analogue)."""
    from mcp_ocr_server_spark.sources.tables import (
        compact_table,
        file_stats,
    )

    n = 40_000
    df = spark.range(n).selectExpr(
        "id AS x", f"cast((id * 2654435761) % {n} AS bigint) AS y"
    )
    loc = str(tmp_path / "frag")
    for chunk in range(4):  # interleaved tiny appends
        df.filter(f"id % 4 = {chunk}").repartition(8) \
          .write.mode("append").parquet(loc)
    want = sorted(r["x"] for r in df.collect())

    import pytest

    with pytest.raises(ValueError):
        compact_table(spark, loc, cluster_col="x", zorder_cols=["x", "y"])

    # target sized so the rewrite keeps >= ~8 files: with only 2, the
    # top Morton bit can split just ONE dimension and the per-dim
    # pruning claim below is vacuous
    n_before, n_after = compact_table(
        spark, loc, target_file_bytes=1 << 15, zorder_cols=["x", "y"]
    )
    assert n_before == 32 and 4 <= n_after < n_before

    def overlapping(col, lo, hi):
        st = file_stats(loc, col)
        return sum(1 for (_f, fl, fh) in st if fl <= hi and fh >= lo), len(st)

    lo, hi = n // 2, n // 2 + n // 8 - 1
    for col in ("x", "y"):
        k, total = overlapping(col, lo, hi)
        assert k < total, (col, k, total)  # SOME pruning on every dim
    got = sorted(r["x"] for r in spark.read.parquet(loc).collect())
    assert got == want


def test_zorder_handles_timestamp_date_and_string_columns(spark, tmp_path):
    """The docstring's own motivating case — cluster by (user, time) —
    must actually run: timestamp/date columns cluster via their epoch
    surrogate and string columns via a lexicographic 60-bit prefix
    (approxQuantile accepts only numerics, so the writer samples the
    surrogate).  Pruning must work on the time dimension, content must
    round-trip, and unsupported types must fail fast with ValueError."""
    import pytest
    from pyspark.sql import functions as F

    from mcp_ocr_server_spark.sources.tables import (
        file_stats,
        write_zorder_clustered,
    )

    n = 20_000
    df = spark.range(n).selectExpr(
        f"cast((id * 2654435761) % {n} AS bigint) AS user_id",
        "timestamp_micros(cast(id * 1000000 AS bigint)) AS event_time",
        "cast(timestamp_micros(cast(id * 86400000000 AS bigint)) AS date)"
        " AS day",
        "concat('https://example.com/', lpad(cast(id AS string), 8, '0'))"
        " AS url",
    )
    loc = str(tmp_path / "zts")
    write_zorder_clustered(df, loc, ["user_id", "event_time"], n_files=16)
    back = spark.read.parquet(loc)
    assert back.count() == n
    # time-slice pruning: files are clustered on event_time too
    stats = file_stats(loc, "event_time")
    assert len(stats) == 16
    lo = df.selectExpr(
        f"timestamp_micros(cast({n // 2} AS bigint) * 1000000) AS t"
    ).collect()[0]["t"]
    hi = df.selectExpr(
        f"timestamp_micros(cast({n // 2 + n // 8 - 1} AS bigint) * 1000000)"
        " AS t"
    ).collect()[0]["t"]
    # parquet stats are tz-aware UTC; Spark collect() yields naive
    # datetimes in the session zone (pinned UTC) — align for comparison
    from datetime import timezone

    lo_utc = lo.replace(tzinfo=timezone.utc)
    hi_utc = hi.replace(tzinfo=timezone.utc)
    n_overlap = sum(
        1 for (_f, fl, fh) in stats if fl <= hi_utc and fh >= lo_utc
    )
    assert n_overlap <= 10, n_overlap
    # value fidelity on a selective time read
    sel = back.filter(F.col("event_time").between(lo, hi)).collect()
    ref = df.filter(F.col("event_time").between(lo, hi)).collect()
    assert sorted(map(tuple, sel)) == sorted(map(tuple, ref))

    # date + string cluster keys: run, round-trip, AND the string
    # dimension must actually cluster despite every url sharing the
    # 'https://example.com/' prefix (the surrogate strips the common
    # prefix — hashing the first 7.5 bytes verbatim would collapse the
    # whole column to one bucket and prune nothing)
    loc2 = str(tmp_path / "zds")
    write_zorder_clustered(df, loc2, ["day", "url"], n_files=8)
    assert spark.read.parquet(loc2).count() == n
    ustats = file_stats(loc2, "url")
    u_lo = f"https://example.com/{n // 2:08d}"
    u_hi = f"https://example.com/{n // 2 + n // 8 - 1:08d}"
    u_overlap = sum(
        1 for (_f, fl, fh) in ustats if fl <= u_hi and fh >= u_lo
    )
    assert u_overlap <= 5, (u_overlap, [(a, b) for _, a, b in ustats])

    # unsupported type fails fast, naming the column
    bad = df.withColumn("arr", F.array(F.lit(1)))
    with pytest.raises(ValueError, match="arr"):
        write_zorder_clustered(bad, str(tmp_path / "zbad"), ["arr"], 4)
