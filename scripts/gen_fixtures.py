"""Generate the committed golden fixtures (FIXTURES.md §2-§3).

Pure-python (no Spark): the corpus is a deterministic function of
(seed, index), so the goldens are stable across machines and Spark
versions and are committed to git.  Regenerate with:

    python scripts/gen_fixtures.py

Outputs (under fixtures/):
  expected_spans.parquet  — golden extraction output for the flagship
                            corpus (CorpusConfig(n_docs=120), FIXTURE_JOB)
  media_meta.parquet      — per-media golden: degradation, byte length,
                            rendered text, analyzer metrics (A1-A4) and
                            suggested pipeline (A5)
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mcp_ocr_server_spark.config import FIXTURE_JOB  # noqa: E402
from mcp_ocr_server_spark.imaging.analyzer import analyze  # noqa: E402
from mcp_ocr_server_spark.imaging.png import decode_png  # noqa: E402
from mcp_ocr_server_spark.sources import synthetic as S  # noqa: E402

FLAGSHIP_CORPUS = S.CorpusConfig(n_docs=120)
FIXTURES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)


def gen_expected_spans() -> pd.DataFrame:
    rows: list[dict] = []
    for i in range(FLAGSHIP_CORPUS.n_docs):
        rows.extend(S.expected_rows(FLAGSHIP_CORPUS, FIXTURE_JOB, i))
    df = pd.DataFrame(
        rows,
        columns=["doc_id", "order", "kind", "media_ref", "text",
                 "confidence", "language", "error_code"],
    )
    df["order"] = df["order"].astype("int32")
    return df


def gen_media_meta() -> pd.DataFrame:
    rows = []
    for j in range(FLAGSHIP_CORPUS.media_universe):
        if not S.media_exists(FLAGSHIP_CORPUS, j):
            continue
        ref, png, deg, true_text = S.media_item(FLAGSHIP_CORPUS, j)
        img = decode_png(png)
        q = analyze(img, FIXTURE_JOB.preprocessing)
        rows.append(
            dict(
                media_ref=ref, degradation=deg, n_bytes=len(png),
                true_text=true_text,
                sharpness=round(q.sharpness, 6),
                contrast=round(q.contrast, 6),
                brightness=round(q.brightness, 6),
                needs_preprocessing=q.needs_preprocessing,
                pipeline=",".join(q.suggested_pipeline),
            )
        )
    df = pd.DataFrame(rows)
    df["n_bytes"] = df["n_bytes"].astype("int64")
    return df


def gen_layout_meta() -> pd.DataFrame:
    from mcp_ocr_server_spark.imaging.layout import layout_summary

    rows = []
    for j in range(FLAGSHIP_CORPUS.media_universe):
        if not S.media_exists(FLAGSHIP_CORPUS, j):
            continue
        ref, png, _deg, _ = S.media_item(FLAGSHIP_CORPUS, j)
        s = layout_summary(decode_png(png))
        rows.append(dict(media_ref=ref, **s))
    df = pd.DataFrame(rows)
    for c in ("n_blocks", "n_lines", "n_words"):
        df[c] = df[c].astype("int64")
    for c in ("first_block_y", "last_block_bottom"):
        df[c] = df[c].astype("Int64")
    return df


def gen_image_features() -> pd.DataFrame:
    """Golden for the multimodal image-features stage: SAME row code
    the Spark UDF runs (multimodal.image_feature_row)."""
    from mcp_ocr_server_spark.functions.multimodal import image_feature_row

    rows = []
    for j in range(FLAGSHIP_CORPUS.media_universe):
        if not S.media_exists(FLAGSHIP_CORPUS, j):
            continue
        ref, png, _deg, _ = S.media_item(FLAGSHIP_CORPUS, j)
        rows.append(image_feature_row(ref, png))
    df = pd.DataFrame(rows)
    for c in ("width", "height"):
        df[c] = df[c].astype("Int64")
    return df


def gen_audio_meta() -> pd.DataFrame:
    """Golden for the audio-features stage over the deterministic WAV
    corpus (multimodal.audio_feature_row — shared with the UDF)."""
    from mcp_ocr_server_spark.functions.multimodal import audio_feature_row

    rows = []
    for j in range(S.N_AUDIO_CLIPS):
        ref, data, kind = S.audio_item(FLAGSHIP_CORPUS, j)
        row = audio_feature_row(ref, data)
        row["kind"] = kind
        rows.append(row)
    df = pd.DataFrame(
        rows, columns=["media_ref", "n_samples", "rms", "peak", "error",
                       "kind"]
    )
    df["n_samples"] = df["n_samples"].astype("Int64")
    return df


def gen_pdf_meta() -> pd.DataFrame:
    """Golden for the born-digital PDF text path over the deterministic
    PDF corpus (pdf.pdf_text_row — shared with the UDF)."""
    from mcp_ocr_server_spark.functions.pdf import pdf_text_row

    rows = []
    for j in range(S.N_PDF_DOCS):
        ref, data, kind = S.pdf_item(FLAGSHIP_CORPUS, j)
        row = pdf_text_row(ref, data, ocr_cfg=FIXTURE_JOB)
        row["kind"] = kind
        rows.append(row)
    df = pd.DataFrame(
        rows, columns=["media_ref", "n_pages", "text", "error", "kind"]
    )
    df["n_pages"] = df["n_pages"].astype("Int64")
    return df


def gen_audio_inventory() -> pd.DataFrame:
    """Golden for the audio container-metadata sniff over the
    deterministic multi-format corpus (multimodal.audio_inventory_row
    — shared with the UDF)."""
    from mcp_ocr_server_spark.functions.multimodal import (
        audio_inventory_row,
    )

    rows = []
    for j in range(S.N_SNIFF_CLIPS):
        ref, data, kind = S.sniff_item(FLAGSHIP_CORPUS, j)
        row = audio_inventory_row(ref, data)
        row["kind"] = kind
        rows.append(row)
    df = pd.DataFrame(
        rows, columns=["media_ref", "format", "codec", "sample_rate",
                       "channels", "duration_s", "pcm_md5", "error",
                       "kind"]
    )
    for c in ("sample_rate", "channels"):
        df[c] = df[c].astype("Int64")
    return df


def gen_warc_goldens() -> tuple[pd.DataFrame, pd.DataFrame]:
    """Goldens for WARC ingestion (warc_record_rows) and the fused
    warc->main-content composition (warc_main_rows) — same row code
    as the Spark UDFs."""
    from mcp_ocr_server_spark.functions.warc import (
        warc_main_rows,
        warc_record_rows,
    )

    recs, mains = [], []
    for j in range(S.N_WARC_FILES):
        ref, data, kind = S.warc_item(FLAGSHIP_CORPUS, j)
        recs.extend(warc_record_rows(ref, data))
        mains.extend(warc_main_rows(ref, data))
    rdf = pd.DataFrame(
        recs, columns=["warc_ref", "rec_idx", "warc_type", "url",
                       "date", "http_status", "mime", "payload_len",
                       "payload_md5", "error"])
    for c in ("rec_idx", "http_status"):
        rdf[c] = rdf[c].astype("Int64")
    rdf["payload_len"] = rdf["payload_len"].astype("Int64")
    mdf = pd.DataFrame(
        mains, columns=["warc_ref", "rec_idx", "url", "main_text",
                        "n_chars", "charset", "charset_source",
                        "error"])
    mdf["rec_idx"] = mdf["rec_idx"].astype("Int64")
    mdf["n_chars"] = mdf["n_chars"].astype("Int64")
    return rdf, mdf


def gen_video_inventory() -> pd.DataFrame:
    """Golden for the video container-metadata sniff over the
    deterministic avi/mp4/webm/garbage corpus
    (multimodal.video_inventory_row — shared with the UDF)."""
    from mcp_ocr_server_spark.functions.multimodal import (
        video_inventory_row,
    )

    rows = []
    for j in range(S.N_VIDEO_SNIFF_CLIPS):
        ref, data, kind = S.video_sniff_item(FLAGSHIP_CORPUS, j)
        row = video_inventory_row(ref, data)
        row["kind"] = kind
        rows.append(row)
    df = pd.DataFrame(
        rows, columns=["media_ref", "container", "codec", "width",
                       "height", "duration_s", "n_frames", "rotation",
                       "error", "kind"]
    )
    for c in ("width", "height", "n_frames", "rotation"):
        df[c] = df[c].astype("Int64")
    return df


def gen_video_meta() -> pd.DataFrame:
    """Golden for the video frame-features stage over the deterministic
    AVI corpus (multimodal.video_feature_rows — shared with the UDF)."""
    from mcp_ocr_server_spark.functions.multimodal import video_feature_rows

    rows = []
    for j in range(S.N_VIDEO_CLIPS):
        ref, data, kind = S.video_item(FLAGSHIP_CORPUS, j)
        for row in video_feature_rows(ref, data):
            row["kind"] = kind
            rows.append(row)
    df = pd.DataFrame(
        rows, columns=["media_ref", "frame_idx", "width", "height",
                       "sharpness", "contrast", "brightness", "error",
                       "kind"]
    )
    for c in ("frame_idx", "width", "height"):
        df[c] = df[c].astype("Int64")
    return df


INTERLEAVED_CORPUS = S.INTERLEAVED_CORPUS


def gen_interleaved_spans() -> pd.DataFrame:
    """Golden for the four-kind interleaved corpus (text/html/image/pdf
    in one document stream): SAME expected_rows path as the flagship
    golden, now exercising the pdf branch (golden_pdf shares
    pdf_text_row with the pipeline)."""
    rows: list[dict] = []
    for i in range(INTERLEAVED_CORPUS.n_docs):
        rows.extend(S.expected_rows(INTERLEAVED_CORPUS, FIXTURE_JOB, i))
    df = pd.DataFrame(
        rows,
        columns=["doc_id", "order", "kind", "media_ref", "text",
                 "confidence", "language", "error_code"],
    )
    df["order"] = df["order"].astype("int32")
    return df


def gen_word_boxes() -> pd.DataFrame:
    """Golden for the K11 word-box query: SAME row code the Spark
    stage runs (media_ocr.word_box_rows) over the flagship media."""
    from mcp_ocr_server_spark.operators.media_ocr import word_box_rows

    rows: list[dict] = []
    for j in range(FLAGSHIP_CORPUS.media_universe):
        if not S.media_exists(FLAGSHIP_CORPUS, j):
            continue
        ref, png, _deg, _ = S.media_item(FLAGSHIP_CORPUS, j)
        rows.extend(word_box_rows(ref, png, FIXTURE_JOB))
    df = pd.DataFrame(
        rows, columns=["media_ref", "word_idx", "x", "y", "width",
                       "height", "text", "confidence"]
    )
    for c in ("word_idx", "x", "y", "width", "height"):
        df[c] = df[c].astype("int64")
    return df


def gen_subtitle_cues() -> pd.DataFrame:
    """Expected subtitle cues — the writer's own input cue list (a
    true round-trip; the parser never runs here) plus the error/empty
    contracts the row function promises."""
    rows = []
    for j in range(S.N_SUBTITLE_FILES):
        ref, _data, kind, cues = S.subtitle_item(FLAGSHIP_CORPUS, j)
        fmt = ("srt" if kind.startswith("srt")
               else "vtt" if kind.startswith("vtt")
               else "ttml" if kind.startswith("ttml") else None)
        if kind in ("bad_ts", "garbage"):
            rows.append(dict(media_ref=ref, format=None, cue_idx=None,
                             start_s=None, end_s=None, text=None,
                             has_error=True))
        elif not cues:
            rows.append(dict(media_ref=ref, format=fmt, cue_idx=None,
                             start_s=None, end_s=None, text=None,
                             has_error=False))
        else:
            for i, (a, b, text) in enumerate(cues):
                rows.append(dict(media_ref=ref, format=fmt, cue_idx=i,
                                 start_s=a, end_s=b, text=text,
                                 has_error=False))
    df = pd.DataFrame(
        rows, columns=["media_ref", "format", "cue_idx", "start_s",
                       "end_s", "text", "has_error"]
    )
    df["cue_idx"] = df["cue_idx"].astype("Int64")
    for c in ("format", "text"):
        df[c] = df[c].astype("string")
    return df


def gen_html_meta() -> pd.DataFrame:
    """Expected html_metadata values — constructed INDEPENDENTLY by
    the corpus generator (never by running the extractor), so the
    query's parity is a true round-trip."""
    rows = []
    for j in range(S.N_HTML_META_DOCS):
        (pid, cls, _html, title, desc, canon, og_t, og_ty, lang,
         ld, n_meta) = S.html_meta_item(FLAGSHIP_CORPUS, j)
        rows.append(dict(
            page_id=pid, cls=cls, title=title, description=desc,
            canonical=canon, og_title=og_t, og_type=og_ty, lang=lang,
            jsonld_types=ld, n_meta=n_meta,
        ))
    df = pd.DataFrame(rows)
    df["n_meta"] = df["n_meta"].astype("Int64")
    for c in ("title", "description", "canonical", "og_title",
              "og_type", "lang", "jsonld_types"):
        df[c] = df[c].astype("string")
    return df


def gen_pdf_info() -> pd.DataFrame:
    """Golden for the document-metadata query: SAME row code the
    Spark stage runs (functions/pdf.pdf_info_rows) over the pdf
    corpus."""
    from mcp_ocr_server_spark.functions.pdf import pdf_info_rows

    rows = []
    for j in range(S.N_PDF_DOCS):
        ref, data, _kind = S.pdf_item(FLAGSHIP_CORPUS, j)
        rows.extend(pdf_info_rows(ref, data))
    df = pd.DataFrame(
        rows, columns=["media_ref", "title", "author", "subject",
                       "producer", "created", "n_pages", "error"]
    )
    df["n_pages"] = df["n_pages"].astype("Int64")
    for c in ("title", "author", "subject", "producer", "created",
              "error"):
        df[c] = df[c].astype("string")  # all-null cols must stay VARCHAR
    return df


def gen_pdf_layout() -> pd.DataFrame:
    """Golden for the layout query: SAME row code the Spark stage runs
    (functions/pdf.pdf_layout_rows) over the layout-pdf corpus."""
    from mcp_ocr_server_spark.functions.pdf import pdf_layout_rows

    rows = []
    for j in range(S.N_LAYOUT_PDFS):
        ref, data, _kind = S.layout_pdf_item(FLAGSHIP_CORPUS, j)
        rows.extend(pdf_layout_rows(ref, data))
    df = pd.DataFrame(
        rows, columns=["media_ref", "page_idx", "line_idx", "x", "y",
                       "text", "error"]
    )
    for c in ("page_idx", "line_idx"):
        df[c] = df[c].astype("Int64")
    return df


def gen_audio_tags() -> pd.DataFrame:
    """Golden for the embedded-tag query: SAME row code the Spark
    stage runs (multimodal.audio_tags_row) over the sniff corpus."""
    from mcp_ocr_server_spark.functions.multimodal import audio_tags_row

    rows = []
    for j in range(S.N_SNIFF_CLIPS):
        ref, data, _kind = S.sniff_item(FLAGSHIP_CORPUS, j)
        rows.append(audio_tags_row(ref, data))
    df = pd.DataFrame(
        rows, columns=["media_ref", "format", "vendor", "title",
                       "artist", "album", "n_tags", "error"]
    )
    df["n_tags"] = df["n_tags"].astype("Int64")
    return df


def gen_pdf_scan_meta() -> pd.DataFrame:
    """Golden for the scanned-PDF OCR query: SAME row code the Spark
    stage runs (media_ocr.scan_pdf_rows) over the scan-pdf corpus."""
    from mcp_ocr_server_spark.operators.media_ocr import scan_pdf_rows

    rows: list[dict] = []
    for j in range(S.N_SCAN_PDFS):
        ref, data, _kind, _true = S.scan_pdf_item(FLAGSHIP_CORPUS, j)
        rows.extend(scan_pdf_rows(ref, data, FIXTURE_JOB))
    df = pd.DataFrame(
        rows, columns=["media_ref", "page_idx", "text", "confidence",
                       "error"]
    )
    df["page_idx"] = df["page_idx"].astype("Int64")
    return df


def gen_pdf_render_meta() -> pd.DataFrame:
    """Golden for the compositing-PDF OCR query: SAME row code the
    Spark stage runs (media_ocr.render_pdf_rows — the content-stream
    renderer path) over the composite-pdf corpus."""
    from mcp_ocr_server_spark.operators.media_ocr import render_pdf_rows

    rows: list[dict] = []
    for j in range(S.N_COMP_PDFS):
        ref, data, _kind, _true = S.comp_pdf_item(FLAGSHIP_CORPUS, j)
        rows.extend(render_pdf_rows(ref, data, FIXTURE_JOB))
    df = pd.DataFrame(
        rows, columns=["media_ref", "page_idx", "text", "confidence",
                       "error"]
    )
    df["page_idx"] = df["page_idx"].astype("Int64")
    return df


def gen_sitemap_urls() -> pd.DataFrame:
    """Golden for the sitemap-ingestion query: SAME row code the Spark
    stage runs (functions/sitemap.sitemap_rows) over the sitemap
    corpus."""
    from mcp_ocr_server_spark.functions.sitemap import sitemap_rows

    rows: list[dict] = []
    for j in range(S.N_SITEMAPS):
        ref, data, _kind = S.sitemap_item(FLAGSHIP_CORPUS, j)
        rows.extend(sitemap_rows(ref, data))
    df = pd.DataFrame(
        rows, columns=["media_ref", "entry_idx", "kind", "loc",
                       "lastmod", "changefreq", "priority", "error"]
    )
    df["entry_idx"] = df["entry_idx"].astype("Int64")
    df["priority"] = df["priority"].astype("float64")
    return df


def gen_feed_entries() -> pd.DataFrame:
    """Golden for the feed-ingestion query: SAME row code the Spark
    stage runs (functions/feeds.feed_rows)."""
    from mcp_ocr_server_spark.functions.feeds import feed_rows

    rows: list[dict] = []
    for j in range(S.N_FEEDS):
        ref, data, _kind = S.feed_item(FLAGSHIP_CORPUS, j)
        rows.extend(feed_rows(ref, data))
    df = pd.DataFrame(
        rows, columns=["media_ref", "entry_idx", "kind", "title",
                       "link", "published", "guid", "error"]
    )
    df["entry_idx"] = df["entry_idx"].astype("Int64")
    return df


def gen_warc_redirects() -> pd.DataFrame:
    """Golden for the redirect-edge query: SAME row code the Spark
    stage runs (functions/warc.warc_redirect_rows)."""
    from mcp_ocr_server_spark.functions.warc import warc_redirect_rows

    rows: list[dict] = []
    for j in range(S.N_WARC_FILES):
        ref, data, _kind = S.warc_item(FLAGSHIP_CORPUS, j)
        rows.extend(warc_redirect_rows(ref, data))
    df = pd.DataFrame(
        rows, columns=["warc_ref", "rec_idx", "url", "http_status",
                       "location", "error"]
    )
    df["rec_idx"] = df["rec_idx"].astype("Int64")
    df["http_status"] = df["http_status"].astype("Int64")
    return df


def gen_robots_rules() -> pd.DataFrame:
    """Golden for the robots.txt parse query: SAME row code the Spark
    stage runs (functions/robots.robots_rows) over the robots
    corpus."""
    from mcp_ocr_server_spark.functions.robots import robots_rows

    rows: list[dict] = []
    for j in range(S.N_ROBOTS):
        ref, data, _kind = S.robots_item(FLAGSHIP_CORPUS, j)
        rows.extend(robots_rows(ref, data))
    df = pd.DataFrame(
        rows, columns=["media_ref", "row_idx", "kind", "agent",
                       "allow", "pattern", "regex", "sitemap_url",
                       "error"]
    )
    df["row_idx"] = df["row_idx"].astype("Int64")
    df["allow"] = df["allow"].astype("boolean")
    return df


def gen_scan_formats() -> tuple[pd.DataFrame, pd.DataFrame]:
    """Goldens for the scan-format corpus (BMP/PNM/TIFF — the rest of
    the imdecode input matrix): inventory rows and per-page OCR rows,
    SAME row code the Spark stages run (media_ocr.scan_inventory_row /
    scan_image_ocr_rows)."""
    from mcp_ocr_server_spark.operators.media_ocr import (
        scan_image_ocr_rows,
        scan_inventory_row,
    )

    inv_rows: list[dict] = []
    ocr_rows: list[dict] = []
    for j in range(S.N_SCAN_IMAGES):
        ref, data, _kind, _truths = S.scan_format_item(FLAGSHIP_CORPUS, j)
        inv_rows.append(scan_inventory_row(ref, data))
        ocr_rows.extend(scan_image_ocr_rows(ref, data, FIXTURE_JOB))
    inv = pd.DataFrame(
        inv_rows, columns=["media_ref", "format", "n_pages", "width",
                           "height", "channels", "error"]
    )
    for c in ("n_pages", "width", "height", "channels"):
        inv[c] = inv[c].astype("Int64")
    ocr = pd.DataFrame(
        ocr_rows, columns=["media_ref", "page_idx", "text", "confidence",
                           "error"]
    )
    ocr["page_idx"] = ocr["page_idx"].astype("Int64")
    return inv, ocr


def gen_b64_media() -> pd.DataFrame:
    """S2 base64-ingestion golden: (media_ref, data_b64, corrupted)."""
    rows = []
    for j in range(FLAGSHIP_CORPUS.media_universe):
        if not S.media_exists(FLAGSHIP_CORPUS, j):
            continue
        ref, b64, corrupted = S.b64_media_item(FLAGSHIP_CORPUS, j)
        rows.append(dict(media_ref=ref, data_b64=b64, corrupted=corrupted))
    return pd.DataFrame(rows)


def gen_html_raw() -> pd.DataFrame:
    """Raw html spans of the flagship corpus (doc_id, order, html) —
    the oracle-side input for link extraction (q_html_links): DuckDB
    cannot run the corpus generator, so the raw html is committed and
    the Spark side must re-derive byte-identical html live."""
    rows = []
    for i in range(FLAGSHIP_CORPUS.n_docs):
        doc_id, spans = S.doc_item(FLAGSHIP_CORPUS, i)
        for order, sp in enumerate(spans):
            if sp["kind"] == "html":
                rows.append(dict(doc_id=doc_id, order=order, html=sp["text"]))
    df = pd.DataFrame(rows, columns=["doc_id", "order", "html"])
    df["order"] = df["order"].astype("int32")
    return df


def gen_html_eval() -> pd.DataFrame:
    """Per-document golden for the boilerplate-classifier operating-
    point eval (q_html_main_eval): token precision/recall rows from
    the SAME row function the Spark UDF runs
    (text_extract.main_content_eval_row) over the adversarial html
    corpus (synthetic.html_eval_item)."""
    from mcp_ocr_server_spark.functions.text_extract import (
        main_content_eval_row,
    )

    from mcp_ocr_server_spark.queries import HTML_EVAL_COLS

    rows = []
    for j in range(S.N_HTML_EVAL_DOCS):
        doc_id, cls, html_doc, golden = S.html_eval_item(FLAGSHIP_CORPUS, j)
        rows.append(main_content_eval_row(doc_id, cls, html_doc, golden))
    return pd.DataFrame(rows, columns=HTML_EVAL_COLS)


def gen_html_md() -> pd.DataFrame:
    """Golden for the DOM->Markdown renderer (q_html_main_markdown):
    exactness rows from the SAME row function the Spark UDF runs
    (markdown.markdown_eval_row) over the structured corpus
    (synthetic.html_md_item), whose golden markdown the generator
    constructs independently of the renderer."""
    from mcp_ocr_server_spark.functions.markdown import markdown_eval_row

    rows = []
    for j in range(S.N_HTML_MD_DOCS):
        doc_id, cls, html_doc, golden = S.html_md_item(FLAGSHIP_CORPUS, j)
        rows.append(markdown_eval_row(doc_id, cls, html_doc, golden))
    return pd.DataFrame(
        rows, columns=["doc_id", "cls", "exact", "md_md5", "n_blocks",
                       "n_chars"])


def gen_docs_jsonl() -> int:
    """Deterministic JSONL document file (the LLM-corpus interchange
    format) with injected messes a robust ingester must classify:
    syntactically-corrupt lines (indices 13, 37), lines missing the
    `lang` field (every index % 11 == 5), and one line carrying an
    unknown extra field (index 20, dropped by schema on read).  Valid
    text is word soup drawn by md5(i) — pure function of the index,
    stable across machines.  Consumed by queries.q_jsonl_ingest and
    its DuckDB oracle (which re-classifies the RAW lines with JSON
    functions, independent of Spark's json reader)."""
    import hashlib
    import json

    words = ["spark", "table", "scan", "merge", "row", "hash",
             "window", "batch", "sort", "key"]
    lines: list[str] = []
    for i in range(60):
        h = hashlib.md5(f"jsonl:{i}".encode()).hexdigest()
        text = " ".join(
            words[int(h[j], 16) % len(words)] for j in range(8 + i % 5)
        )
        rec = {
            "doc_id": i,
            "text": text,
            "lang": ["en", "es", "fr", "de"][i % 4],
            "source": f"src{i % 7}",
        }
        if i % 11 == 5:
            del rec["lang"]
        if i == 20:
            rec["extra_field"] = "ignored-by-schema"
        line = json.dumps(rec, separators=(",", ":"))
        if i in (13, 37):
            line = line[: len(line) // 2] + "<corrupt"  # truncated JSON
        lines.append(line)
    path = os.path.join(FIXTURES_DIR, "docs.jsonl")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return len(lines)


def main() -> None:
    os.makedirs(FIXTURES_DIR, exist_ok=True)
    spans = gen_expected_spans()
    spans.to_parquet(os.path.join(FIXTURES_DIR, "expected_spans.parquet"), index=False)
    meta = gen_media_meta()
    meta.to_parquet(os.path.join(FIXTURES_DIR, "media_meta.parquet"), index=False)
    layout = gen_layout_meta()
    layout.to_parquet(os.path.join(FIXTURES_DIR, "layout_meta.parquet"), index=False)
    b64 = gen_b64_media()
    b64.to_parquet(os.path.join(FIXTURES_DIR, "b64_media.parquet"), index=False)
    imgf = gen_image_features()
    imgf.to_parquet(
        os.path.join(FIXTURES_DIR, "image_features.parquet"), index=False
    )
    audio = gen_audio_meta()
    audio.to_parquet(os.path.join(FIXTURES_DIR, "audio_meta.parquet"), index=False)
    pdfm = gen_pdf_meta()
    pdfm.to_parquet(os.path.join(FIXTURES_DIR, "pdf_meta.parquet"), index=False)
    scan = gen_pdf_scan_meta()
    scan.to_parquet(
        os.path.join(FIXTURES_DIR, "pdf_scan_meta.parquet"), index=False
    )
    rend = gen_pdf_render_meta()
    rend.to_parquet(
        os.path.join(FIXTURES_DIR, "pdf_render_meta.parquet"), index=False
    )
    print(f"pdf_scan_meta: {len(scan)} rows"
          f" ({int(scan.error.notna().sum())} errors)")
    print(f"pdf_render_meta: {len(rend)} rows"
          f" ({int(rend.error.notna().sum())} errors)")
    smap = gen_sitemap_urls()
    smap.to_parquet(
        os.path.join(FIXTURES_DIR, "sitemap_urls.parquet"), index=False
    )
    print(f"sitemap_urls: {len(smap)} rows"
          f" ({int(smap.error.notna().sum())} errors)")
    robo = gen_robots_rules()
    robo.to_parquet(
        os.path.join(FIXTURES_DIR, "robots_rules.parquet"), index=False
    )
    print(f"robots_rules: {len(robo)} rows"
          f" ({int(robo.error.notna().sum())} errors)")
    wred = gen_warc_redirects()
    wred.to_parquet(
        os.path.join(FIXTURES_DIR, "warc_redirects.parquet"), index=False
    )
    print(f"warc_redirects: {len(wred)} rows"
          f" ({int(wred.error.notna().sum())} errors)")
    feed = gen_feed_entries()
    feed.to_parquet(
        os.path.join(FIXTURES_DIR, "feed_entries.parquet"), index=False
    )
    print(f"feed_entries: {len(feed)} rows"
          f" ({int(feed.error.notna().sum())} errors)")
    sinv, socr = gen_scan_formats()
    sinv.to_parquet(
        os.path.join(FIXTURES_DIR, "scan_inventory.parquet"), index=False
    )
    socr.to_parquet(
        os.path.join(FIXTURES_DIR, "scan_ocr.parquet"), index=False
    )
    print(f"scan_inventory: {len(sinv)} rows"
          f" ({int(sinv.error.notna().sum())} errors);"
          f" scan_ocr: {len(socr)} rows")
    atags = gen_audio_tags()
    atags.to_parquet(
        os.path.join(FIXTURES_DIR, "audio_tags.parquet"), index=False
    )
    print(f"audio_tags: {len(atags)} rows"
          f" ({int(atags.error.notna().sum())} errors;"
          f" tagged {int(atags.n_tags.fillna(0).gt(0).sum())})")
    lay = gen_pdf_layout()
    lay.to_parquet(
        os.path.join(FIXTURES_DIR, "pdf_layout.parquet"), index=False
    )
    print(f"pdf_layout: {len(lay)} rows"
          f" ({int(lay.error.notna().sum())} errors)")
    pinfo = gen_pdf_info()
    pinfo.to_parquet(
        os.path.join(FIXTURES_DIR, "pdf_info.parquet"), index=False
    )
    print(f"pdf_info: {len(pinfo)} rows"
          f" ({int(pinfo.error.notna().sum())} errors;"
          f" titled {int(pinfo.title.notna().sum())})")
    subs = gen_subtitle_cues()
    subs.to_parquet(
        os.path.join(FIXTURES_DIR, "subtitle_cues.parquet"),
        index=False
    )
    print(f"subtitle_cues: {len(subs)} rows"
          f" ({int(subs.has_error.sum())} errors)")
    hmeta = gen_html_meta()
    hmeta.to_parquet(
        os.path.join(FIXTURES_DIR, "html_meta.parquet"), index=False
    )
    print(f"html_meta: {len(hmeta)} rows,"
          f" classes {hmeta.cls.value_counts().to_dict()}")
    vid = gen_video_meta()
    vid.to_parquet(os.path.join(FIXTURES_DIR, "video_meta.parquet"), index=False)
    inv = gen_audio_inventory()
    inv.to_parquet(
        os.path.join(FIXTURES_DIR, "audio_inventory.parquet"), index=False
    )
    print(f"audio_inventory: {len(inv)} rows"
          f" ({int(inv.error.notna().sum())} errors;"
          f" formats {inv['format'].value_counts(dropna=True).to_dict()})")
    vinv = gen_video_inventory()
    vinv.to_parquet(
        os.path.join(FIXTURES_DIR, "video_inventory.parquet"), index=False
    )
    print(f"video_inventory: {len(vinv)} rows"
          f" ({int(vinv.error.notna().sum())} errors;"
          f" containers"
          f" {vinv['container'].value_counts(dropna=True).to_dict()})")
    wrec, wmain = gen_warc_goldens()
    wrec.to_parquet(
        os.path.join(FIXTURES_DIR, "warc_records.parquet"), index=False
    )
    wmain.to_parquet(
        os.path.join(FIXTURES_DIR, "warc_main.parquet"), index=False
    )
    print(f"warc: {len(wrec)} records"
          f" ({int(wrec.error.notna().sum())} errors;"
          f" types {wrec.warc_type.value_counts(dropna=True).to_dict()}),"
          f" {len(wmain)} main-content rows")
    print(f"video_meta: {len(vid)} rows over {vid.media_ref.nunique()}"
          f" clips ({int(vid.error.notna().sum())} errors;"
          f" kinds {vid.kind.value_counts().to_dict()})")
    words = gen_word_boxes()
    words.to_parquet(
        os.path.join(FIXTURES_DIR, "word_boxes.parquet"), index=False
    )
    inter = gen_interleaved_spans()
    inter.to_parquet(
        os.path.join(FIXTURES_DIR, "interleaved_spans.parquet"), index=False
    )
    hraw = gen_html_raw()
    hraw.to_parquet(os.path.join(FIXTURES_DIR, "html_raw.parquet"), index=False)
    print(f"html_raw: {len(hraw)} rows")
    heval = gen_html_eval()
    heval.to_parquet(
        os.path.join(FIXTURES_DIR, "html_eval.parquet"), index=False
    )
    print(f"html_eval: {len(heval)} rows,"
          f" classes {heval.cls.value_counts().to_dict()}")
    hmd = gen_html_md()
    hmd.to_parquet(
        os.path.join(FIXTURES_DIR, "html_md.parquet"), index=False
    )
    print(f"html_md: {len(hmd)} rows, exact {int(hmd.exact.sum())}"
          f"/{len(hmd)}, classes {hmd.cls.value_counts().to_dict()}")
    print(f"docs.jsonl: {gen_docs_jsonl()} lines")
    print(f"interleaved_spans: {len(inter)} rows,"
          f" kinds {inter.kind.value_counts().to_dict()},"
          f" errors {inter.error_code.value_counts(dropna=True).to_dict()}")
    print(f"expected_spans: {len(spans)} rows; media_meta: {len(meta)} rows;"
          f" layout_meta: {len(layout)} rows; b64_media: {len(b64)} rows"
          f" ({int(b64.corrupted.sum())} corrupted)")
    print(f"word_boxes: {len(words)} rows over"
          f" {words.media_ref.nunique()} media")
    print(f"image_features: {len(imgf)} rows"
          f" ({int(imgf.error.notna().sum())} errors);"
          f" audio_meta: {len(audio)} rows"
          f" ({int(audio.error.notna().sum())} errors);"
          f" pdf_meta: {len(pdfm)} rows"
          f" ({int(pdfm.error.notna().sum())} errors)")
    print("error codes:", spans.error_code.value_counts(dropna=True).to_dict())
    print("degradations:", meta.degradation.value_counts().to_dict())


if __name__ == "__main__":
    main()
