"""mcp_ocr_server_spark — a from-scratch PySpark-native corpus-scale
extraction engine with the capabilities of Ricardo-M-L/mcp-ocr-server.

The reference (/root/reference, Go + Tesseract/OpenCV via CGo) is a
per-image MCP request/response service.  This package re-expresses the
same computations — adaptive image preprocessing, OCR decode, content-
hash memoization, fail-soft batch fan-out — as vectorized, partition-
parallel DataFrame stages over tables of interleaved text + media
documents, and adds the corpus-scale operations a training-data
pipeline needs (dedup, similarity search, text quality analysis).

Nothing here is a port: the architecture is DataFrame/Catalyst-first,
with numpy/pandas-UDF kernels only where Spark's built-in operators
cannot express the semantics (per-image raster math, OCR decode).
"""

__version__ = "0.1.0"
