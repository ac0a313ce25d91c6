"""Numpy-only raster imaging core.

The reference delegates raster math to OpenCV via CGo
(internal/preprocessing/preprocessor.go, analyzer.go).  This container
ships no OpenCV/Pillow, so every kernel is reimplemented in pure
numpy from public algorithm descriptions — the semantics (thresholds,
defaults, guard conditions) mirror the reference exactly; the
implementations do not.
"""
