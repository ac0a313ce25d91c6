"""Dataflow operators: media OCR stage, partitioning, span routing."""
