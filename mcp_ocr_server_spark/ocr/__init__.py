"""OCR engines behind the reference's Engine seam (engine.go:9-21)."""
