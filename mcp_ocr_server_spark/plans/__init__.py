"""Job plans: end-to-end extraction, checkpoint/resume, metrics."""
