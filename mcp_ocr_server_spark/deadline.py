"""Cooperative per-image deadline shared by preprocessing and OCR (P4).

The reference enforces its 30 s/image budget inside the OCR client call
(tesseract.go:94-138); this engine runs the (now costlier) preprocessing
kernels in the same task, so the SAME absolute `time.monotonic()`
deadline is threaded through every unbounded kernel loop — NL-means
offset loop, Canny hysteresis, the Hough chunk walker — and the engine
band loop.  A pathological page raises `DeadlineExceeded` from whichever
stage it wedges in, and the mapInPandas stage converts that into a
TIMEOUT error row instead of stalling the task (in local mode nothing
else can interrupt it — speculation is cluster-only, session.py).

Lives in its own module so `imaging/` need not import `ocr/`.
"""

from __future__ import annotations

import time


class DeadlineExceeded(Exception):
    """Raised when the cooperative per-image deadline passes."""


def check_deadline(deadline: float | None, stage: str) -> None:
    """Raise DeadlineExceeded if the absolute monotonic deadline passed.

    Call between bounded units of work (a Hough chunk, an NL-means
    offset row, a hysteresis sweep) — each unit must itself be small
    relative to the budget for the check to be effective.
    """
    if deadline is not None and time.monotonic() > deadline:
        raise DeadlineExceeded(f"{stage}: deadline exceeded")
