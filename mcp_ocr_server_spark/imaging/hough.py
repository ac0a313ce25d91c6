"""K5 reference-parity skew estimator: Canny -> HoughLinesP -> median.

From-scratch numpy implementation of the reference's live deskew
estimator chain (internal/preprocessing/analyzer.go:169-232):

  CalculateSkewAngle:
    Canny(img, 50, 150)                           analyzer.go:172-174
    HoughLinesP(rho=1, theta=pi/180, thr=100)     analyzer.go:177-179
      (gocv 5-arg form => minLineLength=0, maxLineGap=0)
    < 10 lines                        => 0.0      analyzer.go:181-183
    angle = atan2(y2-y1, x2-x1) deg, keep |a|<45  analyzer.go:186-198
    exact median; even count => mean of middle 2  analyzer.go:209-232

The building blocks are textbook algorithms re-derived from the public
literature (Canny 1986; Matas/Galambos/Kittler progressive
probabilistic Hough 2000) — not ports of OpenCV internals.  Two
deliberate divergences from OpenCV, documented for the parity audit:

- OpenCV's progressive probabilistic Hough visits edge points in
  RANDOM order (cv::RNG); we visit in deterministic scan order so the
  estimator is reproducible across runs/executors (a hard requirement
  for content-hash memoization and committed goldens).
- Hysteresis/NMS use float Sobel gradients rather than OpenCV's
  fixed-point approximations, so edge maps can differ by a pixel at
  threshold boundaries.

Guard semantics and the median are literal.
"""

from __future__ import annotations

import math

import numpy as np

# --------------------------------------------------------------------------
# Canny edge detector (aperture-3 Sobel, L1 gradient norm — OpenCV's
# defaults for Canny(img, 50, 150) with L2gradient=false).


def _sobel3(gray: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    g = gray.astype(np.float64)
    p = np.pad(g, 1, mode="reflect")
    # separable Sobel: smooth [1 2 1], diff [-1 0 1]
    gx = (
        (p[:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:])
        - (p[:-2, :-2] + 2 * p[1:-1, :-2] + p[2:, :-2])
    )
    gy = (
        (p[2:, :-2] + 2 * p[2:, 1:-1] + p[2:, 2:])
        - (p[:-2, :-2] + 2 * p[:-2, 1:-1] + p[:-2, 2:])
    )
    return gx, gy


def canny(gray: np.ndarray, lo: float = 50.0, hi: float = 150.0) -> np.ndarray:
    """Boolean edge map: Sobel -> 4-direction NMS -> hysteresis."""
    gx, gy = _sobel3(gray)
    mag = np.abs(gx) + np.abs(gy)  # L1 norm (OpenCV L2gradient=false)

    # non-maximum suppression, gradient direction quantized to 4 sectors
    # via tangent comparisons (tan 22.5 deg = 0.4142, tan 67.5 = 2.4142)
    ax, ay = np.abs(gx), np.abs(gy)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(ax > 0, ay / np.maximum(ax, 1e-30), np.inf)
    horiz = t < math.tan(math.radians(22.5))          # gradient ~ horizontal
    vert = t > math.tan(math.radians(67.5))           # gradient ~ vertical
    diag = ~horiz & ~vert
    diag_main = diag & ((gx * gy) > 0)                # 45 deg gradient
    diag_anti = diag & ~diag_main                     # 135 deg gradient

    m = np.pad(mag, 1, mode="constant")
    c = m[1:-1, 1:-1]
    keep = np.zeros_like(c, dtype=bool)
    keep |= horiz & (c >= m[1:-1, :-2]) & (c >= m[1:-1, 2:])
    keep |= vert & (c >= m[:-2, 1:-1]) & (c >= m[2:, 1:-1])
    keep |= diag_main & (c >= m[:-2, :-2]) & (c >= m[2:, 2:])
    keep |= diag_anti & (c >= m[:-2, 2:]) & (c >= m[2:, :-2])

    strong = keep & (mag >= hi)
    weak = keep & (mag >= lo) & ~strong

    # hysteresis: weak pixels 8-connected to strong become edges;
    # iterate a bounded flood (numpy-only dilation) until stable
    edges = strong.copy()
    for _ in range(max(gray.shape)):
        e = np.pad(edges, 1, mode="constant")
        grown = (
            e[:-2, :-2] | e[:-2, 1:-1] | e[:-2, 2:]
            | e[1:-1, :-2] | e[1:-1, 2:]
            | e[2:, :-2] | e[2:, 1:-1] | e[2:, 2:]
        )
        new = edges | (weak & grown)
        if new.sum() == edges.sum():
            break
        edges = new
    return edges


# --------------------------------------------------------------------------
# Progressive probabilistic Hough transform (Matas et al. 2000), the
# algorithm behind cv::HoughLinesP — deterministic scan-order variant.


def hough_lines_p(
    edges: np.ndarray,
    rho_res: float = 1.0,
    theta_res: float = math.pi / 180.0,
    threshold: int = 100,
    min_line_length: int = 0,
    max_line_gap: int = 0,
    max_lines: int = 2000,
) -> list[tuple[int, int, int, int]]:
    """Line segments (x1, y1, x2, y2) from a boolean edge map."""
    h, w = edges.shape
    n_theta = int(round(math.pi / theta_res))
    thetas = np.arange(n_theta) * theta_res
    cos_t = np.cos(thetas)
    sin_t = np.sin(thetas)
    max_rho = int(math.ceil((h + w) / rho_res))  # rho in [-max_rho, max_rho]
    acc = np.zeros((n_theta, 2 * max_rho + 1), dtype=np.int32)

    mask = edges.copy()
    ys, xs = np.nonzero(mask)
    order = np.lexsort((xs, ys))  # deterministic scan order
    pts = list(zip(xs[order].tolist(), ys[order].tolist()))

    out: list[tuple[int, int, int, int]] = []
    for x, y in pts:
        if not mask[y, x]:
            continue  # consumed by an earlier segment walk
        # vote
        rhos = np.round((x * cos_t + y * sin_t) / rho_res).astype(int) + max_rho
        acc[np.arange(n_theta), rhos] += 1
        votes = acc[np.arange(n_theta), rhos]
        k = int(np.argmax(votes))
        if votes[k] < threshold:
            continue
        # walk the line through (x, y) at angle theta_k in both
        # directions, consuming edge pixels, tolerating max_line_gap
        ct, st = cos_t[k], sin_t[k]
        # line direction (unit): perpendicular to the normal (ct, st)
        dx, dy = -st, ct
        if abs(dx) >= abs(dy):
            step_x, step_y = (1.0 if dx > 0 else -1.0), dy / abs(dx)
        else:
            step_x, step_y = dx / abs(dy), (1.0 if dy > 0 else -1.0)
        ends = []
        for sgn in (1.0, -1.0):
            cx, cy = float(x), float(y)
            lx, ly = x, y
            gap = 0
            while True:
                cx += sgn * step_x
                cy += sgn * step_y
                ix, iy = int(round(cx)), int(round(cy))
                if ix < 0 or ix >= w or iy < 0 or iy >= h:
                    break
                if mask[iy, ix]:
                    lx, ly = ix, iy
                    gap = 0
                else:
                    gap += 1
                    if gap > max_line_gap:
                        break
            ends.append((lx, ly))
        (x1, y1), (x2, y2) = ends
        # consume the segment's pixels and cancel their votes
        n_steps = max(abs(x2 - x1), abs(y2 - y1))
        for i in range(n_steps + 1):
            f = i / max(n_steps, 1)
            ix = int(round(x1 + f * (x2 - x1)))
            iy = int(round(y1 + f * (y2 - y1)))
            if mask[iy, ix]:
                mask[iy, ix] = False
                r = (
                    np.round((ix * cos_t + iy * sin_t) / rho_res).astype(int)
                    + max_rho
                )
                np.subtract.at(acc, (np.arange(n_theta), r), 1)
        if max(abs(x2 - x1), abs(y2 - y1)) >= min_line_length:
            out.append((x1, y1, x2, y2))
            if len(out) >= max_lines:
                break
    return out


# --------------------------------------------------------------------------
# CalculateSkewAngle parity (analyzer.go:169-206) + calculateMedian
# (analyzer.go:209-232).


def calculate_median(values: list[float]) -> float:
    """Exact reference semantics: even count => mean of middle two."""
    if not values:
        return 0.0
    s = sorted(values)
    mid = len(s) // 2
    if len(s) % 2 == 0:
        return (s[mid - 1] + s[mid]) / 2.0
    return s[mid]


def skew_angle_hough(gray: np.ndarray) -> float:
    """Skew estimate in degrees, reference guard semantics literal:
    <10 Hough lines => 0.0; only |angle| < 45 deg lines count; median."""
    edges = canny(gray, 50.0, 150.0)
    lines = hough_lines_p(edges, 1.0, math.pi / 180.0, 100)
    if len(lines) < 10:
        return 0.0
    angles = []
    for x1, y1, x2, y2 in lines:
        a = math.degrees(math.atan2(y2 - y1, x2 - x1))
        if abs(a) < 45.0:
            angles.append(a)
    if not angles:
        return 0.0
    return calculate_median(angles)
