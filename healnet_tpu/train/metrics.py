"""Survival metrics: censored concordance index.

scikit-survival is not available on this image, so this is a native NumPy
implementation of ``sksurv.metrics.concordance_index_censored`` semantics —
the metric engine of the reference pipeline
(`/root/reference/healnet/main.py:21,478,616`, called with events
``(1 - censorship).astype(bool)`` and ``tied_tol=1e-8``):

- a pair (i, j) is comparable iff sample i has an event and either
  ``time_j > time_i``, or ``time_j == time_i`` with j censored;
- a comparable pair is concordant when the shorter-surviving sample has the
  strictly higher risk estimate; estimates within ``tied_tol`` count 0.5.

Vectorised O(n²) pairwise computation — exact for the concordant/discordant/
tied-risk counts and the index itself. The ``tied_time`` element counts
comparable pairs with tied event times.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def concordance_index_censored(
    event_indicator: np.ndarray,
    event_time: np.ndarray,
    estimate: np.ndarray,
    tied_tol: float = 1e-8,
) -> Tuple[float, int, int, int, int]:
    """Censored concordance index (sksurv-compatible return tuple).

    Returns:
        (cindex, concordant, discordant, tied_risk, tied_time)
    """
    event = np.asarray(event_indicator).astype(bool).reshape(-1)
    time = np.asarray(event_time, dtype=np.float64).reshape(-1)
    est = np.asarray(estimate, dtype=np.float64).reshape(-1)
    n = time.shape[0]
    if not (event.shape[0] == n == est.shape[0]):
        raise ValueError("all inputs must have the same length")
    if not event.any():
        raise ValueError(
            "All samples are censored — concordance index is undefined"
        )

    # row-blockwise pair counting: identical results to the full n x n
    # broadcast, but bounded memory (the all-at-once float64 diff matrix
    # alone is 8*n^2 bytes — ~5 GB at a 25k-sample pooled cohort; this is
    # the fallback path when the native library is unavailable)
    concordant = tied_risk = total = tied_time = 0
    block = max(1, int(2**22 // max(n, 1)))  # ~32 MB of f64 per block
    for start in range(0, n, block):
        sl = slice(start, min(start + block, n))
        later = time[None, :] > time[sl, None]
        ties_t = time[None, :] == time[sl, None]
        tied_censored = ties_t & (~event[None, :])
        comparable = event[sl, None] & (later | tied_censored)
        rows = np.arange(sl.start, sl.stop)
        comparable[np.arange(rows.size), rows] = False  # no self-pairs

        diff = est[sl, None] - est[None, :]
        concordant += int(np.sum(comparable & (diff > tied_tol)))
        tied_risk += int(np.sum(comparable & (np.abs(diff) <= tied_tol)))
        total += int(np.sum(comparable))
        tied_time += int(np.sum(comparable & ties_t))
    discordant = total - concordant - tied_risk

    if total == 0:
        raise ValueError("No comparable pairs available")
    cindex = (concordant + 0.5 * tied_risk) / total
    return float(cindex), concordant, discordant, tied_risk, tied_time
