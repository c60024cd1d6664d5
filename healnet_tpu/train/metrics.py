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

    # comparable[i, j]: i has an event and j outlives i (or ties censored)
    later = time[None, :] > time[:, None]
    tied_censored = (time[None, :] == time[:, None]) & (~event[None, :])
    comparable = event[:, None] & (later | tied_censored)
    np.fill_diagonal(comparable, False)

    diff = est[:, None] - est[None, :]  # diff[i, j] = est_i - est_j
    tied_risk_mask = np.abs(diff) <= tied_tol
    concordant_mask = diff > tied_tol

    concordant = int(np.sum(comparable & concordant_mask))
    tied_risk = int(np.sum(comparable & tied_risk_mask))
    total = int(np.sum(comparable))
    discordant = total - concordant - tied_risk
    tied_time = int(np.sum(comparable & (time[None, :] == time[:, None])))

    if total == 0:
        raise ValueError("No comparable pairs available")
    cindex = (concordant + 0.5 * tied_risk) / total
    return float(cindex), concordant, discordant, tied_risk, tied_time
