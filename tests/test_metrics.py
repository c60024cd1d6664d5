"""Concordance-index tests: hand-computed cases + brute-force cross-check."""

import numpy as np
import pytest

from healnet_tpu.train import concordance_index_censored


def test_perfect_concordance():
    # higher risk -> earlier event
    time = np.array([1.0, 2.0, 3.0, 4.0])
    event = np.array([1, 1, 1, 1], dtype=bool)
    risk = np.array([4.0, 3.0, 2.0, 1.0])
    c, con, dis, tr, tt = concordance_index_censored(event, time, risk)
    assert c == 1.0 and con == 6 and dis == 0 and tr == 0


def test_perfect_discordance():
    time = np.array([1.0, 2.0, 3.0])
    event = np.array([1, 1, 1], dtype=bool)
    risk = np.array([1.0, 2.0, 3.0])
    c, con, dis, tr, tt = concordance_index_censored(event, time, risk)
    assert c == 0.0 and dis == 3


def test_tied_risk_counts_half():
    time = np.array([1.0, 2.0])
    event = np.array([1, 1], dtype=bool)
    risk = np.array([1.0, 1.0])
    c, con, dis, tr, tt = concordance_index_censored(event, time, risk)
    assert c == 0.5 and tr == 1


def test_censored_pairs_excluded():
    # a censored sample is not comparable as the earlier element
    time = np.array([1.0, 2.0])
    event = np.array([0, 1], dtype=bool)
    risk = np.array([5.0, 1.0])
    # only sample 1 has an event but nothing outlives it -> no pairs
    with pytest.raises(ValueError):
        concordance_index_censored(event, time, risk)


def test_tied_time_event_vs_censored_comparable():
    # an event is comparable to a censored sample at the same time
    time = np.array([2.0, 2.0])
    event = np.array([1, 0], dtype=bool)
    risk = np.array([3.0, 1.0])
    c, con, dis, tr, tt = concordance_index_censored(event, time, risk)
    assert con == 1 and c == 1.0 and tt == 1


def test_tied_time_two_events_not_comparable():
    time = np.array([2.0, 2.0, 5.0])
    event = np.array([1, 1, 1], dtype=bool)
    risk = np.array([3.0, 1.0, 0.5])
    c, con, dis, tr, tt = concordance_index_censored(event, time, risk)
    # pairs: (0,2) and (1,2) only
    assert con + dis + tr == 2 and c == 1.0


def test_all_censored_raises():
    with pytest.raises(ValueError):
        concordance_index_censored(
            np.zeros(4, bool), np.arange(4.0), np.arange(4.0)
        )


def test_against_bruteforce(rng):
    n = 60
    time = rng.uniform(1, 100, size=n)
    event = rng.uniform(size=n) > 0.4
    risk = rng.normal(size=n)
    if not event.any():
        event[0] = True
    c, con, dis, tr, tt = concordance_index_censored(event, time, risk, tied_tol=1e-8)

    num = den = 0.0
    for i in range(n):
        if not event[i]:
            continue
        for j in range(n):
            if j == i:
                continue
            comparable = time[j] > time[i] or (time[j] == time[i] and not event[j])
            if not comparable:
                continue
            den += 1
            if abs(risk[i] - risk[j]) <= 1e-8:
                num += 0.5
            elif risk[i] > risk[j]:
                num += 1
    np.testing.assert_allclose(c, num / den, rtol=1e-12)
    assert con + dis + tr == den
