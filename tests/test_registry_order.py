"""The self-ordering registry must front verification debt.

r11 lesson: dedup_minhash_lsh gained an exact oracle in r10 but its
latest driver row stayed the weaker r9 rows-only check for two rounds,
because the ordering keyed on age alone. The invariant now: an entry
whose oracle is NEWER than its last driver observation (last row was
rows-only, oracle exists today) sorts ahead of every already-verified
entry — the exact check is still owed.
"""

from strawboat_spark.queries import _driver_history, all_queries


def test_oracle_owed_entries_front_the_window():
    history = _driver_history()
    names = list(all_queries())
    qs = all_queries()

    owed = [
        n
        for n in names
        if history.get(n) is not None
        and history[n][2]  # last driver row was rows-only
        and qs[n].oracle is not None  # but an exact oracle exists now
    ]
    verified_exact = [
        n
        for n in names
        if history.get(n) is not None and not history[n][2] and history[n][1]
    ]
    if not owed or not verified_exact:
        return  # nothing owed right now — invariant vacuously holds
    worst_owed = max(names.index(n) for n in owed)
    best_verified = min(names.index(n) for n in verified_exact)
    assert worst_owed < best_verified, (
        f"oracle-owed entries {owed} must sort before verified ones"
    )


def test_never_checked_entries_lead():
    history = _driver_history()
    names = list(all_queries())
    never = [n for n in names if n not in history]
    checked_ok = [n for n in names if n in history and history[n][1]]
    if not never or not checked_ok:
        return
    assert max(names.index(n) for n in never) < min(
        names.index(n) for n in checked_ok
    )


def test_window_50_contains_oldest_cohort():
    """The 50-entry driver window must include the least-recently
    verified entries — rotation provably accumulates."""
    history = _driver_history()
    names = list(all_queries())
    window = set(names[:50])
    rounds = sorted({history[n][0] for n in names if n in history})
    if not rounds:
        return
    oldest = rounds[0]
    stale = [n for n in names if n in history and history[n][0] == oldest]
    missing = [n for n in stale if n not in window]
    assert not missing, f"oldest cohort (r{oldest}) not fully in window: {missing}"
