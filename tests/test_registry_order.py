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


def test_revised_entries_front_the_window():
    """r17: a gate whose semantics were revised AFTER its most recent
    driver observation (QueryDef.revised > last observed round) owes the
    exact check of the revision — it must sort ahead of every
    already-verified unrevised entry, like a never-checked one.  Without
    this, a revised composite (e.g. the distributed-trainer leg folded
    into similarity_ann_recall in r17) ships with no hard correctness
    row until age alone rotates it back into the 50-entry window."""
    history = _driver_history()
    names = list(all_queries())
    qs = all_queries()
    revised_owed = [
        n
        for n in names
        if n in history
        and qs[n].revised is not None
        and qs[n].revised > history[n][0]
    ]
    verified_unrevised = [
        n
        for n in names
        if n in history
        and history[n][1]
        and (qs[n].revised is None or qs[n].revised <= history[n][0])
    ]
    if not revised_owed or not verified_unrevised:
        return
    assert max(names.index(n) for n in revised_owed) < min(
        names.index(n) for n in verified_unrevised
    ), f"revised-owed entries {revised_owed} must sort before verified ones"


def test_rotation_horizon_is_bounded():
    """Freshness bound (r13): with a 50-entry driver window and LRU
    ordering, steady-state worst-case staleness is ceil(N/50) rounds.
    Two assertions keep the horizon under control as the registry
    grows:

    1. structural — the registry must stay small enough that the
       steady-state bound is <= 4 rounds (N <= 200). When this trips,
       fold sibling gates into composites (the per-codec multimodal
       family already has composite twins) instead of widening debt.
    2. observed — no entry's CURRENT staleness (rounds since its last
       driver row, measured against the newest round on disk) may
       exceed 4. The LRU ordering fronts the oldest cohort every
       round, so a violation means the ordering (or the window) broke.
    """
    import math

    history = _driver_history()
    names = list(all_queries())
    horizon = math.ceil(len(names) / 50)
    assert horizon <= 4, (
        f"registry has {len(names)} gates: steady-state rotation "
        f"staleness {horizon} rounds exceeds the 4-round bound — fold "
        f"sibling gates into composites"
    )
    if not history:
        return
    newest = max(rnd for rnd, _, _ in history.values())
    over = {
        n: newest - history[n][0]
        for n in names
        if n in history and newest - history[n][0] > 4
    }
    assert not over, f"entries >4 rounds driver-unverified: {over}"
