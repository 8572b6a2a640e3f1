"""Unit tests for the driver-gate queue policy (plans/registry.py).

The external driver verifies only the first ~50 entries of queries() per
round, so _gate_ordered IS coverage policy: never-checked oracled queries
jump the queue, failed/changed ones re-check next, rows-only entries that
never earned a driver row get ONE probe behind those, green ones rotate
by staleness, deliberately-deferred entries wait one round — and entries
whose only driver row is ``err: no_oracle`` are TERMINAL (the driver has
proven it cannot check them; retrying burns the window) except for one
rotating probe slot.
"""

from __future__ import annotations

from duckdb_hybrid_doc_search_spark.plans import registry


def _rank_with(monkeypatch, hist, recheck, defs):
    """Run _gate_ordered against synthetic history/registry state.

    hist values: (round, green) or (round, green, err) — 2-tuples get
    err=None appended, matching _check_history's 3-tuple shape.
    """
    hist = {k: (v if len(v) == 3 else (*v, None)) for k, v in hist.items()}
    monkeypatch.setattr(registry, "_check_history", lambda: hist)
    monkeypatch.setattr(registry, "RECHECK", recheck)
    monkeypatch.setattr(registry, "_LOADED", True)
    fake = {
        name: registry.QueryDef(name, lambda *a: None, oracle, True, defer)
        for name, (oracle, defer) in defs.items()
    }
    monkeypatch.setattr(registry, "REGISTRY", fake)
    return registry._gate_ordered()


def test_priority_tiers(monkeypatch):
    order = _rank_with(
        monkeypatch,
        hist={"green_old": (1, True), "green_new": (3, True),
              "red": (3, False), "ro_err": (2, False, "boom"),
              "ro_green": (1, True)},
        recheck={},
        defs={
            "rows_only": (None, False),
            "ro_err": (None, False),
            "ro_green": (None, False),
            "green_new": ("SELECT 1", False),
            "deferred": ("SELECT 1", True),
            "never": ("SELECT 1", False),
            "green_old": ("SELECT 1", False),
            "red": ("SELECT 1", False),
        },
    )
    assert order[0] == "never"          # unchecked oracled jumps the queue
    assert order[1] == "red"            # failed oracled check next
    assert order[2] == "rows_only"      # rows-only never checked: in window
    assert order[3] == "ro_err"         # rows-only genuine err: retried
    # green tail rotates by staleness regardless of oracle-ness
    assert order[4:7] == ["ro_green", "green_old", "green_new"]
    assert order[7] == "deferred"       # held back one round


def test_no_oracle_err_is_terminal(monkeypatch):
    """err:no_oracle rows park BEHIND the green tail — the driver proved
    it cannot check them, so they must not burn window slots — except one
    rotating probe slot (the stalest) kept in the retry tier."""
    defs = {
        "no1": (None, False), "no2": (None, False), "no3": (None, False),
        "green": ("SELECT 1", False),
        "ro_real_err": (None, False),
    }
    order = _rank_with(
        monkeypatch,
        hist={"no1": (5, False, "no_oracle"), "no2": (4, False, "no_oracle"),
              "no3": (5, False, "no_oracle"), "green": (2, True),
              "ro_real_err": (3, False, "Py4JJavaError: ...")},
        recheck={},
        defs=defs,
    )
    # the stalest no_oracle entry (no2, round 4) is the rotating probe and
    # a genuine rows-only failure still retries; both rank before greens
    assert set(order[:2]) == {"no2", "ro_real_err"}
    assert order[2] == "green"
    # the other no_oracle entries are terminal: strictly behind the greens
    assert set(order[3:]) == {"no1", "no3"}


def test_recheck_self_clears_after_green_row(monkeypatch):
    """A RECHECK flag (impl changed in round R) stops boosting once a
    driver row from round >= R is green — stale flags cost nothing."""
    defs = {"q": ("SELECT 1", False), "tail": ("SELECT 1", False)}
    # green row from BEFORE the change round: still needs re-check
    order = _rank_with(
        monkeypatch, hist={"q": (3, True), "tail": (2, True)},
        recheck={"q": 4}, defs=defs,
    )
    assert order[0] == "q"
    # green row from the change round itself: flag satisfied, rotates by
    # staleness again (tail is staler)
    order = _rank_with(
        monkeypatch, hist={"q": (4, True), "tail": (2, True)},
        recheck={"q": 4}, defs=defs,
    )
    assert order[0] == "tail"
    # red row from the change round: keeps the boost
    order = _rank_with(
        monkeypatch, hist={"q": (4, False), "tail": (2, True)},
        recheck={"q": 4}, defs=defs,
    )
    assert order[0] == "q"


def test_defer_gate_only_parks_unchecked_queries(monkeypatch):
    """defer_gate holds back NEW queries only: once a driver row exists —
    especially a red one — or a RECHECK flag is set, the normal tiers
    govern, so a stale defer flag can never park a failed query outside
    the gate window."""
    defs = {"d_red": ("SELECT 1", True), "d_green": ("SELECT 1", True),
            "d_new": ("SELECT 1", True), "plain": ("SELECT 1", False)}
    order = _rank_with(
        monkeypatch,
        hist={"d_red": (4, False), "d_green": (2, True),
              "plain": (3, True)},
        recheck={},
        defs=defs,
    )
    assert order[0] == "d_red"            # red row: retried despite flag
    assert order[1:3] == ["d_green", "plain"]  # green tail by staleness
    assert order[3] == "d_new"            # truly new: held back
    # RECHECK also overrides the flag
    order = _rank_with(
        monkeypatch, hist={}, recheck={"d_new": 5}, defs=defs,
    )
    assert order[0] == "d_new"
