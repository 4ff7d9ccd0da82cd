"""The verification-window ordering is driver evidence policy — a
silent regression here burns correctness slots, so the policy is
pinned as a unit test (no Spark session needed).

Policy (plans/registry.py): touched-this-round queries with a stale
green signal rank STRICTLY first (fresh code invalidates old
evidence, and a bug fix must never lose its slot to a merely-new
query), then never-driver-verified queries, then stalest-signal
first; ties break by state-heaviness, then registration order.
"""

from __future__ import annotations

import lapidus_spark.plans.registry as registry
from lapidus_spark.plans.registry import load_all


def _ordered(monkeypatch, ages, touched):
    monkeypatch.setattr(registry, "_SIGNAL_AGES", dict(ages))
    monkeypatch.setattr(registry, "_TOUCHED_THIS_ROUND", tuple(touched))
    return list(load_all())


def test_never_verified_precede_stale(monkeypatch):
    names = list(load_all())
    ages = {n: 3 for n in names}
    ages.pop(names[-1])  # make the LAST registered query never-verified
    order = _ordered(monkeypatch, ages, ())
    assert order[0] == names[-1]


def test_touched_rank_strictly_before_new(monkeypatch):
    """A touched+stale query outranks every never-verified query,
    regardless of heaviness — the round-4 policy gap (shared cohort,
    heaviness deciding) is closed."""
    names = list(load_all())
    # pick the HEAVIEST-class new query vs a LIGHT touched one: a
    # stateless format scan (heaviness 4) touched, a streaming query
    # (heaviness 0) never verified
    light_touched = "src_jsonl_scan"
    heavy_new = "stream_tx_assembly"
    ages = {n: 4 for n in names}
    ages[light_touched] = 2  # stale signal + fresh code
    ages.pop(heavy_new)  # never verified
    order = _ordered(monkeypatch, ages, (light_touched,))
    assert order.index(light_touched) < order.index(heavy_new)


def test_stalest_signal_first(monkeypatch):
    names = list(load_all())
    ages = {n: 4 for n in names}
    ages[names[0]] = 1
    ages[names[1]] = 3
    order = _ordered(monkeypatch, ages, ())
    assert order.index(names[0]) < order.index(names[1])


def test_untouched_never_verified_beats_touched_policy_only_when_listed(monkeypatch):
    """Being in _TOUCHED_THIS_ROUND without a prior signal is just
    age-0: the touched fast-path only applies to stale signals."""
    names = list(load_all())
    ages = {n: 2 for n in names}
    ages.pop("src_jsonl_scan")
    order = _ordered(monkeypatch, ages, ("src_jsonl_scan",))
    assert order[0] == "src_jsonl_scan"


def _assert_window_invariant(order, ages, touched):
    """The relative window invariant (replaces the r5 absolute
    'age <= 2' assertion that every new CORRECTNESS_r*.json artifact
    falsified): the 50-slot window holds the stalest evidence.

    1. every touched-with-stale-signal query is inside the window;
    2. every never-verified UNTOUCHED query precedes every verified
       untouched query;
    3. no untouched query outside the window has a strictly staler
       (lower-round, never-verified = 0) signal than any untouched
       query inside it.
    """
    window, rest = order[:50], order[50:]
    touched_stale = {n for n in touched if ages.get(n, 0) > 0}
    assert touched_stale <= set(window)
    untouched = [n for n in order if n not in touched_stale]
    verified_seen = False
    for n in untouched:
        if ages.get(n, 0) == 0:
            assert not verified_seen, f"never-verified {n} after a verified query"
        else:
            verified_seen = True
    win_max = max((ages.get(n, 0) for n in window if n not in touched_stale), default=0)
    rest_min = min((ages.get(n, 0) for n in rest if n not in touched_stale), default=win_max)
    assert win_max <= rest_min


def test_current_window_holds_the_stalest_evidence():
    """Against the committed artifacts at HEAD, whatever rounds they
    span — the invariant is relative, so a new round's artifact
    landing in the repo root rotates the window instead of breaking
    this test."""
    order = list(load_all())
    _assert_window_invariant(order, registry._signal_ages(), registry._TOUCHED_THIS_ROUND)


def test_window_invariant_survives_next_round_artifact(tmp_path, monkeypatch):
    """Round-proofing (VERDICT r5 #1): synthesize the NEXT round's
    CORRECTNESS artifact — all-green for the current window — into a
    scratch root, re-derive ages from it, and assert the same relative
    invariant. This is exactly the event that broke the r5 test."""
    import json
    import re
    from pathlib import Path

    root = Path(registry.__file__).resolve().parents[2]
    latest = 0
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.name)
        if m:
            latest = max(latest, int(m.group(1)))
        (tmp_path / p.name).write_text(p.read_text())
    current_window = list(load_all())[:50]
    green = {
        n: {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
        for n in current_window
    }
    (tmp_path / f"CORRECTNESS_r{latest + 1:02d}.json").write_text(json.dumps(green))

    next_ages = registry._signal_ages(root=tmp_path)
    assert all(next_ages[n] == latest + 1 for n in current_window)
    # next round: the touched list resets (fresh code would be re-listed)
    monkeypatch.setattr(registry, "_SIGNAL_AGES", dict(next_ages))
    monkeypatch.setattr(registry, "_TOUCHED_THIS_ROUND", ())
    _assert_window_invariant(list(load_all()), next_ages, ())
