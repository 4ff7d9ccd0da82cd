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


def test_current_window_is_the_evidence_debt():
    """With the committed artifacts (r1–r4) and a frozen surface, the
    50-slot window is exactly: every never-verified query + every
    r1/r2-stale query — and nothing verified at r3+ sneaks in."""
    reg = load_all()
    ages = registry._signal_ages()
    window, rest = list(reg)[:50], list(reg)[50:]
    assert all(ages.get(n, 0) <= 2 for n in window)
    assert all(ages.get(n, 99) >= 3 for n in rest)
