"""Property-based tests for the transaction-assembler handler
(hypothesis over the pure per-group function — no Spark session).

The reference asserts stream integrity only for the happy path
(currentTxId === commit id, postgresql.js:463) on a totally-ordered
pipe. The rebuild must hold under arbitrary micro-batch slicing and
within-batch arrival order, since a distributed stream guarantees
neither. Invariants:

1. a committed transaction emits exactly once, with every item,
   item_types in event_seq order, first/last_seq = min/max;
2. an uncommitted transaction never emits and its state persists;
3. slicing the same event sequence into any number of micro-batches
   (commit always in the final slice it belongs to) yields identical
   output.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from lapidus_spark.streaming.assembler import _assemble_tx


class FakeState:
    def __init__(self):
        self._v = None
        self.removed = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.removed = False

    def remove(self):
        self._v = None
        self.removed = True

    def setTimeoutDuration(self, ms):
        pass

    @property
    def hasTimedOut(self):
        return False


def drive(batches, state=None):
    """Feed batches (lists of (seq, type, ts) rows) through the
    handler, one call per micro-batch, collecting emitted rows."""
    state = state or FakeState()
    out = []
    for rows in batches:
        pdf = pd.DataFrame(rows, columns=["event_seq", "type", "ts"])
        out.extend(
            _assemble_tx((1,), iter([pdf]), state, timeout_ms=None)
        )
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame(), state


items_strategy = st.lists(
    st.sampled_from(["insert", "update", "delete"]), min_size=1, max_size=12
)


@given(types=items_strategy, data=st.data())
@settings(max_examples=60, deadline=None)
def test_committed_tx_emits_once_sorted(types, data):
    seqs = list(range(2, 2 + len(types)))
    rows = [(s, t, None) for s, t in zip(seqs, types)]
    rows = data.draw(st.permutations(rows))  # arbitrary arrival order
    events = [(1, "beginTransaction", None), *rows, (max(seqs) + 1, "commitTransaction", "T")]

    # arbitrary micro-batch slicing (commit lands in the last slice)
    n_cuts = data.draw(st.integers(min_value=1, max_value=len(events)))
    cut_points = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=len(events) - 1),
                max_size=n_cuts,
                unique=True,
            )
        )
    )
    batches, prev = [], 0
    for c in [*cut_points, len(events)]:
        batches.append(events[prev:c])
        prev = c
    batches = [b for b in batches if b]

    out, state = drive(batches)
    assert len(out) == 1
    row = out.iloc[0]
    assert row["n_items"] == len(types)
    assert row["first_seq"] == min(seqs) and row["last_seq"] == max(seqs)
    # item order follows event_seq, independent of arrival order
    assert row["item_types"] == "|".join(types)
    assert row["commit_ts"] == "T"
    assert state.removed  # state cleared on commit


@given(types=items_strategy)
@settings(max_examples=20, deadline=None)
def test_uncommitted_tx_never_emits(types):
    rows = [(i + 2, t, None) for i, t in enumerate(types)]
    out, state = drive([[(1, "beginTransaction", None)], rows])
    assert out.empty
    assert state.exists  # still buffered, resumable


def test_empty_tx_commit_emits_zero_items():
    out, _ = drive([[(1, "beginTransaction", None), (2, "commitTransaction", "T")]])
    assert len(out) == 1
    assert out.iloc[0]["n_items"] == 0
    assert pd.isna(out.iloc[0]["first_seq"])


def test_abandoned_tx_timeout_drops_state():
    """The eviction path (upgrade over the reference's forever-leaked
    buffer, postgresql.js:14-17): on timeout the state is dropped and
    nothing is emitted."""

    class TimedOutState(FakeState):
        @property
        def hasTimedOut(self):
            return True

    state = TimedOutState()
    state.update(("2,3", "insert|update"))
    out = list(_assemble_tx((1,), iter([]), state, timeout_ms=60_000))
    assert out == []
    assert state.removed and not state.exists
