"""Streaming transaction assembly (agg_tx → applyInPandasWithState).

The reference buffers DML envelopes between begin/commit in an
in-memory ``DatabaseTransaction`` (postgresql.js:18-33, buffer at
427-429/482-484, commit-emit at 451-465/487-501) and its author flags
the unbounded buffer for spill rework (postgresql.js:14-17). The
Spark rebuild keys the stream by ``tx_id`` and holds per-transaction
state in the state store (spillable, checkpointed, resumable), with a
processing-time timeout for abandoned transactions — two upgrades the
reference never had, stated as upgrades in SURVEY §2.4.

Emission contract (matches DatabaseTransaction.commit):
- on a ``commitTransaction`` marker: emit one row
  {tx_id, n_items, item_types (statement order), first_seq, last_seq,
  commit_ts} and clear state;
- items are ordered by event_seq, NOT arrival order — the reference
  assumes a totally-ordered pipe; a distributed stream cannot, so we
  sort within the transaction (same result on ordered input).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TX_OUTPUT_SCHEMA = StructType(
    [
        StructField("tx_id", LongType(), False),
        StructField("n_items", LongType(), False),
        StructField("first_seq", LongType(), True),
        StructField("last_seq", LongType(), True),
        StructField("item_types", StringType(), True),
        StructField("commit_ts", TimestampType(), True),
    ]
)

#: state: (seqs, types) — commit is emit-or-buffer, never persisted:
#: a commit marker in the batch drains the state immediately, so only
#: uncommitted item buffers live in the store between triggers.
#: Typed arrays, not serialized strings: the state row crosses the
#: Python/JVM boundary as Arrow columns, so array elements stay
#: binary — no join/split/str round-trip per trigger.
TX_STATE_SCHEMA = StructType(
    [
        StructField("seqs", ArrayType(LongType()), True),  # event_seqs buffered
        StructField("types", ArrayType(StringType()), True),  # types, parallel to seqs
    ]
)

COMMIT_TYPE = "commitTransaction"
BEGIN_TYPE = "beginTransaction"


def _assemble_tx(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
    timeout_ms: int | None,
) -> Iterator[pd.DataFrame]:
    """Per-tx_id stateful assembler (applyInPandasWithState handler)."""
    if state.hasTimedOut:
        # abandoned transaction: drop buffered items (the reference
        # would leak them forever — postgresql.js:14-17 TODO)
        state.remove()
        return

    seqs: list[int] = []
    types: list[str] = []
    if state.exists:
        s_seqs, s_types = state.get
        if s_seqs is not None and len(s_seqs):
            seqs = [int(x) for x in s_seqs]
            types = [str(t) for t in s_types]

    committed = False
    commit_ts: Any = None
    tx_id = int(key[0])
    for pdf in pdf_iter:
        # vectorized: one mask per micro-batch chunk, no per-row loop
        commits = pdf.loc[pdf["type"] == COMMIT_TYPE, "ts"]
        if len(commits):
            committed = True
            commit_ts = commits.iloc[-1]
        mask = ~pdf["type"].isin((COMMIT_TYPE, BEGIN_TYPE))
        seqs.extend(int(s) for s in pdf.loc[mask, "event_seq"])
        types.extend(str(t) for t in pdf.loc[mask, "type"])

    if committed:
        order = sorted(range(len(seqs)), key=lambda i: seqs[i])
        yield pd.DataFrame(
            {
                "tx_id": [tx_id],
                "n_items": [len(seqs)],
                "first_seq": [min(seqs) if seqs else None],
                "last_seq": [max(seqs) if seqs else None],
                "item_types": ["|".join(types[i] for i in order)],
                "commit_ts": [commit_ts],
            }
        )
        state.remove()
    else:
        state.update((seqs, types))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)


from pyspark.sql.streaming import StatefulProcessor  # noqa: E402


class TxAssemblerProcessor(StatefulProcessor):
    """``transformWithState`` twin of ``_assemble_tx`` — the Spark 4
    arbitrary-state API (typed composite state, timers, TTL) that
    supersedes ``applyInPandasWithState``. Buffered items live in a
    ListState of (seq, type) tuples backed by the RocksDB state store;
    list appends are incremental RocksDB merges, so a long-running
    transaction never rewrites its whole buffer per trigger — the
    concrete win over the single-blob GroupState row.

    Both implementations are kept: applyInPandasWithState is today's
    stable path, this is the forward path; the registry verifies they
    produce identical answers against one oracle.
    """

    def init(self, handle) -> None:
        self._items = handle.getListState("items", "seq BIGINT, t STRING")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        buffered: list[tuple[int, str]] = (
            [(int(s), str(t)) for s, t in self._items.get()]
            if self._items.exists()
            else []
        )
        committed = False
        commit_ts: Any = None
        fresh: list[tuple[int, str]] = []
        for pdf in rows:
            commits = pdf.loc[pdf["type"] == COMMIT_TYPE, "ts"]
            if len(commits):
                committed = True
                commit_ts = commits.iloc[-1]
            mask = ~pdf["type"].isin((COMMIT_TYPE, BEGIN_TYPE))
            fresh.extend(
                (int(s), str(t))
                for s, t in zip(pdf.loc[mask, "event_seq"], pdf.loc[mask, "type"])
            )

        if committed:
            items = sorted(buffered + fresh)
            yield pd.DataFrame(
                {
                    "tx_id": [int(key[0])],
                    "n_items": [len(items)],
                    "first_seq": [items[0][0] if items else None],
                    "last_seq": [items[-1][0] if items else None],
                    "item_types": ["|".join(t for _, t in items)],
                    "commit_ts": [commit_ts],
                }
            )
            self._items.clear()
        elif fresh:
            self._items.appendList(fresh)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def handleInitialState(self, key, initialState, timerValues) -> None:
        pass

    def close(self) -> None:
        pass


def assemble_transactions_tws(envelopes: DataFrame) -> DataFrame:
    """Transaction assembly via ``transformWithStateInPandas``
    (requires the RocksDB state store provider)."""
    proc = TxAssemblerProcessor()
    return (
        envelopes.select("tx_id", "type", "event_seq", "ts")
        .groupBy("tx_id")
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=TX_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    )


def assemble_transactions(
    envelopes: DataFrame, abandoned_tx_timeout_ms: int | None = None
) -> DataFrame:
    """Group the envelope stream by tx_id and assemble transactions.

    Input must carry (tx_id, type, event_seq, ts). Output one row per
    committed transaction.

    ``abandoned_tx_timeout_ms`` evicts never-committed transactions
    from the state store after a processing-time delay (an upgrade on
    the reference's unbounded buffer, postgresql.js:14-17). Leave
    ``None`` for replay / availableNow runs: with a processing-time
    timeout armed, Spark keeps scheduling state-cleanup batches and an
    availableNow trigger never terminates.

    Out-of-order caveat: an item arriving AFTER its transaction's
    commit marker (at-least-once redelivery across triggers) finds no
    state — its transaction already emitted — and silently re-creates
    a buffer that only the optional timeout ever evicts. Upstream
    must not split a transaction across a commit boundary; the
    replay harness guarantees it by batching on the seq midpoint.
    """
    import functools

    fn = functools.partial(_assemble_tx, timeout_ms=abandoned_tx_timeout_ms)
    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if abandoned_tx_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        envelopes.select("tx_id", "type", "event_seq", "ts")
        .groupBy("tx_id")
        .applyInPandasWithState(
            fn,
            outputStructType=TX_OUTPUT_SCHEMA,
            stateStructType=TX_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout_conf,
        )
    )
