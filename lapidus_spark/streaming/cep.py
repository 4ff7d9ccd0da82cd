"""Sequence-pattern (CEP-lite) stateful operator: streaming funnel.

The reference has no notion of cross-event patterns — every event is
dispatched independently (SURVEY §2.4 scorecard). This module adds
the classic complex-event-processing primitive a Spark user would
reach for MATCH_RECOGNIZE for: per-entity ordered-stage matching
(signup → view → purchase), maintained incrementally by
``applyInPandasWithState`` so the match is EXACT even when events
arrive out of order across micro-batches (late signups lower stage 1
and force downstream stages to re-resolve — the state keeps the
candidate sets, not just the current answer).

Semantics (identical to the batch ``agg_funnel_stages`` query): each
stage is the earliest qualifying event strictly after the previous
stage's event, ordered by (event time, event_id) — a total order, so
batch and stream agree bit for bit.

State per entity (bounded by that entity's history, the same bound
as transaction assembly):
- the minimal signup key (only the minimum can ever matter — stage 1
  is a plain argmin),
- ALL view and purchase keys seen so far: a later, earlier-ts signup
  can re-qualify views that today precede stage 1, so candidate sets
  must be retained. (A production build can prune any view v with an
  existing v' < v that already exceeds the current stage-1 key —
  v' wins for every future stage-1 value too; at fixture history
  sizes the prune is noise, so it is documented, not implemented.)

Every invocation recomputes the funnel from (state ∪ batch) and
emits the current per-entity answer with a bumped version; the
final answer is the max-version row per entity (update-mode output).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("entity_id", LongType(), False),
        StructField("version", LongType(), False),
        StructField("signup_us", LongType(), True),
        StructField("view_us", LongType(), True),
        StructField("purchase_us", LongType(), True),
    ]
)

FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("version", LongType(), True),
        StructField("sig_ts", LongType(), True),
        StructField("sig_id", LongType(), True),
        StructField("view_ts", ArrayType(LongType()), True),
        StructField("view_id", ArrayType(LongType()), True),
        StructField("pur_ts", ArrayType(LongType()), True),
        StructField("pur_id", ArrayType(LongType()), True),
    ]
)


def _first_after(cands: list[tuple[int, int]], after: tuple[int, int] | None):
    """Earliest (ts_us, event_id) key strictly greater than ``after``."""
    if after is None:
        return None
    best = None
    for k in cands:
        if k > after and (best is None or k < best):
            best = k
    return best


def _funnel_handler(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    entity_id = int(key[0])
    ver = 0
    sig: tuple[int, int] | None = None
    views: list[tuple[int, int]] = []
    purs: list[tuple[int, int]] = []
    if state.exists:
        s_ver, s_sts, s_sid, s_vts, s_vid, s_pts, s_pid = state.get
        ver = int(s_ver or 0)
        if s_sts is not None:
            sig = (int(s_sts), int(s_sid))
        views = list(zip((int(x) for x in s_vts or []), (int(x) for x in s_vid or [])))
        purs = list(zip((int(x) for x in s_pts or []), (int(x) for x in s_pid or [])))

    for pdf in pdf_iter:
        for etype, ts_us, eid in zip(pdf["event_type"], pdf["ts_us"], pdf["event_id"]):
            k = (int(ts_us), int(eid))
            if etype == "signup":
                if sig is None or k < sig:
                    sig = k
            elif etype == "view":
                views.append(k)
            elif etype == "purchase":
                purs.append(k)

    ver += 1
    state.update(
        (
            ver,
            sig[0] if sig else None,
            sig[1] if sig else None,
            [v[0] for v in views],
            [v[1] for v in views],
            [p[0] for p in purs],
            [p[1] for p in purs],
        )
    )
    if sig is None:
        return  # no funnel entry yet; candidates stay in state
    s2 = _first_after(views, sig)
    s3 = _first_after(purs, s2)
    yield pd.DataFrame(
        {
            "entity_id": [entity_id],
            "version": [ver],
            "signup_us": [sig[0]],
            "view_us": [s2[0] if s2 else None],
            "purchase_us": [s3[0] if s3 else None],
        }
    )


def funnel_stream(events: DataFrame) -> DataFrame:
    """events stream (event_id, ts_us, user_id, event_type) → per-
    entity funnel updates. One shuffle on the entity key; state lives
    in the state store (spillable, checkpointed, resumable)."""
    relevant = events.filter(events["event_type"].isin("signup", "view", "purchase"))
    return (
        relevant.groupBy("user_id")
        .applyInPandasWithState(
            _funnel_handler,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
