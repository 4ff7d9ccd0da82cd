"""Property-based tests for the jsoncdc line decoder: a pure-Python
reference decoder (a direct transcription of the reference's
lineHandler state machine, src/postgresql.js:373-485) is compared
against the Spark decode over randomized captures.

Randomized dimensions the fixture replay can't cover:
- arbitrary table names including pg_temp noise anywhere,
- ``@`` replica-identity objects with nulls in arbitrary positions
  and arbitrary key orders (first-non-null pk rule),
- ``id`` vs ``ID`` pk spelling, or neither (null pk),
- interleaved schema epochs per table,
- transactions of any size including empty ones,
- unicode values.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lapidus_spark.sources.jsoncdc import decode_jsoncdc_dir

_word = st.text(
    alphabet="abßc日x_0", min_size=1, max_size=6
).filter(lambda s: not s.isspace())

_tables = st.sampled_from(["users", "orders", "pg_temp_77", "billing_items"])


@st.composite
def _capture(draw):
    """One capture file: list of jsoncdc line dicts + the expected
    decoded envelope rows (the pure-Python reference decoder)."""
    lines: list[dict] = []
    expected: list[tuple] = []
    schema_cache: dict[str, str] = {}
    tx_id = None
    next_eid = 0

    n_ops = draw(st.integers(min_value=1, max_value=12))
    for _ in range(n_ops):
        kind = draw(
            st.sampled_from(["begin", "commit", "schema", "insert", "update", "delete"])
        )
        if kind == "begin":
            tx_id = draw(st.integers(min_value=0, max_value=99))
            lines.append({"begin": tx_id})
        elif kind == "commit":
            lines.append({"commit": tx_id if tx_id is not None else 0})
        elif kind == "schema":
            tbl = draw(_tables)
            schema = {"v": draw(st.integers(min_value=1, max_value=5))}
            lines.append({"table": tbl, "schema": schema})
            if "pg_temp_" not in tbl:
                schema_cache[tbl] = json.dumps(schema, separators=(",", ":"))
        else:
            tbl = draw(_tables)
            eid = next_eid
            next_eid += 1
            if kind == "delete":
                at = {}
                # arbitrary key order with nulls anywhere
                for key in draw(
                    st.permutations(["a", "b", "c"]).map(tuple)
                ):
                    at[key] = draw(st.one_of(st.none(), _word))
                lines.append({"table": tbl, "delete": {}, "@": at})
                pk = next((v for v in at.values() if v is not None), None)
                item = json.dumps(at, separators=(",", ":"), ensure_ascii=False)
            else:
                id_key = draw(st.sampled_from(["id", "ID", "none"]))
                row = {"k": draw(_word)}
                if id_key != "none":
                    row[id_key] = eid
                lines.append({"table": tbl, kind: row})
                pk = str(eid) if id_key != "none" else None
                item = json.dumps(row, separators=(",", ":"), ensure_ascii=False)
            if "pg_temp_" not in tbl:
                expected.append(
                    (kind, tbl, pk, item, tx_id, schema_cache.get(tbl))
                )
    return lines, expected


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cap=_capture())
def test_decode_matches_reference_state_machine(spark, tmp_path_factory, cap):
    lines, expected = cap
    d = tmp_path_factory.mktemp("cap")
    (d / "segment_000.ldjson").write_text(
        "\n".join(json.dumps(ln, separators=(",", ":"), ensure_ascii=False) for ln in lines)
        + "\n",
        encoding="utf-8",
    )
    out = decode_jsoncdc_dir(spark, str(d))
    got = [
        (r.type, r.table_name, r.pk, r.item, r.tx_id, r.table_schema)
        for r in out.orderBy("event_id", "pk", "item").collect()
    ]
    # order within a single file is line order; compare as multisets
    # keyed deterministically since event_id is only present for rows
    # whose item carries an id
    assert sorted(got, key=repr) == sorted(
        [(t, tbl, pk, item, tx, sch) for (t, tbl, pk, item, tx, sch) in expected],
        key=repr,
    )
