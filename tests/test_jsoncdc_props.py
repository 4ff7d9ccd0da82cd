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


@st.composite
def _multi_file_ddl_capture(draw):
    """A multi-file capture with arbitrary DDL interleavings: per file,
    a random sequence of schema lines (random table, random version
    payload, re-announcements included), DML/begin/commit lines mixed
    in, pg_temp noise anywhere. Returns (files, expected_history) where
    expected_history recomputes the schema-registry view the way
    src_schema_history defines it: for every distinct (table,
    schema_json) epoch, the number of capture FILES that observed it."""
    n_files = draw(st.integers(min_value=1, max_value=4))
    files: list[list[dict]] = []
    history: dict[tuple[str, str], set[int]] = {}
    for file_id in range(n_files):
        lines: list[dict] = []
        n_ops = draw(st.integers(min_value=0, max_value=10))
        for _ in range(n_ops):
            kind = draw(st.sampled_from(["schema", "schema", "begin", "insert"]))
            if kind == "schema":
                tbl = draw(_tables)
                # small version space so re-announcements and cross-file
                # repeats of the same epoch actually happen
                schema = {"v": draw(st.integers(min_value=1, max_value=3))}
                lines.append({"table": tbl, "schema": schema})
                if "pg_temp_" not in tbl:
                    key = (tbl, json.dumps(schema, separators=(",", ":")))
                    history.setdefault(key, set()).add(file_id)
            elif kind == "begin":
                lines.append({"begin": draw(st.integers(min_value=0, max_value=9))})
            else:
                tbl = draw(_tables)
                lines.append({"table": tbl, "insert": {"id": draw(st.integers(0, 99))}})
        files.append(lines)
    expected = sorted(
        (tbl, schema_json, len(file_ids))
        for (tbl, schema_json), file_ids in history.items()
    )
    return files, expected


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cap=_multi_file_ddl_capture())
def test_schema_history_arbitrary_ddl_interleavings(spark, tmp_path_factory, cap):
    """src_schema_history semantics hold for ARBITRARY DDL layouts —
    not just the fixture generator's two-version epoch shape its
    DuckDB oracle hardcodes: version counts, re-announcements,
    cross-file repeats, and noise placement are all randomized, and
    the Spark aggregation must match a direct recomputation."""
    import pyspark.sql.functions as F

    from lapidus_spark.sources.jsoncdc import _with_file_order, decode_jsoncdc

    files, expected = cap
    d = tmp_path_factory.mktemp("ddlcap")
    for i, lines in enumerate(files):
        (d / f"segment_{i:03d}.ldjson").write_text(
            "".join(
                json.dumps(ln, separators=(",", ":"), ensure_ascii=False) + "\n"
                for ln in lines
            ),
            encoding="utf-8",
        )
    rec = decode_jsoncdc(_with_file_order(spark.read.text(str(d))))
    got = sorted(
        (r.table_name, r.schema_json, r.n_files)
        for r in (
            rec.filter(F.col("type") == "schema")
            .groupBy("table_name", "schema_json")
            .agg(F.countDistinct("src_file").cast("bigint").alias("n_files"))
        ).collect()
    )
    assert got == expected
