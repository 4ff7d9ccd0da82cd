"""The local mirror of the driver's t2 correctness gate: every
registered query with an oracle must exact-match DuckDB at sf0.001.
"""

from __future__ import annotations

import pytest

from lapidus_spark.plans.registry import load_all
from tests.conftest import SF_DIR
from tests.oracle_utils import compare, duck_connection

REG = load_all()
WITH_ORACLE = sorted(name for name, spec in REG.items() if spec.oracle is not None)
ROWS_ONLY = sorted(name for name, spec in REG.items() if spec.oracle is None)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, duck, name):
    spec = REG[name]
    report = compare(spec.fn(spark, SF_DIR), duck, spec.oracle)
    assert report["ok"], f"{name}: {report['detail']} rows={report['rows']} cols={report['cols']}"
    # Vacuity guard (VERDICT r9 #1): a green that compares empty to
    # empty verifies nothing. Every query must return rows at the test
    # sf unless it declares expected_empty=True at registration.
    if not spec.expected_empty:
        assert report["rows"][0] >= 1, (
            f"{name}: 0 rows at {SF_DIR} — vacuously verified. Fix the "
            "predicate to intersect the fixture, or annotate the "
            "registration with expected_empty=True."
        )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(spark, name):
    spec = REG[name]
    df = spec.fn(spark, SF_DIR)
    n = df.count()
    assert len(df.schema.fields) > 0
    if not spec.expected_empty:
        assert n >= 1, f"{name}: 0 rows at {SF_DIR} — vacuous rows-only check."


@pytest.fixture(scope="module")
def tiny_corpus(spark, tmp_path_factory):
    """A corpus SMALLER than both bad-line moduli, so the injected-
    corruption count is zero — the case where an ungrouped oracle
    aggregate without HAVING emits a phantom zero 'corrupt' row the
    Spark side never produces (VERDICT r5 #4, sources/formats.py)."""
    import duckdb

    out = str(tmp_path_factory.mktemp("tiny_sf"))
    spark.sql(
        "SELECT id AS event_id, timestamp'2024-01-01' AS ts, id AS user_id, "
        "concat('t', CAST(id % 3 AS STRING)) AS event_type, "
        "CAST(id AS DOUBLE) / 4 AS value, '{}' AS props "
        "FROM range(1, 10)"
    ).coalesce(1).write.parquet(f"{out}/events.parquet")
    spark.sql(
        "SELECT id AS doc_id, concat('doc text ', CAST(id AS STRING)) AS text, "
        "concat('l', CAST(id % 2 AS STRING)) AS lang, "
        "concat('s', CAST(id % 3 AS STRING)) AS source, "
        "CAST(9 + length(CAST(id AS STRING)) AS BIGINT) AS n_chars "
        "FROM range(1, 10)"
    ).coalesce(1).write.parquet(f"{out}/documents.parquet")
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{out}/{t}.parquet/*.parquet')"
        )
    yield out, con
    con.close()


@pytest.mark.parametrize("name", ["src_csv_scan", "src_jsonl_scan"])
def test_format_scans_agree_on_corruption_free_corpus(spark, tiny_corpus, name):
    sf_dir, con = tiny_corpus
    spec = REG[name]
    report = compare(spec.fn(spark, sf_dir), con, spec.oracle)
    assert report["ok"], f"{name}: {report['detail']} rows={report['rows']} cols={report['cols']}"
