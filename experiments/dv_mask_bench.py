"""Micro-bench for the vectorized deletion-vector mask (VERDICT r12
#3): the batch reader's DV probe used to materialize entity_id /
last_seq / ts-ISO to Python lists for EVERY row of a DV-carrying file
and probe a Python set per row — O(file rows) Python work on the SQL
read path. The round-13 path pre-restricts candidates with
``pc.is_in`` (one Arrow kernel) and replays the triple probe only on
rows whose entity the vector names, so the Python-loop work scales
with DV HITS, not file rows.

Run: python experiments/dv_mask_bench.py
Prints per-row-count timings of ``_aligned_file_table`` on a
DV-carrying file vs the same file with no DV; the delta (the mask's
cost) must stay ~flat as rows grow 10x while the old implementation's
delta grew linearly.
"""

from __future__ import annotations

import os
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq

from lapidus_spark.sources.lake_batch import _aligned_file_table


def build_file(n_rows: int) -> str:
    d = tempfile.mkdtemp(prefix="dvbench_")
    f = os.path.join(d, "part-0.parquet")
    tbl = pa.table(
        {
            "entity_id": pa.array([f"k{i % 5000:06d}" for i in range(n_rows)]),
            "last_seq": pa.array(list(range(n_rows)), pa.int64()),
            "last_ts": pa.array(
                [1_700_000_000_000_000 + i for i in range(n_rows)],
                pa.timestamp("us"),
            ),
            "last_type": pa.array(["update"] * n_rows),
            "item": pa.array([f"payload-{i}" for i in range(n_rows)]),
            "bucket": pa.array([0] * n_rows, pa.int32()),
        }
    )
    pq.write_table(tbl, f)
    return f


def time_read(f: str, dv, reps: int = 7) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _aligned_file_table(f, [], "timestamp_ntz", "string", dv)
        best = min(best, time.perf_counter() - t0)
    return best


def time_old_mask(f: str, dv, reps: int = 5) -> float:
    """The pre-round-13 mask, reproduced for comparison: full-column
    to_pylist + a per-row Python set probe over EVERY row."""
    import pyarrow.compute as pc

    dv_keys = {(str(e[0]), int(e[1]), str(e[2])) for e in dv}
    best = float("inf")
    for _ in range(reps):
        out = _aligned_file_table(f, [], "timestamp_ntz", "string", [])
        t0 = time.perf_counter()
        ts_iso = pc.strftime(
            out.column("last_ts").cast(pa.timestamp("us")),
            format="%Y-%m-%dT%H:%M:%S",
        )
        ents = out.column("entity_id").to_pylist()
        seqs = out.column("last_seq").to_pylist()
        isos = ts_iso.to_pylist()
        hit = pa.array(
            [(e, s, t) in dv_keys for e, s, t in zip(ents, seqs, isos)],
            pa.bool_(),
        )
        out.filter(pc.invert(hit))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    # a 5-entry DV (typical: a GDPR-style redaction names few rows)
    import datetime

    def iso(i):
        return (
            datetime.datetime(1970, 1, 1)
            + datetime.timedelta(microseconds=1_700_000_000_000_000 + i)
        ).strftime("%Y-%m-%dT%H:%M:%S.%f")

    dv = [[f"k{i:06d}", i, iso(i)] for i in range(5)]
    print(
        f"{'rows':>10} {'no_dv_ms':>10} {'dv_ms':>10} {'mask_ms':>10} "
        f"{'old_mask_ms':>12}"
    )
    for n in (10_000, 100_000, 1_000_000):
        f = build_file(n)
        base = time_read(f, [])
        with_dv = time_read(f, dv)
        old = time_old_mask(f, dv)
        print(
            f"{n:>10} {base * 1e3:>10.2f} {with_dv * 1e3:>10.2f} "
            f"{(with_dv - base) * 1e3:>10.2f} {old * 1e3:>12.2f}"
        )


if __name__ == "__main__":
    main()
