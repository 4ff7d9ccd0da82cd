"""Stream health monitoring (SURVEY.md §2.1 src_stderr / src_probe).

The reference classifies pg_recvlogical stderr lines into
error/status/disconnected events (stdErrorToEvent,
src/postgresql.js:192-229) and probes connectivity before starting
(pgIsReady/canPsql, postgresql.js:259-288). In the rebuild those
concerns map onto Spark's own control plane:

- ``PipelineMonitor`` is a ``StreamingQueryListener`` that turns
  query lifecycle + progress into the same kind of normalized event
  records (started/progress/terminated/error, with rows/sec);
- ``probe_source`` is the start-up connectivity probe: a bounded
  read proving the source exists and yields the expected schema.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class MonitorEvent:
    kind: str  # 'started' | 'progress' | 'terminated' | 'error'
    query_id: str
    name: str | None = None
    rows_per_sec: float | None = None
    num_input_rows: int | None = None
    error: str | None = None


@dataclass
class PipelineMonitor(StreamingQueryListener):
    """Collects normalized stream-health events (the reference's
    status/error/disconnected taxonomy, postgresql.js:203-215)."""

    events: list[MonitorEvent] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:
        self.events.append(
            MonitorEvent(kind="started", query_id=str(event.id), name=event.name)
        )

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.events.append(
            MonitorEvent(
                kind="progress",
                query_id=str(p.id),
                name=p.name,
                rows_per_sec=p.processedRowsPerSecond,
                num_input_rows=p.numInputRows,
            )
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover — timing-dependent
        pass

    def onQueryTerminated(self, event) -> None:
        kind = "error" if event.exception else "terminated"
        self.events.append(
            MonitorEvent(
                kind=kind,
                query_id=str(event.id),
                error=str(event.exception) if event.exception else None,
            )
        )

    # -- convenience accessors -------------------------------------
    def total_input_rows(self) -> int:
        return sum(e.num_input_rows or 0 for e in self.events if e.kind == "progress")

    def errors(self) -> list[MonitorEvent]:
        return [e for e in self.events if e.kind == "error"]


def probe_source(spark: SparkSession, path: str) -> DataFrame:
    """Connectivity probe before start() (src_probe,
    postgresql.js:259-288): bounded read of the source — the Spark
    analog of ``SELECT 1`` over the replication connection."""
    # same runtime conf as the loaders: fixtures store TIMESTAMP(NANOS)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(path).limit(1)
