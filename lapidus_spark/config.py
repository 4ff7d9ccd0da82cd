"""Config parse/validate + CLI semantics (SURVEY.md §2.8).

Mirrors the reference's control plane:
- JSON config with ≥1 backend (lapidus.js:55-56), backend type must
  be registered (lapidus.js:59-63 checks {type}-worker.js exists; we
  check a registry dict),
- PG backends require a slot matching \\w+ (postgresql.js:680-699),
- per-backend sink (plugin) config inheriting global sinks when unset
  (lapidus.js:96),
- emit flags cascade: the master ``emit_events`` switch overrides
  unset per-type flags (postgresql.js:153-170 setter cascade),
- ``--validate-only`` parses+validates and exits (index.js:46-49).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

BACKEND_TYPES = ("postgresql", "mysql", "mongo", "file", "jsoncdc", "kafka")
SINK_TYPES = ("console", "parquet", "memory", "kafka", "lake")
EVENT_TYPES = ("insert", "update", "delete")

#: plugin sink types (sink_plugin, lapidus.js:28-49): factories
#: registered via lapidus_spark.streaming.sinks.register_sink add
#: their config type name here to pass validation.
EXTRA_SINK_TYPES: set[str] = set()


class ConfigError(ValueError):
    pass


#: the reference's full emit-gate kind list (postgresql.js:90-97).
EMIT_KINDS = (
    "insert",
    "update",
    "delete",
    "schema",
    "transaction",
    "beginTransaction",
    "commitTransaction",
    "event",
)


class EmitFlags:
    """Per-kind emit gates with the reference's master cascade.

    Construction (postgresql.js:88-97): each kind resolves to its
    explicit boolean when given, else to the ``emitEvents`` master
    (default True). Re-assigning ``master`` afterwards mirrors the
    reference's ``emitEvents`` *setter* (postgresql.js:153-170): it
    overwrites EVERY per-kind flag, including explicitly-set ones.
    """

    def __init__(self, master: bool = True, explicit: dict[str, bool] | None = None):
        explicit = explicit or {}
        unknown = set(explicit) - set(EMIT_KINDS)
        if unknown:
            raise ConfigError(f"unknown emit kinds: {sorted(unknown)}; valid: {EMIT_KINDS}")
        self._master = bool(master)
        self._flags = {
            k: bool(explicit[k]) if isinstance(explicit.get(k), bool) else self._master
            for k in EMIT_KINDS
        }

    @property
    def master(self) -> bool:
        return self._master

    @master.setter
    def master(self, val: bool) -> None:
        val = bool(val)
        for k in EMIT_KINDS:
            self._flags[k] = val
        self._master = val

    def __getitem__(self, kind: str) -> bool:
        return self._flags[kind]

    def enabled(self) -> list[str]:
        return [k for k in EMIT_KINDS if self._flags[k]]


class WrapperCascade:
    """``onEventsWrapper`` cascade (postgresql.js:108-142).

    Per-kind wrappers default to the master wrapper; re-assigning the
    master re-points ONLY the kinds still equal to the old master —
    explicitly-overridden kinds keep their value. (Deliberately the
    opposite retention rule from ``EmitFlags.master``, matching the
    reference's two setters.) Wrapper values are opaque (the JSON
    config carries registry names; programmatic use carries
    callables)."""

    def __init__(self, master=None, explicit: dict | None = None):
        explicit = explicit or {}
        unknown = set(explicit) - set(EMIT_KINDS)
        if unknown:
            raise ConfigError(f"unknown wrapper kinds: {sorted(unknown)}; valid: {EMIT_KINDS}")
        self._master = master
        self._wrappers = {k: explicit.get(k, master) for k in EMIT_KINDS}

    @property
    def master(self):
        return self._master

    @master.setter
    def master(self, val) -> None:
        for k in EMIT_KINDS:
            if self._wrappers[k] is self._master:
                self._wrappers[k] = val
        self._master = val

    def __getitem__(self, kind: str):
        return self._wrappers[kind]


@dataclass
class SinkConfig:
    type: str
    options: dict = field(default_factory=dict)
    enabled_types: list[str] | None = None
    cache_prefix: str | None = None


@dataclass
class BackendConfig:
    name: str
    type: str
    path: str | None = None  # file backend: directory to stream
    slot: str | None = None  # postgresql only
    exclude_tables: list[str] = field(default_factory=list)
    emit_events: bool = True
    emit_types: list[str] | None = None  # None → derived from emit flags
    emit: EmitFlags = field(default_factory=EmitFlags)
    wrappers: WrapperCascade = field(default_factory=WrapperCascade)
    sinks: list[SinkConfig] = field(default_factory=list)
    #: micro-batch size knob for the replay backends (file/jsoncdc):
    #: at most N input files per trigger. None → Spark default (all
    #: available files in one batch).
    max_files_per_trigger: int | None = None
    #: kafka backend (the Debezium→Kafka production capture path,
    #: SURVEY §2.1): broker list + the topic carrying the LDJSON
    #: change lines; startingOffsets follows the Kafka source's
    #: 'earliest'/'latest' contract — checkpointed offsets win on
    #: restart (the slot-cursor analog)
    bootstrap_servers: str | None = None
    topic: str | None = None
    #: 'earliest' / 'latest', or a Kafka JSON offset spec
    #: ({"<topic>": {"<partition>": offset}}) pinning the exact start
    #: per partition — checkpointed offsets still win on restart
    starting_offsets: str = "earliest"
    #: admission control (VERDICT r10 #6, mirroring the lake source's
    #: maxVersionsPerBatch): at most N records per trigger across the
    #: topic's partitions — bounds micro-batch size against a deep
    #: backlog so a restarted daemon catches up in bounded steps
    #: instead of one giant batch. None → Spark default (unbounded).
    max_offsets_per_trigger: int | None = None

    def enabled_types(self) -> list[str] | None:
        """Flag cascade: an explicit ``emitTypes`` list wins; otherwise
        the per-kind emit gates decide — ``None`` (no gating) when
        every DML kind is enabled, else the enabled subset."""
        if self.emit_types is not None:
            return self.emit_types
        dml = [t for t in EVENT_TYPES if self.emit[t]]
        return None if len(dml) == len(EVENT_TYPES) else dml


@dataclass
class EngineConfig:
    backends: list[BackendConfig]
    sinks: list[SinkConfig] = field(default_factory=list)  # global default
    #: durable checkpoint directory (the daemon's slot-cursor
    #: analog, src_slot / postgresql.js slot semantics): a restarted
    #: daemon with the same checkpointRoot resumes from committed
    #: offsets instead of replaying history. None → ephemeral tempdir
    #: (tests / one-shot runs).
    checkpoint_root: str | None = None


def parse_config(text: str) -> EngineConfig:
    """jsonlint-style parse with friendly errors (lapidus.js:24-26)."""
    try:
        raw = json.loads(text)
    except json.JSONDecodeError as e:
        raise ConfigError(f"Parse error in config: {e}") from e
    return validate_config(raw)


def validate_config(raw: dict) -> EngineConfig:
    backends_raw = raw.get("backends")
    if not backends_raw:
        raise ConfigError("config requires at least one backend")  # lapidus.js:55-56
    global_sinks = [_sink(s) for s in raw.get("sinks", [])]
    backends = []
    for i, b in enumerate(backends_raw):
        btype = b.get("type")
        if btype not in BACKEND_TYPES:
            raise ConfigError(
                f"backend[{i}]: unknown type {btype!r}; valid: {BACKEND_TYPES}"
            )  # lapidus.js:59-63
        if btype == "postgresql":
            slot = b.get("slot")
            if not slot or not re.fullmatch(r"\w+", slot):
                raise ConfigError(
                    f"backend[{i}]: postgresql requires slot matching \\w+"
                )  # postgresql.js:680-699
        if btype in ("file", "jsoncdc") and not b.get("path"):
            # friendly error at validate time instead of a TypeError
            # deep inside stream_events (mirrors the pg slot check)
            raise ConfigError(f"backend[{i}]: {btype} backend requires a 'path'")
        if btype == "kafka":
            # mirror the kafka SINK's bootstrap_servers rule — fail at
            # validate time (-t), not at .load() inside the daemon
            if not b.get("bootstrapServers"):
                raise ConfigError(
                    f"backend[{i}]: kafka backend requires 'bootstrapServers'"
                )
            if not b.get("topic"):
                raise ConfigError(f"backend[{i}]: kafka backend requires 'topic'")
            so = b.get("startingOffsets", "earliest")
            if so not in ("earliest", "latest"):
                # the Kafka source's third form: a JSON offset spec
                # pinning exact per-partition starts — validate its
                # SHAPE at -t time (the source would only fail at
                # .start(), deep inside a running daemon)
                try:
                    spec = json.loads(so)
                except (TypeError, json.JSONDecodeError):
                    raise ConfigError(
                        f"backend[{i}]: startingOffsets must be 'earliest', "
                        f"'latest', or a JSON offset spec "
                        '({"<topic>": {"<partition>": offset}}), got '
                        f"{so!r}"
                    ) from None
                if (
                    not isinstance(spec, dict)
                    or b.get("topic") not in spec
                    or not all(
                        isinstance(parts, dict)
                        and all(
                            isinstance(p, str)
                            and p.lstrip("-").isdigit()
                            and isinstance(off, int)
                            for p, off in parts.items()
                        )
                        for parts in spec.values()
                    )
                ):
                    raise ConfigError(
                        f"backend[{i}]: startingOffsets JSON spec must map "
                        f"this backend's topic ({b.get('topic')!r}) to "
                        '{"<partition>": offset} with string partition ids '
                        "and integer offsets (-1 latest, -2 earliest)"
                    )
            mopt = b.get("maxOffsetsPerTrigger")
            if mopt is not None and (
                isinstance(mopt, bool) or not isinstance(mopt, int) or mopt < 1
            ):
                raise ConfigError(
                    f"backend[{i}]: maxOffsetsPerTrigger must be a positive int"
                )
        elif b.get("maxOffsetsPerTrigger") is not None:
            raise ConfigError(
                f"backend[{i}]: maxOffsetsPerTrigger applies to kafka "
                "backends only (the replay backends bound batches with "
                "maxFilesPerTrigger)"
            )
        mfpt = b.get("maxFilesPerTrigger")
        if mfpt is not None and (
            isinstance(mfpt, bool) or not isinstance(mfpt, int) or mfpt < 1
        ):
            raise ConfigError(
                f"backend[{i}]: maxFilesPerTrigger must be a positive int"
            )
        sinks = [_sink(s) for s in b.get("sinks", [])] or global_sinks  # lapidus.js:96
        master = b.get("emitEvents", True)
        if not isinstance(master, bool):
            master = True  # reference: non-boolean → default (postgresql.js:88)
        emit = EmitFlags(
            master=master,
            explicit={
                k: b[f"emit{k[0].upper()}{k[1:]}"]
                for k in EMIT_KINDS
                if isinstance(b.get(f"emit{k[0].upper()}{k[1:]}"), bool)
            },
        )
        wrappers = WrapperCascade(
            master=b.get("onEventsWrapper"),
            explicit={
                k: b[f"on{k[0].upper()}{k[1:]}Wrapper"]
                for k in EMIT_KINDS
                if f"on{k[0].upper()}{k[1:]}Wrapper" in b
            },
        )
        backends.append(
            BackendConfig(
                name=b.get("name", f"backend{i}"),
                type=btype,
                path=b.get("path"),
                slot=b.get("slot"),
                exclude_tables=list(b.get("excludeTables", [])),
                emit_events=emit.master,
                emit_types=b.get("emitTypes"),
                emit=emit,
                wrappers=wrappers,
                sinks=sinks,
                max_files_per_trigger=mfpt,
                bootstrap_servers=b.get("bootstrapServers"),
                topic=b.get("topic"),
                starting_offsets=b.get("startingOffsets", "earliest"),
                max_offsets_per_trigger=b.get("maxOffsetsPerTrigger"),
            )
        )
    ckpt_root = raw.get("checkpointRoot")
    if ckpt_root is not None and not isinstance(ckpt_root, str):
        raise ConfigError("checkpointRoot must be a path string")
    return EngineConfig(backends=backends, sinks=global_sinks, checkpoint_root=ckpt_root)


def _sink(s: dict) -> SinkConfig:
    stype = s.get("type")
    if stype not in SINK_TYPES and stype not in EXTRA_SINK_TYPES:
        raise ConfigError(
            f"sink: unknown type {stype!r}; valid: {SINK_TYPES + tuple(sorted(EXTRA_SINK_TYPES))}"
        )
    opts = s.get("options", {})
    # friendly errors at --validate-only time instead of TypeErrors
    # deep inside the writer builders (mirrors the pg slot check)
    if stype == "parquet" and not opts.get("path"):
        raise ConfigError("sink: parquet sink requires options.path")
    if stype == "kafka" and not opts.get("bootstrap_servers"):
        raise ConfigError("sink: kafka sink requires options.bootstrap_servers")
    if stype == "lake":
        if not opts.get("path"):
            raise ConfigError("sink: lake sink requires options.path")
        buckets = opts.get("buckets")
        # bool is an int subclass: "buckets": true would otherwise
        # validate and silently mean a degenerate 1-bucket layout
        if buckets is not None and (
            isinstance(buckets, bool) or not isinstance(buckets, int) or buckets < 1
        ):
            raise ConfigError("sink: lake sink options.buckets must be a positive int")
        retain = opts.get("retainVersions")
        if retain is not None and (
            isinstance(retain, bool) or not isinstance(retain, int) or retain < 1
        ):
            raise ConfigError(
                "sink: lake sink options.retainVersions must be a positive int"
            )
        compact_every = opts.get("compactEvery")
        if compact_every is not None and (
            isinstance(compact_every, bool)
            or not isinstance(compact_every, int)
            or compact_every < 1
        ):
            raise ConfigError(
                "sink: lake sink options.compactEvery must be a positive int"
            )
        concurrency = opts.get("concurrency")
        if concurrency is not None and concurrency not in ("locked", "optimistic"):
            raise ConfigError(
                "sink: lake sink options.concurrency must be 'locked' or "
                f"'optimistic', got {concurrency!r}"
            )
        extra_columns = opts.get("extraColumns")
        if extra_columns is not None and (
            not isinstance(extra_columns, list)
            or not all(isinstance(c, str) and c for c in extra_columns)
        ):
            raise ConfigError(
                "sink: lake sink options.extraColumns must be a list of "
                "envelope column names (schema evolution on MERGE)"
            )
        txn_app_id = opts.get("txnAppId")
        if txn_app_id is not None and (
            not isinstance(txn_app_id, str) or not txn_app_id
        ):
            raise ConfigError(
                "sink: lake sink options.txnAppId must be a non-empty string "
                "(idempotence marker — unique per sink/lake pair)"
            )
    return SinkConfig(
        type=stype,
        options=dict(s.get("options", {})),
        enabled_types=s.get("enabledTypes"),
        cache_prefix=s.get("cachePrefix"),
    )
