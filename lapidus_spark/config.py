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

BACKEND_TYPES = ("postgresql", "mysql", "mongo", "file")
SINK_TYPES = ("console", "parquet", "memory")
EVENT_TYPES = ("insert", "update", "delete")

#: plugin sink types (sink_plugin, lapidus.js:28-49): factories
#: registered via lapidus_spark.streaming.sinks.register_sink add
#: their config type name here to pass validation.
EXTRA_SINK_TYPES: set[str] = set()


class ConfigError(ValueError):
    pass


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
    emit_types: list[str] | None = None  # None → derived from emit_events
    sinks: list[SinkConfig] = field(default_factory=list)

    def enabled_types(self) -> list[str] | None:
        """Flag cascade (postgresql.js:153-170): explicit per-type list
        wins; otherwise the master switch enables all or none."""
        if self.emit_types is not None:
            return self.emit_types
        return None if self.emit_events else []


@dataclass
class EngineConfig:
    backends: list[BackendConfig]
    sinks: list[SinkConfig] = field(default_factory=list)  # global default


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
        sinks = [_sink(s) for s in b.get("sinks", [])] or global_sinks  # lapidus.js:96
        backends.append(
            BackendConfig(
                name=b.get("name", f"backend{i}"),
                type=btype,
                path=b.get("path"),
                slot=b.get("slot"),
                exclude_tables=list(b.get("excludeTables", [])),
                emit_events=bool(b.get("emitEvents", True)),
                emit_types=b.get("emitTypes"),
                sinks=sinks,
            )
        )
    return EngineConfig(backends=backends, sinks=global_sinks)


def _sink(s: dict) -> SinkConfig:
    stype = s.get("type")
    if stype not in SINK_TYPES and stype not in EXTRA_SINK_TYPES:
        raise ConfigError(
            f"sink: unknown type {stype!r}; valid: {SINK_TYPES + tuple(sorted(EXTRA_SINK_TYPES))}"
        )
    return SinkConfig(
        type=stype,
        options=dict(s.get("options", {})),
        enabled_types=s.get("enabledTypes"),
        cache_prefix=s.get("cachePrefix"),
    )
