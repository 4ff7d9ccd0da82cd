"""CLI daemon entry (ctl_cli, reference index.js:5-53).

    python -m lapidus_spark -c config.json [--validate-only]
    python -m lapidus_spark --compact LAKE_DIR [--retain-versions K] [--optimistic]
    python -m lapidus_spark --rebucket LAKE_DIR --buckets N

``--validate-only`` parses and validates the config then exits 0/1
(the reference's ``-t`` flag, index.js:46-49). The maintenance
commands run a lake table operation and exit; they take the lake's
single-writer lock, so run them while the daemon's lake sink is
paused (a colliding writer raises instead of corrupting).
"""

from __future__ import annotations

import argparse
import sys

from lapidus_spark.config import ConfigError, parse_config
from lapidus_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="lapidus_spark")
    ap.add_argument("-c", "--config", help="path to JSON config")
    ap.add_argument(
        "--compact",
        metavar="LAKE_DIR",
        help="compact a lake table's degraded buckets and exit",
    )
    ap.add_argument(
        "--rebucket",
        metavar="LAKE_DIR",
        help="rebucket a lake table to --buckets and exit",
    )
    ap.add_argument("--buckets", type=int, help="target bucket count for --rebucket")
    ap.add_argument(
        "--retain-versions",
        type=int,
        default=1,
        help="committed versions whose data GC keeps (time-travel horizon)",
    )
    ap.add_argument(
        "--target-files-per-bucket",
        type=int,
        default=1,
        help="--compact rewrites buckets with more parquet files than this",
    )
    ap.add_argument(
        "--max-records-per-file",
        type=int,
        default=None,
        help="split valve for oversized buckets during --compact",
    )
    ap.add_argument(
        "--optimistic",
        action="store_true",
        help="--compact with optimistic concurrency: stage the rewrite "
        "without holding the writer lock (a running daemon keeps "
        "committing) and apply only the buckets no concurrent merge "
        "touched — losing a race defers maintenance, never blocks it",
    )
    ap.add_argument(
        "-t",
        "--validate-only",
        action="store_true",
        help="validate config and exit",
    )
    ap.add_argument(
        "--checkpoint-root",
        default=None,
        help="durable checkpoint dir (overrides config checkpointRoot); "
        "restarting with the same dir resumes from committed offsets",
    )
    args = ap.parse_args(argv)

    if args.compact or args.rebucket:
        if args.config:
            ap.error("maintenance commands do not take -c")
        if args.compact and args.rebucket:
            ap.error("--compact and --rebucket are mutually exclusive")
        if args.rebucket and args.buckets is None:
            ap.error("--rebucket requires --buckets")
        if args.rebucket and args.optimistic:
            ap.error("--optimistic applies to --compact only (a rebucket is a global layout swap)")
        from lapidus_spark.streaming.materialize import compact_lake, rebucket_lake

        spark = get_spark("lapidus_spark_maintenance")
        if args.compact:
            res = compact_lake(
                spark,
                args.compact,
                target_files_per_bucket=args.target_files_per_bucket,
                max_records_per_file=args.max_records_per_file,
                retain_versions=args.retain_versions,
                concurrency="optimistic" if args.optimistic else "locked",
            )
            skipped = f" ({res['skipped_buckets']} lost to concurrent merges)" if args.optimistic else ""
            print(
                f"compacted {res['compacted_buckets']} bucket(s); version {res['version']}{skipped}"
            )
        else:
            res = rebucket_lake(
                spark, args.rebucket, args.buckets, retain_versions=args.retain_versions
            )
            print(f"rebucketed to {res['n_buckets']}; version {res['version']}")
        return 0
    if not args.config:
        ap.error("-c/--config is required (or a maintenance command)")

    try:
        with open(args.config) as f:
            cfg = parse_config(f.read())
    except (OSError, ConfigError) as e:
        print(f"config error: {e}", file=sys.stderr)
        return 1
    if args.validate_only:
        print(f"config ok: {len(cfg.backends)} backend(s)")
        return 0

    from lapidus_spark.streaming.pipeline import run

    spark = get_spark("lapidus_spark_daemon")
    run(spark, cfg, checkpoint_root=args.checkpoint_root, await_termination=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
