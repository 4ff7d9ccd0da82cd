"""CLI daemon entry (ctl_cli, reference index.js:5-53).

    python -m lapidus_spark -c config.json [--validate-only]

``--validate-only`` parses and validates the config then exits 0/1
(the reference's ``-t`` flag, index.js:46-49).
"""

from __future__ import annotations

import argparse
import sys

from lapidus_spark.config import ConfigError, parse_config
from lapidus_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="lapidus_spark")
    ap.add_argument("-c", "--config", required=True, help="path to JSON config")
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
