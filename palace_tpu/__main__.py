"""Command-line interface: ``python -m palace_tpu [options] CONFIG.json``.

Mirrors the reference CLI (reference: palace/main.cpp:168-197).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="palace_tpu",
        description="TPU-native 3D finite element solver for computational "
        "electromagnetics",
    )
    ap.add_argument("config", help="JSON configuration file")
    ap.add_argument("--dry-run", "-dry-run", action="store_true",
                    help="parse and validate the configuration, then exit")
    ap.add_argument("--output", "-o", default=None, help="override output directory")
    ap.add_argument("--version", action="version", version="palace-tpu 0.1.0")
    args = ap.parse_args(argv)

    import palace_tpu

    if args.dry_run:
        iodata = palace_tpu.run(args.config, dry_run=True)
        import json

        print(json.dumps(iodata.config.resolved_dict(), indent=2, default=str))
        return 0

    palace_tpu.run(args.config, output_dir=args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
