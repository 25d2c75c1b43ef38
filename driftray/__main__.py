"""CLI: ``python -m driftray <command>`` — the ``ray job submit`` entry
point for the validation engine (north_rule: resumable runs via repeated
submission; each invocation skips windows already bearing ``_DONE``).

Commands:
  validate  --input PATH --out DIR [--spec CFG.json] [--baseline P] [--bloom]
  promote   --out DIR --window N --baseline PATH
  alerts    --out DIR
  schema    --input PATH [--out DIR] [--spec CFG.json]
  profile   --input PATH [--columns a,b,c]
  compact   --input DIR --out DIR [--target-mb N] [--partition-col k]
  snapshot  log|compact|expire|head --table DIR [--version N]
            [--keep-last N] [--target-mb N]
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="driftray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="validate a windowed parquet table, resumably")
    v.add_argument("--input", required=True)
    v.add_argument("--out", required=True)
    v.add_argument("--spec", help="JSON TableSpec config (default: repo_files spec)")
    v.add_argument("--baseline", help="baseline sketch parquet for drift scoring")
    v.add_argument("--dims", help="JSON mapping dim_table -> parquet path")
    v.add_argument("--bloom", action="store_true", help="Bloom membership (scale path)")
    v.add_argument("--window-column", default="window_id")

    p = sub.add_parser("promote", help="adopt a window's profiles as the baseline")
    p.add_argument("--out", required=True)
    p.add_argument("--window", type=int, required=True)
    p.add_argument("--baseline", required=True)

    a = sub.add_parser("alerts", help="print the alert history of a run")
    a.add_argument("--out", required=True)

    s = sub.add_parser("schema", help="schema snapshot / drift vs a run dir "
                       "(metadata-only, no scan, no Ray session)")
    s.add_argument("--input", required=True)
    s.add_argument("--out", help="run dir holding the previous schema.json "
                   "(omit for a plain snapshot print)")
    s.add_argument("--spec", help="JSON TableSpec config for the preflight "
                   "findings (default: repo_files spec)")

    pr = sub.add_parser("profile", help="whole-table auto-profile (one "
                        "streaming pass, every column)")
    pr.add_argument("--input", required=True)
    pr.add_argument("--columns", help="comma-separated subset (default: all)")

    co = sub.add_parser("compact", help="rewrite small parquet files into "
                        "~target-size outputs, resumably per partition")
    co.add_argument("--input", required=True)
    co.add_argument("--out", required=True)
    co.add_argument("--target-mb", type=int, default=128)
    co.add_argument("--partition-col")

    sn = sub.add_parser("snapshot", help="snapshot-versioned table ops: "
                        "log / compact / expire / show a pinned version")
    sn.add_argument("action", choices=["log", "compact", "expire", "head"])
    sn.add_argument("--table", required=True)
    sn.add_argument("--version", type=int, help="pin for 'head'")
    sn.add_argument("--keep-last", type=int, default=2)
    sn.add_argument("--target-mb", type=int, default=128)

    args = ap.parse_args(argv)

    if args.cmd == "validate":
        _init_ray()
        from driftray.pipeline import run_validation
        from driftray.spec import repo_files_spec, spec_from_dict

        spec = (spec_from_dict(json.load(open(args.spec)))
                if args.spec else repo_files_spec())
        dims = json.load(open(args.dims)) if args.dims else None
        results = run_validation(args.input, args.out, spec,
                                 window_column=args.window_column,
                                 dim_paths=dims, baseline_path=args.baseline,
                                 use_bloom=args.bloom)
        for r in results:
            print(json.dumps(r.verdict_row(), default=float))
        print(f"# {len(results)} window(s) validated (others already _DONE)")
    elif args.cmd == "promote":
        from driftray.pipeline import promote_baseline

        promote_baseline(args.out, args.window, args.baseline)
        print(f"baseline <- window {args.window} -> {args.baseline}")
    elif args.cmd == "alerts":
        from driftray.alerts import AlertManager

        t = AlertManager(history_path=f"{args.out}/alerts").history()
        for row in t.to_pylist():
            print(json.dumps(row))
    elif args.cmd == "profile":
        _init_ray()
        import ray.data as rd

        from driftray.ops.profile import profile_table

        cols = args.columns.split(",") if args.columns else None
        prof = profile_table(rd.read_parquet(args.input, columns=cols),
                             columns=cols)
        for row in prof.to_dict("records"):
            print(json.dumps(row, default=str))
    elif args.cmd == "compact":
        _init_ray()
        from driftray.ops.layout import compact_partitions

        rep = compact_partitions(args.input, args.out,
                                 target_mb=args.target_mb,
                                 partition_col=args.partition_col)
        for row in rep.to_dict("records"):
            print(json.dumps(row))
    elif args.cmd == "snapshot":
        from driftray.ops.snapshots import (expire_snapshots, read_version,
                                            snapshot_compact, snapshot_log)

        if args.action == "log":
            for row in snapshot_log(args.table):
                print(json.dumps(row))
        elif args.action == "compact":
            _init_ray()
            version, rep = snapshot_compact(args.table,
                                            target_mb=args.target_mb)
            print(json.dumps({"version": version, **rep}))
        elif args.action == "expire":
            print(json.dumps(expire_snapshots(args.table,
                                              keep_last=args.keep_last)))
        else:  # head: row count + schema of a pinned version
            _init_ray()
            ds = read_version(args.table, args.version)
            print(json.dumps({"version": args.version, "rows": ds.count(),
                              "schema": str(ds.schema())}))
    elif args.cmd == "schema":
        # footer-only: no Ray session needed at any input size
        from driftray.schema_drift import (record_and_diff, snapshot_schema,
                                           spec_findings)
        from driftray.spec import repo_files_spec, spec_from_dict

        spec = (spec_from_dict(json.load(open(args.spec)))
                if args.spec else repo_files_spec())
        if args.out:
            # inspection must not consume the drift evidence: the stored
            # baseline advances only when a validate run completes
            print(json.dumps(record_and_diff(args.out, args.input, spec,
                                             persist=False)))
        else:
            schema = snapshot_schema(args.input)
            print(json.dumps({"schema": schema,
                              "spec_violations": spec_findings(schema, spec)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
