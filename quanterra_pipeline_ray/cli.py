"""Operational CLI: drive maintenance ops on a table root.

Mirrors the reference's console entry point (``quanterra-cli`` upload →
trigger flow → poll status, reference `src/cli/upload_transactions.py:19-139`
+ `pyproject.toml:37-38`): here the "flow" is a maintenance op on a table
root, the status poll is the final snapshot/metrics summary, and the
env-keyed config registry (:mod:`.config`) supplies defaults exactly like
the reference's dev/prod settings objects.

Usage::

    python -m quanterra_pipeline_ray.cli create  /tmp/t
    python -m quanterra_pipeline_ray.cli append  /tmp/t --parquet a.parquet b.parquet
    python -m quanterra_pipeline_ray.cli compact /tmp/t --env prod
    python -m quanterra_pipeline_ray.cli cluster /tmp/t --curve hilbert
    python -m quanterra_pipeline_ray.cli merge   /tmp/t --source updates.parquet
    python -m quanterra_pipeline_ray.cli expire  /tmp/t --keep-last 3 --sweep-orphans
    python -m quanterra_pipeline_ray.cli evolve  /tmp/t --add priority:int32:0
    python -m quanterra_pipeline_ray.cli changelog /tmp/t --from 3
    python -m quanterra_pipeline_ray.cli scan    /tmp/t --as-of-ts 250 [--conv c17]
    python -m quanterra_pipeline_ray.cli status  /tmp/t
    python -m quanterra_pipeline_ray.cli log     /tmp/t [--snapshot N]
    python -m quanterra_pipeline_ray.cli run-flow /tmp/t --flow maintenance [--no-wait]
    python -m quanterra_pipeline_ray.cli update --release-root /rel --install-path ~/.qpr --yes
    python -m quanterra_pipeline_ray.cli index-build /tmp/idx --corpus docs.parquet
    python -m quanterra_pipeline_ray.cli index-probe /tmp/idx --batch new.parquet --corpus all.parquet
    python -m quanterra_pipeline_ray.cli ingest-dedup /tmp/store --batch new.parquet

The CLI owns the Ray session (guarded init, shutdown on exit) — library code
never calls ``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="qpr", description=__doc__.split("\n\n")[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    def table_cmd(name: str, help_: str):
        c = sub.add_parser(name, help=help_)
        c.add_argument("root", help="table root directory")
        c.add_argument("--env", default="dev", help="settings environment (dev|prod)")
        return c

    table_cmd("create", "initialise an empty table root")

    c = table_cmd("append", "append parquet files as one snapshot")
    c.add_argument("--parquet", nargs="+", required=True)

    c = table_cmd("compact", "bin-pack small files to target size")
    c.add_argument("--target-bytes", type=int, default=None)

    c = table_cmd("cluster", "Z-order/Hilbert cluster")
    c.add_argument("--curve", choices=["z", "hilbert"], default=None)
    c.add_argument("--target-rows", type=int, default=None)

    c = table_cmd("merge", "MERGE INTO from a parquet source (optional __op col)")
    c.add_argument("--source", required=True)

    c = table_cmd("expire", "expire old snapshots (and optionally sweep orphans)")
    c.add_argument("--keep-last", type=int, default=None)
    c.add_argument("--sweep-orphans", action="store_true")
    c.add_argument("--dry-run", action="store_true")

    c = table_cmd("evolve", "add columns to the schema (metadata-only commit)")
    c.add_argument("--add", nargs="+", required=True, metavar="NAME:TYPE:DEFAULT",
                   help="e.g. priority:int32:0 origin:string:synth")

    c = table_cmd("changelog", "row-level delta between two snapshots")
    c.add_argument("--from", dest="from_snap", type=int, required=True)
    c.add_argument("--to", dest="to_snap", type=int, default=None)
    c.add_argument("--limit", type=int, default=20)

    c = table_cmd("scan", "row count of a (possibly time-travel) scan")
    c.add_argument("--snapshot", type=int, default=None)
    c.add_argument("--as-of-ts", type=int, default=None)
    c.add_argument("--conv", nargs="*", default=None, help="point lookup via stats pruning")

    c = table_cmd("run-flow", "trigger a named flow and poll to completion")
    c.add_argument("--flow", required=True, help="maintenance|compact|expire")
    c.add_argument("--param", nargs="*", default=[], metavar="K=V")
    c.add_argument("--poll-interval", type=float, default=5.0)
    c.add_argument("--no-wait", action="store_true", help="trigger only, print run id")
    c.add_argument(
        "--detach",
        action="store_true",
        help="submit as a DETACHED process (survives this CLI); poll with flow-wait",
    )

    c = table_cmd("flow-status", "state of a submitted flow run")
    c.add_argument("--run-id", required=True)

    c = table_cmd("flow-wait", "poll a submitted flow run to completion")
    c.add_argument("--run-id", required=True)
    c.add_argument("--poll-interval", type=float, default=5.0)
    c.add_argument("--timeout", type=float, default=3600.0)

    c = table_cmd("flow-worker", "internal: execute a submitted run in this process")
    c.add_argument("--flow", required=True)
    c.add_argument("--run-id", required=True)
    c.add_argument("--param", nargs="*", default=[], metavar="K=V")

    c = sub.add_parser("update", help="self-update from a release root (version manifest)")
    c.add_argument("--env", default="dev", help="settings environment (dev|prod)")
    c.add_argument("--release-root", required=True)
    c.add_argument("--install-path", required=True)
    c.add_argument("--yes", action="store_true", help="skip the update confirmation prompt")

    c = table_cmd("rollback", "restore a prior snapshot's state as a new commit")
    c.add_argument("--to", dest="to_snap", type=int, required=True)

    table_cmd("rewrite-manifests", "re-shard manifest metadata to target shard size")

    c = table_cmd("index-build", "build a persisted dedup index over a document corpus")
    c.add_argument("--corpus", nargs="+", required=True, help="parquet file(s): doc_id, text")
    c.add_argument("--kind", choices=["jaccard", "minhash"], default="jaccard")
    c.add_argument("--n-buckets", type=int, default=256)

    c = table_cmd("index-probe", "probe a batch against a persisted dedup index")
    c.add_argument("--batch", nargs="+", required=True)
    c.add_argument("--corpus", nargs="+", required=True,
                   help="parquet with texts for BOTH sides (history + batch)")
    c.add_argument("--kind", choices=["jaccard", "minhash"], default="jaccard")
    c.add_argument("--threshold", type=float, default=0.8)
    c.add_argument("--limit", type=int, default=20)

    c = table_cmd("ingest-dedup", "vet one batch against a store's history, append survivors")
    c.add_argument("--batch", nargs="+", required=True)
    c.add_argument("--threshold", type=float, default=0.8)

    c = table_cmd("index-compact", "merge a dedup index's per-bucket fragment files")
    c.add_argument("--kind", choices=["jaccard", "minhash"], default="jaccard")
    c.add_argument("--min-files", type=int, default=2)

    table_cmd("index-verify", "check a continuous store's table/index doc-set consistency")

    c = table_cmd("text-search", "token search via the secondary posting index")
    c.add_argument("--tokens", nargs="+", required=True)
    c.add_argument("--mode", choices=["and", "or"], default="and")
    c.add_argument("--build", action="store_true", help="(re)build the index first")
    c.add_argument(
        "--extend",
        action="store_true",
        help="extend the index to cover the current snapshot's new files first",
    )
    c.add_argument("--limit", type=int, default=10)

    table_cmd("status", "print snapshot/metrics summary")

    c = table_cmd("log", "print lineage records for a snapshot")
    c.add_argument("--snapshot", type=int, default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    from .config import get_settings
    from .observability import configure_logging, snapshot_metrics

    log = configure_logging()
    cfg = get_settings(args.env)

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray and args.cmd not in (
        "create", "status", "log", "evolve", "update", "rollback", "rewrite-manifests",
        "flow-status", "flow-wait",
    ):
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")

    try:
        from .state.manifest import TranscriptTable

        if args.cmd == "update":
            from .flowctl import ToolUpdater

            updater = ToolUpdater(args.release_root, args.install_path)
            confirm = (
                (lambda cur, new: True)
                if args.yes
                else (
                    lambda cur, new: input(
                        f"New version {new} available. Current version: {cur}. "
                        "Do you want to update? [y/N]: "
                    ).lower()
                    == "y"
                )
            )
            print(json.dumps(updater.check_for_updates(confirm), sort_keys=True))
            return 0
        if args.cmd == "create":
            TranscriptTable.create(args.root)
            print(json.dumps({"created": args.root}))
            return 0
        if args.cmd == "index-verify":
            from .pipelines.continuous import verify_index_coverage

            print(json.dumps(verify_index_coverage(args.root), sort_keys=True))
            return 0
        if args.cmd == "index-compact":
            from .functions.jaccard_index import index_file_count

            before = index_file_count(args.root)
            if args.kind == "jaccard":
                from .functions.jaccard_index import compact_jaccard_index as compact_idx
            else:
                from .functions.minhash_index import compact_minhash_index as compact_idx
            stats = compact_idx(args.root, min_files_per_bucket=args.min_files)
            print(
                json.dumps(
                    {**stats, "files_before": before, "files_after": index_file_count(args.root)},
                    sort_keys=True,
                )
            )
            return 0
        if args.cmd in ("index-build", "index-probe", "ingest-dedup"):
            # corpus-store commands: args.root is an index/store directory,
            # not a transcript-table root
            import ray.data as rd

            if args.cmd == "index-build":
                if args.kind == "jaccard":
                    from .functions.jaccard_index import build_jaccard_index as build
                else:
                    from .functions.minhash_index import build_minhash_index as build
                meta = build(
                    rd.read_parquet(list(args.corpus), columns=["doc_id", "text"]),
                    args.root,
                    n_buckets=args.n_buckets,
                )
                print(json.dumps(meta, sort_keys=True))
            elif args.cmd == "index-probe":
                if args.kind == "jaccard":
                    from .functions.jaccard_index import probe_jaccard_index as probe
                else:
                    from .functions.minhash_index import probe_minhash_index as probe
                pairs = probe(
                    rd.read_parquet(list(args.batch), columns=["doc_id", "text"]),
                    args.root,
                    rd.read_parquet(list(args.corpus), columns=["doc_id", "text"]),
                    threshold=args.threshold,
                ).to_pandas()
                print(
                    json.dumps(
                        {
                            "n_pairs": int(len(pairs)),
                            "sample": pairs.head(args.limit).to_dict("records")
                            if len(pairs)
                            else [],
                        },
                        sort_keys=True,
                    )
                )
            else:
                from .pipelines.incremental_ingest import ingest_with_dedup

                rep = ingest_with_dedup(
                    rd.read_parquet(list(args.batch), columns=["doc_id", "text"]),
                    args.root,
                    threshold=args.threshold,
                )
                print(json.dumps(rep, sort_keys=True))
            return 0
        table = TranscriptTable.load(args.root)

        if args.cmd == "append":
            import pyarrow.parquet as pq

            from .stages.append import append_dataset
            import ray.data as rd

            ds = rd.read_parquet(list(args.parquet))
            snap = append_dataset(table, ds, rows_per_file=cfg.target_rows)
            log.info("append committed snapshot %s", snap.snapshot_id)
        elif args.cmd == "compact":
            from .stages.compaction import compact

            snap = compact(
                table,
                target_bytes=args.target_bytes or cfg.target_file_bytes,
                carry_forward_ratio=cfg.carry_forward_ratio,
            )
            log.info("compact committed snapshot %s", snap.snapshot_id)
        elif args.cmd == "cluster":
            from .stages.zorder import cluster

            snap = cluster(
                table,
                ts_bucket_us=cfg.ts_bucket_us,
                target_rows=args.target_rows or cfg.target_rows,
                part_bits=cfg.part_bits,
                curve=args.curve or cfg.curve,
                hot_conv_threshold_rows=cfg.hot_conv_threshold_rows,
            )
            log.info("cluster committed snapshot %s", snap.snapshot_id)
        elif args.cmd == "merge":
            import pyarrow.parquet as pq

            from .stages.merge import merge_into

            src = pq.read_table(args.source)
            snap = merge_into(
                table,
                src,
                target_rows=cfg.target_rows,
                broadcast_threshold=cfg.merge_broadcast_threshold,
            )
            log.info("merge committed snapshot %s (%s)", snap.snapshot_id, snap.summary.get("plan"))
        elif args.cmd == "expire":
            from .stages.expire import expire_snapshots, sweep_orphans

            res = expire_snapshots(
                table, keep_last=args.keep_last or cfg.expire_keep_last, dry_run=args.dry_run
            )
            if args.sweep_orphans:
                res["orphans"] = sweep_orphans(
                    table, min_age_s=cfg.orphan_min_age_s, dry_run=args.dry_run
                )
            print(json.dumps(res))
        elif args.cmd == "evolve":
            from .stages.evolve import evolve_schema

            adds = []
            for spec in args.add:
                name, type_str, default = spec.split(":", 2)
                if type_str in ("int32", "int64"):
                    default = int(default)
                elif type_str == "float64":
                    default = float(default)
                elif type_str == "bool":
                    default = default.lower() in ("1", "true")
                adds.append((name, type_str, default))
            snap = evolve_schema(table, adds)
            log.info("schema evolved at snapshot %s", snap.snapshot_id)
        elif args.cmd == "text-search":
            from .stages.textindex import (
                build_text_index,
                extend_text_index,
                search_tokens_all,
                search_tokens_any,
            )

            if args.build:
                build_text_index(table)
            elif args.extend:
                extend_text_index(table)
            search = search_tokens_all if args.mode == "and" else search_tokens_any
            rows = search(table, list(args.tokens)).take(args.limit)
            print(
                json.dumps(
                    {
                        "mode": args.mode,
                        "tokens": list(args.tokens),
                        "rows": [
                            {k: str(v) for k, v in r.items()} for r in rows
                        ],
                    },
                    sort_keys=True,
                )
            )
            return 0
        elif args.cmd in ("run-flow", "flow-worker", "flow-status", "flow-wait"):
            from .flowctl import FlowRunner, default_flows

            params: dict = {}
            for kv in getattr(args, "param", []):
                k, v = kv.split("=", 1)
                try:
                    params[k] = json.loads(v)
                except json.JSONDecodeError:
                    params[k] = v
            runner = FlowRunner(args.root, default_flows())
            if args.cmd == "flow-status":
                print(json.dumps({"run_id": args.run_id, **runner.state(args.run_id)}, sort_keys=True))
                return 0
            if args.cmd == "flow-wait":
                doc = runner.poll(args.run_id, interval_s=args.poll_interval, timeout_s=args.timeout)
                print(json.dumps({"run_id": args.run_id, **doc}, sort_keys=True))
                return 0
            if args.cmd == "flow-worker":
                doc = runner.execute_published(args.flow, args.run_id, params)
                print(json.dumps({"run_id": args.run_id, **doc}, sort_keys=True))
                return 0 if doc["state"] == "COMPLETED" else 1
            if args.detach:
                run_id = runner.submit(args.flow, params)
                print(json.dumps({"run_id": run_id, "state": runner.state(run_id)["state"]}))
                return 0
            run_id = runner.trigger(args.flow, params)
            if args.no_wait:
                print(json.dumps({"run_id": run_id, "state": runner.state(run_id)["state"]}))
                return 0
            doc = runner.poll(run_id, interval_s=args.poll_interval)
            print(json.dumps({"run_id": run_id, **doc}, sort_keys=True))
            return 0
        elif args.cmd == "rollback":
            snap = table.rollback(args.to_snap)
            print(json.dumps({"rolled_back_to": args.to_snap, "snapshot": snap.snapshot_id}))
            return 0
        elif args.cmd == "rewrite-manifests":
            snap = table.rewrite_manifests()
            print(json.dumps({"snapshot": snap.snapshot_id, **snap.summary}, sort_keys=True))
            return 0
        elif args.cmd == "changelog":
            from .stages.changelog import changelog

            to_snap = args.to_snap if args.to_snap is not None else table.current_snapshot_id()
            out = changelog(table, args.from_snap, to_snap)
            rows = out.take(args.limit)
            for r in rows:
                print(json.dumps({k: str(v) for k, v in r.items()}, sort_keys=True))
            print(json.dumps({"changelog_rows": out.count(), "from": args.from_snap, "to": to_snap}))
            return 0
        elif args.cmd == "scan":
            if args.conv:
                ds = table.scan_convs(args.conv, args.snapshot)
            else:
                ds = table.scan(args.snapshot, as_of_ts=args.as_of_ts)
            print(json.dumps({"rows": ds.count(), "schema": table.schema_of(args.snapshot).names}))
            return 0
        elif args.cmd == "log":
            from .state.lineage import load_lineage

            sid = args.snapshot if args.snapshot is not None else table.current_snapshot_id()
            for rec in load_lineage(table.root, sid):
                print(json.dumps(rec, sort_keys=True))
            return 0

        print(json.dumps(snapshot_metrics(table), sort_keys=True))
        return 0
    finally:
        if owns_ray and ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
