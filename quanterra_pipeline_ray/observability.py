"""Logging + metrics surface.

Rebuilds the reference's structured-logging singleton (one-time handler
setup, reference `src/logging/config.py:8-52`) on stdlib logging, and adds
the metrics surface the reference never had: per-stage counters derived from
lineage records plus Ray Data's own execution stats.
"""

from __future__ import annotations

import json
import logging
import sys
from typing import Any

_CONFIGURED = False


def configure_logging(level: str = "INFO", json_lines: bool = False) -> logging.Logger:
    """One-time logging setup (singleton, like the reference's logger config).

    ``json_lines=True`` emits one JSON object per record — the
    machine-readable form a log shipper wants; rotation/retention is the
    collector's job on a cluster (stdout -> node log rotation), not the
    library's.
    """
    global _CONFIGURED
    logger = logging.getLogger("quanterra_pipeline_ray")
    if _CONFIGURED:
        return logger
    handler = logging.StreamHandler(sys.stderr)
    if json_lines:
        class _JsonFmt(logging.Formatter):
            def format(self, record: logging.LogRecord) -> str:
                return json.dumps(
                    {
                        "level": record.levelname,
                        "logger": record.name,
                        "msg": record.getMessage(),
                        **getattr(record, "ctx", {}),
                    },
                    sort_keys=True,
                )

        handler.setFormatter(_JsonFmt())
    else:
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
        )
    logger.addHandler(handler)
    logger.setLevel(level)
    logger.propagate = False
    _CONFIGURED = True
    return logger


def stage_metrics(records: list[dict[str, Any]]) -> dict[str, dict[str, float]]:
    """Aggregate lineage records into per-op counters.

    Returns ``{op: {partitions, rows_in, rows_out, max_duration_s,
    sum_duration_s}}`` — the per-stage observability the reference's
    per-item success/error logs approximated (reference
    `eodhd_processor.py:59,103`)."""
    out: dict[str, dict[str, float]] = {}
    for r in records:
        m = out.setdefault(
            r.get("op", "?"),
            {"partitions": 0, "rows_in": 0, "rows_out": 0, "max_duration_s": 0.0, "sum_duration_s": 0.0},
        )
        m["partitions"] += 1
        m["rows_in"] += int(r.get("rows_in", 0))
        m["rows_out"] += int(r.get("rows_out", 0))
        d = float(r.get("duration_s", 0.0))
        m["max_duration_s"] = max(m["max_duration_s"], d)
        m["sum_duration_s"] += d
    return out


def snapshot_metrics(table) -> dict[str, Any]:
    """Current-table gauges: snapshot id, files, rows, bytes, ops history."""
    snaps = table.snapshots()
    cur = table.snapshot()
    return {
        "current_snapshot": cur.snapshot_id,
        "commit_ts": cur.commit_ts,
        "num_snapshots": len(snaps),
        "total_rows": cur.summary.get("total_rows", 0),
        "total_bytes": cur.summary.get("total_bytes", 0),
        "num_files": cur.summary.get("num_files", 0),
        "operations": [s.operation for s in snaps],
    }


def dataset_stats(ds) -> str:
    """Ray Data execution stats for a consumed dataset (per-stage wall time,
    block counts — the profiling loop's raw material)."""
    return ds.stats()
