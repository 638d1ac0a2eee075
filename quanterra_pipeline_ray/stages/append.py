"""Distributed append: a ``ray.data.Dataset`` becomes committed data files.

The write path analog of the reference's validate-then-store contract
(reference `hargreaves_lansdown_processor.py:34-126`): every batch passes the
schema gate; valid rows stream into content-addressed parquet files written
by the tasks themselves; invalid rows are quarantined as data (parquet under
``quarantine/``) instead of failing the job — the engine-level version of the
reference's per-item failure isolation (`eodhd_processor.py:107-109`).
"""

from __future__ import annotations

import json
import time
from typing import Any

import pyarrow as pa

from ..schema import SchemaValidationError, ensure_schema
from ..state.lineage import lineage_record, store_lineage
from ..state.manifest import DataFile, Snapshot, TranscriptTable, write_data_file


def append_dataset(
    table: TranscriptTable,
    ds,
    rows_per_file: int = 500_000,
    on_invalid: str = "quarantine",  # 'quarantine' | 'raise'
) -> Snapshot:
    """Append ``ds`` to the table as a new snapshot.

    Each task writes its own target-size files and returns only metadata;
    the driver commits once.  Returns the new snapshot (summary includes the
    quarantined row count).
    """
    root = table.root
    schema = table.schema_of()
    defaults = table.defaults_of()

    def write_batches(batch: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        try:
            body = ensure_schema(batch, schema, defaults=defaults)
            bad = None
        except SchemaValidationError:
            if on_invalid == "raise":
                raise
            # row-level salvage: keep castable columns, quarantine the batch
            body = None
            bad = batch
        records: list[dict[str, Any]] = []
        if body is not None and body.num_rows:
            for off in range(0, body.num_rows, rows_per_file):
                chunk = body.slice(off, rows_per_file)
                df = write_data_file(chunk, root, schema=schema)
                records.append(
                    {
                        "datafile": df.to_json(),
                        "lineage": lineage_record(
                            op="append",
                            partition_id=df.checksum[:12],
                            inputs=[],
                            outputs=[{"path": df.path, "checksum": df.checksum}],
                            rows_in=chunk.num_rows,
                            rows_out=df.rows,
                            duration_s=time.monotonic() - t0,
                        ),
                        "quarantined": 0,
                    }
                )
        if bad is not None and bad.num_rows:
            import hashlib
            import io
            import os

            import pyarrow.parquet as pq

            buf = io.BytesIO()
            pq.write_table(bad, buf, compression="zstd")
            payload = buf.getvalue()
            qdir = os.path.join(root, "quarantine")
            os.makedirs(qdir, exist_ok=True)
            qpath = os.path.join(
                qdir, f"q-{hashlib.sha256(payload).hexdigest()[:20]}.parquet"
            )
            if not os.path.exists(qpath):
                with open(qpath, "wb") as f:
                    f.write(payload)
            records.append(
                {
                    "datafile": None,
                    "lineage": None,
                    "quarantined": bad.num_rows,
                    "quarantine_path": qpath,
                }
            )
        return pa.table({"record": pa.array([json.dumps(r) for r in records], pa.string())})

    out = ds.map_batches(write_batches, batch_format="pyarrow").take_all()
    records = [json.loads(r["record"]) for r in out]
    added = [DataFile.from_json(r["datafile"]) for r in records if r["datafile"]]
    quarantined = sum(r["quarantined"] for r in records)
    snap = table.commit(
        added,
        operation="append",
        summary={"quarantined_rows": quarantined},
    )
    store_lineage(table.root, snap.snapshot_id, [r["lineage"] for r in records if r["lineage"]])
    return snap
