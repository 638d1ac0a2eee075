"""Ingestion flow analog of the reference's richest DAG.

Mirrors ``eodhd_market_data_flow`` (reference
`src/orchestration/pipelines/ingest/eodhd_pipeline.py:18-70`) end-to-end,
Ray-Data-first: dimension fetch → semi-join filter → cartesian fan-out under
bounded concurrency → per-item retry + failure isolation → envelope →
deterministic-key store, with a quarantine output instead of swallowed
errors.  The "API" is :class:`..sources.api.DeterministicFakeAPI` (sandbox
has no network), so the whole flow is deterministic and testable.
"""

from __future__ import annotations

import json
import os
from typing import Any

import pandas as pd
import pyarrow as pa

from ..functions.envelope import EnvelopeBuilder, normalize_json_safe, substring_semi_join
from ..sources.api import fetch_fanout


def market_data_flow(
    out_dir: str,
    exchanges: list[str] = ("US", "LSE", "TO"),
    data_types: list[str] = ("eod", "dividends", "splits"),
    symbols_per_exchange: int = 4,
    concurrency: int = 8,
    seed: int = 42,
    fail_every: int = 0,
    allowed_exchange_suffixes: list[str] | None = None,
) -> dict[str, Any]:
    """Run the flow; returns summary counts (rows stored / quarantined).

    Layout mirrors the reference's deterministic storage keys: one parquet
    partition per ``{data_type}/{exchange}`` (re-runs overwrite the same
    partition — last-writer-wins idempotency).
    """
    # 1. dimension fetch (driver-side id lists, like the reference's
    #    exchanges/symbols lists crossing task boundaries in memory)
    symbols = [
        f"SYM{i}.{ex}" for ex in exchanges for i in range(symbols_per_exchange)
    ]

    # 2. the reference's only join: substring semi-join on exchange suffix
    import ray.data as rd

    sym_ds = rd.from_items([{"symbol": s} for s in symbols])
    if allowed_exchange_suffixes:
        sym_ds = substring_semi_join(sym_ds, "symbol", allowed_exchange_suffixes)
    kept_symbols = [r["symbol"] for r in sym_ds.take_all()]

    # 3. cartesian fan-out under bounded concurrency (Semaphore(8) analog)
    items = [
        {"endpoint": dt, "symbol": sym}
        for dt in data_types
        for sym in kept_symbols
    ]
    ok, quarantine = fetch_fanout(
        items, concurrency=concurrency, seed=seed, fail_every=fail_every
    )

    # 4. envelope + normalize + deterministic-key store, one partition per
    #    (data_type, exchange)
    def explode_payload(b: pd.DataFrame) -> pd.DataFrame:
        payloads = [json.loads(p) for p in b["payload"]]
        out = pd.DataFrame(
            {
                "endpoint": b["endpoint"].to_numpy(),
                "symbol": b["symbol"].to_numpy(),
                "value": [p["value"] for p in payloads],
                "volume": [p["volume"] for p in payloads],
            }
        )
        out["exchange"] = out["symbol"].str.split(".").str[-1]
        return out

    enveloped = (
        ok.map_batches(explode_payload, batch_format="pandas")
        .map_batches(EnvelopeBuilder("market_data"), batch_format="pyarrow")
        .map_batches(normalize_json_safe, batch_format="pyarrow")
    )
    os.makedirs(out_dir, exist_ok=True)
    enveloped.write_parquet(
        out_dir, partition_cols=["endpoint", "exchange"]
    )
    n_quarantined = quarantine.count()
    n_ok = enveloped.count()
    return {
        "stored_rows": n_ok,
        "quarantined_rows": n_quarantined,
        "partitions": sorted(
            f"{d}/{f}" for d in os.listdir(out_dir) for f in os.listdir(os.path.join(out_dir, d))
        )
        if os.path.isdir(out_dir)
        else [],
    }
