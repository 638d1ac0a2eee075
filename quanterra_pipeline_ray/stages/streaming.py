"""Streaming tumbling-window aggregation with watermark semantics.

The reference is batch-only (daily cron flows, reference
`prefect.yaml:103,117,131`); this stage adds the streaming-window operator a
transcript/event table needs for incremental maintenance:

* :class:`WatermarkWindower` — a pure state machine: feed it time-ordered
  event batches; it maintains open ``(key, window)`` counts, advances the
  watermark to ``max_seen_ts - allowed_lateness``, FINALIZES (emits) windows
  whose end the watermark has passed, and DROPS events older than the
  watermark (counted in ``late_dropped``).  Finalized windows are immutable
  — re-emission is impossible by construction.
* :func:`windowed_counts` — Ray plumbing: one hash shuffle on the key, then
  each bucket replays its sub-stream in timestamp order through its own
  windower (state per bucket, the actor-pool pattern).  Watermarks are
  per-bucket, matching a real multi-partition stream (per-partition
  watermarks) — a global watermark would need a cross-partition min, which
  is coordinator state, not a data-plane concern.

With ``allowed_lateness`` covering the whole stream every event is on time
and the result equals the batch tumbling-window aggregate — the
driver-checkable configuration; late-drop behavior is unit-tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class WatermarkWindower:
    """Tumbling-window count state machine with watermark-driven emission."""

    def __init__(
        self,
        window_us: int = 3_600_000_000,
        lateness_us: int = 0,
        key_col: str = "user_id",
        ts_col: str = "ts",
    ):
        self.window_us = int(window_us)
        self.lateness_us = int(lateness_us)
        self.key_col = key_col
        self.ts_col = ts_col
        # open-window state: int64 counts indexed by (key, window_start_us);
        # merged and emitted with vectorized Series ops, never a per-window loop
        self.open: pd.Series = pd.Series(
            [], dtype=np.int64, index=pd.MultiIndex.from_arrays([[], []], names=["k", "w"])
        )
        self.watermark = np.iinfo(np.int64).min
        self.late_dropped = 0

    def _emit_closed(self) -> pd.DataFrame:
        ends = self.open.index.get_level_values("w").to_numpy(dtype=np.int64) + self.window_us
        closed_mask = ends <= self.watermark
        closed = self.open[closed_mask]
        self.open = self.open[~closed_mask]
        rows = {
            self.key_col: closed.index.get_level_values("k").to_numpy(),
            "window_start": closed.index.get_level_values("w")
            .to_numpy(dtype=np.int64)
            .astype("datetime64[us]"),
            "n_events": closed.to_numpy(dtype=np.int64),
        }
        return pd.DataFrame(rows)

    def process(self, batch: pd.DataFrame) -> pd.DataFrame:
        """Feed one batch (any order within the batch); returns finalized
        windows.  Events with ts < current watermark are dropped as late."""
        ts = batch[self.ts_col].astype("int64").to_numpy()
        keys = batch[self.key_col].to_numpy()
        on_time = ts >= self.watermark
        self.late_dropped += int((~on_time).sum())
        ts, keys = ts[on_time], keys[on_time]
        if len(ts):
            starts = (ts // self.window_us) * self.window_us
            agg = (
                pd.DataFrame({"k": keys, "w": starts})
                .groupby(["k", "w"])
                .size()
                .astype(np.int64)
            )
            self.open = (
                agg
                if not len(self.open)
                else self.open.add(agg, fill_value=0).astype(np.int64)
            )
            self.watermark = max(self.watermark, int(ts.max()) - self.lateness_us)
        return self._emit_closed()

    def flush(self) -> pd.DataFrame:
        """End of stream: finalize every remaining open window."""
        self.watermark = np.iinfo(np.int64).max
        return self._emit_closed()


def windowed_counts(
    ds,
    window_us: int = 3_600_000_000,
    lateness_us: int | None = None,
    key_col: str = "user_id",
    ts_col: str = "ts",
    batch_rows: int = 4096,
    n_buckets: int = 64,
):
    """Watermarked tumbling-window counts per key over a Ray Dataset.

    One hash shuffle on the key; each bucket replays its rows in ts order
    through a :class:`WatermarkWindower` in ``batch_rows`` slices (the
    batch-at-a-time streaming discipline), then flushes.  ``lateness_us``
    ``None`` means unbounded lateness (nothing dropped — the batch-equal
    configuration).
    """
    from ..pipelines.relational import bucketed_groupby

    unbounded = lateness_us is None
    late = 0 if unbounded else int(lateness_us)

    def run_bucket(g: pd.DataFrame) -> pd.DataFrame:
        w = WatermarkWindower(
            window_us,
            int(2**62) if unbounded else late,
            key_col,
            ts_col,
        )
        g = g.sort_values([ts_col, key_col], kind="mergesort").reset_index(drop=True)
        outs = []
        for off in range(0, len(g), batch_rows):
            outs.append(w.process(g.iloc[off : off + batch_rows]))
        outs.append(w.flush())
        # drop empty emissions: an all-object empty frame would poison the
        # concat's key dtype (int64 -> object/float through Arrow)
        nonempty = [o for o in outs if len(o)]
        return pd.concat(nonempty, ignore_index=True) if nonempty else outs[-1]

    return bucketed_groupby(ds, [key_col], run_bucket, n_buckets)


def late_arrivals(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    arrival_col: str = "event_id",
    lateness_us: int = 0,
    n_buckets: int = 64,
    out_cols: list[str] | None = None,
):
    """Late-data AUDIT: flag events a per-key watermarking consumer with
    ``allowed_lateness`` would drop, given arrival order ``arrival_col``.

    An event is late iff its ts is below the key's watermark at arrival:
    ``ts < max(ts over earlier arrivals of the key) - lateness`` — the
    operator that sizes ``allowed_lateness`` before deploying a streaming
    window (run it over history, pick the lateness that bounds the drop
    rate).  One keyed exchange; per-key vectorized running max
    (``np.maximum.accumulate``) in arrival order.  SQL-exact: the running
    max is a plain window function.
    """
    from ..pipelines.relational import bucketed_groupby

    def audit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, arrival_col], kind="mergesort").copy()
        # normalize to MICROseconds regardless of the column's unit (a
        # from_pandas frame is datetime64[ns]; parquet reads are [us])
        ts = g[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        # segment-wise running max: reset the accumulator at key boundaries
        keys = g[key_col].to_numpy()
        new_seg = np.empty(len(g), dtype=bool)
        new_seg[:1] = True
        if len(g) > 1:
            new_seg[1:] = keys[1:] != keys[:-1]
        # per-key running max in arrival order (grouped cummax is vectorized)
        run = pd.Series(ts).groupby(pd.Series(keys).factorize()[0]).cummax().to_numpy()
        prev_max = np.empty(len(g), dtype=np.int64)
        prev_max[:1] = np.iinfo(np.int64).min
        if len(g) > 1:
            prev_max[1:] = np.where(new_seg[1:], np.iinfo(np.int64).min, run[:-1])
        # first arrival per key has no watermark (sentinel would wrap under
        # int64 subtraction) — explicitly never late
        has_prev = prev_max != np.iinfo(np.int64).min
        late = has_prev & (prev_max - ts > np.int64(lateness_us))
        out = g[out_cols or [key_col, arrival_col]].copy()
        out["late"] = late
        return out

    return bucketed_groupby(ds, [key_col], audit, n_buckets)
