"""Relational operators over the test star schema, Ray-Data-first.

These demonstrate the engine's general query capabilities (scan-prune,
vectorized filter/project, partial pre-aggregation before the groupby
shuffle, broadcast joins, top-k, windows) and are each paired with a DuckDB
oracle in ``__ray_entry__``.

Scale notes baked into every operator:
* reads pass ``columns=[...]`` so only needed columns leave storage,
* aggregations pre-combine inside ``map_batches`` (one row per key per
  block) before the small ``groupby`` shuffle,
* dimension tables (region/nation/customer) are broadcast via ``ray.put``
  and joined with vectorized pandas maps inside ``map_batches`` — no
  all-to-all shuffle for small-side joins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _rd():
    import ray.data as rd

    return rd


def _col_hash64(col) -> np.ndarray:
    """Vectorized uint64 hash of one Arrow column (any type) — integer
    columns avalanche directly (no string round trip), strings go through
    the version-stable :func:`..stages.skew.key_hash64`, everything else
    casts to string first.  Used ONLY for bucket assignment: the exact hash
    never affects results (rows with equal keys share a bucket either way)."""
    from ..stages.skew import _splitmix64, key_hash64

    t = col.type
    if pa.types.is_integer(t):
        v = col.fill_null(0).cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        return _splitmix64(v.view(np.uint64))
    if not (pa.types.is_string(t) or pa.types.is_large_string(t)):
        col = col.cast(pa.string())
    return key_hash64(col)


def _with_bucket_arrow(b: pa.Table, keys: list[str], n_buckets: int) -> pa.Table:
    """Append ``__bkt = hash(keys) % n_buckets`` to an Arrow block —
    zero-copy in, one int64 column appended, no pandas conversion."""
    h = np.zeros(b.num_rows, dtype=np.uint64)
    for kcol in keys:
        h ^= _col_hash64(b.column(kcol))
    return b.append_column(
        "__bkt", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
    )


def _sorted_segments(g: pa.Table, key_col: str, order_cols: list[str]):
    """Sort an Arrow bucket by ``(key, *order)`` and return
    ``(sorted_table, segment_starts, segment_lengths)`` where segments are
    the per-key runs — the shared backbone of the Arrow window kernels.
    ``combine_chunks`` before ``take`` avoids the multi-chunk take cliff."""
    import pyarrow.compute as pc

    g = g.combine_chunks()
    n = g.num_rows
    sort_keys = [(key_col, "ascending")] + [(o, "ascending") for o in order_cols]
    g = g.take(pc.sort_indices(g, sort_keys=sort_keys))
    k = g.column(key_col)
    if n > 1:
        neq = pc.not_equal(k.slice(1), k.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.flatnonzero(np.concatenate([[True], neq.astype(bool)]))
    else:
        starts = np.zeros(min(n, 1), dtype=np.int64)
    lens = np.diff(np.append(starts, n))
    return g, starts, lens


def bucketed_groupby(
    ds, keys: list[str], combine, n_buckets: int = 64, group_format: str = "pandas"
):
    """High-cardinality groupby without per-key reducer overhead.

    Adds ``__bkt = hash(keys) % n_buckets`` so Ray shuffles into a BOUNDED
    number of groups, then runs ``combine`` once per bucket.  Rows with
    equal keys always share a bucket, so per-bucket combines are exact.
    Use after a per-batch partial aggregation.

    The bucket map is Arrow-native (no pandas decode of the input blocks);
    ``group_format`` picks what ``combine`` receives ("pandas" by default,
    "pyarrow" for Arrow-native bucket kernels)."""

    def add_bucket(b: pa.Table) -> pa.Table:
        return _with_bucket_arrow(b, keys, n_buckets)

    if group_format == "pyarrow":

        def run_bucket_pa(g: pa.Table) -> pa.Table:
            return combine(g.drop_columns(["__bkt"]))

        return (
            ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bkt")
            .map_groups(run_bucket_pa, batch_format="pyarrow")
        )

    def run_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return combine(g.drop(columns="__bkt"))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bkt")
        .map_groups(run_bucket, batch_format="pandas")
    )


# ------------------------------------------------------------------ TPC-H Q1
def q1_pricing_summary(sf_dir: str, ship_before: str = "1998-09-01"):
    """TPC-H Q1 shape: per (returnflag, linestatus) sums/avgs/counts.

    Partial aggregation per batch → tiny groupby → final avg computation.

    Arithmetic is EXACT decimal: the 2-decimal money/rate columns are scaled
    to int64 "cents" per batch, summed as integers (associative — parallel
    partials cannot drift), and divided back once at the end.  This matches
    a SQL engine's ``SUM(CAST(x AS DECIMAL))::DOUBLE`` bit-for-bit as long
    as the scaled sums stay below 2^53 (true through ~sf0.3 for the charge
    column; beyond that, keep 128-bit partials).
    """
    rd = _rd()
    cols = [
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_shipdate",
    ]
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols)
    cutoff = np.datetime64(ship_before, "us")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_shipdate"] < cutoff]
        if not len(b):
            return pd.DataFrame()
        q = np.round(b["l_quantity"].to_numpy() * 100).astype(np.int64)
        p = np.round(b["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc = np.round(b["l_discount"].to_numpy() * 100).astype(np.int64)
        tax = np.round(b["l_tax"].to_numpy() * 100).astype(np.int64)
        g = pd.DataFrame(
            {
                "l_returnflag": b["l_returnflag"].to_numpy(),
                "l_linestatus": b["l_linestatus"].to_numpy(),
                "qty_c": q,
                "price_c": p,
                "disc_price_c": p * (100 - disc),  # 1e-4 units
                "charge_c": p * (100 - disc) * (100 + tax),  # 1e-6 units
                "disc_c": disc,
                "count_order": 1,
            }
        )
        return g.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()

    from ray.data.aggregate import Sum

    partials = ds.map_batches(partial, batch_format="pandas")
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty_c", alias_name="qty_c"),
        Sum("price_c", alias_name="price_c"),
        Sum("disc_price_c", alias_name="disc_price_c"),
        Sum("charge_c", alias_name="charge_c"),
        Sum("disc_c", alias_name="disc_c"),
        Sum("count_order", alias_name="count_order"),
    )
    out = agg.to_pandas()
    n = out["count_order"].astype(np.int64)
    res = pd.DataFrame(
        {
            "l_returnflag": out["l_returnflag"],
            "l_linestatus": out["l_linestatus"],
            "sum_qty": out["qty_c"] / 100.0,
            "sum_base_price": out["price_c"] / 100.0,
            "sum_disc_price": out["disc_price_c"] / 10_000.0,
            "sum_charge": out["charge_c"] / 1_000_000.0,
            # two-step division matches SQL's (exact-sum::DOUBLE) / COUNT(*)
            "avg_qty": (out["qty_c"] / 100.0) / n,
            "avg_price": (out["price_c"] / 100.0) / n,
            "avg_disc": (out["disc_c"] / 100.0) / n,
            "count_order": n,
        }
    )
    return res.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


# ------------------------------------------------------- broadcast dim joins
def orders_per_nation(sf_dir: str):
    """Orders per customer nation: broadcast customer->nation dim maps into a
    vectorized per-batch lookup; integer/string outputs only."""
    import ray

    rd = _rd()
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    c2n = cust.set_index("c_custkey")["c_nationkey"].to_dict()
    n2name = nation.set_index("n_nationkey")["n_name"].to_dict()
    ref = ray.put((c2n, n2name))

    def attach(b: pd.DataFrame) -> pd.DataFrame:
        c2n_, n2name_ = ray.get(ref)
        nk = b["o_custkey"].map(c2n_)
        b = pd.DataFrame({"n_name": nk.map(n2name_), "o_totalprice": b["o_totalprice"]})
        g = b.groupby("n_name", as_index=False).agg(
            order_count=("o_totalprice", "size"), max_price=("o_totalprice", "max")
        )
        return g

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    from ray.data.aggregate import Max, Sum

    out = (
        ds.map_batches(attach, batch_format="pandas")
        .groupby("n_name")
        .aggregate(Sum("order_count", alias_name="order_count"), Max("max_price", alias_name="max_price"))
        .to_pandas()
    )
    out["order_count"] = out["order_count"].astype(np.int64)
    return out.sort_values("n_name").reset_index(drop=True)


def lineitems_per_region(sf_dir: str, ship_before: str = "1995-06-01", n_buckets: int = 64):
    """4-way join lineitem→orders→customer→nation→region.

    Physical plan for two FACT tables + three dims:
    * customer/nation/region are true dimensions → composed into one
      ``custkey → region`` map, broadcast once (``ray.put``), applied to
      ORDERS batches vectorized (orders is scanned, never collected);
    * lineitem is pre-aggregated per ``l_orderkey`` inside ``map_batches``
      (one count row per orderkey per block) BEFORE the shuffle, so the
      exchange carries ~one row per order instead of one per lineitem;
    * lineitem⋈orders is a bucketed hash-shuffle join on ``l_orderkey``
      (both sides are fact-sized; neither is ever broadcast or collected).
    """
    import ray

    rd = _rd()
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    region = pd.read_parquet(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    c2n = cust.set_index("c_custkey")["c_nationkey"]
    n2r = nation.set_index("n_nationkey")["n_regionkey"]
    r2name = region.set_index("r_regionkey")["r_name"]
    c2region = c2n.map(n2r).map(r2name)  # dimension-only composed map
    ref = ray.put(c2region.to_dict())

    cutoff = np.datetime64(ship_before, "us")

    def orders_side(b: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        return pd.DataFrame(
            {
                "okey": b["o_orderkey"].to_numpy(),
                "r_name": b["o_custkey"].map(m).to_numpy(),
                "cnt": np.full(len(b), -1, dtype=np.int64),  # -1 marks the orders side
            }
        )

    def lineitem_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_shipdate"] < cutoff]
        if not len(b):
            return pd.DataFrame({"okey": [], "r_name": [], "cnt": []}).astype(
                {"okey": np.int64, "r_name": str, "cnt": np.int64}
            )
        g = (
            pd.DataFrame({"okey": b["l_orderkey"].to_numpy()})
            .groupby("okey", as_index=False)
            .size()
        )
        return pd.DataFrame(
            {"okey": g["okey"].to_numpy(), "r_name": "", "cnt": g["size"].to_numpy(dtype=np.int64)}
        )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        dim = g[g["cnt"] == -1][["okey", "r_name"]].drop_duplicates("okey")
        fact = g[g["cnt"] >= 0][["okey", "cnt"]]
        j = fact.merge(dim, on="okey", how="inner")
        return j.groupby("r_name", as_index=False)["cnt"].sum().rename(columns={"cnt": "n_items"})

    orders_ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(orders_side, batch_format="pandas")
    items_ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(lineitem_partial, batch_format="pandas")

    joined = bucketed_groupby(orders_ds.union(items_ds), ["okey"], join_bucket, n_buckets)

    # each bucket emits <= |regions| partial rows (5 here): the final combine
    # is n_buckets x |regions| rows — driver-side pandas, not another shuffle
    out = joined.to_pandas().groupby("r_name", as_index=False)["n_items"].sum()
    out["n_items"] = out["n_items"].astype(np.int64)
    return out.sort_values("r_name").reset_index(drop=True)


# --------------------------------------------------------------- sort / top-k
def topk_orders(sf_dir: str, k: int = 10):
    """Top-k orders by total price (deterministic tiebreak on key)."""
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    # distributed top-k: per-block top-k, then tiny driver-side final sort
    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).head(k)

    out = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    return (
        out.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def topk_per_group(
    ds,
    group_cols: list[str],
    order_cols: list[str],
    k: int,
    ascending: "list[bool] | None" = None,
    tiebreak: "list[str] | None" = None,
    n_buckets: int = 64,
):
    """Top-k rows per group (e.g. the k highest-quality docs per language).

    Combiner-first: every input block keeps at most k rows per group BEFORE
    the shuffle (the global per-group top-k is a subset of every block's),
    so exchange bytes are O(groups x k) per block, not O(rows); one keyed
    exchange on the group hash finishes the selection.  ``tiebreak`` columns
    (ascending) make the result deterministic when order values collide.
    """
    asc = ascending if ascending is not None else [False] * len(order_cols)
    tb = tiebreak or []
    sort_cols = order_cols + tb
    sort_asc = list(asc) + [True] * len(tb)

    def local_cap(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(sort_cols, ascending=sort_asc, kind="mergesort")
        return b.groupby(group_cols, sort=False).head(k)

    def final_cap(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, ascending=sort_asc, kind="mergesort")
        return g.groupby(group_cols, sort=False).head(k)

    capped = ds.map_batches(local_cap, batch_format="pandas")
    return bucketed_groupby(capped, group_cols, final_cap, n_buckets)


def sliding_window_counts(
    ds,
    key_col: str = "event_type",
    ts_col: str = "ts",
    size_us: int = 3_600_000_000,
    hop_us: int = 900_000_000,
    n_buckets: int = 64,
):
    """Sliding (hopping) window counts per key: every event lands in the
    ``size/hop`` windows covering it (e.g. 1 h windows hopping every 15 min
    → 4).  Completes the windows family (tumbling `events_hourly`, session
    `events_sessions`, watermark `stages/streaming`).

    Vectorized expansion (repeat/tile, no per-row loop) with a PER-BLOCK
    partial count before the keyed exchange — the shuffle carries
    ``(key, window) -> count`` partials, not the ``size/hop``-times-expanded
    events.  Requires ``size_us % hop_us == 0`` (every covering window is
    then exactly ``floor(ts/hop)*hop - k*hop`` for ``k < size/hop``).
    """
    if size_us % hop_us:
        raise ValueError("size_us must be a multiple of hop_us")
    nhops = size_us // hop_us

    def expand_count(b: pd.DataFrame) -> pd.DataFrame:
        us = b[ts_col].astype("int64").to_numpy()
        base = (us // hop_us) * hop_us
        reps = np.repeat(np.arange(len(b)), nhops)
        k = np.tile(np.arange(nhops, dtype=np.int64), len(b))
        g = pd.DataFrame(
            {
                key_col: b[key_col].to_numpy()[reps],
                "window_start": (base[reps] - k * hop_us).astype("datetime64[us]"),
            }
        )
        return (
            g.groupby([key_col, "window_start"], as_index=False)
            .size()
            .rename(columns={"size": "n_events"})
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby([key_col, "window_start"], as_index=False)["n_events"].sum()

    out = bucketed_groupby(
        ds.map_batches(expand_count, batch_format="pandas"),
        [key_col, "window_start"],
        combine,
        n_buckets,
    )
    return out.map_batches(
        lambda b: b.assign(n_events=b["n_events"].astype(np.int64)), batch_format="pandas"
    )


def pivot_counts(
    ds,
    key_col: str,
    pivot_col: str,
    values: list[str],
    prefix: str = "n_",
    n_buckets: int = 64,
):
    """Crosstab: one row per key, one count column per DECLARED pivot value
    (``n_<value>``).  The value set is an explicit argument, not discovered
    from the data — at scale the output schema must be known before the
    pipeline runs, and undeclared values are ignored deterministically.

    Per-block partial crosstabs (vectorized eq-masks, no per-row loop)
    before one keyed exchange; the reduce sums the partial count columns.
    """
    cols = [f"{prefix}{v}" for v in values]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({key_col: b[key_col]})
        pv = b[pivot_col].astype(str).to_numpy()
        for v, c in zip(values, cols):
            out[c] = (pv == v).astype(np.int64)
        return out.groupby(key_col, as_index=False)[cols].sum()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(key_col, as_index=False)[cols].sum()

    out = bucketed_groupby(
        ds.map_batches(partial, batch_format="pandas"), [key_col], combine, n_buckets
    )
    return out.map_batches(
        lambda b: b.assign(**{c: b[c].astype(np.int64) for c in cols}),
        batch_format="pandas",
    )


def unpivot_counts(
    wide_ds,
    key_col: str,
    values: list[str],
    prefix: str = "n_",
    name_col: str = "name",
    value_col: str = "n",
):
    """Inverse of :func:`pivot_counts`: wide count columns back to long
    ``(key, name, n)`` rows, zeros included (faithful inverse — dropping
    zeros would lose which combinations were observed as absent).  Pure
    per-batch reshape (vectorized tile/repeat), no exchange."""
    cols = [f"{prefix}{v}" for v in values]

    def melt(b: pd.DataFrame) -> pd.DataFrame:
        k = np.repeat(b[key_col].to_numpy(), len(values))
        names = np.tile(np.array(values, dtype=object), len(b))
        vals = b[cols].to_numpy(dtype=np.int64).reshape(-1)
        return pd.DataFrame({key_col: k, name_col: names, value_col: vals})

    return wide_ds.map_batches(melt, batch_format="pandas")


def rolling_max_by(
    ds,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    window: int,
    out_col: str = "rolling_max",
    n_buckets: int = 64,
):
    """Per-key rolling maximum over the last ``window`` rows (inclusive) in
    ``order_cols`` order — SQL ``MAX(v) OVER (PARTITION BY key ORDER BY ...
    ROWS window-1 PRECEDING)``.  The window-frame family's representative:
    one keyed exchange (all of a key's rows share a bucket), then a
    vectorized pandas ``groupby(...).rolling`` inside the bucket.  MAX is
    chosen as the exactly-reproducible frame aggregate (pure comparisons,
    no float summation order to match)."""

    def bucket_roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col] + order_cols, kind="mergesort")
        r = (
            g.groupby(key_col, sort=False)[value_col]
            .rolling(window, min_periods=1)
            .max()
            .reset_index(drop=True)
        )
        out = g.copy()
        out[out_col] = r.to_numpy()
        return out

    return bucketed_groupby(ds, [key_col], bucket_roll, n_buckets)


def rolling_quantile_by(
    ds,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    window: int,
    q: float,
    out_col: str = "rolling_q",
    n_buckets: int = 64,
):
    """Per-key rolling CONTINUOUS quantile over the last ``window`` rows
    (inclusive) — SQL ``quantile_cont(v, q) OVER (PARTITION BY key ORDER
    BY … ROWS window-1 PRECEDING)``.  Completes the window-frame family
    beside rolling MAX/SUM.

    Arrow-native one-exchange plan (the :func:`running_sum_by` shape):
    inside each bucket, the sorted values become ONE ``(n, window)``
    NaN-padded lag matrix (column j = value j rows back, NaN when that
    position crosses the segment head), every window row-sorts in a single
    ``np.sort`` call (NaNs to the back), and the interpolation is computed
    as ``(1-frac)*lower + frac*upper`` — DuckDB's ``quantile_cont``
    arithmetic to the bit (verified against its window form on raw
    doubles; both ``lower + frac*(upper-lower)`` and numpy's own
    ``quantile`` lerp drift by 1 ulp on some pairs).  Memory per bucket is
    ``n × window`` doubles, so size ``window`` like any frame clause
    (frames are small by definition; unbounded frames belong to
    :func:`running_sum_by`-style scans)."""

    def bucket_q(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.append_column(out_col, pa.array([], pa.float64()))
        g, starts, lens = _sorted_segments(g, key_col, order_cols)
        n = g.num_rows
        v = g.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        lag = np.full((n, window), np.nan)
        rows = np.arange(n, dtype=np.int64)
        for j in range(window):
            ok = pos >= j
            lag[ok, j] = v[rows[ok] - j]
        lag.sort(axis=1)  # NaNs sort to the back: valid prefix per row
        count = np.minimum(pos + 1, window)
        idx = q * (count - 1).astype(np.float64)
        lo_i = np.floor(idx).astype(np.int64)
        frac = idx - lo_i
        hi_i = np.minimum(lo_i + 1, count - 1)
        lo = lag[rows, lo_i]
        hi = lag[rows, hi_i]
        out = (1.0 - frac) * lo + frac * hi
        return g.append_column(out_col, pa.array(out))

    return bucketed_groupby(ds, [key_col], bucket_q, n_buckets, group_format="pyarrow")


def distinct_count_by(
    ds,
    group_cols: list[str],
    distinct_col: str,
    out_col: str = "n_distinct",
    n_buckets: int = 64,
):
    """EXACT ``COUNT(DISTINCT distinct_col)`` per group at any cardinality.

    Two passes, both with map-side combining: (1) per-block dedupe of
    ``(group, distinct)`` pairs, keyed exchange on the PAIR hash, per-bucket
    global dedupe — the exchange carries each distinct pair once per block
    at most; (2) per-block partial counts of the now-unique pairs, keyed
    exchange on the group hash, sum.  The approximate counterpart (KMV
    sketches, `state/bloom.py`) trades this second exchange for fixed-size
    mergeable state; this is the exact path.
    """
    cols = group_cols + [distinct_col]

    def local_distinct(b: pd.DataFrame) -> pd.DataFrame:
        return b[cols].drop_duplicates()

    def global_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    uniq = bucketed_groupby(
        ds.map_batches(local_distinct, batch_format="pandas"), cols, global_distinct, n_buckets
    )

    def partial_count(b: pd.DataFrame) -> pd.DataFrame:
        c = b.groupby(group_cols, as_index=False).size()
        return c.rename(columns={"size": out_col})

    def sum_counts(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(group_cols, as_index=False)[out_col].sum()

    out = bucketed_groupby(
        uniq.map_batches(partial_count, batch_format="pandas"), group_cols, sum_counts, n_buckets
    )
    return out.map_batches(
        lambda b: b.assign(**{out_col: b[out_col].astype(np.int64)}), batch_format="pandas"
    )


def quantiles_disc(ds, col: str, qs: list[float], n_buckets: int = 64) -> pd.DataFrame:
    """EXACT discrete quantiles (nearest-rank, SQL ``quantile_disc``
    semantics: the value at sorted index ``max(0, ceil(q*n) - 1)``) of an
    integer-ish column, computed distributed in one pass.

    Plan: per-block partial value-counts (map-side combine) -> one keyed
    exchange on value hash -> per-bucket count merge -> the driver reduces
    the DISTINCT-VALUE histogram (one ``(value, count)`` row per distinct
    value — bounded by the value domain, not the row count; fine for
    lengths/token counts/scores, not for continuous floats).  Exact at any
    row count because counts, not samples, cross the exchange.
    """

    def partial_counts(b: pd.DataFrame) -> pd.DataFrame:
        c = b.groupby(col, sort=False).size()
        return pd.DataFrame({col: c.index.to_numpy(), "n": c.to_numpy(dtype=np.int64)})

    def merge_counts(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(col, sort=False)["n"].sum()
        return pd.DataFrame({col: c.index.to_numpy(), "n": c.to_numpy(dtype=np.int64)})

    hist = (
        bucketed_groupby(
            ds.map_batches(partial_counts, batch_format="pandas"),
            [col],
            merge_counts,
            n_buckets,
        )
        .to_pandas()
        .sort_values(col)
    )
    counts = hist["n"].to_numpy(dtype=np.int64)
    values = hist[col].to_numpy()
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        rank = max(1, int(np.ceil(q * n)))  # 1-based nearest rank
        idx = int(np.searchsorted(cum, rank, side="left"))
        out_q.append(float(q))
        out_v.append(values[min(idx, len(values) - 1)])
    return pd.DataFrame({"q": np.array(out_q, dtype=np.float64), "v": out_v})


def quantiles_cont(ds, col: str, qs: list[float], n_buckets: int = 64) -> pd.DataFrame:
    """EXACT interpolated quantiles (SQL ``quantile_cont``: position
    ``q*(n-1)``, result ``lo*(1-frac) + hi*frac`` — the exact float form
    DuckDB computes, verified term-for-term) over the same distributed
    value-count histogram as :func:`quantiles_disc`: counts, not samples,
    cross the exchange, and the driver reduces the distinct-value domain."""

    def partial_counts(b: pd.DataFrame) -> pd.DataFrame:
        c = b.groupby(col, sort=False).size()
        return pd.DataFrame({col: c.index.to_numpy(), "n": c.to_numpy(dtype=np.int64)})

    def merge_counts(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(col, sort=False)["n"].sum()
        return pd.DataFrame({col: c.index.to_numpy(), "n": c.to_numpy(dtype=np.int64)})

    hist = (
        bucketed_groupby(
            ds.map_batches(partial_counts, batch_format="pandas"),
            [col],
            merge_counts,
            n_buckets,
        )
        .to_pandas()
        .sort_values(col)
    )
    counts = hist["n"].to_numpy(dtype=np.int64)
    values = hist[col].to_numpy(dtype=np.float64)
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        pos = q * (n - 1)
        lo_rank, hi_rank = int(np.floor(pos)), int(np.ceil(pos))
        frac = pos - lo_rank
        # sorted-index -> distinct-value lookup via the cumulative counts
        lo_v = values[int(np.searchsorted(cum, lo_rank + 1, side="left"))]
        hi_v = values[int(np.searchsorted(cum, hi_rank + 1, side="left"))]
        out_q.append(float(q))
        out_v.append(lo_v * (1.0 - frac) + hi_v * frac)
    return pd.DataFrame(
        {"q": np.array(out_q, dtype=np.float64), "v": np.array(out_v, dtype=np.float64)}
    )


# ------------------------------------------------------------------- windows
def events_hourly(sf_dir: str):
    """Tumbling 1h window: events per (user_id, hour). Int outputs only."""
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("int64")
        hour = (us // 3_600_000_000) * 3_600_000_000
        g = pd.DataFrame({"user_id": b["user_id"], "hour": hour.astype("datetime64[us]")})
        return g.groupby(["user_id", "hour"], as_index=False).size().rename(columns={"size": "n_events"})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["user_id", "hour"], as_index=False)["n_events"].sum()

    # (user, hour) cardinality is unbounded -> bucketed reduce, not per-key
    out = bucketed_groupby(
        ds.map_batches(bucket, batch_format="pandas"), ["user_id", "hour"], combine
    ).to_pandas()
    out["n_events"] = out["n_events"].astype(np.int64)
    out["hour"] = out["hour"].astype("datetime64[us]")
    return out.sort_values(["user_id", "hour"]).reset_index(drop=True)


def events_sessions(sf_dir: str, gap_s: int = 1800, n_buckets: int = 64):
    """Session count per user: 30-min-gap sessionization.

    Bucketed by user hash (bounded Ray group count — never one Ray group per
    user); within a bucket ALL users are sessionized in one vectorized pandas
    pass (sort by (user, ts, event_id), diff within user via shift compare).
    """
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"])
    gap_us = gap_s * 1_000_000

    def sess_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        us = g["ts"].astype("int64").to_numpy()
        uid = g["user_id"].to_numpy()
        new_session = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            same_user = uid[1:] == uid[:-1]
            new_session[1:] = (~same_user | (np.diff(us) > gap_us)).astype(np.int64)
        out = pd.DataFrame({"user_id": uid, "n": new_session})
        return (
            out.groupby("user_id", as_index=False)["n"].sum().rename(columns={"n": "n_sessions"})
        )

    out = bucketed_groupby(ds, ["user_id"], sess_bucket, n_buckets).to_pandas()
    out["n_sessions"] = out["n_sessions"].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


def distinct_event_types(sf_dir: str):
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
    vals = sorted(ds.unique("event_type"))
    return pd.DataFrame({"event_type": vals})


def docs_stats_by_lang(sf_dir: str):
    """Per-language doc stats — exact integer aggregation with per-batch
    pre-combine before the shuffle."""
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("lang", as_index=False).agg(
            n_docs=("n_chars", "size"),
            sum_chars=("n_chars", "sum"),
            max_chars=("n_chars", "max"),
            min_chars=("n_chars", "min"),
        )
        return g

    from ray.data.aggregate import Max, Min, Sum

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_chars", alias_name="sum_chars"),
            Max("max_chars", alias_name="max_chars"),
            Min("min_chars", alias_name="min_chars"),
        )
        .to_pandas()
    )
    for c in ["n_docs", "sum_chars", "max_chars", "min_chars"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


def rollup_sums(
    ds,
    keys: list[str],
    val_col: str,
    n_out: str = "n_rows",
    sum_out: str = "sum_val",
    sets: str | list[tuple[str, ...]] = "rollup",
) -> pd.DataFrame:
    """``GROUP BY ROLLUP / CUBE / GROUPING SETS`` — grouping-sets
    aggregate in ONE streamed pass: per-block ``(count, sum)`` partials
    at the finest grain (map-side combine before the shuffle), a small
    grouped reduce, then every coarser grouping set — the d prefixes for
    ``sets="rollup"``, all 2^d subsets for ``sets="cube"``, or an
    explicit list of key tuples (each a subset of ``keys``; include
    ``tuple(keys)`` itself to get the finest level) — is re-aggregated
    from that tiny finest-grain result on the driver.  O(distinct key
    combos) driver work; the data is never scanned twice.  Rolled-up key
    positions are NULL, as in SQL.  Exact when the summed values are
    integer-valued (partial sums re-associate losslessly).

    Reference parity: the reference's grouped report writers aggregate at
    one grain per pass (`src/services/eodhd_processor.py` projection +
    group loops); ROLLUP/CUBE/GROUPING SETS generalize that to the full
    level lattice."""
    from itertools import combinations

    from ray.data.aggregate import Sum

    if isinstance(sets, str) and sets not in ("rollup", "cube"):
        raise ValueError(f"sets must be 'rollup', 'cube' or a list, got {sets!r}")
    if not isinstance(sets, str):
        bad = [s for s in sets for k in s if k not in keys]
        if bad:
            raise ValueError(f"grouping sets reference unknown keys: {bad}")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(keys, as_index=False, dropna=False).agg(
            __n=(val_col, "size"), __s=(val_col, "sum")
        )

    finest = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(keys)
        .aggregate(Sum("__n", alias_name="__n"), Sum("__s", alias_name="__s"))
        .to_pandas()
    )
    out_cols = list(keys) + [n_out, sum_out]
    levels = []
    if sets == "rollup":
        grouping_sets = [tuple(keys[:d]) for d in range(len(keys) - 1, -1, -1)]
    elif sets == "cube":
        grouping_sets = [
            c
            for d in range(len(keys) - 1, -1, -1)
            for c in combinations(keys, d)
        ]
    else:
        grouping_sets = [tuple(s) for s in sets]
    if isinstance(sets, str) or tuple(keys) in grouping_sets:
        levels.append(
            finest.rename(columns={"__n": n_out, "__s": sum_out})[out_cols]
        )
        grouping_sets = [s for s in grouping_sets if s != tuple(keys)]
    for kept in grouping_sets:
        kept = list(kept)
        if kept:
            g = finest.groupby(kept, as_index=False, dropna=False)[
                ["__n", "__s"]
            ].sum()
        else:
            g = finest[["__n", "__s"]].sum().to_frame().T
        for k in keys:
            if k not in kept:
                g[k] = None
        g = g.rename(columns={"__n": n_out, "__s": sum_out})
        levels.append(g[out_cols])
    out = pd.concat(levels, ignore_index=True)
    out[n_out] = out[n_out].astype(np.int64)
    out[sum_out] = out[sum_out].astype(np.float64)
    for k in keys:
        out[k] = out[k].astype(object).where(pd.notna(out[k]), None)
    return out.sort_values(
        keys, na_position="last", kind="mergesort"
    ).reset_index(drop=True)


def anti_join_keys(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    n_buckets: int = 64,
):
    """NOT EXISTS anti-join: rows of ``left_ds`` whose key has no match in
    ``right_ds``.

    Only KEYS ever cross an exchange: both sides map-side-dedup to distinct
    keys, one bucketed groupby computes the unmatched-left key set per
    bucket, and the final filter broadcasts that set back over the left
    rows.  The broadcast is bounded by the RESULT's distinct keys — if that
    set doesn't fit one node, the row-wise result doesn't either, so this
    is the honest scaling contract (the alternative, shipping full left
    rows through the exchange, moves strictly more bytes)."""
    import ray
    import pyarrow.compute as pc

    rd = _rd()

    def keys_of(col, side):
        def f(b: pa.Table) -> pa.Table:
            if col not in b.column_names:  # Ray 2.49 empty blocks are column-less
                return pa.table(
                    {"k": pa.array([], pa.int64()), "side": pa.array([], pa.int8())}
                )
            k = pc.unique(b.column(col))
            return pa.table(
                {"k": k, "side": pa.array(np.full(len(k), side, dtype=np.int8))}
            )

        return f

    both = left_ds.map_batches(keys_of(left_key, 0), batch_format="pyarrow").union(
        right_ds.map_batches(keys_of(right_key, 1), batch_format="pyarrow")
    )

    def add_bkt(b: pa.Table) -> pa.Table:
        return _with_bucket_arrow(b, ["k"], n_buckets)

    def unmatched(g: pd.DataFrame) -> pd.DataFrame:
        # per-bucket distinct keys only — tiny frames, pandas is fine here
        if "k" not in g.columns:  # Ray 2.49 empty exchange partitions are column-less
            return pd.DataFrame({"k": pd.Series(dtype=np.int64)})
        right = set(g.loc[g["side"] == 1, "k"])
        lk = g.loc[g["side"] == 0, "k"].drop_duplicates()
        return pd.DataFrame({"k": lk[~lk.isin(right)]})

    adf = (
        both.map_batches(add_bkt, batch_format="pyarrow")
        .groupby("__bkt")
        .map_groups(unmatched, batch_format="pandas")
        .to_pandas()
    )
    # an all-empty result loses its schema on the pandas round trip
    anti = adf["k"].to_numpy() if "k" in adf.columns else np.array([], dtype=np.int64)
    ref = ray.put(np.sort(anti))

    def filt(b: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        if not len(keys):
            return b.slice(0, 0)
        col = b.column(left_key)
        vs = pa.array(keys)
        if vs.type != col.type:
            vs = vs.cast(col.type)
        return b.filter(pc.is_in(col, value_set=vs))

    return left_ds.map_batches(filt, batch_format="pyarrow")


def running_sum_by(
    ds,
    key_col: str,
    val_col: str,
    order_cols: list[str],
    out_col: str = "run_sum",
    n_buckets: int = 64,
):
    """Per-key running sum (``SUM(val) OVER (PARTITION BY key ORDER BY
    ...)``): one keyed exchange, then a vectorized in-bucket sort + cumsum.

    Arithmetic is exact int64 cents (the q1 pattern): scaled integer
    cumsum is associative and order-stable, so the result bit-matches a
    SQL window over ``CAST(val AS DECIMAL(18,2))`` regardless of the
    engine's accumulation tree.  Arrow-native end to end: the bucket map
    appends one int64 column to the zero-copy block, and the in-bucket
    kernel is a single Arrow sort + numpy segment cumsum (no pandas
    decode on this table-sized path)."""
    import pyarrow.compute as pc

    def bucket_cumsum(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.append_column(out_col, pa.array([], pa.float64()))
        g, starts, lens = _sorted_segments(g, key_col, order_cols)
        cents = np.round(
            g.column(val_col).to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        c = np.cumsum(cents)
        base = np.concatenate([[0], c[starts[1:] - 1]])
        run = c - np.repeat(base, lens)
        return g.append_column(out_col, pa.array(run / 100.0))

    return bucketed_groupby(
        ds, [key_col], bucket_cumsum, n_buckets, group_format="pyarrow"
    )


def histogram_bins(
    ds, col: str, lo: float, hi: float, nbins: int, n_buckets: int = 64
) -> pd.DataFrame:
    """Equi-width histogram with SQL ``width_bucket`` semantics (bin 0 below
    ``lo``, ``nbins+1`` at/above ``hi``, else ``floor((x-lo)/(hi-lo)*n)+1``).
    Per-block partial counts (map-side combine) → one tiny keyed exchange of
    ``O(nbins)`` rows per block — the canonical distributed histogram."""

    def partial(b: pa.Table) -> pa.Table:
        x = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        bins = np.floor((x - lo) / (hi - lo) * nbins).astype(np.int64) + 1
        bins = np.where(x < lo, 0, np.where(x >= hi, nbins + 1, np.clip(bins, 1, nbins)))
        counts = np.bincount(bins, minlength=nbins + 2)
        nz = np.flatnonzero(counts)
        return pa.table(
            {"bin": pa.array(nz.astype(np.int64)), "n": pa.array(counts[nz].astype(np.int64))}
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("bin", as_index=False)["n"].sum()
        return c

    out = bucketed_groupby(
        ds.map_batches(partial, batch_format="pyarrow"), ["bin"], combine, n_buckets
    ).to_pandas()
    return out.sort_values("bin").reset_index(drop=True)


def string_agg_by(
    ds,
    key_col: str,
    val_col: str,
    order_cols: list[str],
    sep: str = "|",
    out_col: str = "agg",
    n_buckets: int = 64,
):
    """Per-key ORDERED string aggregation (``string_agg(val, sep ORDER BY
    …)``): one keyed exchange, in-bucket sort, vectorized groupby-join.
    Order columns make the result deterministic on any cluster shape.
    Arrow-native: the per-key runs become one ListArray over the sorted
    values and ``pc.binary_join`` concatenates every group in a single
    kernel call — no pandas decode, no per-group Python join."""
    import pyarrow.compute as pc

    def bucket_agg(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            kt = (
                g.column(key_col).type
                if key_col in g.column_names
                else pa.string()
            )
            return pa.table(
                {key_col: pa.array([], kt), out_col: pa.array([], pa.string())}
            )
        g, starts, _lens = _sorted_segments(g, key_col, order_cols)
        n = g.num_rows
        vals = g.column(val_col).combine_chunks()
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.chunk(0) if vals.num_chunks else pa.array([], vals.type)
        if not pa.types.is_string(vals.type):
            vals = vals.cast(pa.string())
        offsets = pa.array(np.append(starts, n).astype(np.int32), pa.int32())
        joined = pc.binary_join(pa.ListArray.from_arrays(offsets, vals), sep)
        keys_out = g.column(key_col).take(pa.array(starts))
        return pa.table({key_col: keys_out, out_col: joined})

    return bucketed_groupby(
        ds, [key_col], bucket_agg, n_buckets, group_format="pyarrow"
    )


def rolling_sum_by(
    ds,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    window: int,
    out_col: str = "rolling_sum",
    n_buckets: int = 64,
):
    """Per-key rolling SUM over the last ``window`` rows (inclusive) —
    SQL ``SUM(v) OVER (PARTITION BY key ORDER BY … ROWS window-1
    PRECEDING)``.  Same one-exchange plan as :func:`rolling_max_by`;
    arithmetic in exact int64 cents so the result is independent of the
    engine's accumulation tree (the q1/running_sum discipline).
    Arrow-native: rolling sum = cumsum difference over the per-key
    segments (``c[i] - c[i-w]`` inside a segment, clipped at the segment
    head) — one Arrow sort + O(n) numpy, no pandas decode."""

    def bucket_roll(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.append_column(out_col, pa.array([], pa.float64()))
        g, starts, lens = _sorted_segments(g, key_col, order_cols)
        n = g.num_rows
        cents = np.round(
            g.column(value_col).to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        c = np.cumsum(cents)
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        seg_base = np.repeat(np.concatenate([[0], c[starts[1:] - 1]]), lens)
        full = pos >= window
        prev = np.where(full, c[np.maximum(np.arange(n) - window, 0)], seg_base)
        return g.append_column(out_col, pa.array((c - prev) / 100.0))

    return bucketed_groupby(
        ds, [key_col], bucket_roll, n_buckets, group_format="pyarrow"
    )


def lag_lead_by(
    ds,
    key_col: str,
    val_col: str,
    order_cols: list[str],
    lag_out: str = "prev_value",
    lead_out: str = "next_value",
    n_buckets: int = 64,
):
    """Per-key LAG/LEAD (``LAG(v) OVER (PARTITION BY key ORDER BY …)``):
    one keyed exchange, then a vectorized in-bucket sort + shift.  The
    shifted values are copied bit-for-bit (no arithmetic), so the result
    is exact for any value type.  Arrow-native: the segment backbone is
    :func:`_sorted_segments`; the shift is two ``pa.Array.take`` calls
    with null masks at segment boundaries."""
    import pyarrow.compute as pc

    def bucket_shift(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            vt = (
                g.column(val_col).type
                if val_col in g.column_names
                else pa.float64()
            )
            g = g.append_column(lag_out, pa.array([], vt))
            return g.append_column(lead_out, pa.array([], vt))
        g, starts, lens = _sorted_segments(g, key_col, order_cols)
        n = g.num_rows
        idx = np.arange(n, dtype=np.int64)
        seg_start = np.repeat(starts, lens)
        seg_end = seg_start + np.repeat(lens, lens) - 1
        v = g.column(val_col).combine_chunks()
        lag_idx = pa.array(
            np.maximum(idx - 1, 0), pa.int64()
        )  # clamped; boundary rows nulled below
        lead_idx = pa.array(np.minimum(idx + 1, n - 1), pa.int64())
        lagv = v.take(lag_idx)
        leadv = v.take(lead_idx)
        lag_mask = pa.array(idx == seg_start)  # first row of each key → null
        lead_mask = pa.array(idx == seg_end)  # last row of each key → null
        lagv = pc.if_else(lag_mask, pa.scalar(None, v.type), lagv)
        leadv = pc.if_else(lead_mask, pa.scalar(None, v.type), leadv)
        g = g.append_column(lag_out, lagv)
        return g.append_column(lead_out, leadv)

    return bucketed_groupby(
        ds, [key_col], bucket_shift, n_buckets, group_format="pyarrow"
    )


def first_last_by(
    ds,
    key_col: str,
    val_col: str,
    order_cols: list[str],
    first_out: str = "first_value",
    last_out: str = "last_value",
    n_buckets: int = 64,
):
    """Per-key FIRST_VALUE/LAST_VALUE over the whole partition frame
    (``FIRST_VALUE(v) OVER (PARTITION BY key ORDER BY … ROWS BETWEEN
    UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)``): one keyed exchange,
    then the shared Arrow segment sort and two ``take`` calls at the
    segment endpoints.  Values are copied bit-for-bit — exact for any
    value type — and never null over the full frame (every segment has
    at least one row)."""

    def bucket_fl(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            vt = (
                g.column(val_col).type
                if val_col in g.column_names
                else pa.float64()
            )
            g = g.append_column(first_out, pa.array([], vt))
            return g.append_column(last_out, pa.array([], vt))
        g, starts, lens = _sorted_segments(g, key_col, order_cols)
        seg_start = np.repeat(starts, lens)
        seg_end = seg_start + np.repeat(lens, lens) - 1
        v = g.column(val_col).combine_chunks()
        firstv = v.take(pa.array(seg_start, pa.int64()))
        lastv = v.take(pa.array(seg_end, pa.int64()))
        g = g.append_column(first_out, firstv)
        return g.append_column(last_out, lastv)

    return bucketed_groupby(
        ds, [key_col], bucket_fl, n_buckets, group_format="pyarrow"
    )


def nth_value_by(
    ds,
    key_col: str,
    val_col: str,
    order_cols: list[str],
    n: int,
    out_col: str = "nth_value",
    n_buckets: int = 64,
):
    """Per-key NTH_VALUE(v, n) over the whole partition frame
    (``NTH_VALUE(v, n) OVER (PARTITION BY key ORDER BY … ROWS BETWEEN
    UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)``): the same
    segment-sort + endpoint-take plan as :func:`first_last_by`, with the
    take index clamped at ``start + n - 1`` and NULL for segments
    shorter than ``n`` (SQL semantics).  Bit-copy, exact for any type."""
    import pyarrow.compute as pc

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def bucket_nth(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            vt = (
                g.column(val_col).type
                if val_col in g.column_names
                else pa.float64()
            )
            return g.append_column(out_col, pa.array([], vt))
        g, starts, lens = _sorted_segments(g, key_col, order_cols)
        seg_start = np.repeat(starts, lens)
        seg_len = np.repeat(lens, lens)
        valid = seg_len >= n
        idx = np.where(valid, seg_start + (n - 1), 0)
        v = g.column(val_col).combine_chunks()
        nth = v.take(pa.array(idx, pa.int64()))
        nth = pc.if_else(pa.array(valid), nth, pa.scalar(None, v.type))
        return g.append_column(out_col, nth)

    return bucketed_groupby(
        ds, [key_col], bucket_nth, n_buckets, group_format="pyarrow"
    )


def ntile_by(
    ds,
    key_col: str,
    order_cols: list[str],
    tiles: int,
    out_col: str = "tile",
    n_buckets: int = 64,
):
    """Per-key NTILE(t) (``NTILE(t) OVER (PARTITION BY key ORDER BY …)``):
    SQL semantics — a segment of length L splits into ``t`` groups where
    the first ``L % t`` groups get ``L // t + 1`` rows.  Pure integer
    output, bit-exact by construction.  One keyed exchange; the in-bucket
    kernel is the shared Arrow segment sort plus O(n) numpy index math."""

    def bucket_ntile(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.append_column(out_col, pa.array([], pa.int64()))
        g, starts, lens = _sorted_segments(g, key_col, order_cols)
        n = g.num_rows
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        seg_len = np.repeat(lens, lens).astype(np.int64)
        base = seg_len // tiles
        rem = seg_len % tiles
        cut = rem * (base + 1)
        # below the cut: tiles of size base+1; above: size base (base>0 there,
        # because pos >= cut implies the segment has at least `tiles` rows)
        safe_base = np.maximum(base, 1)
        tile = np.where(
            pos < cut, pos // (base + 1), rem + (pos - cut) // safe_base
        ) + 1
        return g.append_column(out_col, pa.array(tile.astype(np.int64)))

    return bucketed_groupby(
        ds, [key_col], bucket_ntile, n_buckets, group_format="pyarrow"
    )


def grouped_corr(
    ds,
    key_col: str,
    x_col: str,
    y_col: str,
    x_scale: float = 1.0,
    y_scale: float = 1.0,
) -> pd.DataFrame:
    """Grouped Pearson correlation + population covariance over columns
    whose scaled values are INTEGERS (e.g. quantities, cents) — computed
    bit-exactly from the closed-form moments.

    Distribution: each block emits per-key integer partial sums
    ``(n, Σx, Σy, Σxy, Σx², Σy²)`` (a map-side combine — one row per key
    per block), the tiny partials reduce on the driver with Python
    arbitrary-precision integers (no overflow at any scale), and the
    final doubles are produced by ONE explicitly-ordered float expression
    that the paired oracle SQL replicates cast-for-cast, so the floats
    match DuckDB bit-for-bit.  This sidesteps the order-dependence of
    streaming covariance updates entirely: integer sums are associative,
    so the result is independent of block boundaries and cluster shape."""

    def partial(b: pa.Table) -> pa.Table:
        k = b.column(key_col).to_pandas()
        x = np.round(
            b.column(x_col).to_numpy(zero_copy_only=False) * x_scale
        ).astype(np.int64)
        y = np.round(
            b.column(y_col).to_numpy(zero_copy_only=False) * y_scale
        ).astype(np.int64)
        df = pd.DataFrame(
            {"k": k, "n": 1, "sx": x, "sy": y, "sxy": x * y, "sxx": x * x, "syy": y * y}
        )
        out = df.groupby("k", as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    rows = []
    for k, g in parts.groupby("k"):
        # python ints: exact at any corpus size (int64 partials are safe at
        # block scale; the cross-block totals are where overflow could live)
        n = int(g["n"].sum())
        sx, sy = int(g["sx"].sum()), int(g["sy"].sum())
        sxy, sxx, syy = int(g["sxy"].sum()), int(g["sxx"].sum()), int(g["syy"].sum())
        cov_num = n * sxy - sx * sy
        var_x = n * sxx - sx * sx
        var_y = n * syy - sy * sy
        # one float expression, replicated cast-for-cast in the oracle SQL
        covar_pop = float(cov_num) / float(n * n)
        denom = np.sqrt(float(var_x)) * np.sqrt(float(var_y))
        corr = float(cov_num) / denom if denom != 0.0 else float("nan")
        rows.append(
            {key_col: k, "n_rows": n, "covar_pop": covar_pop, "corr": corr}
        )
    return pd.DataFrame(rows).sort_values(key_col).reset_index(drop=True)


def hash_join_keys(
    left_ds,
    right_ds,
    key: str,
    how: str = "full_outer",
    n_buckets: int = 64,
):
    """Distributed hash equi-join (``how`` ∈ full_outer / left / inner).
    Both sides carry a ``key`` column and otherwise-disjoint columns.
    Plan: pad each side with typed-null columns for the other side's
    fields (schema-aligned union, zero-copy Arrow), tag the side,
    hash-bucket by key, and merge per bucket — rows with equal keys
    always share a bucket, so per-bucket merges are exact and the output
    streams without any driver materialization.  The two sides may be any
    size (this is the shuffle join; use the broadcast map in
    ``orders_per_nation`` when one side is small).  ``key`` must be
    non-null on both sides: the in-bucket pandas merge would match null
    keys to each other, which SQL never does — filter nulls first if the
    key is nullable."""
    import pyarrow.compute as pc

    pandas_how = {"full_outer": "outer", "left": "left", "inner": "inner"}
    if how not in pandas_how:
        raise ValueError(f"how must be one of {sorted(pandas_how)}, got {how!r}")

    def arrow_schema(ds) -> pa.Schema:
        base = ds.schema().base_schema
        if isinstance(base, pa.Schema):
            return base
        # pandas-block datasets (tests): object dtype means string here
        fields = []
        for name, t in zip(base.names, base.types):
            try:
                fields.append((name, pa.from_numpy_dtype(t)))
            except (pa.ArrowNotImplementedError, pa.ArrowTypeError, TypeError):
                fields.append((name, pa.string()))
        return pa.schema(fields)

    lschema = arrow_schema(left_ds)
    rschema = arrow_schema(right_ds)
    lcols = [f for f in lschema.names if f != key]
    rcols = [f for f in rschema.names if f != key]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"non-key columns must be disjoint: {sorted(overlap)}")
    ltypes = {n: lschema.field(n).type for n in lcols}
    rtypes = {n: rschema.field(n).type for n in rcols}
    out_names = [key, *lcols, *rcols, "__side"]

    def pad(other_types, side):
        def f(b: pa.Table) -> pa.Table:
            arrs = {name: b.column(name) for name in b.column_names}
            for name, t in other_types.items():
                arrs[name] = pa.nulls(b.num_rows, t)
            arrs["__side"] = pa.array(np.full(b.num_rows, side, dtype=np.int8))
            return pa.table({n: arrs[n] for n in out_names})

        return f

    both = left_ds.map_batches(pad(rtypes, 0), batch_format="pyarrow").union(
        right_ds.map_batches(pad(ltypes, 1), batch_format="pyarrow")
    )

    def bucket_join(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.drop_columns(["__side"])
        lt = g.filter(pc.equal(g.column("__side"), pa.scalar(0, pa.int8())))
        rt = g.filter(pc.equal(g.column("__side"), pa.scalar(1, pa.int8())))
        ldf = lt.select([key, *lcols]).to_pandas()
        rdf = rt.select([key, *rcols]).to_pandas()
        out = ldf.merge(rdf, on=key, how=pandas_how[how])
        # restore declared types; from_pandas=True maps NaN/NaT → null (the
        # outer merge upcasts unmatched int columns to float-with-NaN)
        cols = {}
        for name in [key, *lcols, *rcols]:
            want = (
                lschema.field(name).type
                if name == key or name in ltypes
                else rtypes[name]
            )
            cols[name] = pa.array(out[name], type=want, from_pandas=True)
        return pa.table(cols)

    return bucketed_groupby(
        both, [key], bucket_join, n_buckets, group_format="pyarrow"
    )


def full_outer_join_keys(left_ds, right_ds, key: str, n_buckets: int = 64):
    """FULL OUTER convenience wrapper over :func:`hash_join_keys`."""
    return hash_join_keys(left_ds, right_ds, key, how="full_outer", n_buckets=n_buckets)


def rank_by(
    ds,
    key_col: str,
    order_cols: list[str],
    n_buckets: int = 64,
):
    """Per-key ranking family in one pass: ``rank``, ``dense_rank``,
    ``percent_rank`` and ``cume_dist`` over ``ORDER BY order_cols`` (ties
    allowed — peers share rank and cume_dist).  One keyed exchange; the
    in-bucket kernel is the shared Arrow segment sort plus O(n) numpy
    peer-group index math.  The two float outputs are single int/int IEEE
    divisions (``(rank-1)/(L-1)``, ``peer_end/L``) that a SQL oracle
    reproduces bit-for-bit; ``percent_rank`` is 0 for 1-row partitions
    (SQL semantics)."""
    import pyarrow.compute as pc

    def bucket_rank(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            for c, t in [
                ("rnk", pa.int64()),
                ("drnk", pa.int64()),
                ("pct_rank", pa.float64()),
                ("cume", pa.float64()),
            ]:
                g = g.append_column(c, pa.array([], t))
            return g
        g, starts, lens = _sorted_segments(g, key_col, order_cols)
        n = g.num_rows
        idx = np.arange(n, dtype=np.int64)
        seg_start = np.repeat(starts, lens)
        seg_len = np.repeat(lens, lens).astype(np.int64)
        # peer groups: rows equal on (key, *order)
        peer_new = np.ones(n, dtype=bool)
        if n > 1:
            eq = np.ones(n - 1, dtype=bool)
            for c in [key_col, *order_cols]:
                col = g.column(c)
                a, b = col.slice(1), col.slice(0, n - 1)
                e = pc.fill_null(pc.equal(a, b), False)
                # SQL ordering: NULLs are peers of each other
                both_null = pc.and_(pc.is_null(a), pc.is_null(b))
                e = pc.or_(e, both_null).to_numpy(zero_copy_only=False)
                eq &= e.astype(bool)
            peer_new[1:] = ~eq
        peer_start = idx[peer_new][np.cumsum(peer_new) - 1]  # start of own peer grp
        peer_lens = np.diff(np.append(np.flatnonzero(peer_new), n))
        peer_end = np.repeat(
            np.flatnonzero(peer_new) + peer_lens, peer_lens
        )  # one past the last peer
        rnk = peer_start - seg_start + 1
        # dense rank: count of peer-group starts in this segment up to here
        peer_new_cum = np.cumsum(peer_new)
        drnk = peer_new_cum - np.repeat(peer_new_cum[starts] - 1, lens)
        pct = np.where(
            seg_len > 1, (rnk - 1) / np.maximum(seg_len - 1, 1), 0.0
        )
        cume = (peer_end - seg_start) / seg_len
        g = g.append_column("rnk", pa.array(rnk.astype(np.int64)))
        g = g.append_column("drnk", pa.array(drnk.astype(np.int64)))
        g = g.append_column("pct_rank", pa.array(pct.astype(np.float64)))
        return g.append_column("cume", pa.array(cume.astype(np.float64)))

    return bucketed_groupby(
        ds, [key_col], bucket_rank, n_buckets, group_format="pyarrow"
    )


def grouped_quantile_cont(
    ds,
    key_col: str,
    val_col: str,
    q: float,
    out_col: str = "q_val",
    n_buckets: int = 64,
):
    """Per-key EXACT continuous quantile (``quantile_cont(v, q) GROUP BY
    key``) — the exact scalar member of the grouped-quantile family
    (the mergeable sketch in ``state/sketch.py`` is the approximate
    streaming path for when per-key sorts don't fit).

    One keyed exchange; inside each bucket :func:`_sorted_segments` with
    the VALUE as the order column yields every key's values already
    sorted, so the quantile is pure O(keys) index math.  Interpolation is
    ``(1-frac)*lower + frac*upper`` — the bit-verified DuckDB
    ``quantile_cont`` arithmetic (see :func:`rolling_quantile_by`).
    Nulls are not supported in ``val_col`` (filter first)."""

    def bucket_q(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            kt = g.column(key_col).type if key_col in g.column_names else pa.string()
            return pa.table(
                {key_col: pa.array([], kt), out_col: pa.array([], pa.float64())}
            )
        g, starts, lens = _sorted_segments(g, key_col, [val_col])
        v = g.column(val_col).to_numpy(zero_copy_only=False).astype(np.float64)
        idx = q * (lens - 1).astype(np.float64)
        lo_i = np.floor(idx).astype(np.int64)
        frac = idx - lo_i
        hi_i = np.minimum(lo_i + 1, lens - 1)
        out = (1.0 - frac) * v[starts + lo_i] + frac * v[starts + hi_i]
        return pa.table(
            {key_col: g.column(key_col).take(pa.array(starts)),
             out_col: pa.array(out)}
        )

    return bucketed_groupby(ds, [key_col], bucket_q, n_buckets, group_format="pyarrow")


def mode_by(
    ds,
    key_col: str,
    val_col: str,
    out_col: str = "mode_val",
    n_buckets: int = 64,
):
    """Per-key MODE (most frequent value, deterministic smallest-value
    tie-break) — one keyed exchange.  Inside each bucket an Arrow
    ``group_by((key, val))`` count collapses the rows to distinct pairs,
    then the segment sort over ``(key, -cnt, val)`` makes every key's
    winner its first row — O(pairs) after the in-bucket combine.  Fully
    deterministic (SQL engines' bare ``mode()`` is not), so the paired
    oracle uses the explicit ``row_number() OVER (ORDER BY cnt DESC,
    val)`` form."""
    import pyarrow.compute as pc

    def bucket_mode(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            kt = g.column(key_col).type if key_col in g.column_names else pa.int64()
            vt = g.column(val_col).type if val_col in g.column_names else pa.string()
            return pa.table(
                {key_col: pa.array([], kt), out_col: pa.array([], vt),
                 "mode_cnt": pa.array([], pa.int64())}
            )
        pairs = (
            g.select([key_col, val_col])
            .group_by([key_col, val_col])
            .aggregate([([], "count_all")])
            .rename_columns([key_col, val_col, "cnt"])
            .combine_chunks()
        )
        idx = pc.sort_indices(
            pairs,
            sort_keys=[(key_col, "ascending"), ("cnt", "descending"),
                       (val_col, "ascending")],
        )
        pairs = pairs.take(idx)
        k = pairs.column(key_col)
        n = pairs.num_rows
        if n > 1:
            neq = pc.not_equal(k.slice(1), k.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
            starts = np.flatnonzero(np.concatenate([[True], neq.astype(bool)]))
        else:
            starts = np.zeros(min(n, 1), dtype=np.int64)
        head = pairs.take(pa.array(starts))
        return pa.table(
            {key_col: head.column(key_col),
             out_col: head.column(val_col),
             "mode_cnt": head.column("cnt")}
        )

    return bucketed_groupby(ds, [key_col], bucket_mode, n_buckets, group_format="pyarrow")


def grouped_quantiles_cont(
    ds,
    key_col: str,
    val_col: str,
    qs: list[float],
    n_buckets: int = 64,
):
    """Per-key exact continuous quantiles at MULTIPLE q in one pass —
    long-form output ``(key, q, q_val)``.  Identical plan to
    :func:`grouped_quantile_cont` (one keyed exchange, per-key pre-sorted
    values from the segment sort); each additional q is O(keys) index
    math over the same sorted array, so k quantiles cost one exchange,
    not k."""

    def bucket_q(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            kt = g.column(key_col).type if key_col in g.column_names else pa.string()
            return pa.table(
                {key_col: pa.array([], kt), "q": pa.array([], pa.float64()),
                 "q_val": pa.array([], pa.float64())}
            )
        g, starts, lens = _sorted_segments(g, key_col, [val_col])
        v = g.column(val_col).to_numpy(zero_copy_only=False).astype(np.float64)
        keys = g.column(key_col).take(pa.array(starts))
        key_parts, q_parts, val_parts = [], [], []
        for q in qs:
            idx = q * (lens - 1).astype(np.float64)
            lo_i = np.floor(idx).astype(np.int64)
            frac = idx - lo_i
            hi_i = np.minimum(lo_i + 1, lens - 1)
            val_parts.append((1.0 - frac) * v[starts + lo_i] + frac * v[starts + hi_i])
            q_parts.append(np.full(len(starts), q))
            key_parts.append(keys)
        return pa.table(
            {key_col: pa.concat_arrays(
                [k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k
                 for k in key_parts]
            ),
             "q": pa.array(np.concatenate(q_parts)),
             "q_val": pa.array(np.concatenate(val_parts))}
        )

    return bucketed_groupby(ds, [key_col], bucket_q, n_buckets, group_format="pyarrow")
