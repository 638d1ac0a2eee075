"""Envelope / normalization / key-derivation operators from the reference's
ingestion layer, rebuilt as vectorized batch transforms.

* :func:`normalize_json_safe` — the reference's recursive
  ``convert_to_json_safe`` (NaN→None, timestamps→ISO strings,
  `src/utils/utilities.py:11-25`) as an Arrow-level batch cast.
* :class:`EnvelopeBuilder` — the ``{data, metadata}`` wrapper
  (`src/models/data/eodhd_models.py:15-27`) as added metadata columns.
* :func:`storage_key` — deterministic date-partitioned storage path
  derivation (`eodhd_models.py:29-32`: ``eodhd/{type}/{YYYY/MM/DD}/{ex}/{code}``),
  vectorized; the same derivation that makes re-runs idempotent.
* :func:`substring_semi_join` — the reference's only join:
  keep rows whose key ends with any configured suffix
  (`eodhd_pipeline.py:73-80`), as a broadcast mask instead of a nested loop.
* :func:`split_composite_key` — ``instrument.split('.', 1)``
  (`eodhd_processor.py:206`) via Arrow ``split_pattern``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def normalize_json_safe(batch: pa.Table) -> pa.Table:
    """NaN -> null, timestamps -> ISO strings; other columns untouched."""
    cols = {}
    for name in batch.column_names:
        col = batch.column(name)
        if pa.types.is_floating(col.type):
            col = pc.if_else(pc.is_nan(col), pa.scalar(None, col.type), col)
        elif pa.types.is_timestamp(col.type):
            col = pc.strftime(col, format="%Y-%m-%dT%H:%M:%S.%f")
        cols[name] = col
    return pa.table(cols)


class EnvelopeBuilder:
    """Adds the metadata-envelope columns the reference stores per object."""

    def __init__(self, data_type: str, source: str = "quanterra-ray"):
        self.data_type = data_type
        self.source = source

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        batch = batch.append_column(
            "meta_data_type", pa.array([self.data_type] * n, pa.string())
        )
        return batch.append_column("meta_source", pa.array([self.source] * n, pa.string()))


def storage_key(
    data_type: str,
    ts: pa.ChunkedArray | pa.Array,
    entity: pa.ChunkedArray | pa.Array,
    code: pa.ChunkedArray | pa.Array,
    prefix: str = "eodhd",
    suffix: str = ".json.gz",
) -> pa.ChunkedArray:
    """Vectorized ``{prefix}/{data_type}/{YYYY/MM/DD}/{entity}/{code}{suffix}``."""
    date_part = pc.strftime(ts, format="%Y/%m/%d")
    n = len(date_part)
    return pc.binary_join_element_wise(
        pa.chunked_array([pa.array([f"{prefix}/{data_type}"] * n)]),
        date_part,
        pc.cast(entity, pa.string()),
        pc.binary_join_element_wise(pc.cast(code, pa.string()), suffix, ""),
        "/",
    )


def substring_semi_join(ds, key_col: str, suffixes: list[str]):
    """Broadcast semi-join: keep rows whose key ends with any suffix.

    The suffix list is tiny (closure-captured, shipped once per task); the
    mask is a vectorized ``ends_with`` OR-chain — no shuffle.
    """
    sfx = list(suffixes)

    def mask(t: pa.Table) -> pa.Table:
        col = t.column(key_col)
        m = pc.ends_with(col, pattern=sfx[0]) if sfx else pa.array([False] * t.num_rows)
        for s in sfx[1:]:
            m = pc.or_(m, pc.ends_with(col, pattern=s))
        return t.filter(m)

    return ds.map_batches(mask, batch_format="pyarrow")


def split_composite_key(
    ds, key_col: str, out_cols: tuple[str, str] = ("code", "exchange"), sep: str = "."
):
    """``code.exchange`` -> two columns (Arrow split, max one split)."""

    import re

    pattern = f"(?P<a>[^{re.escape(sep)}]*){re.escape(sep)}?(?P<b>.*)"

    def split(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t.column(key_col), pattern=pattern)
        t = t.append_column(out_cols[0], pc.struct_field(ex, "a"))
        return t.append_column(out_cols[1], pc.struct_field(ex, "b"))

    return ds.map_batches(split, batch_format="pyarrow")
