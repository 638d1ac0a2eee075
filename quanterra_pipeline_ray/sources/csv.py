"""CSV file sources with the reference's validation semantics.

The reference reads broker CSVs whose real header sits at a fixed row offset
(HL transactions: row 6, HL positions: row 11, Interactive Investor: row 1 —
reference `src/models/data/hargreaves_lansdown_models.py:9,41,77,107`,
`interactive_investor_models.py:9,33`), previews the first 15 rows for
validation (`src/clients/file/base_csv_client.py:14,20-24`), checks a
required-column set against that preview and only then copies the FULL file
(validation is a gate, not a row filter —
`hargreaves_lansdown_processor.py:46-53`), and rejects non-``.csv``
extensions (`base_csv_client.py:26-30`).

Ray-native mapping: preview/validation run driver-side on a few KB; the full
read is a ``ray.data`` dataset with the validated schema applied.  Remote
files (the reference's ``GoogleCloudFileClient.preview_file``,
`src/clients/file/google_cloud_file_client.py:21-35`) go through the same
:class:`..state.fs.StorageAdapter` seam as the manifest layer — pass the
object-store filesystem and the preview reads the blob's head through it.
"""

from __future__ import annotations

import csv
import io
import os
from dataclasses import dataclass

from ..state.fs import LOCAL, StorageAdapter


class FileValidationError(ValueError):
    pass


@dataclass
class CSVSourceConfig:
    """Mirrors the reference's per-broker CSV configs."""

    header_row: int = 0  # 0-based row index of the real header
    preview_rows: int = 15
    delimiter: str = ","
    encoding: str = "ISO-8859-1"
    required_columns: tuple[str, ...] = ()
    allowed_extensions: tuple[str, ...] = (".csv",)


# presets shaped like the reference's four models
HL_TRANSACTIONS = CSVSourceConfig(header_row=5)
HL_POSITIONS = CSVSourceConfig(header_row=10)
II_TRANSACTIONS = CSVSourceConfig(header_row=0)


def validate_file_type(
    path: str, config: CSVSourceConfig = CSVSourceConfig(), fs: StorageAdapter = LOCAL
) -> None:
    """Extension predicate (case-insensitive) + existence, reject-on-mismatch
    (mirrors the reference's local AND remote variants)."""
    ext = os.path.splitext(path)[1].lower()
    if ext not in config.allowed_extensions:
        raise FileValidationError(f"unsupported file type {ext!r} for {path}")
    if not fs.exists(path):
        raise FileValidationError(f"file does not exist: {path}")


def preview_file(
    path: str, config: CSVSourceConfig = CSVSourceConfig(), fs: StorageAdapter = LOCAL
) -> list[list[str]]:
    """First ``preview_rows`` raw rows (driver-side, a few KB) — local disk
    or any ``pyarrow.fs`` filesystem via the storage adapter."""
    rows = []
    with fs.fs.open_input_stream(path) as raw:
        text = io.TextIOWrapper(io.BytesIO(raw.read(256 * 1024)), encoding=config.encoding, newline="")
        for i, row in enumerate(csv.reader(text, delimiter=config.delimiter)):
            if i >= config.preview_rows:
                break
            rows.append(row)
    return rows


def validate_structure(preview: list[list[str]], config: CSVSourceConfig) -> list[str]:
    """Required-column-set check at the configured header row.

    Returns the header; raises listing missing columns otherwise (same
    failure contract as the reference's ``validate_data_structure``)."""
    if len(preview) <= config.header_row:
        raise FileValidationError(
            f"file has {len(preview)} preview rows; header expected at row "
            f"{config.header_row + 1}"
        )
    header = [c.strip() for c in preview[config.header_row]]
    missing = set(config.required_columns) - set(header)
    if missing:
        raise FileValidationError(f"missing required columns: {sorted(missing)}")
    return header


def read_validated_csv(
    path: str, config: CSVSourceConfig = CSVSourceConfig(), fs: StorageAdapter = LOCAL
):
    """Validate (gate) then read the FULL file as a ``ray.data.Dataset``.

    The gate inspects only the preview, then the whole file streams through
    Ray with the discovered header applied and pre-header rows skipped.
    """
    import pyarrow.csv as pacsv
    import ray.data as rd

    validate_file_type(path, config, fs)
    preview = preview_file(path, config, fs)
    header = validate_structure(preview, config)

    read_options = pacsv.ReadOptions(
        skip_rows=config.header_row, encoding=config.encoding
    )
    parse_options = pacsv.ParseOptions(delimiter=config.delimiter)
    kw = {} if fs.is_local else {"filesystem": fs.fs}
    ds = rd.read_csv(path, read_options=read_options, parse_options=parse_options, **kw)
    # normalize column names to the validated stripped header
    rename = dict(zip([c for c in ds.schema().names], header))
    if any(k != v for k, v in rename.items()):
        import pyarrow as pa

        def apply_header(t: pa.Table) -> pa.Table:
            return t.rename_columns([rename.get(c, c) for c in t.column_names])

        ds = ds.map_batches(apply_header, batch_format="pyarrow")
    return ds


def head_sample(ds, n: int = 15):
    """Head-N sampling of any dataset (the reference's only 'limit')."""
    return ds.limit(n)
