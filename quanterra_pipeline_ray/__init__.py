"""quanterra_pipeline_ray — a Ray-Data-native table-maintenance engine.

A from-scratch rebuild of the table-maintenance layer the reference datalake
(`fplon/quanterra-pipeline`) needs but never built (its curate/transform zones
are empty packages): compaction, Z-order clustering, copy-on-write
manifest/snapshot management, MERGE INTO, and snapshot expiry over Parquet
tables of multi-turn conversation transcripts — plus the training-data
operators (dedup, similarity search, text analysis) a 100 TB pipeline needs.

Library code never calls ``ray.init``/``ray.shutdown``; only CLI entry
points, ``bench.py`` and the test fixture own a Ray session.
"""

from .schema import TRANSCRIPTS_SCHEMA, SchemaValidationError, ensure_schema
from .state.catalog import Catalog, Transaction, TransactionConflict
from .state.manifest import DataFile, Snapshot, TranscriptTable, write_data_file

__all__ = [
    "TRANSCRIPTS_SCHEMA",
    "SchemaValidationError",
    "ensure_schema",
    "Catalog",
    "Transaction",
    "TransactionConflict",
    "DataFile",
    "Snapshot",
    "TranscriptTable",
    "write_data_file",
]

__version__ = "0.1.0"
