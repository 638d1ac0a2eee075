from .checkpoint import Checkpoint
from .fs import LOCAL, StorageAdapter
from .lineage import lineage_record, load_lineage, store_lineage, throughput_turns_per_sec
from .manifest import DataFile, Snapshot, TranscriptTable, write_data_file

__all__ = [
    "Checkpoint",
    "StorageAdapter",
    "LOCAL",
    "DataFile",
    "Snapshot",
    "TranscriptTable",
    "write_data_file",
    "lineage_record",
    "load_lineage",
    "store_lineage",
    "throughput_turns_per_sec",
]
