"""Storage adapter: every manifest/data byte goes through one seam.

The reference's storage layer is GCS-native (reference
`src/clients/google_cloud_storage_client.py:40-163`,
`src/clients/file/google_cloud_file_client.py:21-35`); a 100-TB multi-node
table lives on object storage.  This adapter wraps a
``pyarrow.fs.FileSystem`` so the table root may be local disk (default),
S3/GCS (pass the matching pyarrow filesystem), or anything fsspec can hand
to Arrow — and so tests can inject an explicit filesystem handle.

Atomicity notes (the commit protocol depends on them):

* **local**: publish = write temp + ``move`` (POSIX rename) — readers never
  observe a torn file.
* **object stores**: single-object PUT is already atomic (readers see old or
  new, never partial), but rename is copy+delete, so the temp+move dance is
  skipped there and the payload is PUT directly; the snapshot-id
  exists-check-then-write race documented in ``manifest.py`` likewise
  assumes a single committer per table (a real multi-writer deployment
  would use a conditional-PUT / generation-match primitive).
"""

from __future__ import annotations

import os


class StorageAdapter:
    """Thin, picklable wrapper over ``pyarrow.fs.FileSystem``."""

    def __init__(self, fs=None):
        if fs is None:
            from pyarrow.fs import LocalFileSystem

            fs = LocalFileSystem()
        self.fs = fs
        from pyarrow.fs import LocalFileSystem

        self.is_local = isinstance(fs, LocalFileSystem)

    # -- reads -------------------------------------------------------------
    def read_bytes(self, path: str) -> bytes:
        with self.fs.open_input_stream(path) as f:
            return f.read()

    def exists(self, path: str) -> bool:
        from pyarrow.fs import FileType

        return self.fs.get_file_info(path).type != FileType.NotFound

    def listdir(self, path: str) -> list[str]:
        """Base names of direct children (empty list if dir is missing)."""
        from pyarrow.fs import FileSelector, FileType

        if not self.exists(path):
            return []
        infos = self.fs.get_file_info(FileSelector(path, recursive=False))
        return sorted(os.path.basename(i.path.rstrip("/")) for i in infos)

    def walk_files(self, path: str) -> list[str]:
        """All file paths under ``path``, recursively."""
        from pyarrow.fs import FileSelector, FileType

        if not self.exists(path):
            return []
        infos = self.fs.get_file_info(FileSelector(path, recursive=True))
        return sorted(i.path for i in infos if i.type == FileType.File)

    def mtime(self, path: str) -> float:
        info = self.fs.get_file_info(path)
        mt = info.mtime
        return mt.timestamp() if mt is not None else 0.0

    # -- writes ------------------------------------------------------------
    def makedirs(self, path: str) -> None:
        self.fs.create_dir(path, recursive=True)

    def write_atomic(self, path: str, payload: bytes) -> None:
        """Publish ``payload`` at ``path`` such that readers never observe a
        torn file: temp+rename locally, single PUT on object stores."""
        if self.is_local:
            tmp = f"{path}.tmp.{os.getpid()}"
            with self.fs.open_output_stream(tmp) as f:
                f.write(payload)
            self.fs.move(tmp, path)
        else:
            with self.fs.open_output_stream(path) as f:
                f.write(payload)

    def remove(self, path: str) -> None:
        from pyarrow.fs import FileType

        if self.fs.get_file_info(path).type == FileType.File:
            self.fs.delete_file(path)


#: process-default adapter (local disk) — what Ray tasks use when a table
#: handle was not shipped to them explicitly.
LOCAL = StorageAdapter()
