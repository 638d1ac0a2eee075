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
  skipped there and the payload is PUT directly.
* **multi-writer commits** go through :meth:`StorageAdapter.write_if_absent`
  — a true CAS locally (atomic ``link(2)``); on object stores the default is
  exists-check + PUT (single-committer), and deployments override it with
  the store's conditional-PUT (S3 ``If-None-Match``, GCS generation-match)
  to make concurrent drivers safe.
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
        # compression=None: the adapter deals in raw bytes — Arrow must not
        # infer a codec from the extension (a .tar.gz release blob is data)
        with self.fs.open_input_stream(path, compression=None) as f:
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
            with self.fs.open_output_stream(tmp, compression=None) as f:
                f.write(payload)
            self.fs.move(tmp, path)
        else:
            with self.fs.open_output_stream(path, compression=None) as f:
                f.write(payload)

    def write_if_absent(self, path: str, payload: bytes) -> bool:
        """Commit primitive: publish ``payload`` at ``path`` iff no file
        exists there; returns whether THIS call created it.

        This is the compare-and-swap the snapshot commit protocol is built
        on — the first writer of ``snapshots/s<N>.json`` wins and every
        loser re-parents and retries (see ``manifest.TranscriptTable.commit``).

        * **local**: write temp + ``os.link`` — link(2) is atomic and fails
          with EEXIST if the target appeared meanwhile, so this is a true
          CAS *and* readers never observe a torn file.
        * **other filesystems**: exists-check + atomic PUT — NOT safe under
          concurrent committers.  Object-store deployments must subclass
          with the store's conditional write (S3 ``If-None-Match: *``, GCS
          ``x-goog-if-generation-match: 0``) for multi-writer safety; the
          single-writer semantics here match the reference's singleton
          client (reference `src/clients/google_cloud_storage_client.py:14-38`).
        """
        if self.is_local:
            tmp = f"{path}.cas.{os.getpid()}.{os.urandom(4).hex()}"
            with self.fs.open_output_stream(tmp, compression=None) as f:
                f.write(payload)
            try:
                os.link(tmp, path)
                return True
            except FileExistsError:
                return False
            finally:
                os.unlink(tmp)
        if self.exists(path):
            return False
        self.write_atomic(path, payload)
        return True

    def remove(self, path: str) -> None:
        from pyarrow.fs import FileType

        if self.fs.get_file_info(path).type == FileType.File:
            self.fs.delete_file(path)


#: process-default adapter (local disk) — what Ray tasks use when a table
#: handle was not shipped to them explicitly.
LOCAL = StorageAdapter()
