"""PyArrow filesystem handler rooted at a Delta table, mirroring
``deltalake.fs.DeltaStorageHandler`` (reference:
python/deltalake/fs/_base_handler.py + fs/fs_handler.py — there a shim
over the Rust object-store; here over ``pyarrow.fs.LocalFileSystem``,
which is the storage this sandbox has; the LogStore seam in log/commit.py
is where cloud stores would plug in).

Usage matches the reference:

    handler = DeltaStorageHandler(table_uri)
    fs = pyarrow.fs.PyFileSystem(handler)
    pq.read_table("part-000....parquet", filesystem=fs)

Paths given to the handler are relative to the table root (the form that
Delta ``add.path`` entries take), so a snapshot's file list can be fed
straight to ``pyarrow.dataset`` — which is exactly what
``DeltaTable.to_pyarrow_dataset`` does internally.
"""

from __future__ import annotations

import os
from collections.abc import Mapping

import pyarrow as pa
from pyarrow import fs as pafs


class DeltaStorageHandler(pafs.FileSystemHandler):
    """Concrete ``pyarrow.fs.FileSystemHandler`` for a Delta table root.

    ``known_sizes`` mirrors the reference's optimization (skip a stat
    call per file when the commit log already recorded the size).
    """

    def __init__(
        self,
        table_uri: str,
        options: dict[str, str] | None = None,
        known_sizes: dict[str, int] | None = None,
    ) -> None:
        self._root = os.path.abspath(str(table_uri).removeprefix("file://"))
        self._options = dict(options or {})
        self._known_sizes = dict(known_sizes or {})
        self._fs = pafs.LocalFileSystem()

    @classmethod
    def from_table(
        cls,
        table,
        options: dict[str, str] | None = None,
        known_sizes: dict[str, int] | None = None,
    ) -> "DeltaStorageHandler":
        return cls(table.table_uri, options, known_sizes)

    # -- path plumbing -----------------------------------------------------
    def _abs(self, path: str) -> str:
        p = str(path).removeprefix("file://")
        if not os.path.isabs(p):
            p = os.path.join(self._root, p)
        return p

    def normalize_path(self, path: str) -> str:
        return os.path.normpath(self._abs(path))

    def get_type_name(self) -> str:
        return "delta-storage-handler"

    def equals(self, other) -> bool:
        return (
            isinstance(other, DeltaStorageHandler) and other._root == self._root
        )

    # -- metadata ----------------------------------------------------------
    def get_file_info(self, paths: list[str]) -> list[pafs.FileInfo]:
        infos = []
        for p in paths:
            if p in self._known_sizes:
                infos.append(
                    pafs.FileInfo(
                        self._abs(p), pafs.FileType.File, size=self._known_sizes[p]
                    )
                )
            else:
                infos.append(self._fs.get_file_info(self._abs(p)))
        return infos

    def get_file_info_selector(self, selector: pafs.FileSelector) -> list[pafs.FileInfo]:
        sel = pafs.FileSelector(
            self._abs(selector.base_dir),
            allow_not_found=selector.allow_not_found,
            recursive=selector.recursive,
        )
        return self._fs.get_file_info(sel)

    # -- directories -------------------------------------------------------
    def create_dir(self, path: str, recursive: bool = True) -> None:
        self._fs.create_dir(self._abs(path), recursive=recursive)

    def delete_dir(self, path: str) -> None:
        self._fs.delete_dir(self._abs(path))

    def delete_dir_contents(self, path: str, missing_dir_ok: bool = False) -> None:
        self._fs.delete_dir_contents(self._abs(path), missing_dir_ok=missing_dir_ok)

    def delete_root_dir_contents(self) -> None:
        self._fs.delete_dir_contents(self._root)

    # -- files -------------------------------------------------------------
    def delete_file(self, path: str) -> None:
        self._fs.delete_file(self._abs(path))

    def move(self, src: str, dest: str) -> None:
        self._fs.move(self._abs(src), self._abs(dest))

    def copy_file(self, src: str, dest: str) -> None:
        self._fs.copy_file(self._abs(src), self._abs(dest))

    def open_input_stream(self, path: str) -> pa.NativeFile:
        return self._fs.open_input_stream(self._abs(path))

    def open_input_file(self, path: str) -> pa.NativeFile:
        return self._fs.open_input_file(self._abs(path))

    def open_output_stream(
        self, path: str, metadata: Mapping[str, str] | None = None
    ) -> pa.NativeFile:
        return self._fs.open_output_stream(self._abs(path))

    def open_append_stream(
        self, path: str, metadata: Mapping[str, str] | None = None
    ) -> pa.NativeFile:
        # object stores are append-less; the reference raises here too
        # (fs/fs_handler.py open_append_stream -> NotImplementedError)
        raise NotImplementedError("append streams are not supported")


__all__ = ["DeltaStorageHandler"]
