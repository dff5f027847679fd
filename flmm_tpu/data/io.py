"""Remote/local file IO.

Generalises the reference's optional Ceph/petrel client
(flmm/datasets/png.py:11-14,101-112) to fsspec-style access: ``open_any``
handles local paths, ``gs://``/``s3://``/``http(s)://`` URLs when fsspec
(or a protocol-specific library) is importable, falling back to local
filesystem semantics otherwise.
"""

from __future__ import annotations

import io
import pathlib
from typing import IO

from PIL import Image


def open_any(path: str, mode: str = "rb") -> IO:
    p = str(path)
    if "://" in p and not p.startswith("file://"):
        try:
            import fsspec

            return fsspec.open(p, mode).open()
        except ImportError as e:
            raise ImportError(
                f"remote path {p!r} requires fsspec, which is not installed"
            ) from e
    return open(p.removeprefix("file://"), mode)


def read_bytes(path: str) -> bytes:
    with open_any(path, "rb") as f:
        return f.read()


def open_image(path: str) -> Image.Image:
    return Image.open(io.BytesIO(read_bytes(path)))


def exists(path: str) -> bool:
    p = str(path)
    if "://" in p and not p.startswith("file://"):
        try:
            import fsspec

            fs, rel = fsspec.core.url_to_fs(p)
            return fs.exists(rel)
        except ImportError:
            return False
    return pathlib.Path(p.removeprefix("file://")).exists()
