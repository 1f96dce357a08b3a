"""file:: bucket operations over a local-filesystem bucket.

Parity: the reference's file functions (core/src/fnc/file.rs) operate on
named object-store buckets (`DEFINE BUCKET`), with `file:/bucket/key`
values. This engine maps a bucket to a directory root — the same API shape
a cloud object store (s3a://, abfss://) would get on a real cluster, where
these calls become driver-side object-store requests; only `file::bucket`
and `file::key` are row-wise column functions.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


# -- column functions over file:/bucket/key pointer strings -------------------


def file_bucket(f) -> Column:
    """file::bucket('file:/b/k/ey') -> 'b'."""
    path = F.regexp_replace(_c(f), r"^file:/+", "")
    return F.substring_index(path, "/", 1)


def file_key(f) -> Column:
    """file::key('file:/b/k/ey') -> '/k/ey' (reference keeps the leading /)."""
    path = F.regexp_replace(_c(f), r"^file:/+", "")
    bkt = F.substring_index(path, "/", 1)
    return F.concat(
        F.lit("/"), F.substring(path, F.length(bkt) + 2, F.lit(2**31 - 1))
    )


# -- driver-side bucket ops ---------------------------------------------------


class LocalBucket:
    """A named bucket rooted at a local directory (or any Path-like mount).

    Keys are slash-separated; `put`/`get` move bytes; the *_if_not_exists
    variants mirror file.rs semantics (error-free no-ops returning False
    when the precondition fails).
    """

    def __init__(self, name: str, root: str):
        self.name = name
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _p(self, key: str) -> Path:
        key = key.lstrip("/")
        p = (self.root / key).resolve()
        # Path.is_relative_to, not a string-prefix check: "/bkt-evil" would
        # pass a startswith("/bkt") test despite being a sibling directory.
        if not p.is_relative_to(self.root.resolve()):
            raise ValueError(f"key escapes bucket: {key!r}")
        return p

    def pointer(self, key: str) -> str:
        return f"file:/{self.name}/{key.lstrip('/')}"

    # file::put / file::get -------------------------------------------------
    def put(self, key: str, data: bytes) -> str:
        if isinstance(data, str):
            data = data.encode()  # string payloads store as UTF-8
        p = self._p(key)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(data)
        return self.pointer(key)

    def put_if_not_exists(self, key: str, data: bytes) -> bool:
        if self.exists(key):
            return False
        self.put(key, data)
        return True

    def get(self, key: str) -> bytes | None:
        # missing files are NONE, not an error (fnc/file.rs get -> Option)
        p = self._p(key)
        return p.read_bytes() if p.is_file() else None

    def head(self, key: str) -> dict | None:
        p = self._p(key)
        if not p.is_file():
            return None
        st = p.stat()
        return {"key": "/" + key.lstrip("/"), "size": st.st_size,
                "updated": int(st.st_mtime)}

    def exists(self, key: str) -> bool:
        return self._p(key).is_file()

    def delete(self, key: str) -> None:
        p = self._p(key)
        if p.is_file():
            p.unlink()

    def copy(self, src: str, dst: str) -> None:
        shutil.copyfile(self._p(src), self._ensure_parent(dst))

    def copy_if_not_exists(self, src: str, dst: str) -> bool:
        if self.exists(dst):
            return False
        self.copy(src, dst)
        return True

    def rename(self, src: str, dst: str) -> None:
        self._p(src).rename(self._ensure_parent(dst))

    def rename_if_not_exists(self, src: str, dst: str) -> bool:
        if self.exists(dst):
            return False
        self.rename(src, dst)
        return True

    def list(self, prefix: str = "", limit: int | None = None) -> list[dict]:
        out = []
        for p in sorted(self.root.rglob("*")):
            if not p.is_file():
                continue
            key = "/" + str(p.relative_to(self.root))
            if prefix and not key.lstrip("/").startswith(prefix.lstrip("/")):
                continue
            st = p.stat()
            out.append({"key": key, "size": st.st_size,
                        "updated": int(st.st_mtime)})
            if limit is not None and len(out) >= limit:
                break
        return out

    def _ensure_parent(self, key: str) -> Path:
        p = self._p(key)
        p.parent.mkdir(parents=True, exist_ok=True)
        return p


_BUCKETS: dict[str, LocalBucket] = {}


def define_bucket(name: str, root: str) -> LocalBucket:
    """DEFINE BUCKET analogue — register a named bucket backend."""
    _BUCKETS[name] = LocalBucket(name, root)
    return _BUCKETS[name]


def bucket(name: str) -> LocalBucket:
    if name not in _BUCKETS:
        raise KeyError(f"bucket {name!r} not defined (define_bucket first)")
    return _BUCKETS[name]


def _split_pointer(ptr: str) -> tuple[LocalBucket, str]:
    if not ptr.startswith("file:/"):
        raise ValueError(f"not a file pointer: {ptr!r}")
    rest = ptr[len("file:/"):].lstrip("/")
    bname, _, key = rest.partition("/")
    return bucket(bname), key


# driver-side file:: dispatch (registry entries take pointer strings)
def f_put(ptr: str, data: bytes) -> str:
    b, k = _split_pointer(ptr)
    return b.put(k, data)


def f_put_if_not_exists(ptr: str, data: bytes) -> bool:
    b, k = _split_pointer(ptr)
    return b.put_if_not_exists(k, data)


def f_get(ptr: str) -> bytes:
    b, k = _split_pointer(ptr)
    return b.get(k)


def f_head(ptr: str) -> dict | None:
    b, k = _split_pointer(ptr)
    return b.head(k)


def f_exists(ptr: str) -> bool:
    b, k = _split_pointer(ptr)
    return b.exists(k)


def f_delete(ptr: str) -> None:
    b, k = _split_pointer(ptr)
    b.delete(k)


def f_copy(ptr: str, dst_key: str) -> None:
    b, k = _split_pointer(ptr)
    b.copy(k, dst_key)


def f_copy_if_not_exists(ptr: str, dst_key: str) -> bool:
    b, k = _split_pointer(ptr)
    return b.copy_if_not_exists(k, dst_key)


def f_rename(ptr: str, dst_key: str) -> None:
    b, k = _split_pointer(ptr)
    b.rename(k, dst_key)


def f_rename_if_not_exists(ptr: str, dst_key: str) -> bool:
    b, k = _split_pointer(ptr)
    return b.rename_if_not_exists(k, dst_key)


def f_list(bucket_name: str, prefix: str = "", limit: int | None = None) -> list[dict]:
    return bucket(bucket_name).list(prefix, limit)
