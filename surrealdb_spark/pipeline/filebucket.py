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


class BucketError(ValueError):
    """file:: operation failure — message text mirrors core/src/err."""


def _coerce_bytes(data) -> bytes:
    """put() payload coercion (buc controller converts the Value):
    strings store UTF-8, arrays of ints store raw bytes
    (primitive/files/binary.surql)."""
    if isinstance(data, (bytes, bytearray)):
        return bytes(data)
    if isinstance(data, str):
        return data.encode()
    if isinstance(data, list):
        return bytes(int(x) for x in data)
    raise BucketError(f"cannot store value of type "
                      f"{type(data).__name__} in a bucket")


class LocalBucket:
    """A named bucket rooted at a local directory (or any Path-like mount).

    Keys are slash-separated; `put`/`get` move bytes; the *_if_not_exists
    variants mirror file.rs semantics (precondition-failed is a no-op;
    every mutator returns None like fnc/file.rs returning Value::None).
    """

    def __init__(self, name: str, root: str, readonly: bool = False):
        self.name = name
        self.root = Path(root)
        self.readonly = readonly
        self.root.mkdir(parents=True, exist_ok=True)

    def _check_write(self) -> None:
        if self.readonly:
            # buc/mod.rs BucketController::require_writeable error text
            raise BucketError(
                f"Write operation is not supported, as bucket "
                f"`{self.name}` is in read-only mode")

    def _require_src(self, key: str) -> None:
        if not self.exists(key):
            # buc store error surface (files/errors.surql)
            raise BucketError(
                f"Operation for bucket `{self.name}` failed: "
                f"Source key does not exist: /{key.lstrip('/')}")

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

    def _meta(self, key: str, p: Path) -> dict:
        """ObjectMeta::into_value shape (buc/store/mod.rs:44-53):
        { updated: datetime, size: int, file: <pointer> }."""
        import datetime as _dt

        st = p.stat()
        return {
            "updated": _dt.datetime.fromtimestamp(st.st_mtime,
                                                  _dt.timezone.utc),
            "size": st.st_size,
            "file": self.pointer(key),
        }

    # file::put / file::get -------------------------------------------------
    def put(self, key: str, data) -> None:
        self._check_write()
        p = self._p(key)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(_coerce_bytes(data))

    def put_if_not_exists(self, key: str, data) -> None:
        self._check_write()
        if self.exists(key):
            return
        self.put(key, data)

    def get(self, key: str) -> bytes | None:
        # missing files are NONE, not an error (fnc/file.rs get -> Option)
        p = self._p(key)
        return p.read_bytes() if p.is_file() else None

    def head(self, key: str) -> dict | None:
        p = self._p(key)
        return self._meta(key, p) if p.is_file() else None

    def exists(self, key: str) -> bool:
        return self._p(key).is_file()

    def delete(self, key: str) -> None:
        self._check_write()
        p = self._p(key)
        if p.is_file():
            p.unlink()

    def copy(self, src: str, dst: str) -> None:
        self._check_write()
        self._require_src(src)
        shutil.copyfile(self._p(src), self._ensure_parent(dst))

    def copy_if_not_exists(self, src: str, dst: str) -> None:
        # idempotent BOTH ways: existing destination AND missing source
        # are silent no-ops (files/errors.surql case 7), unlike
        # rename_if_not_exists which errors on a missing source
        self._check_write()
        if self.exists(dst) or not self.exists(src):
            return
        shutil.copyfile(self._p(src), self._ensure_parent(dst))

    def rename(self, src: str, dst: str) -> None:
        self._check_write()
        self._require_src(src)
        self._p(src).rename(self._ensure_parent(dst))

    def rename_if_not_exists(self, src: str, dst: str) -> None:
        self._check_write()
        self._require_src(src)
        if self.exists(dst):
            return
        self._p(src).rename(self._ensure_parent(dst))

    def list(self, prefix: str | None = None, start: str | None = None,
             limit: int | None = None) -> list[dict]:
        """ListOptions semantics (buc/store/mod.rs:56-67): `start` is
        exclusive pagination, `prefix` filters keys, `limit` caps; keys
        come back sorted."""
        out = []
        for p in sorted(self.root.rglob("*"), key=lambda q: str(q)):
            if not p.is_file():
                continue
            key = "/" + p.relative_to(self.root).as_posix()
            if prefix is not None \
                    and not key.startswith("/" + prefix.lstrip("/")):
                continue
            if start is not None and key <= "/" + start.lstrip("/"):
                continue
            out.append(self._meta(key, p))
            if limit is not None and len(out) >= limit:
                break
        return out

    def _ensure_parent(self, key: str) -> Path:
        p = self._p(key)
        p.parent.mkdir(parents=True, exist_ok=True)
        return p


_BUCKETS: dict[str, LocalBucket] = {}


def define_bucket(name: str, root: str, readonly: bool = False,
                  backend: str | None = None) -> LocalBucket:
    """DEFINE BUCKET analogue — register a named bucket backend.

    A `file:...` backend needs the global bucket folder allowlist the
    server never configures here, so it is denied like the reference
    (buc/store/file.rs:99 FileAccessDenied)."""
    if backend and backend.startswith("file:"):
        path = backend[len("file:"):]
        raise BucketError(f"File access denied: {path}")
    _BUCKETS[name] = LocalBucket(name, root, readonly=readonly)
    return _BUCKETS[name]


def remove_bucket(name: str) -> None:
    _BUCKETS.pop(name, None)


def bucket(name: str) -> LocalBucket:
    if name not in _BUCKETS:
        # fnc error text (files/errors.surql)
        raise BucketError(f"The bucket '{name}' does not exist")
    return _BUCKETS[name]


def _split_pointer(ptr: str) -> tuple[LocalBucket, str]:
    if not ptr.startswith("file:/"):
        raise ValueError(f"not a file pointer: {ptr!r}")
    rest = ptr[len("file:/"):].lstrip("/")
    bname, _, key = rest.partition("/")
    return bucket(bname), key


# driver-side file:: dispatch (fnc/file.rs surface; every mutator
# returns None = Value::None)
def f_put(ptr: str, data) -> None:
    b, k = _split_pointer(ptr)
    b.put(k, data)


def f_put_if_not_exists(ptr: str, data) -> None:
    b, k = _split_pointer(ptr)
    b.put_if_not_exists(k, data)


def f_get(ptr: str) -> bytes | None:
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


def _dst(b: LocalBucket, dst) -> tuple[LocalBucket, str]:
    """Copy destination: a file pointer targets (possibly) another
    bucket; a bare string is a key in the SOURCE bucket
    (fnc/file.rs value_to_file / DestinationFile)."""
    if isinstance(dst, str) and dst.startswith("file:/"):
        return _split_pointer(dst)
    return b, str(dst)


def f_copy(ptr: str, dst) -> None:
    b, k = _split_pointer(ptr)
    db_, dk = _dst(b, dst)
    if db_ is b:
        b.copy(k, dk)
    else:  # cross-bucket: read from source, write to destination
        data = b.get(k)
        if data is None:
            raise BucketError("Source file does not exist")
        db_.put(dk, data)


def f_copy_if_not_exists(ptr: str, dst) -> None:
    b, k = _split_pointer(ptr)
    db_, dk = _dst(b, dst)
    if db_ is b:
        b.copy_if_not_exists(k, dk)
    else:
        data = b.get(k)
        if data is None:
            raise BucketError("Source file does not exist")
        db_.put_if_not_exists(dk, data)


def f_rename(ptr: str, dst_key: str) -> None:
    b, k = _split_pointer(ptr)
    b.rename(k, dst_key)


def f_rename_if_not_exists(ptr: str, dst_key: str) -> None:
    b, k = _split_pointer(ptr)
    b.rename_if_not_exists(k, dst_key)


def f_list(bucket_name: str, opts: dict | None = None) -> list[dict]:
    opts = opts or {}
    return bucket(bucket_name).list(
        prefix=opts.get("prefix"), start=opts.get("start"),
        limit=opts.get("limit"))
