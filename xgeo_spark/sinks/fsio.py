"""Driver-side filesystem IO through the Hadoop FileSystem API.

Why: the lake's commit protocol (manifest read/write, written-file
discovery, snapshot expiry) runs on the DRIVER, and a driver on a real
cluster sees the table root through HDFS/S3A/GCS — not the local POSIX
tree that ``os.listdir``/``os.replace`` assume. Routing every such access
through ``org.apache.hadoop.fs.FileSystem`` (reached over the session's
JVM gateway) makes the identical code path work on ``file:`` in tests and
on object storage in production; only the root URI changes.

Commit atomicity contract (see ParquetLakeTable): new files are written to
a temp name then ``rename``-ed into place with overwrite=false — on HDFS
and file: that rename is atomic and FAILS if the destination exists, which
doubles as optimistic-concurrency detection (two drivers racing the same
version lose deterministically). This is the same create-swap discipline
Iceberg's HadoopTableOperations uses for version-hint-less commits.

Per-call py4j overhead is ~0.1ms; callers batch listings per directory so
a merge does O(buckets) calls, not O(files).
"""

from __future__ import annotations

import posixpath
import uuid


class HadoopFS:
    """Thin wrapper over one ``FileSystem`` instance for a table root."""

    def __init__(self, spark, root: str):
        self.spark = spark
        self.root = root
        jvm = spark._jvm
        self._jvm = jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(root).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )
        # Scheme of the RESOLVED filesystem (a bare "/p" root resolves
        # through fs.defaultFS, which may be hdfs:// on a cluster) —
        # gates the os.link local fast path in write_text_commit.
        self._scheme = str(self._fs.getUri().getScheme() or "")

    # ---------- path helpers ----------

    def _p(self, path: str):
        return self._Path(path)

    def join(self, *parts: str) -> str:
        return posixpath.join(*parts)

    # ---------- predicates ----------

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def is_dir(self, path: str) -> bool:
        p = self._p(path)
        return bool(self._fs.exists(p) and self._fs.getFileStatus(p).isDirectory())

    # ---------- listing ----------

    def list_names(self, dir_path: str) -> list[str]:
        """Immediate child names of a directory ([] if it doesn't exist)."""
        p = self._p(dir_path)
        if not self._fs.exists(p):
            return []
        return sorted(st.getPath().getName() for st in self._fs.listStatus(p))

    def list_files_recursive(self, dir_path: str) -> list[str]:
        """All file paths (relative to dir_path) under a directory tree."""
        p = self._p(dir_path)
        if not self._fs.exists(p):
            return []
        out = []
        it = self._fs.listFiles(p, True)
        base = self._fs.getFileStatus(p).getPath().toUri().getPath()
        while it.hasNext():
            fp = it.next().getPath().toUri().getPath()
            out.append(posixpath.relpath(fp, base))
        return sorted(out)

    # ---------- read / write ----------

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def _write_stream(self, path: str, data: bytes) -> None:
        out = self._fs.create(self._p(path), True)
        try:
            out.write(bytearray(data))
            # durability before visibility: without a sync, a host crash
            # after the commit rename can leave a torn/empty manifest that
            # the directory listing presents as the CURRENT version. hsync
            # on HDFS persists to datanode disks; LocalFileSystem maps it
            # to fsync (verified supported here). Streams that genuinely
            # can't sync (some object-store shims) fall through — close()
            # is their only durability point anyway.
            try:
                out.hsync()
            except Exception:
                pass
        finally:
            out.close()

    def write_bytes(self, path: str, data: bytes) -> None:
        """Non-atomic single-file write (callers use unique names)."""
        self.mkdirs(posixpath.dirname(path))
        self._write_stream(path, data)

    def write_text_commit(self, path: str, content: str) -> None:
        """Atomic-visibility write: temp file + rename with overwrite=false.

        Raises FileExistsError if ``path`` already exists (lost a commit
        race) — the caller surfaces this as a commit conflict.

        Rename-onto-existing semantics, verified empirically on this
        Hadoop build: both HDFS and LocalFileSystem return False without
        replacing the destination (the FileSystem#rename contract), so the
        loser of a race is detected.

        On LOCAL paths the swap uses ``os.link`` instead of the Hadoop
        rename: LocalFileSystem's dst-exists check is not atomic with its
        rename (a TOCTOU window where two same-version committers can both
        "succeed", the second silently overwriting the first), whereas
        link(2) is an atomic create-if-absent — exactly one of N racing
        writers wins, every loser gets EEXIST. HDFS needs no such detour:
        its rename is atomic-no-overwrite server-side.

        SCOPE: this protocol is only correct on RENAME-ATOMIC filesystems
        (HDFS, file:, most POSIX-semantics stores). On S3A, rename is a
        non-atomic copy+delete and the dst-exists probe races other
        writers — do NOT point a ParquetLakeTable at s3a:// and expect
        commit-conflict detection. The object-store answer is a catalog
        with a real atomic swap: use the IcebergLakeTable sink there
        (Iceberg commits via catalog CAS, not rename)."""
        parent = posixpath.dirname(path)
        self.mkdirs(parent)
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        self._write_stream(tmp, content.encode("utf-8"))
        local_dst = self._local_path(path)
        if local_dst is not None:
            import os

            local_tmp = self._local_path(tmp)
            try:
                os.link(local_tmp, local_dst)
            except FileExistsError:
                raise FileExistsError(
                    f"commit conflict: {path} already exists"
                ) from None
            else:
                # Preserve the ChecksumFileSystem sidecar: Hadoop wrote
                # ``.{tmp}.crc`` beside the tmp file and later Hadoop
                # reads of the destination verify against
                # ``.{dst}.crc``; link it across BEFORE the tmp delete
                # removes it. Best-effort — absent when checksums are
                # off, and the CRC encodes chunk contents, not the
                # filename, so the link is valid for the destination.
                tdir, tname = os.path.split(local_tmp)
                ddir, dname = os.path.split(local_dst)
                try:
                    os.link(
                        os.path.join(tdir, f".{tname}.crc"),
                        os.path.join(ddir, f".{dname}.crc"),
                    )
                except OSError:
                    pass
            finally:
                self._fs.delete(self._p(tmp), False)
            return
        dst = self._p(path)
        if self._fs.exists(dst) or not self._fs.rename(self._p(tmp), dst):
            self._fs.delete(self._p(tmp), False)
            raise FileExistsError(f"commit conflict: {path} already exists")

    def _local_path(self, path: str) -> str | None:
        """POSIX path when the RESOLVED filesystem is the local one,
        else None.

        Gated on the filesystem's own scheme, not the path's shape: a
        bare ``/p`` resolves through ``fs.defaultFS`` (hdfs:// on a
        typical cluster), in which case the tmp manifest lives on HDFS
        and an ``os.link`` against the driver's local disk would fail —
        such configs must take the Hadoop rename path below.  Authority
        and relative parts are resolved by Hadoop itself
        (``makeQualified().toUri().getPath()``), not string surgery, so
        ``file://host/p`` URIs survive intact."""
        if self._scheme != "file":
            return None
        try:
            return str(
                self._fs.makeQualified(self._p(path)).toUri().getPath()
            )
        except Exception:
            return None

    # ---------- metadata ----------

    def mtime(self, path: str) -> float:
        """Modification time (epoch seconds) of a path."""
        return (
            self._fs.getFileStatus(self._p(path)).getModificationTime()
            / 1000.0
        )

    def newest_mtime_recursive(self, dir_path: str) -> float:
        """Newest file modification time (epoch seconds) under a tree,
        falling back to the dir's own mtime for an empty tree."""
        p = self._p(dir_path)
        newest = self._fs.getFileStatus(p).getModificationTime()
        it = self._fs.listFiles(p, True)
        while it.hasNext():
            newest = max(newest, it.next().getModificationTime())
        return newest / 1000.0

    # ---------- mutation ----------

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def delete(self, path: str, recursive: bool = False) -> bool:
        return bool(self._fs.delete(self._p(path), recursive))

    def delete_if_empty_dir(self, path: str) -> bool:
        p = self._p(path)
        if self._fs.exists(p) and len(self._fs.listStatus(p)) == 0:
            return bool(self._fs.delete(p, False))
        return False
