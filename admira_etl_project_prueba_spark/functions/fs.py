"""Hadoop-FileSystem helpers for store maintenance ops.

Everything goes through the session's Hadoop FS (not ``os.path``) so the
same code path works for local directories and HDFS/S3A URIs — the
distinction matters exactly for the index/store maintenance ops that run
against a cluster filesystem at scale.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def path_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists on the session's filesystem.

    Maintenance ops use this to distinguish GENUINELY ABSENT (legacy
    store, first run) from a FAILING READ (permissions, corrupt footer,
    transient IO).  A bare ``except Exception`` around a read conflates
    the two and silently skips validation in exactly the failure cases
    it exists for — only a confirmed-missing path may take the legacy
    branch; every other error must propagate.
    """
    fs, jpath, _ = _fs_and_path(spark, path)
    return bool(fs.exists(jpath))


def path_mtime(spark: SparkSession, path: str) -> int:
    """Modification time (ms since epoch) of ``path``, or -1 when absent —
    ONE metadata RPC, no data read.

    Used as a cache-invalidation key for sidecar stores that are replaced
    by RENAME (``swap_into_place``): the renamed-in directory is a new
    filesystem object carrying its own mtime, so a changed value means
    the store was swapped since the cache was filled — including by a
    DIFFERENT process, which in-process invalidation can never see."""
    fs, jpath, _ = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return -1
    return int(fs.getFileStatus(jpath).getModificationTime())


def recover_swap(spark: SparkSession, dst: str) -> bool:
    """Heal the one crash window :func:`swap_into_place` leaves open.

    A crash between the swap's two renames leaves the only copy of the
    store at ``dst__old`` with ``dst`` absent.  Callers that treat
    "store absent" as "first run" (streaming folds, legacy-index
    branches) MUST call this before the existence check — otherwise the
    post-crash restart silently resets the store to the current batch
    and the NEXT successful swap deletes the ``__old`` recovery copy,
    turning a recoverable crash into permanent, error-free data loss.
    Returns True when a recovery rename was performed.
    """
    fs, jdst, jvm = _fs_and_path(spark, dst)
    jold = jvm.org.apache.hadoop.fs.Path(_old_path(dst))
    if not fs.exists(jdst) and fs.exists(jold):
        if not fs.rename(jold, jdst):
            raise IOError(f"recover_swap: rename {jold} -> {dst} failed")
        return True
    return False


def _old_path(dst: str) -> str:
    """The recovery-copy location :func:`swap_into_place` uses — the
    naming rule lives HERE, next to the swap, so probes can't drift."""
    return dst.rstrip("/") + "__old"


def swap_window_open(spark: SparkSession, dst: str) -> bool:
    """True when a crashed :func:`swap_into_place` left only the
    recovery copy (``dst`` absent, ``dst__old`` present) — the cheap
    unlocked probe callers use to decide whether to take a lock and
    :func:`recover_swap`.  Two metadata RPCs, no data read."""
    fs, jdst, jvm = _fs_and_path(spark, dst)
    jold = jvm.org.apache.hadoop.fs.Path(_old_path(dst))
    return (not fs.exists(jdst)) and bool(fs.exists(jold))


def swap_into_place(spark: SparkSession, tmp: str, dst: str) -> None:
    """Replace ``dst`` with ``tmp`` via two directory renames.

    The crash-safety contract for compaction-style rewrites: the new
    layout is FULLY WRITTEN at ``tmp`` before the original is touched,
    so no failure window destroys the only copy (``mode('overwrite')``
    on the source path deletes the directory FIRST — an executor loss
    mid-write then loses the store).  Sequence: ``dst`` → ``dst__old``
    (rename, atomic per-directory on HDFS and local FS), ``tmp`` →
    ``dst`` (rename), delete ``dst__old``.  A crash between the renames
    leaves ``dst__old`` intact for manual recovery; a stale
    ``dst__old`` from such a crash is cleared on the next swap.
    """
    fs, jdst, jvm = _fs_and_path(spark, dst)
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    jold = jvm.org.apache.hadoop.fs.Path(dst.rstrip("/") + "__old")
    if fs.exists(jold):
        fs.delete(jold, True)
    if not fs.rename(jdst, jold):
        raise IOError(f"swap_into_place: rename {dst} -> {jold} failed")
    if not fs.rename(jtmp, jdst):
        # put the original back rather than leaving no store at dst
        fs.rename(jold, jdst)
        raise IOError(f"swap_into_place: rename {tmp} -> {dst} failed")
    fs.delete(jold, True)
