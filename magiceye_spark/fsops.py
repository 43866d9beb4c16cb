"""Hadoop-FileSystem-API path operations for stored-index lifecycle
maintenance (:mod:`magiceye_spark.llmops.annindex`,
:mod:`magiceye_spark.llmops.sigstore`).

At 100 TB a persistent index lives on a lake (hdfs://, s3a://, ...), not
the driver's local disk — so compaction's list/rename/delete must go
through ``org.apache.hadoop.fs.FileSystem`` (the abstraction Spark itself
writes through), not ``os.walk``/``shutil``. These helpers resolve the
correct FileSystem implementation from the path's scheme via the active
session's Hadoop configuration, so the SAME code path serves local file:,
HDFS, and the object-store connectors the cluster ships.

Crash-safety of :func:`fs_swap_dirs` (the rename-ASIDE order, not
delete-then-rename): live → live_old, tmp → live, delete live_old. At
every intermediate state a full copy of the table exists at a known path:
a crash before the first rename leaves ``live``; between the renames
leaves ``live_old`` (recovery: rename it back); after the second leaves
the new ``live``. On HDFS and local file: each rename is atomic. On S3A
rename is a server-side copy+delete — NOT atomic — but the aside order
still never deletes the only copy: a crash mid-copy leaves the rename's
SOURCE intact, so the table is recoverable at one of the two paths in
every window. (Contrast delete-then-rename, which has a window with no
copy under the live path at all.)
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path_str: str):
    """(FileSystem, Path) for ``path_str``, scheme-resolved through the
    session's Hadoop configuration (file:, hdfs:, s3a:, ...)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def fs_exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_and_path(spark, path)
    return bool(fs.exists(p))


def fs_count_files(spark: SparkSession, path: str, suffix: str = ".parquet") -> int:
    """Recursive count of data files under ``path`` — the compaction
    before/after metric. Uses the remote-iterator listing (streams; no
    driver-side materialized index of the whole tree)."""
    fs, p = _fs_and_path(spark, path)
    it = fs.listFiles(p, True)
    n = 0
    while it.hasNext():
        if it.next().getPath().getName().endswith(suffix):
            n += 1
    return n


_MANIFEST = "_MANIFEST"


def _write_swap_manifest(spark: SparkSession, dir_str: str) -> None:
    """Stage a completeness manifest into ``dir_str``: one ``name\\tbytes``
    line per file (recursive, relative path, the manifest itself excluded).
    Written BEFORE the directory is renamed into the live position, so a
    later crash-recovery pass can prove live is a complete copy by checking
    live against live's own manifest — no heuristic needed."""
    fs, root = _fs_and_path(spark, dir_str)
    base = root.toUri().getPath().rstrip("/") + "/"
    it = fs.listFiles(root, True)
    lines = []
    while it.hasNext():
        st = it.next()
        rel = st.getPath().toUri().getPath()
        rel = rel[len(base):] if rel.startswith(base) else st.getPath().getName()
        # data files only: _-/.-prefixed entries (_SUCCESS, .crc, this
        # manifest) are Spark-hidden metadata, not table content — and a
        # cluster policy (e.g. markers disabled) may legitimately add or
        # remove them after staging
        if st.getPath().getName().startswith(("_", ".")):
            continue
        lines.append(f"{rel}\t{st.getLen()}")
    out = fs.create(
        spark._jvm.org.apache.hadoop.fs.Path(root, _MANIFEST), True
    )
    try:
        out.write(bytearray("\n".join(sorted(lines)).encode("utf-8")))
    finally:
        out.close()


def _manifest_proves_complete(spark: SparkSession, dir_str: str):
    """``True``/``False`` per the ``_MANIFEST`` check — every listed file
    exists with the recorded size. S3A copies objects one at a time (each
    object-copy atomic), so per-file existence + size against the staged
    manifest is a real completeness proof, not a marker heuristic. A
    present-but-failing manifest is AUTHORITATIVE (no ``_SUCCESS``
    fallback — the marker sorts before ``part-*`` in copy order, so it
    lies about exactly this state). Returns ``None`` when no manifest is
    present (pre-manifest store or a write that bypassed fs_swap_dirs) —
    only then do callers fall back to the best-effort ``_SUCCESS`` check."""
    jvm = spark._jvm
    fs, root = _fs_and_path(spark, dir_str)
    mpath = jvm.org.apache.hadoop.fs.Path(root, _MANIFEST)
    if not fs.exists(mpath):
        return None
    stream = fs.open(mpath)
    try:
        # py4j passes byte[] by value (a Python-side read buffer would stay
        # zeros), so drain the stream JVM-side via the commons-io that
        # ships with Hadoop.
        text = bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        ).decode("utf-8")
    finally:
        stream.close()
    for line in filter(None, text.split("\n")):
        rel, _, size = line.rpartition("\t")
        p = jvm.org.apache.hadoop.fs.Path(root, rel)
        if not fs.exists(p) or fs.getFileStatus(p).getLen() != int(size):
            return False
    return True


def fs_swap_dirs(spark: SparkSession, tmp_dir: str, live_dir: str) -> None:
    """Promote a staged rewrite: ``live → live_old``, ``tmp → live``,
    delete ``live_old`` (guarantees per scheme in the module docstring).

    A pre-existing ``live_old`` is a crash leftover, and there are TWO
    states that leave one behind: a crash after the second rename (live
    is the complete new table — safe to clear old) and, on S3A only, a
    crash MID tmp→live rename (rename = non-atomic copy+delete there), which
    leaves a PARTIAL live plus the complete old. Deleting old in that
    second state would destroy the only complete copy and silently commit
    truncated data — so old is cleared only after live is shown complete:

    * Primary proof: the ``_MANIFEST`` this function stages into tmp before
      the swap (file list + sizes); live matching its own manifest IS a
      completeness proof, since each S3A object-copy is atomic.
    * Fallback (pre-manifest stores only): the Spark ``_SUCCESS`` marker.
      This one is BEST-EFFORT, not a proof — an interrupted S3A rename
      copies objects in listing order and ``_SUCCESS`` sorts before
      ``part-*``, so a partial live can already carry it; and clusters
      that disable success markers would fail it spuriously. Every swap
      through this function writes a manifest, so the fallback only runs
      for stores last written by something else.

    If neither check passes this raises for operator recovery (rename
    ``*_old`` back over live, or finish the interrupted promotion by
    hand)."""
    jvm = spark._jvm
    fs, live = _fs_and_path(spark, live_dir)
    _, tmp = _fs_and_path(spark, tmp_dir)
    _, old = _fs_and_path(spark, live_dir.rstrip("/") + "_old")
    if fs.exists(old):
        verdict = _manifest_proves_complete(spark, live_dir)
        complete = (
            verdict
            if verdict is not None
            else fs.exists(jvm.org.apache.hadoop.fs.Path(live, "_SUCCESS"))
        )
        if not complete:
            raise IOError(
                f"refusing to delete crash leftover {live_dir}_old: "
                f"{live_dir} fails its _MANIFEST check (or, pre-manifest, "
                "lacks _SUCCESS), so it may be a partial copy from an "
                "interrupted promotion (S3A rename is copy+delete) — "
                "recover by renaming the *_old directory back over the "
                "live path before re-running compaction"
            )
        fs.delete(old, True)
    _write_swap_manifest(spark, tmp_dir)
    if not fs.rename(live, old):
        raise IOError(f"rename {live_dir} -> {live_dir}_old failed")
    if not fs.rename(tmp, live):
        fs.rename(old, live)  # roll back: keep the store readable
        raise IOError(f"rename {tmp_dir} -> {live_dir} failed (rolled back)")
    fs.delete(old, True)
