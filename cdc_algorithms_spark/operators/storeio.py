"""Hadoop-FS helpers shared by the durable index stores (text postings,
PQ codes): epoch-directory listing and the folded-epochs manifest that
makes compaction atomic with respect to delta liveness.

The crash window the manifest closes: every ``compact_*`` stages the
merged store, installs it with a rename, then deletes the now-folded
epoch deltas. A crash BETWEEN the install rename and the delta delete
used to leave both the folded rows (inside the new base) and the live
epoch directories — the next probe would union them and double-count.

Fix: the staged store carries ``_folded_epochs.json`` (a ``_``-prefixed
file, invisible to Spark's parquet reader) listing every epoch directory
it subsumes, written BEFORE the install rename. The install rename is
therefore the single atomic operation that both publishes the folded
rows and retires their deltas: :func:`live_epoch_dirs` consults the
manifest of the CURRENT base and skips listed epochs, so post-install
delta deletion is garbage collection, not correctness. A bonus: an
at-least-once replay that re-writes an epoch AFTER a compaction folded
it is now skipped too, instead of double-counting.

Manifests accumulate (each compaction unions the previous manifest), so
epoch names must never be REUSED for new data after a compaction — the
existing monotonic-epoch contract of the ``extend_*`` writers
(foreachBatch batch ids) already guarantees that.
"""

from __future__ import annotations

import json
import logging

from pyspark.sql import SparkSession

_LOG = logging.getLogger(__name__)

MANIFEST = "_folded_epochs.json"


def _fs_and_path(spark: SparkSession, path_str: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path_str)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def read_folded_epochs(spark: SparkSession, store_dir: str) -> set[str]:
    """Epoch basenames the base store at ``store_dir`` already contains
    (empty set when the store predates manifests or was never
    compacted)."""
    fs, p = _fs_and_path(spark, f"{store_dir}/{MANIFEST}")
    if not fs.exists(p):
        return set()
    stream = fs.open(p)
    try:
        text = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return set(json.loads(text)["folded"])


def write_folded_epochs(
    spark: SparkSession, staged_dir: str, folded: set[str]
) -> None:
    """Record ``folded`` epoch basenames inside a STAGED store so the
    install rename publishes rows and manifest in one atomic step."""
    fs, p = _fs_and_path(spark, f"{staged_dir}/{MANIFEST}")
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps({"folded": sorted(folded)}).encode()))
    finally:
        out.close()


# Store-format marker (r12): writers record layout parameters a reader
# or extender MUST agree with (bucket counts, key types) in one small
# JSON beside the store. Shared by the Jaccard index (_index_meta.json),
# the DSIR count store and the BM25 text index (_store_meta.json).
STORE_META = "_store_meta.json"


def write_store_meta(
    spark: SparkSession, store_root: str, meta: dict, name: str = STORE_META
) -> None:
    fs, p = _fs_and_path(spark, f"{store_root}/{name}")
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps(meta).encode()))
    finally:
        out.close()


def read_store_meta(
    spark: SparkSession, store_root: str, name: str = STORE_META
) -> dict | None:
    """None for stores predating markers (the fixed pre-r12 layouts)."""
    fs, p = _fs_and_path(spark, f"{store_root}/{name}")
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        text = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return json.loads(text)


def gc_folded_epochs(
    spark: SparkSession, delta_root: str, store_dir: str
) -> None:
    """Delete epoch directories under ``delta_root`` that the base
    store's manifest already records as folded — the cleanup a crash
    between install and delete deferred. Safe at any time: probes skip
    these directories regardless."""
    fs, root = _fs_and_path(spark, delta_root)
    if not fs.exists(root):
        return
    folded = read_folded_epochs(spark, store_dir)
    for st in fs.listStatus(root):
        if st.isDirectory() and st.getPath().getName() in folded:
            fs.delete(st.getPath(), True)


def _try_rename(fs, src, dst) -> bool:
    """Rename that reports failure instead of raising: Hadoop's
    FileSystem contract is a boolean, but RawLocalFileSystem THROWS for
    a missing source (it falls back to a copy that stats the src) — an
    install rename that raises would skip the rollback branch and
    strand the store parked at ``*_old``, the exact failure the
    rollback exists to prevent."""
    try:
        return bool(fs.rename(src, dst))
    except Exception:
        return False


def install_staged_store(
    spark: SparkSession, path: str, kinds: list[str]
) -> None:
    """Shared install tail for the ``*_delta`` compactors
    (compact_text_index / compact_pq_index / compact_dsir_counts): for
    each ``kind``, park the live ``{path}/{kind}`` at ``{kind}_old``,
    install ``{kind}_tmp`` (whose manifest was written by the caller
    BEFORE this call), then garbage-collect ONLY the manifest-folded
    epochs under ``{kind}_delta`` — never the whole delta root, so an
    epoch a concurrent extend landed after the caller's listing
    survives (it is live: not in the manifest, still probed).

    Crash honesty: no byte is deleted before its replacement is
    installed, and the delta GC is correctness-free (probes skip folded
    epochs via the manifest) — but between the park rename and the
    install rename the store directory is ABSENT, so a crash in that
    instant leaves probes failing path-not-found until the parked
    ``{kind}_old`` is renamed back by hand. A FAILED install rename (as
    opposed to a crash) rolls the parked store back into place before
    raising, so only a crash or a double failure needs manual recovery.
    Every other crash point leaves a readable, never-double-counting
    store."""
    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    fs = P(path).getFileSystem(spark._jsc.hadoopConfiguration())
    for kind in kinds:
        old = P(f"{path}/{kind}_old")
        fs.delete(old, True)
        if not fs.rename(P(f"{path}/{kind}"), old):
            raise IOError(f"could not park the old {kind} store")
        if not _try_rename(fs, P(f"{path}/{kind}_tmp"), P(f"{path}/{kind}")):
            if _try_rename(fs, old, P(f"{path}/{kind}")):
                raise IOError(
                    f"could not install the compacted {kind} store; the"
                    f" previous store was rolled back into place"
                )
            raise IOError(
                f"could not install the compacted {kind} store; live"
                f" data parked at {path}/{kind}_old"
            )
        gc_folded_epochs(spark, f"{path}/{kind}_delta", f"{path}/{kind}")
        fs.delete(old, True)


def _is_generation(name: str) -> bool:
    return name == "seed" or name.startswith("batch_")


def compact_epoch_store(spark: SparkSession, store_dir: str) -> int:
    """Fold every live generation of an epoch-SUBDIR store (the
    ``seed`` + ``batch_<id>`` layout of streaming/sync.py,
    streaming/near_dup.py, streaming/ingest_pipeline.py — distinct from
    the ``*_delta`` layout the ``compact_*`` verbs own) into ONE
    consolidated ``seed`` generation. Returns the number of generations
    folded (0 when a store with ≤ 1 live generation only
    garbage-collects dead subdirectories).

    Same discipline as every other compaction here: the staged root
    carries the manifest BEFORE the install rename, so the rename
    atomically retires the folded generations; a crash between install
    and cleanup leaves probes exact. The manifest also closes the
    replay-after-compaction hole this layout uniquely has: an
    at-least-once replay of ``batch_k`` AFTER ``batch_k`` was folded
    into seed re-creates its subdirectory — without the manifest every
    reader would double-count it; with it the name is dead forever
    (epoch ids are never reused for NEW data — the foreachBatch batch-id
    contract).

    Concurrency contract: READERS must be quiesced (run between
    micro-batches / with the stream's foreachBatch not mid-probe) — the
    root-swap is the only single-commit-point publish a rename-based FS
    offers, and between the park rename and the install rename the root
    is briefly absent. Concurrent EXTENDS are survived: an epoch
    directory a writer landed between this verb's listing and the park
    rename travels with the parked root, is NOT in the new manifest, and
    is rescued — renamed back into the installed root — before the
    parked copy is deleted. If a writer recreates the root itself inside
    the swap window, the staged store's children are installed INTO that
    recreated root (a plain rename would nest the staged root inside it
    on Hadoop FS semantics). A failed install rename rolls the parked
    root back into place before raising, so only a double failure leaves
    the store at ``__compact_old`` needing manual recovery."""
    fs, root = _fs_and_path(spark, store_dir)
    if not fs.exists(root):
        return 0
    folded = read_folded_epochs(spark, store_dir)
    names = [
        st.getPath().getName()
        for st in fs.listStatus(root)
        if st.isDirectory() and _is_generation(st.getPath().getName())
    ]
    live = [n for n in names if n not in folded]
    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    if len(live) <= 1:
        for n in names:
            if n in folded:
                fs.delete(P(f"{store_dir}/{n}"), True)
        return 0
    df = spark.read.parquet(*[f"{store_dir}/{n}" for n in sorted(live)])
    tmp = f"{store_dir}__compact_tmp"
    fs.delete(P(tmp), True)
    df.write.mode("overwrite").parquet(f"{tmp}/seed")
    new_manifest = (folded | set(live)) - {"seed"}
    write_folded_epochs(spark, tmp, new_manifest)
    old = f"{store_dir}__compact_old"
    fs.delete(P(old), True)
    if not fs.rename(root, P(old)):
        raise IOError(f"could not park the live store at {old}")
    if fs.exists(root):
        # a concurrent writer recreated the root inside the swap window;
        # rename(tmp, root) would NEST tmp under it — install the staged
        # children into the recreated root instead (the writer's fresh
        # epoch dirs are not in the manifest, so they stay live)
        if not _try_rename(fs, P(f"{tmp}/seed"), P(f"{store_dir}/seed")):
            _try_rename(fs, P(old), root)  # best-effort rollback
            raise IOError(
                f"could not install the compacted seed into the"
                f" recreated root; live data parked at {old}"
            )
        fs.delete(P(f"{store_dir}/{MANIFEST}"), False)
        if not _try_rename(
            fs, P(f"{tmp}/{MANIFEST}"), P(f"{store_dir}/{MANIFEST}")
        ):
            # without the manifest a replay of a folded batch_<id> would
            # go live again and double-count; keep tmp (it still holds
            # the manifest) and fail loudly instead of GC-ing it
            raise IOError(
                f"installed the compacted seed but could not install its"
                f" manifest; staged manifest left at {tmp}/{MANIFEST} —"
                f" the store double-counts folded epochs until it is"
                f" moved to {store_dir}/{MANIFEST}"
            )
        fs.delete(P(tmp), True)
    elif not _try_rename(fs, P(tmp), root):
        # roll the parked root back so probes keep working; only a
        # double failure strands the store at __compact_old
        if _try_rename(fs, P(old), root):
            raise IOError(
                "could not install the compacted store; the previous"
                " store was rolled back into place"
            )
        raise IOError(
            f"could not install the compacted store; live data parked"
            f" at {old}"
        )
    # rescue concurrent-extend epochs that travelled with the parked
    # root: any generation in the parked copy that is neither in the
    # fold snapshot nor already folded arrived during the swap — rename
    # it into the installed root (not in the manifest ⇒ still live).
    # Each rescue rename is CHECKED: an unchecked rename followed by an
    # unconditional delete of the parked root would silently destroy a
    # live epoch when the rename fails (e.g. an at-least-once replay
    # already re-created store_dir/<n> inside the swap window, where
    # Hadoop rename-into-existing either returns false or nests src
    # under dst). On any failure the entry stays parked and the root
    # survives with a logged warning — never data loss.
    oldp = P(old)
    if fs.exists(oldp):
        stranded: list[str] = []
        for st in fs.listStatus(oldp):
            n = st.getPath().getName()
            if (
                st.isDirectory()
                and _is_generation(n)
                and n not in names
                and n not in new_manifest
            ):
                dst = P(f"{store_dir}/{n}")
                if fs.exists(dst) or not _try_rename(fs, st.getPath(), dst):
                    stranded.append(n)
        if stranded:
            # delete only what is provably garbage (generations whose
            # rows are inside the installed seed); leave the stranded
            # live epochs parked for manual inspection
            for st in fs.listStatus(oldp):
                n = st.getPath().getName()
                if st.isDirectory() and _is_generation(n) and (
                    n in names or n in new_manifest
                ):
                    fs.delete(st.getPath(), True)
            _LOG.warning(
                "compact_epoch_store: could not rescue concurrent-extend"
                " epoch(s) %s into %s (destination exists or rename"
                " failed); they remain parked under %s and are NOT"
                " probed — reconcile by hand",
                sorted(stranded),
                store_dir,
                old,
            )
        else:
            fs.delete(oldp, True)
    return len(live)


def live_epoch_dirs(
    spark: SparkSession, delta_root: str, store_dir: str
) -> list[str]:
    """Epoch subdirectories under ``delta_root`` NOT already folded into
    the base store at ``store_dir`` (per its manifest); sorted, absent
    root → []."""
    fs, root = _fs_and_path(spark, delta_root)
    if not fs.exists(root):
        return []
    folded = read_folded_epochs(spark, store_dir)
    return sorted(
        str(st.getPath())
        for st in fs.listStatus(root)
        if st.isDirectory() and st.getPath().getName() not in folded
    )
