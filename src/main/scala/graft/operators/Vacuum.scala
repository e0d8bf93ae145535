package graft.operators

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession

import graft.catalog.{GraftCatalog, TableMeta}
import graft.catalog.write.GraftBatchWrite

/** Orphan-file reclamation (`VACUUM`) for catalog tables.
  *
  * A directory-backed table accumulates garbage only through CRASHES —
  * every healthy commit cleans up after itself — so vacuum's job is to
  * reclaim exactly the residue a crash can leave, and nothing else:
  *
  *  1. '''Unregistered partition directories''' (partitioned tables).
  *     The two-phase commit publishes files to the filesystem FIRST,
  *     then registers new partitions in the descriptor
  *     ([[graft.catalog.write.GraftBatchWrite]]). A crash between the
  *     phases leaves a fully-written partition dir the catalog never
  *     learned about: invisible to readers (the file index lists only
  *     registered partitions, [[graft.catalog.GraftFileIndex]]) and
  *     therefore pure dead bytes. Registered truth comes from the
  *     descriptor reloaded UNDER the write permit, so a racing append's
  *     fresh partition is either registered (kept) or the append is
  *     queued behind the permit (its staging lives under `_temporary`,
  *     which the retention window protects).
  *  2. '''`_temporary` staging''' — a crashed/aborted job's committer
  *     leftovers under the table root.
  *  3. '''Resolved transaction residue''' in `_graft_txn`: orphaned
  *     `.committed` markers whose `.pending` manifest is already
  *     retired (documented inert in the COW commit protocol) and
  *     `.tmp` manifest drafts. PENDING manifests and quarantine dirs
  *     are deliberately untouched — they are the repair protocol's
  *     input ([[graft.catalog.write.GraftBatchWrite]] rolls them
  *     forward/back at the next write) and an operator's restore
  *     evidence, respectively.
  *
  * Retention: nothing younger than `retentionMs` is deleted — the same
  * guard every table format's VACUUM ships (files of an IN-FLIGHT job
  * racing the vacuum are always younger than any sane retention). The
  * whole pass runs under the per-table write permit, so no writer is
  * mid-commit while vacuum classifies.
  *
  * Readers are never affected: every reclaimed class is invisible to
  * the catalog-driven scan path by construction, so a concurrent reader
  * observes the identical row set before, during and after
  * (WritePathSpec gates this).
  *
  * 100 TB posture: cost is one recursive listing of the table tree plus
  * per-orphan deletes — proportional to the partition count, not the
  * data size; the permit is held for the listing+delete only (no data
  * is read or rewritten). Run it on the same maintenance cadence as
  * compaction. The reference connector has no reclamation operator —
  * this surface is required by this engine's own crash model (the
  * reference's Hive tables share the exposure via
  * HiveFileFormatWriteBuilder's two-phase commit but leave GC to
  * external tooling).
  */
object Vacuum {

  /** What one vacuum pass reclaimed. */
  case class Stats(reclaimedFiles: Long, reclaimedBytes: Long)

  /** Default retention: 7 days — long past any job's staging lifetime. */
  val DefaultRetentionMs: Long = 7L * 24 * 3600 * 1000

  def vacuum(spark: SparkSession, table: String,
      retentionMs: Long = DefaultRetentionMs): Stats = {
    require(retentionMs >= 0, s"vacuum($table): negative retention")
    val parts = table.split("\\.")
    require(parts.length == 3, s"vacuum expects catalog.ns.table, got $table")
    val plugin = spark.sessionState.catalogManager.catalog(parts.head) match {
      case g: GraftCatalog => g
      case other => throw new IllegalArgumentException(
        s"vacuum($table): not a graft catalog: ${other.name()}")
    }
    val store = plugin.metaStore
    val db = parts(1)
    val preMeta = store.loadTable(db, parts(2))
    require(!preMeta.external,
      s"vacuum($table): EXTERNAL tables own their files; refusing to delete")

    val release = GraftBatchWrite.leaseWritePermit(
      spark, preMeta.location,
      s"vacuum of $table since ${java.time.Instant.now()}",
      plugin.writeLockTimeoutSec)
    try {
      // registered truth as of holding the permit — no writer can be
      // mid-commit now
      val meta = store.loadTable(db, parts(2))
      val conf = spark.sessionState.newHadoopConf()
      val root = new Path(meta.location)
      val fs = root.getFileSystem(conf)
      if (!fs.exists(root)) return Stats(0L, 0L)
      val cutoff = System.currentTimeMillis() - retentionMs

      var files = 0L
      var bytes = 0L
      def reclaim(st: FileStatus): Unit = {
        val summary = fs.getContentSummary(st.getPath)
        // directories count their files; a bare file counts itself
        files += math.max(summary.getFileCount, if (st.isFile) 1L else 0L)
        bytes += summary.getLength
        fs.delete(st.getPath, true)
        ()
      }
      def oldEnough(st: FileStatus): Boolean = newestIn(fs, st) <= cutoff

      // 2. committer staging from crashed/aborted jobs
      val tmpDir = new Path(root, "_temporary")
      if (fs.exists(tmpDir) && oldEnough(fs.getFileStatus(tmpDir)))
        reclaim(fs.getFileStatus(tmpDir))

      // 3. resolved txn residue (never .pending manifests, never
      // quarantine dirs — repair's domain)
      val txnDir = new Path(root, GraftBatchWrite.TxnDirName)
      if (fs.exists(txnDir)) {
        val entries = fs.listStatus(txnDir)
        // every intent-manifest class whose marker strips to its name:
        // COW `<id>.pending` / `<id>.committed`, and merge-on-read
        // `<tok>.delta` / `<tok>.delta.committed` (round 19) — a marker
        // whose manifest still exists is REPAIR'S INPUT (it proves the
        // statement committed; reclaiming it would make the next repair
        // roll a committed statement BACK over live data)
        val pendingIds = entries.collect {
          case s if s.getPath.getName.endsWith(".pending") =>
            s.getPath.getName.stripSuffix(".pending")
          case s if s.getPath.getName.endsWith(".delta") =>
            s.getPath.getName
        }.toSet
        entries.foreach { s =>
          val n = s.getPath.getName
          val orphanMarker =
            n.endsWith(".committed") && !pendingIds.contains(n.stripSuffix(".committed"))
          val draft = s.isFile && n.startsWith(".") && n.endsWith(".tmp")
          if ((orphanMarker || draft) && s.getModificationTime <= cutoff)
            reclaim(s)
        }
      }

      // 4. snapshot-lineage retention (q116): retained snapshots older
      // than the window expire (the CURRENT state always stays), then
      // the snapshot GC reclaims the manifests, shards and
      // retired-token areas only they referenced — after this, a
      // VERSION/TIMESTAMP AS OF into the expired range refuses loudly
      val (snapFiles, snapBytes) =
        graft.catalog.Snapshots.expire(spark, store, db, parts(2), cutoff)
      files += snapFiles
      bytes += snapBytes

      // 1. unregistered partition dirs (partitioned tables only:
      // unpartitioned listings ARE the truth, nothing to compare)
      if (meta.isPartitioned) {
        // FS-qualify both sides: descriptor locations are stored
        // unqualified (`/x/y`) while listings return `file:/x/y`
        val registered = meta.partitions.map { p =>
          fs.makeQualified(p.location.map(new Path(_))
            .getOrElse(GraftBatchWrite.partitionDir(meta, p.spec)))
            .toString
        }.toSet
        partitionLeafDirs(fs, root, meta).foreach { st =>
          if (!registered.contains(fs.makeQualified(st.getPath).toString) &&
              oldEnough(st))
            reclaim(st)
        }
      }
      Stats(files, bytes)
    } finally release()
  }

  /** NAMESPACE-level sweep: reclaims the residue table-scoped VACUUM
    * cannot see because it lives OUTSIDE every table location —
    * [[Migrate]]'s crash/retirement artifacts:
    *
    *  1. '''Crashed migration staging''' — `<x>__migrate_<uuid>` dirs
    *     that are not the location of any live table (a COMMITTED
    *     migration's staging IS the table's location and is skipped by
    *     the liveness check, never by name).
    *  2. '''Retired generations''' — a dir named exactly like a live
    *     MANAGED table whose descriptor points elsewhere: the
    *     pre-migration data Migrate leaves for in-flight readers.
    *
    * Anything else (unknown dirs, `_meta`, `_namespace.json`) is left
    * untouched — the sweep deletes only what the engine's own crash
    * model produces. Liveness compares FS-QUALIFIED paths against every
    * table location AND every registered partition location, so a
    * custom-located partition inside a candidate dir protects it, and
    * is RE-VERIFIED from fresh descriptor loads immediately before each
    * delete — a migration that commits mid-sweep (flipping its staging
    * dir into the live table location) is seen by the recheck, so the
    * sweep can never reclaim just-committed data even with a zero
    * retention window. The same retention cutoff as table vacuum
    * protects an IN-FLIGHT migration's staging (fresh by definition)
    * and readers inside the window.
    *
    * 100 TB posture: one namespace-dir listing + per-candidate
    * recursive stats — cost ∝ table count, never data size. Run beside
    * the table-vacuum cadence. */
  def vacuumNamespace(spark: SparkSession, namespace: String,
      retentionMs: Long = DefaultRetentionMs): Stats = {
    require(retentionMs >= 0, s"vacuumNamespace($namespace): negative retention")
    val parts = namespace.split("\\.")
    require(parts.length == 2, s"vacuumNamespace expects catalog.ns, got $namespace")
    val plugin = spark.sessionState.catalogManager.catalog(parts.head) match {
      case g: GraftCatalog => g
      case other => throw new IllegalArgumentException(
        s"vacuumNamespace($namespace): not a graft catalog: ${other.name()}")
    }
    val store = plugin.metaStore
    val db = parts(1)
    require(store.namespaceExists(db), s"no such namespace: $namespace")
    val conf = spark.sessionState.newHadoopConf()
    val nsDir = store.namespaceDir(db)
    val fs = nsDir.getFileSystem(conf)
    if (!fs.exists(nsDir)) return Stats(0L, 0L)
    val cutoff = System.currentTimeMillis() - retentionMs

    // live truth: every table's (qualified) location + custom partition
    // locations + each non-external table's name→location binding.
    // Recomputed from fresh descriptor loads on demand, because the
    // sweep holds NO lease: a migration that COMMITS mid-sweep flips its
    // staging dir from "unreferenced candidate" to "the live table
    // location", and a snapshot taken before that commit would classify
    // just-committed live data as reclaimable.
    def qualify(p: Path): String = p.getFileSystem(conf).makeQualified(p).toString
    def liveness(): (Set[String], Map[String, String]) = {
      val tables = store.listTables(db).map(t => store.loadTable(db, t))
      // IN-WINDOW retired generations are protected by their RETIREMENT
      // time, not their file mtimes: the normal migrate/zorder retires a
      // directory whose data files are months old (long-ingested data),
      // so an mtime-only retention test would reclaim a restore point
      // seconds after the flip and the documented "rollback/time-travel
      // safe within the retention window" guarantee would be zero for
      // cold tables. A generation retired BEFORE the window is
      // legitimately reclaimable (time travel then refuses loudly).
      val inWindowHistory = tables.flatMap(_.history)
        .filter(_.retiredAtMs > cutoff)
        .map(g => qualify(new Path(g.location)))
      val locations =
        (tables.map(t => qualify(new Path(t.location))) ++
          tables.flatMap(_.partitions.flatMap(_.location)).map(l => qualify(new Path(l))) ++
          inWindowHistory)
          .toSet
      val managed = tables.filterNot(_.external)
        .map(t => t.name -> qualify(new Path(t.location))).toMap
      (locations, managed)
    }
    val MigrateStaging = ".*__migrate_[0-9a-f-]{36}$".r
    def isCandidate(st: FileStatus,
        live: (Set[String], Map[String, String])): Boolean = {
      val (liveLocations, managedNames) = live
      val name = st.getPath.getName
      val qualified = fs.makeQualified(st.getPath).toString
      st.isDirectory && name != "_meta" &&
        // liveness in EITHER direction: a live location at/under the
        // candidate (it holds live data) or an ANCESTOR of it (the
        // candidate sits inside a table's declared tree — e.g. an
        // EXTERNAL table registered on the namespace dir itself)
        !liveLocations.exists(l =>
          l == qualified || l.startsWith(qualified + "/") ||
            qualified.startsWith(l + "/")) && (
          MigrateStaging.matches(name) ||
          managedNames.get(name).exists(_ != qualified))
    }

    var files = 0L
    var bytes = 0L
    val initial = liveness()
    fs.listStatus(nsDir).foreach { st =>
      if (isCandidate(st, initial)) {
        // ONE recursive walk gathers the retention signal AND the
        // reclaim stats — on object stores the listing IS the cost, and
        // a newestIn + getContentSummary pair would traverse every
        // candidate tree twice
        val (newest, fc, bc) = walkStats(fs, st)
        // RE-VERIFY against fresh descriptors immediately before the
        // delete: the walk above takes time, and a migrate/create that
        // committed since the initial snapshot may have made this dir a
        // live location. Cost ∝ tables, paid once per actual candidate
        // (rare), closing the commit-mid-sweep race without a
        // namespace-wide lease.
        if (newest <= cutoff && isCandidate(st, liveness())) {
          files += fc
          bytes += bc
          fs.delete(st.getPath, true)
        }
      }
    }
    Stats(files, bytes)
  }

  /** Newest modification time anywhere under `st` — a dir whose listing
    * is old but that received a fresh file must count as fresh. */
  private def newestIn(fs: org.apache.hadoop.fs.FileSystem, st: FileStatus): Long =
    if (st.isFile) st.getModificationTime
    else (st.getModificationTime +:
      fs.listStatus(st.getPath).toSeq.map(newestIn(fs, _))).max

  /** One recursive walk: (newest mtime anywhere, file count, byte sum). */
  private def walkStats(
      fs: org.apache.hadoop.fs.FileSystem, st: FileStatus): (Long, Long, Long) =
    if (st.isFile) (st.getModificationTime, 1L, st.getLen)
    else fs.listStatus(st.getPath).foldLeft(
      (st.getModificationTime, 0L, 0L)) { case ((m, f, b), child) =>
        val (cm, cf, cb) = walkStats(fs, child)
        (math.max(m, cm), f + cf, b + cb)
      }

  /** Hive-layout leaf partition dirs under the table root: descend
    * exactly `partitionColumns.size` levels of `col=value` dirs,
    * skipping hidden/metadata names at every level. */
  private def partitionLeafDirs(
      fs: org.apache.hadoop.fs.FileSystem, root: Path,
      meta: TableMeta): Seq[FileStatus] = {
    def level(dirs: Seq[FileStatus], depth: Int): Seq[FileStatus] =
      if (depth == meta.partitionColumns.size) dirs
      else level(dirs.flatMap { d =>
        fs.listStatus(d.getPath).toSeq.filter { s =>
          val n = s.getPath.getName
          s.isDirectory && !n.startsWith("_") && !n.startsWith(".") && n.contains("=")
        }
      }, depth + 1)
    level(Seq(fs.getFileStatus(root)), 0)
  }
}
