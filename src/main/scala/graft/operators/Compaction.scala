package graft.operators

import org.apache.spark.sql.SparkSession

/** In-place small-file compaction for partitioned catalog tables.
  *
  * `compact` rewrites every live partition of `table` with itself via a
  * dynamic-partition overwrite. The engine's write pipeline does the
  * rest: `RequiresDistributionAndOrdering` clusters rows by partition
  * value, so each partition is re-written by one task as few large
  * files, and the commit protocol's staging mode swaps partition dirs
  * atomically at job commit.
  *
  * Why reading and overwriting the SAME table is safe here (and only
  * here): dynamic overwrite has no pre-write delete — writer tasks
  * stage under `_temporary` while reader tasks scan the live partition
  * dirs, and the swap happens at job commit, strictly after every read
  * task finished. A truncate/static overwrite would NOT be safe
  * (its deferred pre-delete runs at job start, deleting the files the
  * readers are about to scan), which is why unpartitioned tables are
  * rejected rather than silently routed through truncate.
  *
  * Concurrency: the whole plan+execute runs under a write-permit LEASE
  * ([[graft.catalog.write.GraftBatchWrite.leaseWritePermit]]). The
  * inner write job's own permit acquisition happens only at job start —
  * AFTER the self-scan's file listing at plan time — so without the
  * lease a concurrent append could commit between listing and
  * overwrite and be silently erased by the rewrite. Holding the permit
  * from before the listing until after the commit closes that window:
  * concurrent writers either commit first (their files are listed and
  * rewritten) or queue behind the compaction.
  *
  * 100 TB posture: compaction is a per-partition rewrite — cost scales
  * with the data actually rewritten, the shuffle key is the partition
  * value, and running it per freshly-ingested partition (not the whole
  * table) is the intended maintenance cadence.
  */
object Compaction {

  def compact(spark: SparkSession, table: String): Unit = {
    val parts = table.split("\\.")
    require(parts.length >= 3, s"compact expects catalog.ns.table, got $table")
    val cat = spark.sessionState.catalogManager.catalog(parts.head)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      parts.slice(1, parts.length - 1), parts.last)
    val tbl = cat.loadTable(ident)
    // partitioning() includes the BUCKET transform — dispatch on the
    // identity partition columns (an unpartitioned bucketed table has no
    // partition dirs for dynamic overwrite to swap)
    val identityPartitioned = tbl match {
      case g: graft.catalog.GraftTable => g.meta.isPartitioned
      case _ => tbl.partitioning().nonEmpty
    }
    if (!identityPartitioned) {
      // UNPARTITIONED tables compact via a STAGED REWRITE (round 19):
      // dynamic overwrite — the only safe IN-PLACE self-rewrite — needs
      // partition dirs to swap, so the unpartitioned path writes a
      // fresh generation and flips, exactly the zorder/migrate crash
      // model (staging residue is vacuumable; the old generation stays
      // for in-flight readers). This is also the unpartitioned FOLD for
      // merge-on-read deletion vectors: the staging read applies them,
      // the flip clears them — without it a one-DELETE unpartitioned
      // MOR table could never UPDATE again.
      cat match {
        case g: graft.catalog.GraftCatalog =>
          compactUnpartitioned(spark, g, parts(1), parts.last, table, ident)
          return
        case _ => throw new UnsupportedOperationException(
          s"compact($table): unpartitioned compaction requires a graft catalog")
      }
    }
    val location = tbl.properties.get(
      org.apache.spark.sql.connector.catalog.TableCatalog.PROP_LOCATION)
    require(location != null, s"compact($table): table reports no location")
    val timeoutSec = cat match {
      case g: graft.catalog.GraftCatalog => g.writeLockTimeoutSec
      case _ => graft.catalog.GraftConf.WriteLockTimeoutSec.default.get
    }
    val release = graft.catalog.write.GraftBatchWrite.leaseWritePermit(
      spark, location, s"compaction of $table since ${java.time.Instant.now()}",
      timeoutSec)
    try {
      spark.table(table).writeTo(table).overwritePartitions()
      // compaction reads the WHOLE table and dynamically overwrites every
      // live partition, so after the commit every file is freshly written
      // by the engine's sorted write path — if cluster columns are
      // declared, the catalog's sort-trust marker can be restored (the
      // cure for an ALTER-changed declaration: one compact and sort-free
      // merge joins are back). Still inside the lease, so no concurrent
      // write can interleave between the rewrite and the marker.
      cat match {
        case g: graft.catalog.GraftCatalog
            if graft.catalog.GraftCatalog.clusterColumns(
              tbl.asInstanceOf[graft.catalog.GraftTable].meta.properties).nonEmpty =>
          g.metaStore.updateTable(parts(1), parts.last)(m => m.copy(
            properties = m.properties +
              (graft.catalog.GraftCatalog.ClusterSortedProp -> "true")))
          g.invalidateTable(ident)
        case _ =>
      }
      // FOLD DELETION VECTORS (q119): compaction read the table through
      // the anti-join rewrite, so every rewritten file already excludes
      // the deleted keys — any batch whose appliesTo files are all gone
      // from the live tree is materialized and its descriptor entry
      // drops (the dv dir itself is reclaimed by snapshot GC once no
      // retained snapshot references it). Batches still touching live
      // files (a partition the overwrite left alone) stay. Still inside
      // the lease, so no commit can interleave.
      cat match {
        case g: graft.catalog.GraftCatalog =>
          foldInertDvs(spark, g, parts(1), parts.last)
          g.invalidateTable(ident)
        case _ =>
      }
    } finally release()
  }

  /** The unpartitioned staged-rewrite branch of [[compact]]: read the
    * table through the catalog (deletion vectors applied), write a
    * fresh generation sized to `spark.sql.files.maxPartitionBytes` per
    * file — honoring `graft.cluster.by` with a range distribution +
    * within-file sort, which also restores the sort-trust marker — and
    * flip atomically (history prepend, lineage snapshot, dv list
    * cleared). Refuses bucketed declarations: a V1 staged write cannot
    * reproduce the hash-routed bucket file names, and silently
    * unbucketing would corrupt every SPJ assumption. */
  private def compactUnpartitioned(
      spark: SparkSession,
      plugin: graft.catalog.GraftCatalog,
      db: String,
      name: String,
      table: String,
      ident: org.apache.spark.sql.connector.catalog.Identifier): Unit = {
    import org.apache.spark.sql.functions.col
    val store = plugin.metaStore
    val pre = store.loadTable(db, name)
    require(!pre.external,
      s"compact($table): EXTERNAL tables own their files; refusing to rewrite")
    if (graft.catalog.GraftCatalog.writableBucketSpec(pre).isDefined) {
      // BUCKET-PRESERVING compaction (round 20, the bucketed-MOR fold):
      // the V1 staged rewrite below cannot reproduce hash-routed bucket
      // file names, but the engine's own V2 writer is exactly the
      // machinery every bucketed append uses (shuffle partition id ==
      // bucket id == committer file name) — so the rewrite is a
      // self-TRUNCATE-overwrite: read through the catalog (deletion
      // vectors applied by the anti-join rewrite), replace every file
      // hash-routed, then drop the now-inert DV batches. One file per
      // bucket, sort-trust marker restored by the truncate commit
      // itself, every SPJ assumption preserved.
      val release = graft.catalog.write.GraftBatchWrite.leaseWritePermit(
        spark, pre.location,
        s"bucketed compaction of $table since ${java.time.Instant.now()}",
        plugin.writeLockTimeoutSec)
      try {
        // truncate's pre-write retire fires at writer-factory time, and
        // the scan tasks have already executed by then ONLY when AQE
        // eagerly materializes the bucket-routing shuffle inside
        // query.execute() — with spark.sql.adaptive.enabled=false the
        // factory would retire the very files the scan tasks are about
        // to open. Under AQE the write runs as-is (no extra copy); with
        // AQE off the self-read is MATERIALIZED first by an eager local
        // checkpoint (one memory/disk copy of a table that is being
        // fully rewritten anyway; an executor lost mid-write fails the
        // job and the commit protocol's abort/repair handles it like any
        // crashed compaction).
        val aqeOn = spark.sessionState.conf.getConf(
          org.apache.spark.sql.internal.SQLConf.ADAPTIVE_EXECUTION_ENABLED)
        val snapshot =
          if (aqeOn) spark.table(table)
          else spark.table(table).localCheckpoint(eager = true)
        try {
          snapshot.writeTo(table)
            .overwrite(org.apache.spark.sql.functions.lit(true))
          foldInertDvs(spark, plugin, db, name)
          plugin.invalidateTable(ident)
        } finally if (!aqeOn) { snapshot.unpersist(); () }
      } finally release()
      return
    }
    // (multi-column bucket declarations are metadata-only — no physical
    // routing to preserve — so they take the staged rewrite like any
    // unbucketed table)
    val release = graft.catalog.write.GraftBatchWrite.leaseWritePermit(
      spark, pre.location,
      s"unpartitioned compaction of $table since ${java.time.Instant.now()}",
      plugin.writeLockTimeoutSec)
    try {
      val meta = store.loadTable(db, name)
      val conf = spark.sessionState.newHadoopConf()
      val oldRoot = new org.apache.hadoop.fs.Path(meta.location)
      val fs = oldRoot.getFileSystem(conf)
      val staging = new org.apache.hadoop.fs.Path(oldRoot.getParent,
        s"${oldRoot.getName}__migrate_${java.util.UUID.randomUUID()}")
      val bytes = meta.stats.map(_.sizeInBytes).filter(_ > 0).getOrElse(
        if (fs.exists(oldRoot)) fs.getContentSummary(oldRoot).getLength else 0L)
      val perFile = spark.sessionState.conf.filesMaxPartitionBytes
      val nFiles = math.max(1, math.ceil(bytes.toDouble / perFile).toInt)
      val cluster = graft.catalog.GraftCatalog.clusterColumns(meta.properties)
      val df = spark.table(table)
      val shaped =
        if (cluster.nonEmpty)
          df.repartitionByRange(nFiles, cluster.map(col): _*)
            .sortWithinPartitions(cluster.map(col): _*)
        else df.repartition(nFiles)
      shaped.write.format(meta.provider)
        .options(graft.catalog.GraftCatalog.optionProps(meta.properties))
        .mode("overwrite")
        .save(staging.toString)
      graft.catalog.SkipStats.maintainDir(spark, staging.toString,
        meta.schema, meta.properties, meta.provider)
      store.updateTable(db, name) { cur =>
        cur.copy(location = staging.toString,
          partitions = Nil,
          stats = cur.stats.map(_.copy(
            sizeInBytes = fs.getContentSummary(staging).getLength)),
          history = (cur.asGeneration(System.currentTimeMillis()) +:
            cur.history).take(graft.catalog.TableMeta.MaxHistory),
          // every file is freshly engine-sorted when cluster columns are
          // declared — the sort-trust marker restores with the rewrite
          properties =
            if (cluster.nonEmpty) cur.properties +
              (graft.catalog.GraftCatalog.ClusterSortedProp -> "true")
            else cur.properties,
          // the staging read applied the deletion vectors — folded
          deleteVectors = Nil)
      }
      graft.catalog.Snapshots.recordRewrite(spark, store, db, name)
      plugin.invalidateTable(ident)
    } finally release()
  }

  /** Drop descriptor entries of deletion-vector batches none of whose
    * `appliesTo` files are still live. Shared by compaction (which makes
    * batches inert by rewriting their files) and callable as its own
    * maintenance step. Torn manifests are conservatively KEPT. */
  private[graft] def foldInertDvs(
      spark: SparkSession, g: graft.catalog.GraftCatalog,
      db: String, name: String): Unit = {
    val store = g.metaStore
    val m = store.loadTable(db, name)
    if (m.deleteVectors.isEmpty) return
    val conf = spark.sessionState.newHadoopConf()
    def qualify(p: org.apache.hadoop.fs.Path): String =
      p.getFileSystem(conf).makeQualified(p).toString
    val dirs: Seq[String] =
      if (m.isPartitioned) m.partitions.map(p => p.location.getOrElse(
        graft.catalog.write.GraftBatchWrite.partitionDir(m, p.spec).toString))
      else Seq(m.location)
    val live: Set[String] = dirs.flatMap { d =>
      val dir = new org.apache.hadoop.fs.Path(d)
      val fs = dir.getFileSystem(conf)
      if (!fs.exists(dir)) Nil
      else fs.listStatus(dir).toSeq.collect {
        case s if s.isFile && !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith(".") => qualify(s.getPath)
      }
    }.toSet
    val inert = m.deleteVectors.filter { dv =>
      graft.catalog.write.DvManifest.read(conf, dv.manifest).exists {
        case (_, applies, _) =>
          applies.forall(a => !live.contains(
            qualify(new org.apache.hadoop.fs.Path(a))))
      }
    }
    if (inert.nonEmpty) {
      val inertTokens = inert.map(_.token).toSet
      store.updateTable(db, name)(c => c.copy(
        deleteVectors = c.deleteVectors.filterNot(d =>
          inertTokens.contains(d.token))))
      ()
    }
  }
}
