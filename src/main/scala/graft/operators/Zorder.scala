package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

import graft.catalog.{GraftCatalog, PartitionMeta, SkipStats, TableMeta}
import graft.catalog.write.GraftBatchWrite

/** Z-ORDER clustering — multi-dimensional file locality for q109's
  * file-level data skipping. A single-column sort (`cluster.by`, or
  * q109's range distribution) gives tight per-file ranges on ONE
  * column; a table queried by several independent predicates (order id
  * sometimes, part id other times) needs per-file locality on ALL of
  * them at once. The classic answer is the Z-curve: quantize each
  * clustering column into 2^bits equal-width bins over its observed
  * [min, max] (one aggregate pass), interleave the bin bits into one
  * long, and range-distribute + sort the rewrite by that value — every
  * written file then covers a contiguous Z-interval, whose projection
  * onto EACH dimension is a bounded box, so the skip-stats manifest
  * records tight min/max for every clustering column and a predicate
  * on any one of them prunes files (the Delta `OPTIMIZE ZORDER BY`
  * capability, re-expressed over the engine's manifest + staged
  * rewrite).
  *
  * Execution shape (all-declarative, no driver-side data): one min/max
  * aggregate, then `repartitionByRange(targetFiles, z)` (sampling-based
  * range boundaries — the scalable alternative to a global sort) with
  * `sortWithinPartitions(z)` for row-group locality inside each file.
  * Equal-width quantization keeps the bin mapping a pure codegen'd
  * expression (no lookup table to broadcast); heavily skewed columns
  * degrade gracefully — bins collapse but ranges stay CORRECT, and the
  * manifest never over-promises (a wide file range just skips less).
  *
  * Safety: the rewrite is ATOMIC via the migrate staging protocol —
  * written to a sibling `__migrate_<uuid>` dir while readers resolve
  * the current location, then one descriptor flip under the write
  * permit; a crash leaves staging residue the namespace vacuum already
  * classifies and reclaims, and the old generation stays for in-flight
  * readers until the retention sweep (see [[Migrate]]). The skip-stats
  * manifest for the new generation is written before the flip, so the
  * first post-flip query already skips.
  *
  * Scope: unpartitioned, unbucketed tables — the heap-shaped fact
  * table this layout tier exists for. Partitioned tables compose
  * pruning from directories (q103), bucketed tables from the hash
  * layout (q100); both refuse here with the matching operator named.
  */
object Zorder {

  /** Interleave width: 16 bits per column up to 3 columns, shrinking so
    * the Z value always fits a non-negative long. */
  private def bitsPerCol(n: Int): Int = math.min(16, 62 / n)

  /** The Z-value column for `cols`, given each column's observed
    * (min, max): equal-width bin via `width_bucket` (clamped to
    * [0, 2^bits)), bits interleaved most-significant-first across
    * columns so no dimension dominates the curve. */
  private[operators] def zvalue(
      cols: Seq[(String, Double, Double)]): Column = {
    val n = cols.size
    val bits = bitsPerCol(n)
    val nb = 1L << bits
    val bins = cols.map { case (c, mn, mx) =>
      if (mx <= mn) lit(0L) // constant column: one bin, contributes nothing
      else {
        val wb = width_bucket(col(c).cast("double"), lit(mn), lit(mx), lit(nb))
        // width_bucket: 1..nb inside, 0 / nb+1 outside; nulls → null.
        // Shift to 0-based and clamp — out-of-range and null rows land
        // in the edge bins (correctness never depends on the bin).
        least(greatest(coalesce(wb, lit(1L)) - 1L, lit(0L)), lit(nb - 1L))
      }
    }
    (0 until bits).flatMap { i =>
      bins.zipWithIndex.map { case (b, c) =>
        // bit i of column c → position i*n + (n-1-c)
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + (n - 1 - c))
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Rewrite `table` Z-ordered by `cols` into `targetFiles` files. */
  def zorder(
      spark: SparkSession,
      table: String,
      cols: Seq[String],
      targetFiles: Int = 32): Unit = {
    require(cols.size >= 2,
      s"zorder($table): interleaving needs >= 2 columns " +
        "(single-column locality is graft.cluster.by / a range-distributed write)")
    require(targetFiles > 0, s"zorder($table): targetFiles must be positive")
    val parts = table.split("\\.")
    require(parts.length == 3, s"zorder expects catalog.ns.table, got $table")
    val plugin = spark.sessionState.catalogManager.catalog(parts.head) match {
      case g: GraftCatalog => g
      case other => throw new IllegalArgumentException(
        s"zorder($table): not a graft catalog: ${other.name()}")
    }
    val store = plugin.metaStore
    val (db, name) = (parts(1), parts(2))
    val pre = store.loadTable(db, name)
    require(!pre.external,
      s"zorder($table): EXTERNAL tables own their files; refusing to rewrite")
    require(pre.partitionColumns.isEmpty,
      s"zorder($table): partitioned tables prune from their directories; " +
        "compact() is their in-place rewrite")
    require(GraftCatalog.writableBucketSpec(pre).isEmpty,
      s"zorder($table): bucketed tables prune from the hash layout; " +
        "a Z rewrite would scatter rows across bucket files")
    val resolved = cols.map { c =>
      val f = pre.schema.fields.find(f =>
        spark.sessionState.conf.resolver(f.name, c)).getOrElse(
        throw new IllegalArgumentException(
          s"zorder($table): no such column $c"))
      require(f.dataType.isInstanceOf[NumericType],
        s"zorder($table): ${f.name} is ${f.dataType.simpleString}; the " +
          "equal-width quantizer takes numeric columns")
      f.name
    }

    val release = GraftBatchWrite.leaseWritePermit(
      spark, pre.location,
      s"zorder rewrite of $table by ${resolved.mkString(",")} since " +
        s"${java.time.Instant.now()}",
      plugin.writeLockTimeoutSec)
    try {
      val meta = store.loadTable(db, name)
      val conf = spark.sessionState.newHadoopConf()
      val oldRoot = new org.apache.hadoop.fs.Path(meta.location)
      val fs = oldRoot.getFileSystem(conf)
      // the migrate staging name: a crash before the flip leaves a dir
      // Vacuum.vacuumNamespace already classifies as reclaimable residue
      val staging = new org.apache.hadoop.fs.Path(oldRoot.getParent,
        s"${oldRoot.getName}__migrate_${java.util.UUID.randomUUID()}")

      val df = spark.table(table)
      val ranges = {
        val aggs = resolved.flatMap(c =>
          Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        resolved.zipWithIndex.map { case (c, i) =>
          (c,
            if (row.isNullAt(2 * i)) 0d else row.getDouble(2 * i),
            if (row.isNullAt(2 * i + 1)) 0d else row.getDouble(2 * i + 1))
        }
      }
      val zc = "__graft_z"
      df.withColumn(zc, zvalue(ranges))
        .repartitionByRange(targetFiles, col(zc))
        .sortWithinPartitions(zc)
        .drop(zc)
        .write.format(meta.provider)
        .options(GraftCatalog.optionProps(meta.properties))
        .mode("overwrite")
        .save(staging.toString)

      // manifest BEFORE the flip: the first post-flip query skips
      SkipStats.maintainDir(spark, staging.toString, meta.schema,
        meta.properties, meta.provider)

      store.updateTable(db, name) { cur =>
        cur.copy(location = staging.toString,
          partitions = Nil: Seq[PartitionMeta],
          stats = cur.stats.map(_.copy(
            sizeInBytes = fs.getContentSummary(staging).getLength)),
          history = (cur.asGeneration(System.currentTimeMillis()) +:
            cur.history).take(TableMeta.MaxHistory),
          // the staging read went through the deletion-vector rewrite,
          // so the new generation has the deletes MATERIALIZED (q119)
          deleteVectors = Nil)
      }
      // the flip joins the snapshot lineage too (q116)
      graft.catalog.Snapshots.recordRewrite(spark, store, db, name)
      plugin.invalidateTable(
        org.apache.spark.sql.connector.catalog.Identifier.of(Array(db), name))
      // old generation stays for in-flight readers; the namespace sweep
      // reclaims it after the retention window (the migrate trade)
    } finally release()
  }
}
