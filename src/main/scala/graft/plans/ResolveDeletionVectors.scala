package graft.plans

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.EqualNullSafe
import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, JoinHint, LocalRelation, LogicalPlan, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.StructType

import org.apache.spark.sql.connector.write.RowLevelOperation.Command

import graft.catalog.{GraftTable, Snapshots}
import graft.catalog.write.{DvManifest, GraftBatchWrite, GraftMorOperation}

/** DELETION-VECTOR APPLICATION (q119) — the read half of merge-on-read
  * DML, done the Spark-first way: not a per-row reader filter, but a
  * LOGICAL-PLAN rewrite, so Catalyst keeps every optimization it already
  * knows.
  *
  * A relation over a table with live DV batches splits into pinned
  * fragments by "which batches apply to this file":
  *
  * {{{
  *   t  ⇒  Union(
  *     scan(files no batch applies to),                       — untouched
  *     scan(files of batch group G) LEFT ANTI JOIN keys(G)    — per group
  *       ON t.key <=> dv.key  [broadcast]
  *   )
  * }}}
  *
  * Why this shape survives 100 TB:
  *  - the clean fragment (the overwhelming majority of files between
  *    compactions) scans EXACTLY as before — vectorized, pushed-down,
  *    pruned; zero per-row overhead;
  *  - the anti-join's build side is the batch's deleted keys — small by
  *    the MOR contract (compaction folds batches) — and broadcast, so
  *    no shuffle of the data side, and AQE/codegen treat it like any
  *    other join;
  *  - per-FILE scoping (`appliesTo` = the DML scan's read set) gives
  *    correct sequencing for free: a key deleted in batch v and
  *    re-inserted later lives in a file no batch applies to, so it
  *    survives — the property Iceberg needs sequence numbers for;
  *  - travel reads work unchanged: a pinned (VERSION AS OF) relation
  *    carries ITS snapshot's dv list and splits the pinned file set the
  *    same way.
  *
  * Installed via `graft.GraftExtensions` (operator-optimization batch —
  * BEFORE pushdown, so every fragment gets its own pushdown/pruning
  * pass). Idempotent: the fragments are pinned tables whose dv list is
  * empty. Sessions without the rule are refused loudly by
  * `GraftTable.newScanBuilder` — never served raw files.
  */
object ResolveDeletionVectors extends Rule[LogicalPlan] {

  /** Diagnostic counter: PHYSICAL directory listings taken by the DV
    * planner (cache misses). Tests pin one listing per (dir, cache
    * epoch) across repeated reads of a DV'd table. */
  private[graft] val physicalListings =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Directory listings keyed by (qualified dir, DESCRIPTOR SEQ, the
    * live DV batch TOKENS): every commit bumps the table's seq, so an
    * entry is valid exactly for the descriptor state that planned it —
    * no invalidation hooks to miss (the session `FileStatusCache`
    * namespaces entries per client and its per-client invalidation
    * cannot be relied on across planners). The UUID tokens disambiguate
    * TABLE INCARNATIONS: a DROP + re-CREATE under the same name replays
    * the same (dir, seq) pairs, but can never mint the same batch
    * token. Bounded LRU; repeated reads of a DV'd table between commits
    * pay one physical listing per directory. */
  private val listingCache: java.util.Map[(String, Long, String), Seq[org.apache.hadoop.fs.FileStatus]] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(String, Long, String), Seq[org.apache.hadoop.fs.FileStatus]](
        64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(String, Long, String), Seq[org.apache.hadoop.fs.FileStatus]]): Boolean =
          size() > 4096
      })

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformDownWithSubqueries {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] &&
          r.table.asInstanceOf[GraftTable].meta.deleteVectors.nonEmpty =>
        rewrite(r, r.table.asInstanceOf[GraftTable])
      // MOR UPDATE / MERGE over LIVE deletion vectors (round 20): the
      // delta operation's read gets the SAME anti-join split as any other
      // read of the table, so hidden rows are never re-emitted (which
      // would resurrect deleted keys) and the hourly-MERGE workload no
      // longer needs a compaction between statements. The operation's
      // scan builder is bypassed by this rewrite, so its read snapshot
      // (the conflict check's expected set + the new batch's `appliesTo`)
      // is recorded here from the same universe the fragments scan.
      // DELETE keeps its raw-file delta scan: re-deleting an
      // already-hidden key is a no-op under the anti-join, and skipping
      // the split keeps the static partition pruning it already has.
      case r: DataSourceV2Relation
          if org.apache.spark.sql.graft.GraftSqlBridge
            .rowLevelOperationTable(r.table).isDefined =>
        org.apache.spark.sql.graft.GraftSqlBridge
          .rowLevelOperationTable(r.table) match {
          case Some((t: GraftTable, op: GraftMorOperation))
              if op.command() != Command.DELETE &&
                t.meta.deleteVectors.nonEmpty =>
            rewrite(r, t, Some(op))
          case _ => r
        }
    }

  private def rewrite(
      r: DataSourceV2Relation, t: GraftTable,
      forOp: Option[GraftMorOperation] = None): LogicalPlan = {
    val spark = SparkSession.active
    val conf = spark.sessionState.newHadoopConf()
    val meta = t.meta
    def qualify(p: Path): String =
      p.getFileSystem(conf).makeQualified(p).toString

    // each live batch's manifest: key column, the qualified data files
    // it applies to, and the dir holding its deleted-key parquet files.
    // A missing/torn manifest refuses the read — serving the rows would
    // resurrect the deleted keys.
    val batches: Seq[(String, Set[String], String, Long)] =
      meta.deleteVectors.map { dv =>
        val (keyCol, applies, keys) = DvManifest.read(conf, dv.manifest).getOrElse(
          throw new IllegalStateException(
            s"deletion-vector manifest ${dv.manifest} of ${t.name()} is " +
              "missing or torn — refusing to read (deleted rows would " +
              "resurface); restore it or roll the table back"))
        (keyCol, applies.map(s => qualify(new Path(s))).toSet,
          new Path(dv.manifest).getParent.toString, keys)
      }

    // the file universe: the pinned snapshot's recorded set (travel
    // reads — identity is the ORIGINAL dir + name even when the file now
    // lives in a retirement area), or the live listing per registered
    // directory. Metadata-only planning work, ∝ files in involved dirs.
    def hidden(n: String) = n.startsWith("_") || n.startsWith(".")
    val universe: Seq[(String, String, Map[String, String], org.apache.hadoop.fs.FileStatus)] =
      t.pinnedResolved match {
        case Some(res) => res.dirs.flatMap { rd =>
          val qd = qualify(new Path(rd.dir))
          rd.files.map(f => (s"$qd/${f.getPath.getName}", rd.dir, rd.spec, f))
        }
        case None =>
          val dirSpecs: Seq[(String, Map[String, String])] =
            if (meta.isPartitioned)
              meta.partitions.map(p => (
                p.location.getOrElse(
                  GraftBatchWrite.partitionDir(meta, p.spec).toString),
                p.spec))
            else Seq((meta.location, Map.empty[String, String]))
          // dir listings ride the seq-keyed planner cache (round 20):
          // repeated reads of a DV'd table between commits pay ONE
          // physical listing per directory, not one per planning pass —
          // a commit bumps the descriptor seq, so its readers key to
          // fresh entries by construction.
          val incarnation = meta.deleteVectors.map(_.token).mkString(",")
          dirSpecs.flatMap { case (d, spec) =>
            val dir = new Path(d)
            val fs = dir.getFileSystem(conf)
            val q = fs.makeQualified(dir)
            val key = (q.toString, meta.seq, incarnation)
            var listed = listingCache.get(key)
            if (listed == null) {
              physicalListings.incrementAndGet()
              listed =
                if (fs.exists(q)) fs.listStatus(q).toSeq
                  .filter(s => s.isFile && !hidden(s.getPath.getName))
                else Nil
              listingCache.put(key, listed)
            }
            listed.map(f => (qualify(f.getPath), d, spec, f))
          }
      }

    // a delta operation's read snapshot: the write's commit re-lists and
    // refuses on mismatch (conflict detection), and the committed DV
    // batch applies to exactly these files — recorded here because the
    // fragments' scans replace the operation's own scan builder
    forOp.foreach { op =>
      op.scannedFiles = Some(universe.map(_._1).toSet)
      op.scannedSpecs =
        if (meta.isPartitioned) Some(meta.partitions.map(_.spec)) else None
    }

    // group files by the SET of batches that apply; clean group first so
    // the Union's output (= head child's) keeps the original exprIds
    val grouped: Seq[(Seq[Int], Seq[Snapshots.ResolvedDir])] = universe
      .groupBy { case (id, _, _, _) =>
        batches.indices.filter(i => batches(i)._2.contains(id))
      }
      .toSeq.sortBy(_._1.mkString(","))
      .map { case (idxs, files) =>
        val dirs = files.groupBy(f => (f._2, f._3)).map {
          case ((dir, spec), fs) => Snapshots.ResolvedDir(dir, spec, fs.map(_._4))
        }.toSeq.sortBy(_.dir)
        (idxs, dirs)
      }

    if (grouped.isEmpty) return LocalRelation(r.output)

    val children: Seq[LogicalPlan] = grouped.zipWithIndex.map {
      case ((batchIdxs, dirs), i) =>
        val sub = t.pinnedSubset(dirs)
        // head child reuses the ORIGINAL attribute ids so the rewritten
        // subtree is a drop-in for the relation it replaces
        val base =
          if (i == 0) DataSourceV2Relation(sub, r.output, None, None, r.options)
          else DataSourceV2Relation.create(sub, None, None)
        if (batchIdxs.isEmpty) base
        else {
          // the batch's key declaration: one or more comma-separated
          // columns (a composite key anti-joins on the TUPLE, null-safe
          // per column — all key columns are NOT NULL by the DDL gate,
          // so <=> degrades to = for the planner)
          val keyCols = batches(batchIdxs.head)._1.split(",")
            .map(_.trim).filter(_.nonEmpty).toSeq
          val keyAttrs = keyCols.map(kc =>
            base.output.find(_.name.equalsIgnoreCase(kc))
              .getOrElse(throw new IllegalStateException(
                s"deletion-vector key '$kc' not in output of ${t.name()}")))
          val keyFields = keyCols.map(kc => meta.schema.fields
            .find(_.name.equalsIgnoreCase(kc)).get)
          // the batch group's deleted keys: tiny parquet sidecars, read
          // with an explicit schema (no inference round-trip) and —
          // while the group stays under the dvBroadcastKeys ceiling —
          // BROADCAST, so the data side never shuffles. An OVERSIZED
          // group (a broad MOR DELETE with compaction behind) gets no
          // hint: forcing a multi-GB broadcast is an OOM, and the
          // planner's shuffled anti-join returns the same rows safely.
          val keysPlan: LogicalPlan = batchIdxs.map { bi =>
            spark.read.schema(StructType(keyFields))
              .parquet(batches(bi)._3)
              .queryExecution.analyzed
          }.reduce((a, b) => Union(Seq(a, b), false, false))
          val groupKeys = batchIdxs.map(bi => batches(bi)._4).sum
          val hint =
            if (groupKeys <= t.graftCatalog.dvBroadcastKeys)
              JoinHint(None, Some(HintInfo(Some(BROADCAST))))
            else JoinHint.NONE
          val cond = keyAttrs.zip(keysPlan.output)
            .map { case (a, k) =>
              EqualNullSafe(a, k): org.apache.spark.sql.catalyst.expressions.Expression }
            .reduce(org.apache.spark.sql.catalyst.expressions.And(_, _))
          Join(base, keysPlan, LeftAnti, Some(cond), hint)
        }
    }
    children match {
      case Seq(one) => one
      case many => Union(many, false, false)
    }
  }
}
