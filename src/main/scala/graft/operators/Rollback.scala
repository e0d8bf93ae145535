package graft.operators

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession

import graft.catalog.{GraftCatalog, TableMeta}
import graft.catalog.write.GraftBatchWrite

/** GENERATION ROLLBACK — the "oops" lever the staged-rewrite protocol
  * makes nearly free: migrate and zorder flip a table to a NEW
  * generation directory and leave the old one on disk until the
  * namespace vacuum's retention window expires, so un-doing a rewrite
  * within the window is a pure descriptor flip back — provider,
  * location, partition registrations and stats restored exactly as
  * retired, NO data movement at any table size. The generation being
  * rolled AWAY from joins the history in its place, so a rollback is
  * itself rollback-able (redo), bounded at [[TableMeta.MaxHistory]]
  * entries.
  *
  * Refusals keep it honest: no history → nothing to roll back to; a
  * retired generation whose directory the vacuum already reclaimed →
  * refuse loudly (the descriptor must never point at deleted data).
  * Runs under the write-permit lease of BOTH generations' locations'
  * shared scope — concurrent writers to the current generation are
  * excluded for the flip.
  *
  * `t$history` (the metadata relation) lists the same entries with a
  * liveness flag, so the operator can see what is still restorable
  * before calling.
  */
object Rollback {

  /** Roll `catalog.ns.table` back to its most recent retired
    * generation. Returns (restoredProvider, restoredLocation). */
  def rollback(spark: SparkSession, table: String): (String, String) = {
    val parts = table.split("\\.")
    require(parts.length == 3, s"rollback expects catalog.ns.table, got $table")
    val plugin = spark.sessionState.catalogManager.catalog(parts.head) match {
      case g: GraftCatalog => g
      case other => throw new IllegalArgumentException(
        s"rollback($table): not a graft catalog: ${other.name()}")
    }
    val store = plugin.metaStore
    val (db, name) = (parts(1), parts(2))
    val pre = store.loadTable(db, name)
    require(pre.history.nonEmpty,
      s"rollback($table): no retired generation to roll back to " +
        "(history is appended by migrate/zorder/rollback flips)")
    val target = pre.history.head
    val conf = spark.sessionState.newHadoopConf()
    val targetPath = new Path(target.location)
    require(targetPath.getFileSystem(conf).exists(targetPath),
      s"rollback($table): generation ${target.location} was already " +
        "reclaimed by the namespace vacuum; it cannot be restored")

    val release = GraftBatchWrite.leaseWritePermit(
      spark, pre.location,
      s"generation rollback of $table since ${java.time.Instant.now()}",
      plugin.writeLockTimeoutSec)
    try {
      store.updateTable(db, name) { cur =>
        // the head may have changed under a racing flip — re-resolve and
        // re-check liveness inside the permit
        require(cur.history.nonEmpty, s"rollback($table): history emptied by a concurrent flip")
        val g = cur.history.head
        val gp = new Path(g.location)
        require(gp.getFileSystem(conf).exists(gp),
          s"rollback($table): generation ${g.location} was reclaimed")
        cur.copy(provider = g.provider, location = g.location,
          partitions = g.partitions, stats = g.stats,
          history = (cur.asGeneration(System.currentTimeMillis()) +:
            cur.history.tail).take(TableMeta.MaxHistory))
      }
      plugin.invalidateTable(
        org.apache.spark.sql.connector.catalog.Identifier.of(Array(db), name))
      (target.provider, target.location)
    } finally release()
  }
}
