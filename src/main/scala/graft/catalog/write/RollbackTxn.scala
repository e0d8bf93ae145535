package graft.catalog.write

import java.nio.charset.StandardCharsets
import java.util.Base64

import scala.util.control.NonFatal

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.internal.Logging

import graft.catalog.{MetaStore, TableMeta}

/** Failure atomicity for SNAPSHOT ROLLBACK (the q116 in-place restore).
  *
  * `Rollback.rollbackSnapshot` is a long rename campaign — retire the
  * rolled-back commit's additions, restore the target snapshot's
  * retirements — followed by a descriptor update and the rollback's own
  * snapshot record. Without an intent log, a crash (or one failed
  * rename) mid-campaign leaves the LIVE table silently missing rows:
  * listing-based reads just see fewer files, nothing refuses, and the
  * next commit's snapshot GC can permanently reclaim the unrecorded
  * retirement token — violating the module's "restorable, never lost"
  * contract (ADVICE r18, high).
  *
  * The fix is the `.retire`-manifest pattern the dynamic-overwrite path
  * uses, extended with the descriptor: BEFORE the first rename, the
  * rollback persists `_graft_txn/<token>.rbk` holding (a) the complete
  * PRE-rollback descriptor (so undo restores partitions/stats/lineage
  * exactly) and (b) every planned move in execution order. The manifest
  * is deleted only after the descriptor update and snapshot maintenance
  * succeed — so to every later observer the rollback either FULLY
  * happened (no manifest) or NEVER happened (manifest present → the
  * repair below reverses the moves and restores the descriptor).
  *
  * [[repair]] runs under the table's write permit at every write-job
  * start (GraftBatchWrite, before the COW/retire repairs) and at the
  * start of every rollback call, so no reader-visible state ever feeds
  * a commit before the residue is healed, and — because snapshot GC
  * only runs inside commits, which repair precedes — the unrecorded
  * token's retirement area is emptied back into the live tree before
  * GC could ever reclaim it.
  *
  * Declared residual trade: files OUTSIDE the table root (custom
  * partition LOCATIONs) cannot retire, so the rollback deletes them
  * after all renames succeed; a crash after those deletes loses them to
  * the undo — the same custom-LOCATION exposure every retirement
  * surface documents (SURVEY §7.4).
  */
private[graft] object RollbackTxn extends Logging {

  val Suffix = ".rbk"

  /** One planned rename, in execution order. */
  case class Move(from: Path, to: Path)

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))
  private def unb64(s: String): String =
    new String(Base64.getDecoder.decode(s), StandardCharsets.UTF_8)

  /** Persist the intent manifest (tmp + atomic rename) BEFORE any move
    * executes. Format: one `META\t<base64 descriptor JSON>` line, then
    * `M\t<from>\t<to>` per planned move in execution order. */
  def writeManifest(
      conf: Configuration,
      location: String,
      token: String,
      preMeta: TableMeta,
      moves: Seq[Move]): Path = {
    val txnDir = new Path(location, GraftBatchWrite.TxnDirName)
    val fs = txnDir.getFileSystem(conf)
    fs.mkdirs(txnDir)
    val target = new Path(txnDir, s"$token$Suffix")
    val tmp = new Path(txnDir, s".$token$Suffix.tmp")
    val sb = new StringBuilder
    sb.append("META\t").append(b64(MetaStore.toJson(preMeta))).append('\n')
    moves.foreach(m =>
      sb.append("M\t").append(m.from.toString).append('\t')
        .append(m.to.toString).append('\n'))
    val out = fs.create(tmp, false)
    try out.write(sb.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    GraftBatchWrite.ownTxnFile(target.getName)
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(
        s"failed to persist rollback intent manifest $target")
    }
    target
  }

  /** Undo a (possibly partial) rollback: reverse the recorded moves in
    * REVERSE execution order (each reversed iff the destination exists
    * and the origin does not — unexecuted moves are no-ops), restore
    * the pre-rollback descriptor verbatim, then retire the manifest.
    * Idempotent: a crash mid-undo re-runs cleanly. Callable both from
    * the rollback's own in-JVM failure handler and from crash repair. */
  def undo(
      conf: Configuration,
      store: MetaStore,
      db: String,
      manifest: Path,
      restoreDescriptor: Boolean): Unit = {
    val fs = manifest.getFileSystem(conf)
    if (!fs.exists(manifest)) return
    val lines = {
      val in = fs.open(manifest)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    }
    val preMeta: Option[TableMeta] = lines.collectFirst {
      case l if l.startsWith("META\t") => MetaStore.fromJson(unb64(l.drop(5)))
    }
    val moves: Seq[Move] = lines.collect {
      case l if l.startsWith("M\t") =>
        l.split("\t") match {
          case Array("M", from, to) => Move(new Path(from), new Path(to))
          case _ => sys.error(s"torn rollback manifest line in $manifest: $l")
        }
    }
    moves.reverseIterator.foreach { m =>
      val toFs = m.to.getFileSystem(conf)
      val fromFs = m.from.getFileSystem(conf)
      if (toFs.exists(m.to) && !fromFs.exists(m.from)) {
        fromFs.mkdirs(m.from.getParent)
        if (!toFs.rename(m.to, m.from))
          throw new java.io.IOException(
            s"rollback undo: failed to restore ${m.to} to ${m.from} — " +
              s"manifest $manifest left in place for retry")
      }
    }
    if (restoreDescriptor) preMeta.foreach(store.saveTable(db, _))
    fs.delete(manifest, false)
    ()
  }

  /** Crash repair: undo every `.rbk` manifest under the table's txn dir.
    * Must run under the table's write permit BEFORE any commit work
    * (including snapshot GC) observes the table. A failed undo keeps
    * the manifest so the next writer retries; the failure propagates —
    * committing over un-healed rollback residue would publish a state
    * missing the unrestored rows. */
  def repair(
      conf: Configuration,
      store: MetaStore,
      db: String,
      meta: TableMeta): Unit = {
    val txnDir = new Path(meta.location, GraftBatchWrite.TxnDirName)
    val fs: FileSystem = txnDir.getFileSystem(conf)
    val exists = try fs.exists(txnDir) catch { case NonFatal(_) => false }
    if (!exists) return
    fs.listStatus(txnDir).map(_.getPath)
      .filter(_.getName.endsWith(Suffix)).foreach { pm =>
        logWarning(s"repairing crashed rollback residue $pm on " +
          s"$db.${meta.name}: reversing its moves and restoring the " +
          "pre-rollback descriptor")
        undo(conf, store, db, pm, restoreDescriptor = true)
      }
  }
}
