package graft.temporal

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Expectations
import graft.operators.Expectations.Expectation

/** Write-Audit-Publish (Iceberg's WAP / Netflix's audit pattern; Delta
  * does it with table clones or staged commits): a batch becomes
  * visible ONLY after passing a data-quality audit, and the audit runs
  * against the STAGED FILES — the bytes readers would actually see —
  * not against the in-memory frame that produced them (a writer bug
  * between frame and file is exactly what WAP exists to catch).
  *
  *  1. **Write**: the batch lands under `<root>/_wap/` — the
  *     underscore prefix keeps it invisible to every normal read, and
  *     no manifest references it.
  *  2. **Audit**: [[Expectations]] evaluates the rule set over a
  *     read-back of the staged parquet. The gate is all-or-nothing
  *     over drop/fail rules (the Iceberg shape: a snapshot publishes
  *     whole or not at all — row-level dropping would force a file
  *     rewrite and break the publish-by-rename contract); warn rules
  *     count but never block.
  *  3. **Publish**: [[VersionedStore.publishDir]] RENAMES the staged
  *     dir into the next version and writes the manifest — the same
  *     atomic commit point as every other store commit; the audited
  *     bytes are the published bytes, no rewrite anywhere. On a failed
  *     audit the staged dir is removed and the store is untouched —
  *     the abort is indistinguishable from the batch never arriving.
  *
  * Scale shape: one write + one audit scan of the batch (the audit is
  * Expectations' single codegen'd pass), a rename, a manifest — the
  * table's history size never appears.
  */
object Wap {

  /** What the gate decided: `published` = the new version when the
    * audit passed; `metrics` = per-rule violation counts (computed
    * either way — full counts, never truncated); `quarantineSample` =
    * up to 100 violating rows read from the staged files as abort
    * evidence (bounded — the FULL violation set is a fraction of the
    * batch and belongs in a quarantine TABLE, not on the driver). */
  final case class Outcome(published: Option[Long], metrics: Array[(String, String, Long)],
      quarantineSample: Array[org.apache.spark.sql.Row])

  def writeAuditPublish(spark: SparkSession, root: String, df: DataFrame,
      rules: Seq[Expectation], operation: String = "wap"): Outcome = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = new Path(root,
      s"_wap/stage-${java.util.UUID.randomUUID().toString.take(8)}")
    df.write.mode("error").parquet(staged.toString)
    try {
      val audit = Expectations.audit(spark.read.parquet(staged.toString), rules)
      val metrics = audit.metrics.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val gatingBroken = metrics.exists { case (rule, _, n) =>
        n > 0 && rules.exists(x => x.name == rule && x.mode != "warn")
      }
      if (gatingBroken)
        Outcome(None, metrics, audit.quarantine.limit(100).collect())
      else {
        val v = VersionedStore.publishDir(spark, root, staged.toString, operation)
        Outcome(Some(v), metrics, Array.empty)
      }
    } finally {
      if (fs.exists(staged)) // publish renamed it away; abort cleans up
        require(fs.delete(staged, true), s"Wap: clean $staged failed")
    }
  }
}
