package graft.mdm

import org.apache.spark.sql.SparkSession

/** Best-effort recursive delete for DEAD reliable-checkpoint directories.
  *
  * Cleanup of files nothing needs anymore must never fail the job that
  * created them: a transient filesystem error (HDFS/S3 hiccup) degrades to
  * a leak — logged, reclaimed by a later sweep or the operator — not an
  * abort. Shared by [[ConnectedComponents]]'s per-round generation cleanup
  * and IncrementalMdm's per-batch scope cleanup.
  */
private[graft] object CheckpointHygiene {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  def bestEffortDelete(spark: SparkSession, dir: String): Unit =
    try {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      ()
    } catch {
      case scala.util.control.NonFatal(e) =>
        log.warn(s"best-effort checkpoint cleanup of $dir failed " +
          s"(leaked, not fatal): ${e.getClass.getSimpleName}: ${e.getMessage}")
    }
}
