package graft.mdm

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-SEMANTICS snapshot store over plain Parquet.
  *
  * The environment has no Iceberg runtime jar (SURVEY.md env facts), so the
  * table-format behaviors the north rule needs — atomic commit, snapshot
  * lineage, resume-from-last-committed — are implemented behind this small
  * façade, with a manifest format deliberately Iceberg-shaped (snapshot id,
  * parent id, stage name, counters) so a real Iceberg catalog can be swapped
  * in on a cluster (SURVEY.md §7.5.4 documents this as the swap-in point).
  *
  * Commit protocol: write Parquet to `<root>/.tmp-<stage>-<id>/`, then write
  * the manifest INTO the temp dir, then a single atomic directory rename to
  * `<root>/snap-<id>-<stage>/`. Readers only ever see fully-committed
  * snapshots; a crashed writer leaves only a `.tmp-` dir that is ignored and
  * garbage-collected on the next run.
  */
final class SnapshotStore(rootDir: String) {
  private val root: Path = Paths.get(rootDir)
  Files.createDirectories(root)

  private def snapDirName(id: Long, stage: String) = f"snap-$id%05d-$stage"

  /** All committed snapshots, ordered by id. */
  def committed(): Seq[(Long, String, Path)] =
    Files.list(root).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("snap-"))
      .flatMap { p =>
        val name = p.getFileName.toString.stripPrefix("snap-")
        val dash = name.indexOf('-')
        if (dash < 0) None
        else scala.util.Try((name.take(dash).toLong, name.drop(dash + 1), p)).toOption
      }
      .toSeq.sortBy(_._1)

  def latestFor(stage: String): Option[Path] =
    committed().filter(_._2 == stage).lastOption.map(_._3)

  /** True if `stage` already has a committed snapshot (resume hit). */
  def has(stage: String): Boolean = latestFor(stage).isDefined

  def read(spark: SparkSession, stage: String): DataFrame =
    spark.read.parquet(latestFor(stage)
      .getOrElse(throw new IllegalStateException(s"no committed snapshot for $stage"))
      .resolve("data").toString)

  /** Write + atomically commit a stage snapshot; returns the row count
    * (recorded as a lineage counter in the manifest). If a committed
    * snapshot for the stage exists and `overwrite` is false, returns it
    * without recomputation (resumability). */
  def commit(df: DataFrame, stage: String, counters: Map[String, Long] = Map.empty,
      overwrite: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    if (!overwrite && has(stage)) return read(spark, stage)

    gcTemp()
    val id = committed().lastOption.map(_._1 + 1).getOrElse(0L)
    val parent = committed().lastOption.map(_._1)
    val tmp = root.resolve(s".tmp-$stage-$id")
    df.write.mode("overwrite").parquet(tmp.resolve("data").toString)

    val spark2 = df.sparkSession
    val written = spark2.read.parquet(tmp.resolve("data").toString)
    val rows = written.count()
    val manifest =
      s"""{"snapshot_id":$id,
         |"parent_id":${parent.map(_.toString).getOrElse("null")},
         |"stage":"$stage",
         |"row_count":$rows,
         |"counters":{${(counters + ("rows" -> rows)).map { case (k, v) => s""""$k":$v""" }.mkString(",")}},
         |"committed_at_epoch_ms":${System.currentTimeMillis()}}""".stripMargin
    Files.write(tmp.resolve("manifest.json"), manifest.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, root.resolve(snapDirName(id, stage)), StandardCopyOption.ATOMIC_MOVE)
    read(spark2, stage)
  }

  def manifest(stage: String): Option[String] =
    latestFor(stage).map(p =>
      new String(Files.readAllBytes(p.resolve("manifest.json")), StandardCharsets.UTF_8))

  /** Remove uncommitted temp dirs from crashed runs. */
  def gcTemp(): Unit =
    Files.list(root).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith(".tmp-"))
      .foreach(deleteRecursively)

  def clear(): Unit =
    Files.list(root).iterator().asScala.foreach(deleteRecursively)

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
