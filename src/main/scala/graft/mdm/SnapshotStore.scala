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

  /** Materialized directory listing with the stream closed (Files.list holds
    * an open directory fd until closed — ADVICE r1: long-running streaming
    * jobs call this several times per micro-batch). */
  private def listDir(dir: Path): Seq[Path] =
    scala.util.Using.resource(Files.list(dir))(_.iterator().asScala.toVector)

  /** All committed snapshots, ordered by id. */
  def committed(): Seq[(Long, String, Path)] =
    listDir(root)
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("snap-"))
      .flatMap { p =>
        val name = p.getFileName.toString.stripPrefix("snap-")
        val dash = name.indexOf('-')
        if (dash < 0) None
        else scala.util.Try((name.take(dash).toLong, name.drop(dash + 1), p)).toOption
      }
      .sortBy(_._1)

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

  /** ATOMIC multi-part commit: every part's parquet is written into ONE temp
    * dir, then a single directory rename publishes all of them together —
    * there is no observable state where part A is committed and part B is
    * not (fixes VERDICT r1 "what's wrong #2": the 3-separate-commits crash
    * window in the streaming path). Parts land under `part-<name>/`. */
  def commitMany(parts: Seq[(String, DataFrame)], stage: String,
      counters: Map[String, Long] = Map.empty): Long = {
    require(parts.nonEmpty)
    gcTemp()
    val id = committed().lastOption.map(_._1 + 1).getOrElse(0L)
    val parent = committed().lastOption.map(_._1)
    val tmp = root.resolve(s".tmp-$stage-$id")
    val rows = parts.map { case (name, df) =>
      df.write.mode("overwrite").parquet(tmp.resolve(s"part-$name").toString)
      val n = df.sparkSession.read.parquet(tmp.resolve(s"part-$name").toString).count()
      name -> n
    }
    val allCounters = counters ++ rows.map { case (k, v) => s"rows_$k" -> v }
    val manifest =
      s"""{"snapshot_id":$id,
         |"parent_id":${parent.map(_.toString).getOrElse("null")},
         |"stage":"$stage",
         |"parts":[${rows.map { case (k, _) => s""""$k"""" }.mkString(",")}],
         |"counters":{${allCounters.map { case (k, v) => s""""$k":$v""" }.mkString(",")}},
         |"committed_at_epoch_ms":${System.currentTimeMillis()}}""".stripMargin
    Files.write(tmp.resolve("manifest.json"), manifest.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, root.resolve(snapDirName(id, stage)), StandardCopyOption.ATOMIC_MOVE)
    id
  }

  /** Read a part from the LATEST committed snapshot of `stage` (full-rewrite
    * parts: assignments, golden). */
  def readPart(spark: SparkSession, stage: String, part: String): DataFrame =
    spark.read.parquet(latestFor(stage)
      .getOrElse(throw new IllegalStateException(s"no committed snapshot for $stage"))
      .resolve(s"part-$part").toString)

  /** Read a DELTA part as the union over ALL committed snapshots of `stage`
    * that contain it — the Iceberg-style append-log read (parts like the
    * clean record store and the audit log are written as per-batch deltas so
    * per-batch WRITE volume stays O(batch), not O(history)). */
  def readPartAll(spark: SparkSession, stage: String, part: String): DataFrame = {
    val dirs = committed().filter(_._2 == stage).map(_._3.resolve(s"part-$part"))
      .filter(Files.isDirectory(_)).map(_.toString)
    require(dirs.nonEmpty, s"no committed '$part' parts for stage $stage")
    spark.read.parquet(dirs: _*)
  }

  def manifest(stage: String): Option[String] =
    latestFor(stage).map(p =>
      new String(Files.readAllBytes(p.resolve("manifest.json")), StandardCharsets.UTF_8))

  /** Remove uncommitted temp dirs from crashed runs. */
  def gcTemp(): Unit =
    listDir(root)
      .filter(p => p.getFileName.toString.startsWith(".tmp-"))
      .foreach(deleteRecursively)

  def clear(): Unit =
    listDir(root).foreach(deleteRecursively)

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
