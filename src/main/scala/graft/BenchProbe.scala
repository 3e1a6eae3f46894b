package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.mdm._

/** One-off scaling diagnostic: times the scoring job at a given core count
  * under different shuffle/AQE configs and reports per-stage task-time
  * totals so the serializing stage is visible. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val entities = args.headOption.map(_.toInt).getOrElse(100000)
    val cap = args.drop(1).headOption.map(_.toInt).getOrElse(250)

    val tmp = java.nio.file.Files.createTempDirectory("graft-probe").toString
    val boot = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    boot.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(boot)
    PageGen.pages(boot, entities, hotEntities = math.min(entities / 50, 800))
      .repartition(64).write.mode("overwrite").parquet(s"$tmp/pages")
    boot.stop()

    def job(s: SparkSession, persist: Boolean): Long = {
      val cfg = MatchConfig(maxBlockSize = cap)
      val clean = Standardize(s.read.parquet(s"$tmp/pages"))
      val withSig0 = Blocking.withSignature(clean, cfg)
        .select(Scoring.attachColumns.map(col): _*)
      val withSig =
        if (persist) withSig0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else withSig0
      val cands = Pairs.candidates(Blocking.blockKeysFromSig(withSig, cfg), cfg)
      val n = Scoring(Pairs.attach(cands, withSig), cfg).count()
      if (persist) withSig.unpersist()
      n
    }

    def run(label: String, cores: Int, conf: Map[String, String],
        persist: Boolean = true): Unit = {
      val b = SparkSession.builder().master(s"local[$cores]")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", "/dev/shm/graft-shuffle")
      conf.foreach { case (k, v) => b.config(k, v) }
      val s = b.getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      graft.functions.GraftFunctions.register(s)
      val listener = new StageMetrics.Collector
      job(s, persist) // warm
      s.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = job(s, persist)
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"[probe] $label cores=$cores pairs=$n wall=$dt%.1fs")
      StageMetrics.printTop("probe", listener, 10)
      s.stop()
    }

    def noAqe(cores: Int) = Map(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> (2 * cores).toString)
    // One full-size discard run first: every later session shares this JVM's
    // JIT state, so without it the FIRST measured level eats all C2
    // compilation and the comparison is garbage (observed 86s -> 20s for the
    // same config depending on run order).
    run("jit-warm-discard", 32, noAqe(32))
    run("jit-warm-discard", 8, noAqe(8))
    Seq(8, 32, 8, 32).foreach(c => run(s"persist-cap$cap", c, noAqe(c), persist = true))
  }
}
