package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.mdm._

/** Core-count sweep for the pair-scoring job: times the identical job at
  * 1/2/4/8/16/32 local cores (warm, best-of-2) and prints every N->4N
  * efficiency pair, to locate where single-box hardware saturation (shared
  * memory bandwidth, SMT) starts masking the software's scaling. */
object SweepProbe {
  def main(args: Array[String]): Unit = {
    val entities = args.headOption.map(_.toInt).getOrElse(200000)
    val tmp = java.nio.file.Files.createTempDirectory("graft-sweep").toString
    locally {
      val boot = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false").getOrCreate()
      boot.sparkContext.setLogLevel("ERROR")
      graft.functions.GraftFunctions.register(boot)
      PageGen.pages(boot, entities, hotEntities = math.min(entities / 50, 800))
        .repartition(64).write.mode("overwrite").parquet(s"$tmp/pages")
      boot.stop()
    }

    def job(s: SparkSession): Long = {
      val cfg = MatchConfig()
      val clean = Standardize(s.read.parquet(s"$tmp/pages"))
      val withSig = Blocking.withSignature(clean, cfg)
        .select(Scoring.attachColumns.map(col): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cands = Pairs.candidates(Blocking.blockKeysFromSig(withSig, cfg), cfg)
      val n = Scoring(Pairs.attach(cands, withSig), cfg).count()
      withSig.unpersist()
      n
    }

    def run(cores: Int): (Long, Double) = {
      val s = SparkSession.builder().master(s"local[$cores]")
        .appName(s"sweep-$cores")
        .config("spark.sql.shuffle.partitions", (2 * cores).toString)
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.local.dir", "/dev/shm/graft-shuffle")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      graft.functions.GraftFunctions.register(s)
      job(s) // per-level warm (JVM shared across levels; first level JIT-warms)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = job(s)
        (n, (System.nanoTime() - t0) / 1e9)
      }
      s.stop()
      (times.head._1, times.map(_._2).min)
    }

    run(32) // JIT warm discard
    val levels = Seq(1, 2, 4, 8, 16, 32)
    val res = levels.map { c =>
      val (n, t) = run(c)
      println(f"[sweep] cores=$c%2d wall=$t%7.1fs thr=${n / t}%9.0f pairs/s (pairs=$n)")
      c -> (n / t)
    }.toMap
    for (n <- levels if levels.contains(n * 4)) {
      val eff = res(n * 4) / res(n) / 4.0
      println(f"[sweep] eff ${n}->${n * 4}: $eff%.3f")
    }
  }
}
