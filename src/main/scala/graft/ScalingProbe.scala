package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.mdm._

/** N-vs-4N EXECUTOR scaling via Spark's local-cluster mode: each executor is
  * its own JVM (own heap, own GC) — a faithful single-box simulation of the
  * north rule's "N and 4N executors", unlike local[k] threads which share
  * one heap and conflate GC/bandwidth with scaling. Requires SPARK_HOME
  * (full distribution at /opt/spark) and the project jar (sbt package).
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val entities = args.headOption.map(_.toInt).getOrElse(100000)
    val jar = new java.io.File("target/scala-2.13").listFiles()
      .filter(_.getName.endsWith(".jar")).maxBy(_.lastModified()).getAbsolutePath
    println(s"[scal] jar=$jar")

    val tmp = java.nio.file.Files.createTempDirectory("graft-scal").toString
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

    def run(execs: Int, coresPerExec: Int, memMb: Int): (Long, Double) = {
      val s = SparkSession.builder()
        .master(s"local-cluster[$execs,$coresPerExec,$memMb]")
        .appName(s"graft-scal-$execs")
        .config("spark.jars", jar)
        .config("spark.executor.memory", s"${memMb}m")
        // Each executor JVM must size its GC pools for ITS core slice, not
        // the whole box: without this, N executors spawn N*~23 GC threads on
        // 32 cores and the 4N level collapses under oversubscription
        // (measured 0.07 "efficiency" from GC thrash). GC-targeted flags
        // only — -XX:ActiveProcessorCount would also throttle the JIT
        // compiler pool, leaving hot codegen interpreted (measured 14x CPU).
        .config("spark.executor.extraJavaOptions",
          s"-XX:ParallelGCThreads=$coresPerExec -XX:ConcGCThreads=2")
        .config("spark.sql.shuffle.partitions", (2 * execs * coresPerExec).toString)
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.local.dir", "/dev/shm/graft-shuffle")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      graft.functions.GraftFunctions.register(s)
      val listener = new StageMetrics.Collector
      // Warm TWICE: executors are fresh JVMs; at high executor counts each
      // JVM sees only 1/N of the corpus per pass, so one pass may leave hot
      // codegen loops below C2 thresholds.
      job(s); job(s)
      s.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = job(s)
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      StageMetrics.printTop("scal", listener, 8)
      s.stop()
      (n, dt)
    }

    val (n2, t2) = run(2, 4, 6144)
    println(f"[scal] execs=2x4 pairs=$n2 wall=$t2%.1fs thr=${n2 / t2}%.0f")
    val (n8, t8) = run(8, 4, 6144)
    println(f"[scal] execs=8x4 pairs=$n8 wall=$t8%.1fs thr=${n8 / t8}%.0f")
    println(f"[scal] efficiency=${(n8 / t8) / (n2 / t2) / 4.0}%.3f")
  }
}
