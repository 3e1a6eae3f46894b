package graft

/** Optimization-round profiling harness (guide §1): times individual
  * driver-contract queries in isolation through the noop sink, dumps
  * `.explain("formatted")` for each to plans/<tag>/<name>_<suffix>.txt, and
  * prints per-stage task metrics so the expensive stage (and its
  * parallelism) is visible. NOT part of the driver contract — Bench.scala
  * is the frozen measurement surface; this exists so before/after numbers
  * and plan shapes in OPTIMIZATION_r*.md are reproducible.
  *
  * Usage: runMain graft.BenchExtra <suffix> [query ...]
  *   SPARK_GRAFT_SF_DIR  data dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS    core count (default 32)
  *   no query args = all queries, sorted (same order as Bench part 1).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val suffix = args.headOption.getOrElse("before")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val planDir = new java.io.File(s"plans/r06")
    planDir.mkdirs()

    val localDir =
      if (new java.io.File("/dev/shm").canWrite) "/dev/shm/graft-shuffle"
      else System.getProperty("java.io.tmpdir")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", (2 * cpus).toString)
      .config("spark.local.dir", localDir)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(s)

    // identical generic warm-up to Bench part 1
    s.range(0, 200000).selectExpr("id % 31 AS k", "id")
      .groupBy("k").agg(org.apache.spark.sql.functions.sum("id"))
      .write.mode("overwrite").format("noop").save()

    // mini host stamps (Bench's alloc+cpu probes, cheap): a reading whose
    // brackets are below Bench's floors (2.0 GB/s / 0.25 Gops) is garbage
    def allocStamp(): Double = {
      val n = 32 << 20
      val t0 = System.nanoTime()
      val arr = new Array[Byte](n)
      var i = 0
      while (i < n) { arr(i) = 1; i += 4096 }
      n.toDouble / (System.nanoTime() - t0) * 1e9 / (1L << 30)
    }
    def cpuStamp(): Double = {
      var x = 0x9E3779B97F4A7C15L
      val t0 = System.nanoTime()
      var i = 0L
      while (i < 16000000L) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      if (x == 42L) println(x) // keep live
      16000000L.toDouble / (System.nanoTime() - t0)
    }

    names.foreach { name =>
      val listener = new StageMetrics.Collector
      s.sparkContext.addSparkListener(listener)
      s.sparkContext.setJobDescription(s"bench-extra: $name")
      // timed region = construction + noop write, exactly like Bench part 1
      // (several queries run eager jobs — CC fixpoint, IVF training, dim
      // probes — at construction time; timing only the write would miss them)
      val a0 = allocStamp(); val c0 = cpuStamp()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(s, sfDir)
      df.write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val a1 = allocStamp(); val c1 = cpuStamp()
      // plan dump (post-execution construction is cheap to redo; AQE initial plan)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"plans/r06/${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      Thread.sleep(300) // let stage-completed events drain
      s.sparkContext.removeSparkListener(listener)
      println(f"[extra] $name sec=$sec%.3f alloc=$a0%.1f/$a1%.1f cpu=$c0%.2f/$c1%.2f")
      StageMetrics.printTop("extra", listener, 6)
    }
    s.stop()
  }
}
