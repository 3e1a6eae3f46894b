package graft

/** Shared per-stage task-metrics instrumentation for the perf probes
  * (BenchProbe, ScalingProbe): a SparkListener collecting run/GC/CPU/shuffle
  * totals per completed stage plus a heaviest-stages printer, so the
  * serializing stage of a scaling run is visible from one place. */
object StageMetrics {

  final case class St(id: Int, name: String, runMs: Long, gcMs: Long,
      cpuNs: Long, shufRead: Long, shufWrite: Long, nTasks: Int)

  final class Collector extends org.apache.spark.scheduler.SparkListener {
    val stages = scala.collection.mutable.ArrayBuffer[St]()
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val i = sc.stageInfo
      val m = i.taskMetrics
      stages += St(i.stageId, i.name.takeWhile(_ != '\n').take(40),
        m.executorRunTime, m.jvmGCTime, m.executorCpuTime,
        m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
        i.numTasks)
      ()
    }
  }

  /** Print the n heaviest stages by total task run time, tagged for grep. */
  def printTop(tag: String, c: Collector, n: Int): Unit =
    c.stages.sortBy(-_.runMs).take(n).foreach { st =>
      println(f"[$tag]   stage ${st.id}%4d run=${st.runMs / 1000.0}%7.1fs " +
        f"cpu=${st.cpuNs / 1e9}%7.1fs gc=${st.gcMs / 1000.0}%6.1fs " +
        f"sRead=${st.shufRead / 1e6}%8.1fMB sWrite=${st.shufWrite / 1e6}%8.1fMB " +
        f"tasks=${st.nTasks}")
    }
}
