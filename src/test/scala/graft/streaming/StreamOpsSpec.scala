package graft.streaming

import graft.SparkSpec
import graft.mdm._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("firstSeenDedup: stateful first-capture-wins per canonical url (flatMapGroupsWithState)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, String)]
    val pages = input.toDF().toDF("url_canon", "warc_ts", "record_id")
      .withWatermark("warc_ts", "1 hour")
    val out = StreamOps.firstSeenDedup(pages, ttl = "24 hours")

    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(
        ("https://a/x", ts("2024-01-01 10:00:00"), "r1"),
        ("https://a/x", ts("2024-01-01 10:05:00"), "r2"), // re-crawl, same batch
        ("https://b/y", ts("2024-01-01 10:01:00"), "r3"))
      q.processAllAvailable()
      input.addData(
        ("https://a/x", ts("2024-01-01 11:00:00"), "r4")) // re-crawl, later batch
      q.processAllAvailable()
      val got = spark.table("dedup_out").select("record_id")
        .collect().map(_.getString(0)).toSet
      assert(got == Set("r1", "r3"), s"got $got") // one winner per url; re-crawls dropped
    } finally q.stop()
  }

  test("windowedMatchStats: event-time tumbling windows + watermark drop late rows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val scored = input.toDF().toDF("ts", "match_decision", "combined_score")
    val stats = StreamOps.windowedMatchStats(scored, "ts", "1 hour", "1 hour")

    val q = stats.writeStream.format("memory").queryName("stats_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "auto_merge", 0.9),
        (ts("2024-01-01 10:20:00"), "human_review", 0.7),
        (ts("2024-01-01 10:40:00"), "auto_merge", 0.85))
      q.processAllAvailable()
      // advance watermark far past the 10:00 window so it finalizes (append mode)
      input.addData((ts("2024-01-01 14:00:00"), "auto_merge", 0.95))
      q.processAllAvailable()
      val rows = spark.table("stats_out")
        .where(col("window_start") === ts("2024-01-01 10:00:00"))
        .collect().map(r => r.getAs[String]("match_decision") ->
          (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_auto"))).toMap
      assert(rows("auto_merge") == ((2L, 2L)))
      assert(rows("human_review") == ((1L, 0L)))
    } finally q.stop()
  }
}
