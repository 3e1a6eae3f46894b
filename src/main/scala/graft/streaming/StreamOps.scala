package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators for the ingest path (builder brief:
  * watermarks + windowed aggs; KeyValueGroupedDataset state for custom
  * semantics). These run on an UNBOUNDED stream ahead of the micro-batch
  * MDM merge (IncrementalMdm) — the analogue of the reference's per-record
  * pre-checks and metrics loop (streaming_processor.py:397-430 dedup
  * short-circuit; :755-809 latency/throughput accounting).
  */
object StreamOps {

  case class PageKey(url_canon: String)
  case class PageEvent(url_canon: String, warc_ts: Timestamp, record_id: String)
  case class FirstSeen(record_id: String, url_canon: String, warc_ts: Timestamp)

  /** Stateful first-capture-wins dedup over a page stream, keyed by the
    * CANONICAL url: re-crawls of a url already seen within the state TTL are
    * dropped before they reach standardization/matching (the reference's
    * "record already processed" short-circuit). Implemented with
    * flatMapGroupsWithState + event-time timeout: state is freed
    * `ttl` after the watermark passes the capture — bounded state on an
    * unbounded crawl. Expects columns url_canon, warc_ts, record_id and an
    * event-time WATERMARK already set on warc_ts. */
  def firstSeenDedup(pages: DataFrame, ttl: String = "24 hours"): Dataset[FirstSeen] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val ttlMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(ttl))
    // A month has no fixed millisecond length, so a month-bearing TTL can't
    // be added to an epoch timestamp — reject it instead of silently
    // dropping the months field (which would make the TTL 0 for "1 month").
    require(ttlMs.months == 0,
      s"firstSeenDedup ttl must be a day-time interval (got '$ttl'); " +
        "use days, e.g. '30 days' instead of '1 month'")
    val ttlMillis = ttlMs.days * 86400000L + ttlMs.microseconds / 1000L
    require(ttlMillis > 0, s"firstSeenDedup ttl must be positive (got '$ttl')")
    pages.select(col("url_canon"), col("warc_ts"), col("record_id"))
      .as[PageEvent]
      .groupByKey(_.url_canon)
      .flatMapGroupsWithState[Long, FirstSeen](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, events, state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = events.toSeq.sortBy(e => (e.warc_ts.getTime, e.record_id))
            val out = sorted.headOption.filter(_ => !state.exists).map(e =>
              FirstSeen(e.record_id, e.url_canon, e.warc_ts))
            if (!state.exists && sorted.nonEmpty) {
              state.update(sorted.head.warc_ts.getTime)
              state.setTimeoutTimestamp(sorted.head.warc_ts.getTime + ttlMillis)
            }
            out.iterator
          }
      }
  }

  /** Event-time tumbling-window match statistics over the scored-pair /
    * decision stream (the reference's match_results metrics,
    * streaming_processor.py:755-809): per (window, decision) counts + mean
    * combined score, watermarked so late rows beyond the allowed lateness
    * are dropped and window state is reclaimed. */
  def windowedMatchStats(scored: DataFrame, tsCol: String = "ts",
      window_ : String = "1 hour", lateness: String = "2 hours"): DataFrame =
    scored
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), window_), col("match_decision"))
      .agg(count(lit(1)).as("n_pairs"),
        avg(col("combined_score")).as("avg_score"),
        sum(when(col("match_decision") === "auto_merge", 1L).otherwise(0L)).as("n_auto"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("match_decision"), col("n_pairs"), col("avg_score"), col("n_auto"))
}
