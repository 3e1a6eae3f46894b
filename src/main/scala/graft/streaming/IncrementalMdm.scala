package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.mdm._

/** Streaming ingestion path (SURVEY.md §2.11, reference lifecycle C).
  *
  * The reference's "streaming" is a Python for-loop doing per-record Spanner
  * point lookups + a read-modify-write transaction
  * (/root/reference/streaming_mdm_gcp/streaming_processor.py:397-513).
  * The Spark-first re-expression is Structured Streaming `foreachBatch`:
  * each micro-batch is standardized, matched against the CURRENT golden
  * snapshot with the same blocked-join + scoring used by the batch path
  * (batch/streaming alignment is a headline reference feature,
  * mdm_unified_implementation.md:185-186), then merged:
  *   - matched records fold into their golden cluster (most-recent-wins
  *     survivorship, streaming_processor.py:676-753)
  *   - unmatched records form new golden entities
  *     (create_new_golden_record, streaming_processor.py:515-674)
  * State = the golden snapshot itself in the SnapshotStore (no
  * mapGroupsWithState needed: the "state" is a table, exactly like the
  * reference's Spanner `golden_entities`).
  */
class IncrementalMdm(store: SnapshotStore, cfg: MatchConfig = MatchConfig()) {

  /** Process one micro-batch of raw pages against the current golden state;
    * commits a new golden snapshot and returns it. Callable directly (for
    * tests / backfill) or from foreachBatch. */
  def processBatch(batch: DataFrame): DataFrame = {
    val spark = batch.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.storage.StorageLevel

    val cleanBatch = Standardize(batch)
    val prevClean: Option[DataFrame] =
      if (store.has("stream_clean")) Some(store.read(spark, "stream_clean")) else None

    // Accumulated clean store: old records win on record_id collision
    // (a record already merged must not flip attributes mid-stream).
    val allClean = (prevClean match {
      case Some(p) => p.unionByName(
        cleanBatch.join(p.select("record_id"), Seq("record_id"), "left_anti"))
      case None => cleanBatch
    }).persist(StorageLevel.MEMORY_AND_DISK)

    val newIds = prevClean match {
      case Some(p) => cleanBatch.select("record_id")
        .join(p.select("record_id"), Seq("record_id"), "left_anti")
      case None => cleanBatch.select("record_id")
    }

    // Re-block everything but SCORE only pairs touching a new record —
    // old-old pairs were already decided; their edges are committed state.
    val withSig = Blocking.withSignature(allClean, cfg)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val keys = Blocking.blockKeysFromSig(withSig, cfg)
    val cands = Pairs.candidates(keys, cfg)
    val touching = cands
      .join(newIds.withColumnRenamed("record_id", "id1"), Seq("id1"), "left_semi")
      .union(cands.join(newIds.withColumnRenamed("record_id", "id2"), Seq("id2"), "left_semi"))
      .distinct()

    val scored = Scoring(
      Pairs.attach(touching, withSig.select(Scoring.attachColumns.map(col): _*)), cfg)
    val newEdges = scored
      .where(col("match_decision").isin("auto_merge", "human_review"))
      .select(col("record1_id").as("src"), col("record2_id").as("dst"))

    val edges =
      if (store.has("stream_edges"))
        store.read(spark, "stream_edges").unionByName(newEdges)
      else newEdges

    val assigns = ConnectedComponents(edges, allClean.select("record_id"), cfg)
    val golden = Golden(assigns, allClean)

    store.commit(allClean, "stream_clean", overwrite = true)
    store.commit(edges, "stream_edges", overwrite = true)
    val out = store.commit(golden, "golden", overwrite = true)
    allClean.unpersist(); withSig.unpersist()
    out
  }

  /** Wire a streaming source of pages into the incremental pipeline. */
  def start(pagesStream: DataFrame, checkpointDir: String): StreamingQuery =
    pagesStream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) => processBatch(batch); () }
      .start()
}
