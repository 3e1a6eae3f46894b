package graft.mdm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pairwise precision/recall/F1 at shared blocking keys — the BASELINE.json
  * headline metric ("pairwise-match F1>=0.99 on labeled pairs at shared
  * blocking keys").
  */
object Evaluate {

  case class PairwiseMetrics(tp: Long, fp: Long, fn: Long) {
    def precision: Double = if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp)
    def recall: Double = if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn)
    def f1: Double =
      if (precision + recall == 0) 0.0
      else 2 * precision * recall / (precision + recall)
  }

  /** Labeled pairs = candidate pairs at shared blocking keys, labeled by
    * ground-truth entity equality. (Evaluating AT the blocking key per the
    * metric definition: pairs never sharing a key are out of scope.)
    *
    * @param truthByRecord (record_id, entity_id)
    */
  def labeledPairs(blockKeys: DataFrame, truthByRecord: DataFrame,
      cfg: MatchConfig): DataFrame = {
    val cands = Pairs.candidates(blockKeys, cfg)
    cands
      .join(truthByRecord.toDF("id1", "entity1"), Seq("id1"))
      .join(truthByRecord.toDF("id2", "entity2"), Seq("id2"))
      .withColumn("is_match", col("entity1") === col("entity2"))
      .select("id1", "id2", "is_match")
  }

  /** Compare predicted same-cluster pairs vs labels over the SAME candidate
    * universe. `assignments` = (record_id, cluster_id). */
  def pairwise(labeled: DataFrame, assignments: DataFrame): PairwiseMetrics = {
    val a1 = assignments.toDF("id1", "c1")
    val a2 = assignments.toDF("id2", "c2")
    val j = labeled.join(a1, Seq("id1")).join(a2, Seq("id2"))
      .withColumn("pred", col("c1") === col("c2"))
    val r = j.agg(
      sum(when(col("is_match") && col("pred"), 1L).otherwise(0L)).as("tp"),
      sum(when(!col("is_match") && col("pred"), 1L).otherwise(0L)).as("fp"),
      sum(when(col("is_match") && !col("pred"), 1L).otherwise(0L)).as("fn"))
      .head()
    PairwiseMetrics(
      Option(r.getLong(0)).getOrElse(0L),
      Option(r.getLong(1)).getOrElse(0L),
      Option(r.getLong(2)).getOrElse(0L))
  }

  /** Convenience: full pipeline + eval on a generated corpus with truth. */
  def evalOnGenerated(spark: SparkSession, nEntities: Int, hotEntities: Int = 0,
      cfg: MatchConfig = MatchConfig()): PairwiseMetrics = {
    val pt = PageGen.pagesWithTruth(spark, nEntities, hotEntities).cache()
    val pages = pt.select("url", "warc_ts", "html", "text", "lang")
    val res = Pipeline.run(pages, cfg)

    val truthByRecord = res.clean.select("record_id", "url")
      .join(PageGen.truth(pt), Seq("url"))
      .select("record_id", "entity_id")

    val keys = Blocking.blockKeys(res.clean, cfg)
    val labeled = labeledPairs(keys, truthByRecord, cfg)
    val m = pairwise(labeled, res.assignments)
    pt.unpersist()
    m
  }
}
