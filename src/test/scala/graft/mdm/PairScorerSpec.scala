package graft.mdm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

class PairScorerSpec extends SparkSpec {
  import spark.implicits._

  private val attached = Seq(
    ("a", "b", "alpha beta", "alpha beta"),
    ("a", "c", "alpha beta", "gamma delta"),
    ("b", "c", "alpha", null.asInstanceOf[String]))
    .toDF("id1", "id2", "a_head", "b_head")

  test("F8 default ZeroPairScorer scores 0 (reference streaming degradation)") {
    val got = PairScorer.withAiScore(attached, ZeroPairScorer)
      .select("ai_score").collect().map(_.getDouble(0))
    assert(got.forall(_ == 0.0))
  }

  test("heuristic scorer honors the reference gates (score>0.4 AND confidence>0.6)") {
    val sim: (Column, Column) => Column = (a, b) =>
      when(a === b, 0.9).otherwise(0.1)
    val s = new HeuristicPairScorer(sim, "a_head", "b_head", maxPairs = None)
    val got = PairScorer.withAiScore(attached, s)
      .orderBy("id1", "id2").select("ai_score").collect().map(_.getDouble(0))
    assert(got(0) == 0.9) // identical -> passes both gates
    assert(got(1) == 0.0) // sim 0.1 fails score gate
    assert(got(2) == 0.0) // null side fails confidence gate
  }

  test("J5/O4 cost cap: only maxPairs deterministic pairs get AI-scored (LIMIT 500 analogue)") {
    val many = (1 to 100).map(i => (f"id$i%03d", f"jd$i%03d", "x", "x"))
      .toDF("id1", "id2", "a_head", "b_head")
    val s = new HeuristicPairScorer((a, b) => when(a === b, 0.9).otherwise(0.0),
      "a_head", "b_head", maxPairs = Some(10))
    val scored = PairScorer.withAiScore(many, s).cache()
    assert(scored.count() == 100) // cap limits SCORING, not the pair set
    assert(scored.where(col("ai_score") > 0).count() == 10)
    // deterministic selection: same 10 on re-run
    val first = scored.where(col("ai_score") > 0).select("id1").orderBy("id1")
      .collect().map(_.getString(0)).toSeq
    val second = PairScorer.withAiScore(many, s).where(col("ai_score") > 0)
      .select("id1").orderBy("id1").collect().map(_.getString(0)).toSeq
    assert(first == second)
    scored.unpersist()
  }

  test("Scoring.apply threads the scorer into the ensemble (ai_score column feeds wAi)") {
    val pages = PageGen.pages(spark, 20)
    val cfg = MatchConfig(wAi = 0.1, wFuzzy = 0.25)
    val clean = Standardize(pages)
    val withSig = Blocking.withSignature(clean, cfg)
      .select(Scoring.attachColumns.map(col): _*)
    val cands = Pairs.candidates(Blocking.blockKeysFromSig(withSig, cfg), cfg)
    val s = new HeuristicPairScorer((a, b) => when(a === b, 1.0).otherwise(0.0),
      "a_text_md5", "b_text_md5", maxPairs = None)
    val scored = Scoring(Pairs.attach(cands, withSig), cfg, s)
    assert(scored.where(col("ai_score") === 1.0).count() > 0) // exact dups exist in PageGen
  }
}
