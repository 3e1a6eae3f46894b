package graft.mdm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class GoldenSpec extends SparkSpec {
  import spark.implicits._

  private def g(id: String, url: String, text: String, seen: String,
      act: String, recs: Seq[String]) =
    (id, url, url, text, "en", text, Timestamp.valueOf(seen), Timestamp.valueOf(act),
      recs.size.toLong, recs, Seq("d.com"), id)

  private val cols = Seq("master_id", "canonical_url", "master_url", "master_text",
    "master_lang", "most_complete_text", "first_seen", "last_activity",
    "source_record_count", "source_record_ids", "source_domains", "cluster_id")

  test("S5 bulk MERGE upsert: matched keys update most-recent-wins, unmatched insert") {
    val existing = Seq(
      g("m1", "https://a", "old text", "2023-01-01 00:00:00", "2023-06-01 00:00:00", Seq("r1", "r2")),
      g("m2", "https://b", "keep", "2023-01-01 00:00:00", "2023-06-01 00:00:00", Seq("r3")))
      .toDF(cols: _*)
    val incoming = Seq(
      g("m1", "https://a", "new text", "2023-03-01 00:00:00", "2024-01-01 00:00:00", Seq("r2", "r4")),
      g("m3", "https://c", "inserted", "2024-01-01 00:00:00", "2024-01-01 00:00:00", Seq("r5")))
      .toDF(cols: _*)

    val merged = Golden.merge(existing, incoming).cache()
    assert(merged.count() == 3)
    val m1 = merged.where(col("master_id") === "m1").head()
    assert(m1.getAs[String]("master_text") == "new text") // incoming newer wins
    assert(m1.getAs[Timestamp]("first_seen") == Timestamp.valueOf("2023-01-01 00:00:00"))
    assert(m1.getAs[Timestamp]("last_activity") == Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(m1.getAs[scala.collection.Seq[String]]("source_record_ids").toList == List("r1", "r2", "r4")) // lineage union
    assert(m1.getAs[Long]("source_record_count") == 3L)
    val m2 = merged.where(col("master_id") === "m2").head()
    assert(m2.getAs[String]("master_text") == "keep") // untouched row survives
    assert(merged.where(col("master_id") === "m3").count() == 1) // insert
    merged.unpersist()
  }

  test("S5 merge is idempotent: re-merging the same batch changes nothing") {
    val base = Seq(g("m1", "https://a", "t", "2023-01-01 00:00:00",
      "2023-06-01 00:00:00", Seq("r1"))).toDF(cols: _*)
    val inc = Seq(g("m1", "https://a", "t2", "2023-02-01 00:00:00",
      "2024-01-01 00:00:00", Seq("r2"))).toDF(cols: _*)
    val once = Golden.merge(base, inc)
    val twice = Golden.merge(once, inc)
    assert(once.orderBy("master_id").collect().toSeq ==
      twice.orderBy("master_id").collect().toSeq)
  }

  test("older incoming does NOT overwrite newer existing (most-recent-wins)") {
    val existing = Seq(g("m1", "https://a", "newer", "2023-01-01 00:00:00",
      "2024-06-01 00:00:00", Seq("r1"))).toDF(cols: _*)
    val stale = Seq(g("m1", "https://a", "stale", "2023-01-01 00:00:00",
      "2023-02-01 00:00:00", Seq("r9"))).toDF(cols: _*)
    val m = Golden.merge(existing, stale).head()
    assert(m.getAs[String]("master_text") == "newer")
    assert(m.getAs[scala.collection.Seq[String]]("source_record_ids").toList == List("r1", "r9")) // lineage still unions
  }
}
