package graft.mdm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StandardizeSpec extends SparkSpec {
  import spark.implicits._

  test("reference scalar standardization P1-P5 pinned to cited semantics") {
    val df = Seq((
      "  John O'Brien-Smith 3rd ",
      "  John.Doe+x@EXAMPLE.com ",
      "+1 (555) 123-4567",
      "123 Main Street Apt 4",
      " austin ")).toDF("name", "email", "phone", "addr", "city")
    val r = df.select(
      Standardize.ref.nameClean($"name").as("n"),
      Standardize.ref.emailClean($"email").as("e"),
      Standardize.ref.phoneClean($"phone").as("p"),
      Standardize.ref.addressClean($"addr").as("a"),
      Standardize.ref.upperTrim($"city").as("c")).head()
    // P1 strips the digit from "3rd", leaving "RD" after upper+trim
    assert(r.getString(0) == "JOHN OBRIENSMITH RD")
    assert(r.getString(1) == "john.doe+x@example.com")
    assert(r.getString(2) == "15551234567")
    assert(r.getString(3) == "123 MAIN ST APT 4")
    assert(r.getString(4) == "AUSTIN")
  }

  test("url canonicalization: scheme/case/alias/query/trailing-slash drift collapses") {
    val pages = Seq(
      ("HTTPS://WWW.Site-1.Example.com/Articles/7-a-b?utm_source=feed", "t1"),
      ("https://m.site-1.example.com/articles/7-a-b/", "t2"),
      ("https://site-1.example.com/articles/7-a-b", "t3"))
      .toDF("url", "text")
      .withColumn("warc_ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .withColumn("html", lit(Array[Byte]()))
      .withColumn("lang", lit("en"))
    val c = Standardize(pages.select("url", "warc_ts", "html", "text", "lang"))
    assert(c.select("url_canon").distinct().count() == 1)
    assert(c.select("domain").distinct().head().getString(0) == "site-1.example.com")
    assert(c.select("slug").distinct().head().getString(0) == "7-a-b")
  }

  test("url edge cases pinned: ports kept in domain, fragments stripped, bare hosts") {
    // Common-Crawl urls carry ports, fragments, and pathless hosts; pin the
    // canonicalization DECISIONS so drift is loud: a port is part of the
    // domain identity (different origin), fragments never reach the canon,
    // a bare host canonicalizes without a trailing slash with an empty slug.
    val pages = Seq(
      ("HTTP://WWW.Example.COM:8443/A/B/?q=1#frag", "t1"),
      ("https://example.com", "t2"),
      ("https://example.com/#top", "t3"))
      .toDF("url", "text")
      .withColumn("warc_ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .withColumn("html", lit(Array[Byte]()))
      .withColumn("lang", lit("en"))
    val c = Standardize(pages.select("url", "warc_ts", "html", "text", "lang"))
      .select("text", "url_canon", "domain", "slug")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2), r.getString(3)))
      .toMap
    assert(c("t1") == (("https://example.com:8443/a/b", "example.com:8443", "b")))
    assert(c("t2") == (("https://example.com", "example.com", "")))
    assert(c("t3") == (("https://example.com", "example.com", "")))
  }

  test("null gate drops rows without url or text (P6)") {
    val pages = Seq(
      (Some("https://a.com/x"), Some("body")),
      (None, Some("body")),
      (Some("https://a.com/y"), None),
      (Some("https://a.com/z"), Some("")))
      .toDF("url", "text")
      .withColumn("warc_ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .withColumn("html", lit(Array[Byte]()))
      .withColumn("lang", lit("en"))
    assert(Standardize(pages.select("url", "warc_ts", "html", "text", "lang")).count() == 1)
  }

  test("record ids are deterministic and distinct per (url, warc_ts)") {
    val p = PageGen.pages(spark, 25)
    val c1 = Standardize(p).select("record_id").orderBy("record_id").collect()
    val c2 = Standardize(p).select("record_id").orderBy("record_id").collect()
    assert(c1.sameElements(c2))
    assert(c1.distinct.length == c1.length)
  }

  test("CSV sink/scan round-trip preserves clean records (S1 analogue)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val c = Standardize(PageGen.pages(spark, 15)).drop("warc_ts") // csv loses micros
    c.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() == c.count())
    assert(back.columns.sorted.sameElements(c.columns.sorted))
  }
}
