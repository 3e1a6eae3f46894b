package graft.mdm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CustomerGenSpec extends SparkSpec {

  test("G1-G3: deterministic; coverage ~80/70/60 per source; multiplicity 1-3") {
    val a = CustomerGen.customersWithTruth(spark, 300)
    val b = CustomerGen.customersWithTruth(spark, 300)
    assert(a.orderBy("record_id").collect().toSeq == b.orderBy("record_id").collect().toSeq)

    val cov = a.groupBy("source_system")
      .agg(countDistinct("entity_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cov("crm") > cov("erp") && cov("erp") > cov("ecommerce"))
    assert(math.abs(cov("crm") / 300.0 - 0.8) < 0.08)
    assert(math.abs(cov("ecommerce") / 300.0 - 0.6) < 0.08)

    val mult = a.groupBy("entity_id", "source_system").count()
      .agg(min("count"), max("count")).head()
    assert(mult.getLong(0) >= 1 && mult.getLong(1) <= 3)
  }

  test("G4: variations present — nicknames, address abbreviations, phone reformats") {
    val c = CustomerGen.customersWithTruth(spark, 400).cache()
    // nickname: some entity has records under both the full and nick first name
    val nickPairs = c.groupBy("entity_id")
      .agg(countDistinct("first_name").as("n")).where(col("n") > 1).count()
    assert(nickPairs > 0, "no nickname variation produced")
    assert(c.where(col("address").rlike("\\bSt\\b|\\bAve\\b|\\bBlvd\\b|\\bRd\\b|\\bDr\\b")).count() > 0)
    assert(c.where(col("phone").contains(".")).count() > 0)
    assert(c.where(col("phone").rlike("^\\(")).count() > 0)
    // 21 base columns + truth
    assert(c.columns.length == 22)
    c.unpersist()
  }

  test("G5: scaled(k) multiplies records with disjoint id spaces") {
    val base = CustomerGen.customers(spark, 50)
    val s3 = CustomerGen.scaled(base, 3)
    assert(s3.count() == base.count() * 3)
    assert(s3.select("record_id").distinct().count() == s3.count())
    assert(s3.select("source_id").distinct().count() == s3.count())
  }

  test("P1-P5 standardization merges variant records onto shared keys") {
    val std = CustomerGen.standardized(CustomerGen.customers(spark, 100))
    // phone reformats collapse to identical digit strings within an entity
    val collapsed = std.groupBy("customer_id")
      .agg(countDistinct("phone_clean").as("n")).where(col("n") > 1).count()
    assert(collapsed == 0, "phoneClean failed to collapse reformatting variants")
    // address abbreviation variants collapse after addressClean (STREET->ST etc.)
    val addrVariants = std.groupBy("customer_id")
      .agg(countDistinct("address_clean").as("n")).where(col("n") > 1).count()
    assert(addrVariants == 0, "addressClean failed to collapse abbreviation variants")
  }
}
