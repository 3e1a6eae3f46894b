package graft.mdm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic Common-Crawl-style page corpus with duplicate
  * structure + ground-truth entity labels (FIXTURES.md §B).
  *
  * Semantics transplanted from the reference generator — coverage per
  * source (0.8/0.7/0.6, /root/reference/batch_mdm_gcp/data_generator.py:177,
  * 205,229), duplication multiplicity (data_generator.py:182-183,234-235),
  * variation-injection rates (data_generator.py:24-53,105-165) — but fully
  * deterministic: every pseudo-random choice is `xxhash64(keys...)`-bucketed,
  * never `rand()`/Faker (SURVEY.md §7.5.5, G1-G6).
  *
  * Invariant by construction: `text` is a pure function of `url`
  * (variation seed = hash(url)), so extracted text is byte-identical per url
  * (BASELINE.json input_hint invariant).
  */
object PageGen {

  private val VOCAB = 5000 // token space; cross-entity Jaccard ~ |doc|^2/VOCAB

  /** Bucket in [0, mod) from deterministic hash of key columns. */
  private def bucket(mod: Int, cols: org.apache.spark.sql.Column*) =
    pmod(xxhash64(cols: _*), lit(mod.toLong)).cast("int")

  /** Generate `pages` with hidden entity structure.
    *
    * @param nEntities  seed entity count (reference demo: 120 -> 284 records)
    * @param hotEntities entities 0..hotEntities-1 all share ONE domain
    *                    ("hub.example.com") to force a skewed blocking key
    * @return DataFrame(url, warc_ts, html, text, lang, entity_id) — callers
    *         project off entity_id for the pipeline input and keep it as
    *         ground truth.
    */
  def pagesWithTruth(spark: SparkSession, nEntities: Int, hotEntities: Int = 0,
      seed: Long = 42L): DataFrame = {
    val ent = spark.range(nEntities.toLong).toDF("entity_id")
      .withColumn("seed", lit(seed))

    // 3 pseudo-crawls with coverage 80/70/60% (analogue of CRM/ERP/ECOM).
    val crawls = ent
      .withColumn("crawl", explode(sequence(lit(0), lit(2))))
      .withColumn("cov", element_at(array(lit(80), lit(70), lit(60)), col("crawl") + 1))
      .where(bucket(100, col("entity_id"), col("crawl"), col("seed"), lit("cov")) < col("cov"))

    // Duplication multiplicity 1-3 per entity per crawl
    // (15% double / 5% triple buckets, data_generator.py:182-183,234-235).
    val mult = bucket(100, col("entity_id"), col("crawl"), col("seed"), lit("mult"))
    val dup = crawls
      .withColumn("n_copies", when(mult < 5, 3).when(mult < 20, 2).otherwise(1))
      .withColumn("copy", explode(sequence(lit(0), col("n_copies") - 1)))

    // --- URL construction with deterministic variation drift -------------
    // Slug is entity-stable => same-entity urls are JW-similar; different
    // entities diverge after the shared prefix.
    val slugTok = (i: Int) =>
      concat(lit("w"), pmod(xxhash64(col("entity_id"), lit(i), col("seed"), lit("slug")), lit(VOCAB.toLong)))
    val slug = concat_ws("-", col("entity_id").cast("string"), slugTok(0), slugTok(1))

    val baseDomain =
      if (hotEntities > 0)
        when(col("entity_id") < hotEntities, lit("hub.example.com"))
          .otherwise(concat(lit("site-"), (col("entity_id") / 4).cast("long"), lit(".example.com")))
      else concat(lit("site-"), (col("entity_id") / 4).cast("long"), lit(".example.com"))

    // Variation buckets (reference rates: alias 20%, query-drift 30%,
    // mirror-domain 5% — the mirror is only discoverable via LSH band keys,
    // exercising multi-key blocking recall, SURVEY.md §7.5.3).
    val vb = bucket(100, col("entity_id"), col("crawl"), col("copy"), col("seed"), lit("var"))
    val withUrl = dup
      .withColumn("domain0", baseDomain)
      .withColumn("domain1",
        when(vb < 5, concat(lit("mirror-"), (col("entity_id") / 4).cast("long"), lit(".example.net")))
          .when(vb < 15, concat(lit("www."), col("domain0")))
          .when(vb < 25, concat(lit("m."), col("domain0")))
          .otherwise(col("domain0")))
      .withColumn("qs",
        when(vb % 10 < 3, lit("?utm_source=feed&ref=crawl"))
          .when(vb % 10 === 3, lit("/"))
          .otherwise(lit("")))
      .withColumn("url",
        concat(lit("https://"), col("domain1"), lit("/articles/"), lit(slug), col("qs")))

    // --- Text: pure function of url (invariant) ---------------------------
    // Base token stream is entity-keyed; per-URL variation (typo / dropped
    // tail) is keyed on hash(url) so identical urls yield identical bytes.
    val nTok = (pmod(xxhash64(col("entity_id"), col("seed"), lit("len")), lit(120L)) + 60).cast("int")
    val urlHash = xxhash64(col("url"))
    val typoPos = pmod(urlHash, col("n_tok").cast("long")).cast("int")
    val doTypo = pmod(xxhash64(urlHash, lit("typo")), lit(100L)) < 10
    val doDrop = pmod(xxhash64(urlHash, lit("drop")), lit(100L)) < 15

    val withText = withUrl
      .withColumn("n_tok", nTok)
      .withColumn("base_toks", transform(sequence(lit(0), col("n_tok") - 1),
        i => concat(lit("w"),
          pmod(xxhash64(col("entity_id"), i, col("seed"), lit("tok")), lit(VOCAB.toLong)))))
      .withColumn("toks0",
        when(doTypo,
          transform(col("base_toks"),
            (t, i) => when(i === typoPos, concat(t, lit("x"))).otherwise(t)))
          .otherwise(col("base_toks")))
      .withColumn("toks",
        when(doDrop,
          slice(col("toks0"), lit(1),
            greatest(((col("n_tok") * 85) / 100).cast("int"), lit(8))))
          .otherwise(col("toks0")))
      .withColumn("text", concat_ws(" ", col("toks")))

    withText
      .withColumn("lang",
        element_at(array(lit("en"), lit("en"), lit("en"), lit("es"), lit("de")),
          bucket(5, col("entity_id"), col("seed"), lit("lang")) + 1))
      .withColumn("warc_ts",
        // entity-clustered crawl times: same-entity records land within days
        timestamp_seconds(lit(1700000000L)
          + col("entity_id") * 3600L
          + col("crawl") * 86400L
          + pmod(urlHash, lit(43200L))))
      .withColumn("html",
        concat(lit("<html><head><title>"), lit(slug),
          lit("</title></head><body><p>"), col("text"),
          lit("</p></body></html>")).cast("binary"))
      .select("url", "warc_ts", "html", "text", "lang", "entity_id")
  }

  /** Project the pipeline's product input (drops the truth column). */
  def pages(spark: SparkSession, nEntities: Int, hotEntities: Int = 0,
      seed: Long = 42L): DataFrame =
    pagesWithTruth(spark, nEntities, hotEntities, seed)
      .select("url", "warc_ts", "html", "text", "lang")

  /** Ground truth: distinct (url, entity_id). */
  def truth(pagesWithTruth: DataFrame): DataFrame =
    pagesWithTruth.select("url", "entity_id").distinct()

  /** G6: streaming simulation with the reference's ~80% new / 20% drift mix
    * (streaming notebook cell 14): batch b carries all records of entities
    * "born" in b plus one DRIFT re-capture (query-string variant, +30d
    * crawl time, same extracted text — a re-crawl) for a deterministic 20%
    * bucket of entities born earlier. Returns pages + `batch` + `entity_id`;
    * callers slice on `batch` and drop the truth columns. */
  def driftStream(spark: SparkSession, nEntities: Int, nBatches: Int,
      seed: Long = 42L): DataFrame = {
    val pt = pagesWithTruth(spark, nEntities, hotEntities = 0, seed)
    val perBatch = math.max(1, nEntities / nBatches)
    val birth = least(lit(nBatches - 1), (col("entity_id") / perBatch).cast("int"))
    val base = pt.withColumn("batch", birth)
    val firstUrl = pt.groupBy("entity_id").agg(min("url").as("url"))
    val drift = pt.join(firstUrl, Seq("entity_id", "url")) // one capture per entity
      .where(pmod(xxhash64(col("entity_id"), lit(seed), lit("drift")), lit(100L)) < 20)
      .withColumn("b0", birth)
      .where(col("b0") < nBatches - 1)
      .withColumn("batch", col("b0") + 1)
      .withColumn("url", concat(col("url"), lit("?drift=recrawl")))
      .withColumn("warc_ts", col("warc_ts") + expr("INTERVAL 30 DAYS"))
      .drop("b0")
    base.unionByName(drift.select(base.columns.map(col): _*))
  }
}
