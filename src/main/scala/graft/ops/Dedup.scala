package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Deduplication operators for large-scale training-data pipelines
  * (builder brief): exact, MinHash-LSH, SimHash, n-gram Jaccard,
  * embedding-cosine near-dup. All pure Column/DataFrame ops — each shuffles
  * once on its blocking key and never materializes a cross join.
  */
object Dedup {

  /** Exact dedup: keep one row per byte-identical content.
    * Returns input rows + `dup_group` (content hash) + `is_canonical`
    * (true for the kept row = min id per group). */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dup_group")).orderBy(col(idCol))
    df.withColumn("dup_group", sha2(col(textCol), 256))
      .withColumn("is_canonical", row_number().over(w) === 1)
  }

  /** MinHash-LSH near-dup candidate pairs: (id1, id2, est_jaccard).
    * Shingle -> minhash signature -> banded equi-join -> signature-estimated
    * Jaccard; exact Jaccard re-rank is the caller's choice (verify()). */
  def minhashPairs(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 16, bands: Int = 8, shingle: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val sig = df.select(col(idCol).as("id"),
      textMinhash(col(textCol), numHashes, shingle).as("sig"))
    val keys = sig.select(col("id"), col("sig"),
      explode(bandKeys(col("sig"), bands, numHashes)).as("bk"))
    val a = keys.select(col("bk"), col("id").as("id1"), col("sig").as("sig1"))
    val b = keys.select(col("bk"), col("id").as("id2"), col("sig").as("sig2"))
    a.join(b, Seq("bk")).where(col("id1") < col("id2"))
      .select("id1", "id2", "sig1", "sig2").distinct()
      .withColumn("est_jaccard", minhashJaccardEst(col("sig1"), col("sig2")))
      .where(col("est_jaccard") >= threshold)
      .select("id1", "id2", "est_jaccard")
  }

  /** SimHash near-dup pairs: 64-bit simhash, blocked by k-bit prefix bands
    * (rotations), hamming-similarity filtered. */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val h = df.select(col(idCol).as("id"), textSimhash(col(textCol)).as("sh"))
    // 4 16-bit bands: near-dups within hamming<=3 share >=1 exact band whp;
    // wider hamming budgets raise recall via the verify filter below.
    val banded = h.select(col("id"), col("sh"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("band"),
          call_function("shiftright", col("sh"), lit(i * 16)).bitwiseAND(0xFFFFL).as("key"))): _*))
        .as("b"))
    val a = banded.select(col("b").as("ba"), col("id").as("id1"), col("sh").as("sh1"))
    val b = banded.select(col("b").as("bb"), col("id").as("id2"), col("sh").as("sh2"))
    a.join(b, col("ba") === col("bb") && col("id1") < col("id2"))
      .select("id1", "id2", "sh1", "sh2").distinct()
      .withColumn("hamming", bit_count(col("sh1").bitwiseXOR(col("sh2"))))
      .where(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
  }

  /** Exact n-gram Jaccard for candidate pairs (re-rank stage after LSH). */
  def jaccardVerify(pairs: DataFrame, df: DataFrame, textCol: String,
      idCol: String, shingle: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      array_distinct(shingles(tokens(col(textCol)), shingle)).as("sh"))
    pairs
      .join(sh.select(col("id").as("id1"), col("sh").as("sh_1")), Seq("id1"))
      .join(sh.select(col("id").as("id2"), col("sh").as("sh_2")), Seq("id2"))
      .withColumn("jaccard", arrayJaccard(col("sh_1"), col("sh_2")))
      .drop("sh_1", "sh_2")
  }

  /** Embedding-cosine near-dup pairs, LSH-bucketed by random-hyperplane
    * sign bits so the self-join is an equi-join on bucket (no N² at scale);
    * brute-force within bucket. */
  def cosinePairs(df: DataFrame, embCol: String, idCol: String,
      threshold: Double = 0.9, signBits: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val withBucket = df.withColumn("bucket",
      SimilaritySearch.hyperplaneBucket(col(embCol), signBits))
    val a = withBucket.select(col("bucket"), col(idCol).as("id1"), col(embCol).as("e1"))
    val b = withBucket.select(col("bucket"), col(idCol).as("id2"), col(embCol).as("e2"))
    a.join(b, Seq("bucket")).where(col("id1") < col("id2"))
      .withColumn("cos", cosineSim(col("e1"), col("e2")))
      .where(col("cos") >= threshold)
      .select("id1", "id2", "cos")
  }
}
