package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat again and again today"), // near dup of 1
    (4L, "completely different content about spark shuffles and partitions here"),
    (5L, "el rapido zorro marron salta sobre el perro perezoso una y otra vez")
  ).toDF("id", "text")

  test("exact dedup groups byte-identical docs and keeps min id") {
    val d = Dedup.exact(docs, "text", "id")
    val g = d.where(col("id").isin(1L, 2L)).select("dup_group").distinct()
    assert(g.count() == 1)
    assert(d.where(col("id") === 1L).head().getAs[Boolean]("is_canonical"))
    assert(!d.where(col("id") === 2L).head().getAs[Boolean]("is_canonical"))
    assert(d.where(col("id") === 4L).head().getAs[Boolean]("is_canonical"))
  }

  test("exact dedup keeps null-text rows as canonical singletons (ADVICE r2 #1)") {
    val withNulls = docs.unionByName(Seq(
      (6L, null.asInstanceOf[String]), (7L, null.asInstanceOf[String])).toDF("id", "text"))
    val d = Dedup.exact(withNulls, "text", "id")
    assert(d.count() == 7) // contract: returns ALL input rows
    val nullRows = d.where(col("id").isin(6L, 7L)).collect()
    assert(nullRows.length == 2)
    // null content is unknown, not equal: each null row is its own group
    assert(nullRows.forall(_.getAs[Boolean]("is_canonical")))
    assert(nullRows.forall(_.isNullAt(nullRows.head.fieldIndex("dup_group"))))
  }

  test("minhash LSH finds exact+near dups, not unrelated docs") {
    // 64 hashes: the 1-token-edit pair has true shingle-Jaccard ~0.57; a
    // 16-slot estimate is too noisy to threshold reliably in a unit test.
    val pairs = Dedup.minhashPairs(docs, "text", "id",
      numHashes = 64, bands = 16, threshold = 0.4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("jaccard verify re-ranks: exact dup = 1.0, near dup < 1.0") {
    val pairs = Dedup.minhashPairs(docs, "text", "id", threshold = 0.3)
    val v = Dedup.jaccardVerify(pairs, docs, "text", "id")
      .select("id1", "id2", "jaccard").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(v((1L, 2L)) == 1.0)
    v.get((1L, 3L)).foreach(j => assert(j > 0.5 && j < 1.0))
  }

  test("simhash pairs: hamming 0 for exact dup, small for near dup") {
    val p = Dedup.simhashPairs(docs, "text", "id", maxHamming = 8)
      .select("id1", "id2", "hamming").as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(p((1L, 2L)) == 0)
    p.get((1L, 3L)).foreach(h => assert(h <= 8))
    assert(!p.contains((1L, 4L)) || p((1L, 4L)) > 0)
  }

  test("simhash banding guarantee: every pair within maxHamming is recalled (pigeonhole)") {
    // 40 docs: 20 identical + 20 distinct; identical docs share ALL bands.
    // The guarantee to pin is structural: pairs found == pairs with
    // hamming <= budget computed by brute force.
    val d = (1L to 20L).map(i => (i, "shared text body with many common tokens here"))
      .++((21L to 40L).map(i => (i, s"doc $i unique words w$i x$i y$i z$i q$i r$i")))
      .toDF("id", "text")
    val got = Dedup.simhashPairs(d, "text", "id", maxHamming = 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val h = d.select(col("id"), graft.functions.GraftFunctions.textSimhash(col("text")).as("sh"))
    val brute = h.toDF("id1", "sh1").join(h.toDF("id2", "sh2"), col("id1") < col("id2"))
      .where(bit_count(col("sh1").bitwiseXOR(col("sh2"))) <= 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got == brute, s"missing=${brute -- got} extra=${got -- brute}")
  }

  test("hot band key: skew-split keeps the pair set exact with a tiny block cap") {
    // one boilerplate cluster: 60 identical docs -> every band key is shared
    // by all 60; blockCap=10 forces triangle-splitting; the result must be
    // exactly C(60,2) pairs (completeness under splitting), not fewer/more.
    val hot = (1L to 60L).map(i => (i, "boilerplate web page body identical across the crawl"))
      .toDF("id", "text")
    val pairs = Dedup.minhashPairs(hot, "text", "id", threshold = 0.5, blockCap = 10)
    assert(pairs.count() == 60L * 59 / 2)
    // and the same for the cosine path
    val vecs = (1L to 40L).map(i => (i, Seq(0.5f, 0.5f, 0.1f, 0.2f))).toDF("id", "emb")
    val cp = Dedup.cosinePairs(vecs, "emb", "id", threshold = 0.99, signBits = 8,
      tables = 2, blockCap = 8)
    assert(cp.count() == 40L * 39 / 2)
  }

  test("embedding cosine dedup finds the duplicate vector via LSH buckets") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.2f, 0.1f)),
      (2L, Seq(1.0f, 0.0f, 0.2f, 0.1f)),
      (3L, Seq(0.98f, 0.05f, 0.21f, 0.1f)),
      (4L, Seq(-1.0f, 0.5f, -0.3f, 0.9f))
    ).toDF("id", "emb")
    val p = Dedup.cosinePairs(vecs, "emb", "id", threshold = 0.99)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(p.contains((1L, 2L)))
    assert(!p.exists(x => x._1 == 4L || x._2 == 4L))
  }

  test("brute-force topK and IVF topK agree on an easy corpus") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") < 5)
    val bf = SimilaritySearch.bruteForceTopK(q, e, "embedding", "vec_id", 3)
      .select("qid", "rank", "nid").as[(Long, Int, Long)].collect().toSet
    assert(bf.size == 15)
    val ivf = SimilaritySearch.ivfTopK(q, e, "embedding", "vec_id", 3,
      nCentroids = 8, nProbe = 8) // nProbe = all -> must equal brute force
    val ivfSet = ivf.select("qid", "rank", "nid").as[(Long, Int, Long)].collect().toSet
    assert(ivfSet == bf)
    // real ANN setting: fewer probes still recalls most of top-3
    val ann = SimilaritySearch.ivfTopK(q, e, "embedding", "vec_id", 3,
      nCentroids = 8, nProbe = 3)
      .select("qid", "rank", "nid").as[(Long, Int, Long)].collect().toSet
    val recall = bf.map(x => (x._1, x._3)).intersect(ann.map(x => (x._1, x._3))).size / 15.0
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }

  test("Lloyd-trained IVF centroids: deterministic, count-invariant, exact at full probe") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val t1 = SimilaritySearch.trainIvfCentroids(e, "embedding", "vec_id",
      nCentroids = 8, iters = 3)
    // count invariance (empty clusters keep the previous centroid)
    assert(t1.count() == 8)
    // determinism: identical centroids on a re-run (hash seed, lowest-cid
    // assignment tie-break, order-independent means)
    val t2 = SimilaritySearch.trainIvfCentroids(e, "embedding", "vec_id",
      nCentroids = 8, iters = 3)
    assert(t1.orderBy("cid").collect().toSeq == t2.orderBy("cid").collect().toSeq)
    // training actually moves centroids off the raw hash sample
    val seedOnly = SimilaritySearch.trainIvfCentroids(e, "embedding", "vec_id",
      nCentroids = 8, iters = 0)
    assert(t1.join(seedOnly.toDF("cid", "ce0"), Seq("cid"))
      .where(col("ce").cast("array<double>") =!= col("ce0").cast("array<double>"))
      .count() > 0, "3 Lloyd rounds left every centroid exactly at its seed")
    // trained quantizer still PARTITIONS the corpus: probing all centroids
    // must reproduce brute force exactly, like the untrained path
    val q = e.where(col("vec_id") < 5)
    val bf = SimilaritySearch.bruteForceTopK(q, e, "embedding", "vec_id", 3)
      .select("qid", "rank", "nid").as[(Long, Int, Long)].collect().toSet
    val full = SimilaritySearch.ivfTopK(q, e, "embedding", "vec_id", 3,
      nCentroids = 8, nProbe = 8, trainIters = 3)
      .select("qid", "rank", "nid").as[(Long, Int, Long)].collect().toSet
    assert(full == bf)
    // and at the real ANN setting trained centroids keep useful recall
    val ann = SimilaritySearch.ivfTopK(q, e, "embedding", "vec_id", 3,
      nCentroids = 8, nProbe = 3, trainIters = 3)
      .select("qid", "rank", "nid").as[(Long, Int, Long)].collect().toSet
    val recall = bf.map(x => (x._1, x._3)).intersect(ann.map(x => (x._1, x._3))).size / 15.0
    assert(recall >= 0.5, s"trained-IVF recall too low: $recall")
  }

  test("langId picks the right language on real-ish sentences") {
    val samples = Seq(
      ("en", "the cat is sitting on the mat and the dog is watching it"),
      ("es", "el gato esta sentado en la alfombra y los perros que miran una cosa"),
      ("de", "der hund und die katze sind in das haus und das ist schon"),
      ("fr", "le chat est sur la table et les chiens sont dans une maison"),
      ("zh", "我是学生这是我的书在这里有很多人")
    ).toDF("truth", "text")
    val got = TextAnalysis.langId(samples, "text")
      .select("truth", "pred_lang").as[(String, String)].collect()
    got.foreach { case (truth, pred) => assert(pred == truth, s"$truth predicted $pred") }
  }

  test("quality features + token counts are sane and deterministic") {
    val q = TextAnalysis.tokenCounts(
      TextAnalysis.qualityFeatures(docs, "text"), "text")
    val r1 = q.where(col("id") === 1L).head()
    assert(r1.getAs[Int]("n_words") == 13)
    assert(r1.getAs[Double]("repetition") > 0.0) // "the"/"again" repeat
    assert(r1.getAs[Int]("ws_tokens") == 13)
    assert(r1.getAs[Long]("approx_bpe_tokens") >= 13)
    val again = TextAnalysis.tokenCounts(
      TextAnalysis.qualityFeatures(docs, "text"), "text")
      .where(col("id") === 1L).head()
    assert(again.toString == r1.toString)
  }

  test("fingerprints: identical docs share fp_min and fp_head") {
    val f = TextAnalysis.fingerprints(docs, "text")
      .select("id", "fp_min", "fp_head").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(f(1L) == f(2L))
    assert(f(1L) != f(4L))
  }

  test("multimodal: decode/featurize plumbing is deterministic; frame sampling explodes videos") {
    val media = Multimodal.syntheticMedia(spark, 30).repartition(4)
    val feats = Multimodal.decodeAndFeaturize(media, featureDim = 8)
    val rows = feats.collect()
    assert(rows.length == 30)
    assert(rows.forall(_.feature.length == 8))
    assert(rows.forall(r => r.width >= 64 && r.height >= 64))
    assert(rows.filter(_.kind != "video").forall(_.n_frames == 1))
    // deterministic across runs
    val again = Multimodal.decodeAndFeaturize(
      Multimodal.syntheticMedia(spark, 30).repartition(2), featureDim = 8)
      .collect().map(r => r.media_id -> r.feature.toSeq).toMap
    rows.foreach(r => assert(again(r.media_id) == r.feature.toSeq))
    val frames = Multimodal.sampleFrames(feats, stride = 16)
    assert(frames.count() > 0)
    assert(frames.select("media_id").distinct().count() == rows.count(_.kind == "video"))
  }
}
