package graft.streaming

import graft.SparkSpec
import graft.mdm._
import org.apache.spark.sql.functions._

class IncrementalMdmSpec extends SparkSpec {

  test("incremental micro-batches converge to the same golden records as the batch run") {
    // Batch/streaming alignment is a headline reference property
    // (mdm_unified_implementation.md:185-186: same standardization, same
    // scoring, stable ids across paths).
    val pt = PageGen.pagesWithTruth(spark, 60).cache()
    val pages = pt.select("url", "warc_ts", "html", "text", "lang").cache()

    val batchGolden = Pipeline.run(pages).golden
      .select("master_id", "canonical_url", "source_record_count")
      .orderBy("master_id").collect().map(_.toString).toSeq

    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val inc = new IncrementalMdm(new SnapshotStore(dir))
    // 3 micro-batches in warc_ts order (crawl-time arrival)
    val withBatch = pages.withColumn("b", ntile(3).over(
      org.apache.spark.sql.expressions.Window.orderBy(col("warc_ts"), col("url"))))
    (1 to 3).foreach { b =>
      inc.processBatch(withBatch.where(col("b") === b).drop("b"))
    }
    val store = new SnapshotStore(dir)
    val streamGolden = store.read(spark, "golden")
      .select("master_id", "canonical_url", "source_record_count")
      .orderBy("master_id").collect().map(_.toString).toSeq

    assert(streamGolden == batchGolden)
    pt.unpersist(); pages.unpersist()
  }

  test("foreachBatch wiring processes a file stream end-to-end") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-fstream")
    val srcDir = tmp.resolve("src").toString
    val ckDir = tmp.resolve("ck").toString
    val pages = PageGen.pages(spark, 20)
    pages.write.mode("overwrite").parquet(srcDir)

    val storeDir = tmp.resolve("store").toString
    val inc = new IncrementalMdm(new SnapshotStore(storeDir))
    val stream = spark.readStream
      .schema(pages.schema)
      .option("maxFilesPerTrigger", "2")
      .parquet(srcDir)
    val q = inc.start(stream, ckDir)
    q.awaitTermination(120000)

    val golden = new SnapshotStore(storeDir).read(spark, "golden")
    assert(golden.count() > 0)
    // every input record is accounted for in lineage
    val lineage = golden.select(explode(col("source_record_ids"))).count()
    val cleanCount = Standardize(pages).count()
    assert(lineage == cleanCount)
  }
}
