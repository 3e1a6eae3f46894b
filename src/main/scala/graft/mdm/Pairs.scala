package graft.mdm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Candidate pair generation: blocked self-join with the reference's
  * `a.record_id < b.record_id` dedup predicate kept verbatim
  * (/root/reference/batch_mdm_gcp/bigquery_utils.py:332 — 80,656 -> 40,186
  * pairs rationale, MDM_BATCH_RESULTS.md:355-368), plus explicit skew
  * handling: hot block keys are triangle-split into bounded cells so no
  * single task materializes a quadratic block (north_rule: "salted
  * self-joins with explicit skew splitting of hot keys"; SURVEY.md §4).
  */
object Pairs {

  /** (record_id, block_key) -> distinct (id1, id2) candidate pairs, id1<id2.
    *
    * Completeness under splitting: a member of a hot block with salt group g
    * is replicated into every triangle cell (i,j), i<=j, where g∈{i,j}; a
    * pair with salt groups (ga,gb) is emitted only by cell
    * (min(ga,gb), max(ga,gb)) — each qualifying pair exactly once
    * (exhaustiveness property-tested in PairsSpec).
    */
  def candidates(blockKeys: DataFrame, cfg: MatchConfig): DataFrame = {
    val sizes = blockKeys.groupBy("block_key").agg(count(lit(1)).as("bsize"))
    // O5 stop-word-block cap: keys shared by more than the ceiling carry no
    // discriminating evidence at web scale, only quadratic cost (opt-in).
    val usable = cfg.dropBlocksLargerThan match {
      case Some(ceilN) => sizes.where(col("bsize") > 1 && col("bsize") <= ceilN)
      case None => sizes.where(col("bsize") > 1)
    }
    val keyed = blockKeys.join(usable, Seq("block_key"))

    // salt-group count per block: 1 for normal blocks, ceil(size/cap) capped
    // at cfg.maxSaltGroups for pathological keys
    val nGroups = least(ceil(col("bsize") / lit(cfg.maxBlockSize.toDouble)),
      lit(cfg.maxSaltGroups.toLong)).cast("int")
    val g = pmod(xxhash64(col("record_id"), col("block_key")), nGroups.cast("long")).cast("int")

    val members = keyed
      .withColumn("ng", nGroups)
      .withColumn("g", g)
      .withColumn("cells",
        // cells (i, g) for i<g plus (g, j) for j>=g  — ng cells per member
        concat(
          when(col("g") === 0, array().cast("array<struct<ci:int,cj:int>>"))
            .otherwise(transform(sequence(lit(0), col("g") - 1, lit(1)),
              i => struct(i.as("ci"), col("g").as("cj")))),
          transform(sequence(col("g"), col("ng") - 1, lit(1)),
            j => struct(col("g").as("ci"), j.as("cj")))))
      .withColumn("cell", explode(col("cells")))
      .select(col("block_key"), col("cell"), col("record_id"), col("g"))

    val a = members.select(
      col("block_key").as("bk1"), col("cell").as("cell1"),
      col("record_id").as("id1"), col("g").as("g1"))
    val b = members.select(
      col("block_key").as("bk2"), col("cell").as("cell2"),
      col("record_id").as("id2"), col("g").as("g2"))

    a.join(b,
        col("bk1") === col("bk2") && col("cell1") === col("cell2") &&
          col("id1") < col("id2"))
      // each pair exactly once: only the cell matching its own salt groups
      .where(least(col("g1"), col("g2")) === col("cell1.ci") &&
        greatest(col("g1"), col("g2")) === col("cell1.cj"))
      .select("id1", "id2")
      .distinct() // a pair may share several block keys (domain AND bands)
  }

  /** O5 observability (VERDICT r3 next #7): how much the stop-word-block cap
    * actually dropped — blocks over the ceiling and the member rows inside
    * them. A production 100-TB run wants the cap ON and auditable; lineage
    * counters make silent coverage loss visible in the snapshot manifest.
    * Empty when the cap is off (the oracle-default). Single-row metadata
    * aggregate — not a data-path collect. */
  def droppedBlockStats(blockKeys: DataFrame, cfg: MatchConfig): Map[String, Long] =
    cfg.dropBlocksLargerThan match {
      case None => Map.empty
      case Some(ceilN) =>
        val r = blockKeys.groupBy("block_key").agg(count(lit(1)).as("bsize"))
          .where(col("bsize") > ceilN)
          .agg(count(lit(1)).as("nb"), coalesce(sum(col("bsize")), lit(0L)).as("nr"))
          .collect()(0)
        Map("blocks_dropped" -> r.getLong(0), "rows_in_dropped_blocks" -> r.getLong(1))
    }

  /** Attach both sides' attributes to candidate pairs. The two join inputs
    * are the same (already-blocked) clean dataset — Spark plans these as
    * shuffled hash / sort-merge joins on the id; at 100 TB the clean side is
    * bucketed by record_id so both attach joins co-locate. */
  def attach(cands: DataFrame, cleanWithSig: DataFrame): DataFrame = {
    val cols = cleanWithSig.columns
    val aSide = cleanWithSig.toDF(cols.map(c => s"a_$c"): _*)
    val bSide = cleanWithSig.toDF(cols.map(c => s"b_$c"): _*)
    cands
      .join(aSide, col("id1") === col("a_record_id"))
      .join(bSide, col("id2") === col("b_record_id"))
  }
}
