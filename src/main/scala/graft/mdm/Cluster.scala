package graft.mdm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over match edges, iterated to TRUE fixpoint.
  *
  * The reference runs a fixed 2-hop min-label propagation and calls it
  * "simplified transitive closure"
  * (/root/reference/batch_mdm_gcp/bigquery_utils.py:639-716, caveat at :685)
  * — chains longer than ~3 hops under-merge. Per SURVEY.md §2.9 and the
  * north rule we implement the alternating large-star / small-star
  * algorithm (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SOCC 2014) as a pure DataFrame loop: O(log n) rounds, each
  * round two groupBy-min + join stages; lineage cut by checkpoint every
  * `checkpointEvery` iterations. No GraphX / RDDs (input_hint).
  */
object ConnectedComponents {

  /** edges(src, dst) undirected -> assignments(record_id, cluster_id) where
    * cluster_id = min record id of the component. Nodes present only in
    * `allNodes` (no edges) become singleton clusters (reference J10,
    * bigquery_utils.py:677-682).
    */
  def apply(edges: DataFrame, allNodes: DataFrame, cfg: MatchConfig = MatchConfig()): DataFrame =
    applyWithStats(edges, allNodes, cfg)._1

  /** Same, returning the fixpoint iteration count as a lineage counter.
    *
    * Lineage management: one digest ACTION per iteration materializes the
    * new edge set (the convergence test needs it anyway); the previous
    * iteration's digest is reused, never recomputed. Lineage is CUT every
    * `cfg.checkpointEvery` iterations — `cfg.checkpointDir`-backed reliable
    * checkpoint when set (survives executor loss on a real cluster),
    * localCheckpoint otherwise (local-mode default) — and merely
    * persist()-ed in between, so plans stay shallow without paying a
    * checkpoint write per round.
    */
  def applyWithStats(edges: DataFrame, allNodes: DataFrame,
      cfg: MatchConfig = MatchConfig()): (DataFrame, Int) = {
    val spark = edges.sparkSession
    // Reliable-checkpoint hygiene: `df.checkpoint(true)` files are NOT freed
    // by the ContextCleaner (spark.cleaner.referenceTracking.cleanCheckpoints
    // defaults to false), so a fixpoint loop that checkpoints every round
    // would retain O(iterations) dead files. Each cut gets a fresh
    // setCheckpointDir (fresh uuid subdir); generation k-2's files are
    // deleted once generation k is materialized. Retaining TWO generations
    // (not one) matters at checkpointEvery > 1: a persist-only round's
    // cached frame has lineage into the LATEST generation, and an executor
    // loss right after the next cut would recompute through it — gen k-1
    // must outlive those cached frames (all unpersisted before cut k+1).
    // Only dirs THIS call created are ever deleted — never a caller-set
    // checkpoint dir (the caller may have live checkpoints there). The last
    // two generations survive the call (the returned frame reads the final
    // one); the caller owns their lifetime (see IncrementalMdm's per-batch
    // scope). NOTE: sc.setCheckpointDir is context-GLOBAL, so reliable-
    // checkpointed CC calls must not run concurrently on one SparkContext
    // (true before this cleanup too — interleaved setCheckpointDir already
    // mixed dirs); give concurrent pipelines distinct contexts or dirs.
    var ownCkptGens: List[String] = Nil // newest first
    // Local-mode cut is LAZY (r6, guide §1.2 "remove unnecessary passes"):
    // a lazy localCheckpoint saves its blocks DURING the first action that
    // computes them — and every cut below is immediately followed by the
    // digest action, so the digest doubles as the materializer and each
    // iteration runs ONE job instead of two (measured: the eager
    // cut+digest pair cost ~2 jobs/round of pure scheduling overhead on
    // bench-scale graphs). The reliable-checkpoint path stays EAGER: a lazy
    // reliable checkpoint recomputes the whole lineage in a second pass to
    // write the files, which is strictly worse.
    def cut(df: DataFrame, eager: Boolean = false): DataFrame =
      if (cfg.checkpointDir.isDefined) {
        val sc = spark.sparkContext
        sc.setCheckpointDir(cfg.checkpointDir.get)
        val out = df.checkpoint(true) // eager: materialized before any delete
        ownCkptGens = sc.getCheckpointDir.toList ::: ownCkptGens
        ownCkptGens.drop(2).foreach(CheckpointHygiene.bestEffortDelete(spark, _))
        ownCkptGens = ownCkptGens.take(2)
        out
      } else df.localCheckpoint(eager)

    val e0 = edges.select(col("src").as("u"), col("dst").as("v"))
      .where(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()

    var e = cut(e0)
    var prevDigest = digest(e)
    var toUnpersist: Option[DataFrame] = None
    var converged = false
    var iter = 0
    while (!converged && iter < cfg.maxIterations) {
      iter += 1
      val afterSmall = smallStar(largeStar(e))
      val next =
        if (iter % cfg.checkpointEvery == 0) cut(afterSmall)
        else afterSmall.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nextDigest = digest(next) // action: materializes `next`
      toUnpersist.foreach(_.unpersist())
      toUnpersist = if (iter % cfg.checkpointEvery == 0) None else Some(next)
      converged = nextDigest == prevDigest
      prevDigest = nextDigest
      e = next
    }

    // Loop may exit on a persist-only iteration: the lazy output below still
    // reads `e`, so cut it (eager — this site has no follow-on action to
    // piggyback the materialization on, and the unpersist right after would
    // otherwise force a full-lineage recompute) and THEN release the cached
    // frame — otherwise it stays in executor storage for the session
    // lifetime (one leak per CC call at checkpointEvery > 1).
    toUnpersist.foreach { cached => e = cut(e, eager = true); cached.unpersist(); () }

    // e is now a star forest: (child -> root). Roots map to themselves.
    val assign = e.select(col("v").as("record_id"), col("u").as("cluster_id"))
      .union(e.select(col("u").as("record_id"), col("u").as("cluster_id")))
      .groupBy("record_id").agg(min("cluster_id").as("cluster_id"))

    // singletons: nodes with no edges cluster to themselves
    val out = allNodes.select(col("record_id"))
      .join(assign, Seq("record_id"), "left")
      .select(col("record_id"),
        coalesce(col("cluster_id"), col("record_id")).as("cluster_id"))
    (out, iter)
  }

  /** Large-star: for every node u, connect all strictly-larger neighbors to
    * m(u) = min(u ∪ Γ(u)). Operates on the symmetrized edge list.
    *
    * NO trailing distinct (r6, guide §2.4 "remove shuffles outright"): the
    * only consumer is [[smallStar]], whose min-aggregates are duplicate-
    * insensitive (map-side combine absorbs dup edges before the exchange)
    * and whose OWN trailing distinct restores set semantics before the
    * digest — so dropping this one removes a full shuffle per fixpoint
    * round without changing any iterate. Duplication is bounded: an edge
    * (v, m) is emitted once per (u, v) input edge, i.e. at most deg(v)
    * copies, the same fan-in the groupBy below already absorbs. */
  private[mdm] def largeStar(e: DataFrame): DataFrame = {
    val n = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = n.groupBy("u")
      .agg(min("v").as("minv"))
      .select(col("u"), least(col("u"), col("minv")).as("m"))
    n.join(mins, Seq("u"))
      .where(col("v") > col("u"))
      .select(least(col("v"), col("m")).as("u"), greatest(col("v"), col("m")).as("v"))
      .where(col("u") =!= col("v"))
  }

  /** Small-star: for every node u, connect all smaller-or-equal neighbors
    * (and u itself) to m(u) = min over those neighbors. */
  private[mdm] def smallStar(e: DataFrame): DataFrame = {
    // orient edges high -> low: key = max endpoint, nbr = min endpoint
    val o = e.select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    val mins = o.groupBy("u").agg(min("v").as("m"))
    val relink = o.join(mins, Seq("u"))
      .select(greatest(col("v"), col("m")).as("u"), least(col("v"), col("m")).as("v"))
    val self = mins.select(col("u"), col("m").as("v"))
    relink.union(self)
      .where(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
  }

  /** Order-independent digest of an edge set: (count, xor of row hashes).
    * bit_xor (not sum) — cannot overflow under ANSI mode (Spark 4 default). */
  private def digest(e: DataFrame): (Long, Long) = {
    val r = e.agg(
      count(lit(1)).as("c"),
      coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("h"))
      .head()
    (r.getLong(0), r.getLong(1))
  }
}
