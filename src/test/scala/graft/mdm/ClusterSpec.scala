package graft.mdm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Connected components vs an in-memory union-find oracle (SURVEY.md §5). */
class ClusterSpec extends SparkSpec {

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(i => i)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); var c = x
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private def ccSpark(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val e = spark.createDataFrame(edges).toDF("src", "dst")
    val nodes = spark.range(n.toLong).toDF("record_id")
    ConnectedComponents(e, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("5-node chain merges fully (reference 2-hop propagation under-merges this)") {
    // FIXTURES.md §C: A-B, B-C, C-D, D-E must become ONE cluster; the
    // reference's fixed 2-iteration propagation (bigquery_utils.py:686-716)
    // leaves long chains split — we iterate to fixpoint instead.
    val got = ccSpark(5, Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)))
    assert(got.values.toSet.size == 1)
    assert(got.values.forall(_ == 0L))
  }

  test("singletons, self-loops, duplicate and reversed edges handled") {
    val got = ccSpark(6, Seq((1L, 2L), (2L, 1L), (3L, 3L), (4L, 5L), (4L, 5L)))
    assert(got(0L) == 0L && got(3L) == 3L)
    assert(got(1L) == got(2L))
    assert(got(4L) == got(5L))
    assert(got(1L) != got(4L))
  }

  test("property: equals union-find oracle on random graphs (seeded)") {
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { trial =>
      val n = 2 + rnd.nextInt(59)
      val m = 1 + rnd.nextInt(90)
      val edges = (1 to m)
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val oracle = unionFind(n, edges)
        val got = ccSpark(n, edges)
        assert(got == oracle, s"trial $trial: n=$n edges=$edges")
      }
    }
  }

  test("pathological: star + long path converge within iteration budget") {
    val star = (1L to 30L).map(i => (0L, i))
    val path = (40L until 70L).map(i => (i, i + 1))
    val got = ccSpark(71, star ++ path)
    assert(got.filter(_._1 <= 30L).values.toSet == Set(0L))
    assert(got.filter(_._1 >= 40L).values.toSet == Set(40L))
    assert((31L to 39L).forall(i => got(i) == i))
  }

  test("1000-hop chain converges with RELIABLE checkpointing exercised (VERDICT r1 #9)") {
    // localCheckpoint keeps lineage cuts in executor memory — lost with the
    // executor on a real cluster. cfg.checkpointDir switches the cut to a
    // reliable store; this pins that path end-to-end and the O(log n)
    // round bound on the worst-case (single long chain) topology.
    val ckDir = java.nio.file.Files.createTempDirectory("graft-cc-ck").toString
    val n = 1001
    val edges = spark.range(1000).selectExpr("id AS src", "id + 1 AS dst")
    val nodes = spark.range(n.toLong).toDF("record_id")
    val cfg = MatchConfig(checkpointDir = Some(ckDir), checkpointEvery = 2)
    val (assign, iters) = ConnectedComponents.applyWithStats(edges, nodes, cfg)
    val labels = assign.select("cluster_id").distinct().collect().map(_.getLong(0))
    assert(labels.toSet == Set(0L), "1000-hop chain must collapse to cluster 0")
    assert(iters <= 15, s"large-star/small-star should need O(log n) rounds, took $iters")
    // the reliable checkpoint directory was actually written
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
      .filter(p => java.nio.file.Files.isRegularFile(p)).count()
    assert(wrote > 0, "reliable checkpoint dir is empty — checkpoint() not exercised")
    // ... and retention is O(1), not O(iterations): each cut deletes
    // generation k-2's dead files (ContextCleaner never frees reliable
    // checkpoints), so at most TWO uuid generation dirs survive — the one
    // the returned frame reads plus its predecessor (kept because
    // persist-only rounds' cached frames carry lineage into it).
    val gens = java.nio.file.Files.list(java.nio.file.Paths.get(ckDir))
      .filter(p => java.nio.file.Files.isDirectory(p)).count()
    assert(gens <= 2,
      s"expected <=2 surviving checkpoint generations, found $gens — dead rounds leaked")
    // the survivor is live: the returned assignment must still be readable
    assert(assign.count() == n.toLong)
  }
}
