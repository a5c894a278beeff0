package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the clustering step that turns
  * verified near-dup pairs into canonical cluster ids (keep min-id doc per
  * cluster, drop the rest).
  *
  * Min-label propagation: every node adopts the smallest label among
  * itself and its neighbors until fixpoint — O(component diameter)
  * iterations of one equi-join + partial-agg'd groupBy each. Dedup graphs
  * have tiny diameters (dup clusters are near-cliques), so this converges
  * in 2-3 rounds at any corpus size.
  *
  * Each round ends in `localCheckpoint`, not `persist`: the round's plan
  * references the previous labels twice (through nbrMin and the join), so
  * without lineage truncation the logical plan doubles per round —
  * exponential analysis cost that OOMs the driver near 20 rounds
  * (persist caches execution but Catalyst still walks the full tree).
  */
object Cluster {

  /** Edge-count gate below which components are solved with a driver-side
    * union-find instead of the iterative propagation loop. The loop costs
    * O(diameter) driver-synchronized rounds of two jobs each — pure
    * latency when the dup GRAPH (edges above threshold, not the corpus)
    * is small, which it almost always is: a mostly-unique corpus yields
    * few verified near-dup pairs. A union-find over E edges is O(E·α(E))
    * driver work and ONE collect of graph-sized data (1M edges ≈ 16 MB —
    * the same class of driver bound as a broadcast threshold, and
    * explicitly capped, unlike a corpus-sized collect). Graphs above the
    * cap take the distributed loop; the labels are identical either way
    * (min id of the component). */
  val MaxDriverEdges: Long = 1000000L

  /** @param edges (id_a, id_b) undirected pairs
    * @param nodes one `id` column — universe of nodes (members of no edge
    *              become singleton clusters)
    * @param driverEdgeCap override of [[MaxDriverEdges]]; a NEGATIVE cap
    *                      means "always take the distributed loop" (the
    *                      spec hook — 0 would still admit an EMPTY graph
    *                      to the driver path, so it can't force the loop)
    * @return (id, cluster) with cluster = min id of the component
    */
  def connectedComponents(edges: DataFrame, nodes: DataFrame,
      maxIter: Int = 20, driverEdgeCap: Long = MaxDriverEdges): DataFrame = {
    val spark0 = edges.sparkSession
    // NULL endpoints are dropped HERE, once, so both solver paths see the
    // same graph by construction: a NULL id can never name a component
    // member — the loop's equi-joins would silently never match it (while
    // still emitting a meaningless (NULL, NULL) label row), and the
    // driver path's getLong would NPE. One filter, one contract, and
    // small- and large-graph paths fail (or rather: don't) identically.
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .persist()
    // the count doubles as sym's cache materialization (the loop's first
    // join would pay the same job), so the gate costs no extra pass
    val nSym = sym.count()
    if (driverEdgeCap >= 0 && nSym / 2 <= driverEdgeCap) {
      // collect from the MATERIALIZED sym cache, not the bare `edges`
      // subtree: CacheManager matches plans structurally, so an
      // edges.collect() would re-execute the whole upstream edge-producing
      // pipeline (e.g. the near-dup pair verification join) a third time.
      // sym carries each edge twice (both directions) — duplicates and
      // reversed pairs are no-ops to the union-find.
      val pairs = sym.collect()
      val parent = new scala.collection.mutable.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      pairs.foreach { row =>
        val a = row.getLong(0); val b = row.getLong(1)
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val ra = find(a); val rb = find(b)
        // union by MIN ROOT, so the final root of every component is its
        // smallest member — the same canonical label the loop converges to
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val labelRows = parent.keysIterator.map(id => (id, find(id))).toSeq
      import spark0.implicits._
      val labels = labelRows.toDF("id", "cluster")
      val singletons = nodes.select(col("id")).distinct()
        .join(labels.select(col("id")), Seq("id"), "left_anti")
        .withColumn("cluster", col("id"))
      sym.unpersist()
      return labels.unionAll(singletons)
    }
    // Iterate over edge endpoints only: non-endpoint nodes are singleton
    // clusters by definition and would just ride through every round's
    // join unchanged — at corpus scale the propagation loop then costs
    // O(dup docs × diameter), not O(corpus × diameter). Singletons are
    // united back in one final anti-join.
    // localCheckpoint persists at the RDD level, which Dataset.unpersist
    // does NOT reach (it only clears CacheManager entries) — so read each
    // checkpoint's own RDD id from its plan (Bridge.checkpointRddId) and
    // free the previous round's directly, or O(diameter) label copies pile
    // up in executor storage. (A getPersistentRDDs before/after diff would
    // over-capture caches co-materialized by the same job — e.g. `sym` or
    // session-memoized bases — and free them out from under their owners.)
    val sc = edges.sparkSession.sparkContext
    def free(id: Option[Int]): Unit =
      id.foreach(i => sc.getPersistentRDDs.get(i).foreach(_.unpersist(blocking = false)))
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id")).localCheckpoint()
    var labelRddId = org.apache.spark.sql.graft.Bridge.checkpointRddId(labels)
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("cluster").as("dst_cluster")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("dst_cluster").as("nbr_min"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nbr_min"), col("cluster"))).as("cluster"),
          col("cluster").as("prev"))
        .localCheckpoint()   // eager: materialized on return
      changed = next.where(col("cluster") =!= col("prev")).count()
      free(labelRddId)   // the new checkpoint does not depend on the old
      labelRddId = org.apache.spark.sql.graft.Bridge.checkpointRddId(next)
      labels = next.drop("prev")
      it += 1
    }
    val singletons = nodes.select(col("id")).distinct()
      .join(labels.select(col("id")), Seq("id"), "left_anti")
      .withColumn("cluster", col("id"))
    val all = labels.unionAll(singletons)
    sym.unpersist()
    if (changed > 0) {
      free(labelRddId)   // don't leak the last checkpoint on the error path
      // Surface loudly: callers (train_test_split) build leakage-safety on
      // these labels; silently-wrong canonical ids would leak near-dups
      // across the split with no signal.
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter iterations " +
          s"($changed labels still changing) — component diameter exceeds " +
          "maxIter; raise maxIter or pre-contract the graph")
    }
    all
  }
}
