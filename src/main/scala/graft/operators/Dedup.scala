package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Deduplication operators over `documents`. Exact dedup is here; MinHash/
  * SimHash/Jaccard/embedding variants live alongside and register their own
  * queries as they land.
  */
object Dedup {

  /** Exact dedup: canonical id per identical text. One scan, one shuffle:
    * project to (doc_id, md5 fingerprint) — at 100 TB you shuffle 16-byte
    * keys, not document bodies — and take the per-fingerprint min via a
    * window (the groupBy+join-back formulation read the corpus twice).
    */
  def exactCanonical(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("fp")
    docs
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .withColumn("canonical_id", min("doc_id").over(w))
      .select("doc_id", "canonical_id")
  }

  /** Connected components over an undirected edge list — the exact closure
    * of pairwise near-dup relations into canonical clusters (the one-pass
    * min-over-shared-bucket canonicalization in MinHash/SimHash is the
    * cheap approximation; this is the fixpoint).
    *
    * Iterative min-label propagation: each round every vertex takes the min
    * of its own label and its neighbors' labels; converged when no label
    * changes. O(diameter) rounds of two shuffles each; `localCheckpoint`
    * truncates the lineage so 50 rounds don't build a 100-stage plan. At
    * 100 TB diameters are small for near-dup graphs (clusters are dense);
    * for adversarial chain graphs switch to large-star/small-star, which
    * contracts in O(log n) rounds on the same join primitive.
    */
  def connectedComponents(
      vertices: DataFrame, // one column: vertex id (long)
      edges: DataFrame,    // two columns: endpoint ids
      maxIter: Int = 50,
      /** graphs whose edge AND vertex counts fit under this bound are
        * solved with driver-side union-find (one collect, no iteration) —
        * the iterative path costs ~4 Spark jobs per round, which dominates
        * small graphs; large graphs take the distributed path. The same
        * adaptive shape as broadcast-join thresholds.
        */
      collectThreshold: Long = 1000000L,
  ): DataFrame = {
    val vCol = vertices.columns.head
    // comp labels are the min vertex id, carried as long — fail fast on
    // non-integral ids (a silent cast would null every label and converge
    // immediately to garbage)
    require({
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      Set[org.apache.spark.sql.types.DataType](ByteType, ShortType, IntegerType, LongType)(
        vertices.schema(vCol).dataType)
    }, s"vertex id column $vCol must be integral (got ${vertices.schema(vCol).dataType.simpleString})")
    val (ea, eb) = (edges.columns(0), edges.columns(1))
    // materialize the edge list ONCE — it joins into every round, and an
    // expensive upstream (e.g. an O(N²) similarity join) must not re-run
    // per iteration
    val spark = vertices.sparkSession
    val vtx = vertices.select(col(vCol).cast("long").as("id")).localCheckpoint(true)
    val edg = edges.select(col(ea).cast("long").as("a"), col(eb).cast("long").as("b"))
      .localCheckpoint(true)
    val nV = vtx.count()
    val nE = edg.count()
    if (nV <= collectThreshold && nE <= collectThreshold) {
      // driver union-find with path compression; roots resolved to the
      // component's min id. Edges with an endpoint outside the vertex set
      // are ignored — the same contract the distributed path enforces
      // (label joins drop unknown endpoints), so results never depend on
      // which path the size heuristic picks.
      val ids = vtx.collect().map(_.getLong(0))
      val known = ids.toSet
      val parent = scala.collection.mutable.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edg.collect().foreach { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        if (known(a) && known(b)) {
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
      }
      val minOfRoot = scala.collection.mutable.HashMap[Long, Long]()
      ids.foreach { id =>
        val r = find(id)
        minOfRoot(r) = math.min(minOfRoot.getOrElse(r, Long.MaxValue), id)
      }
      import spark.implicits._
      return ids.toSeq.map(id => (id, minOfRoot(find(id)))).toDF("id", "comp")
    }

    val sym = edg.select(col("a").as("src"), col("b").as("dst"))
      .union(edg.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint(true)
    var labels = vtx.select(col("id"), col("id").as("comp"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // neighbor-min step: each vertex takes the min label in its closed
      // neighborhood
      val nbrMin = sym.join(labels, sym("src") === labels("id"))
        .groupBy(col("dst").as("id2"))
        .agg(min("comp").as("nbr_comp"))
      val stepped = labels
        .join(nbrMin, labels("id") === col("id2"), "left")
        .select(col("id"), col("comp").as("old_comp"),
          least(col("comp"), col("nbr_comp")).as("mid"))
      // pointer-jump step: comp := label(comp) — labels only decrease, so
      // this contracts label chains and drops the round count from
      // O(diameter) to O(log diameter)
      val jump = labels.select(col("id").as("jid"), col("comp").as("jcomp"))
      val updated = stepped
        .join(jump, stepped("mid") === col("jid"), "left")
        .select(col("id"), least(col("mid"), col("jcomp")).as("comp"),
          (least(col("mid"), col("jcomp")) < col("old_comp")).as("changed"))
        .localCheckpoint(true)
      converged = updated.filter(col("changed")).limit(1).count() == 0
      labels = updated.select("id", "comp")
      iter += 1
    }
    labels
  }

  val queries: Seq[Q] = Seq(
    Q(
      "d_exact_dup",
      (s, dir) => exactCanonical(Tables(s, dir, "documents")).orderBy("doc_id"),
      Some("""
        SELECT d.doc_id, m.canonical_id
        FROM documents d
        JOIN (SELECT md5(text) AS fp, MIN(doc_id) AS canonical_id
              FROM documents GROUP BY md5(text)) m
          ON md5(d.text) = m.fp
        ORDER BY d.doc_id"""),
    )
  )
}
