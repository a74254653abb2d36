package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting over an undirected edge list — the classic
  * MapReduce graph analytic (Cohen 2009, "Graph Twiddling in a MapReduce
  * World", CiSE; Suri & Vassilvitskii 2011 WWW) recomposed as two
  * relational joins that Catalyst plans whole.
  *
  * The naive wedge join (edges ⋈ edges on the shared endpoint) explodes
  * on hubs: a degree-d node contributes d² wedge rows, and real graphs'
  * power-law hubs make Σd² catastrophically superlinear. The standard
  * fix — the whole reason this operator is its own algorithm and not
  * just three joins — is DEGREE ORIENTATION (compact-forward): direct
  * every edge from its lower-(degree, id) endpoint to the higher one.
  * The oriented out-degree is bounded by O(√m) REGARDLESS of how skewed
  * the degree distribution is (a node keeps an out-edge only toward
  * neighbors of even higher degree, and at most √(2m) nodes can have
  * degree ≥ √(2m)), so the wedge relation is O(m^1.5) worst-case and
  * near-linear on sparse graphs — the hub's d² term is gone
  * (AdversarialProbe's hot-hub shape pins this empirically).
  *
  * For a triangle whose nodes order x < y < z by (degree, id), the
  * orientation gives exactly the edges x→y, x→z, y→z: only x holds two
  * out-edges, and ordering the wedge pair by the SAME (degree, id) key
  * makes the closing edge exactly y→z — so the count is exact with no
  * multiplicity correction, and (crucially for the plan) the closing
  * probe is a single EQUI-join on (y, z); an orientation-agnostic
  * formulation needs an OR of both directions, which Catalyst can only
  * run as a nested-loop join.
  *
  * Every step is plain relational algebra, so the registered query
  * hash-checks against a DuckDB mirror of the same orientation — an
  * exact, engine-independent answer, not an estimate.
  */
object Triangles {

  /** Canonical undirected edge set: (a, b) with a < b, self-loops and
    * duplicates dropped. */
  def canonicalEdges(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** Degree-oriented edge list (u, v, dv): u → v with
    * (deg(u), u) < (deg(v), v); dv rides along so downstream wedge
    * ordering can reuse the orientation key without re-joining degrees. */
  def orient(und: DataFrame): DataFrame = {
    val deg = und.select(col("a").as("node")).union(und.select(col("b").as("node")))
      .groupBy("node").agg(org.apache.spark.sql.functions.count(lit(1)).as("deg"))
    und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v"), col("db").as("dv")))
          .otherwise(
            struct(col("b").as("u"), col("a").as("v"), col("da").as("dv"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
  }

  /** Global triangle count (one row: n_triangles). */
  def count(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val oriented = orient(canonicalEdges(edges, srcCol, dstCol)).persist()
    // wedges out of u, pair ordered by the orientation key (dv, v) —
    // the closing edge is then exactly lowKey → highKey
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.u") === col("e2.u") &&
          (col("e1.dv") < col("e2.dv") ||
            (col("e1.dv") === col("e2.dv") && col("e1.v") < col("e2.v"))))
      .select(col("e1.v").as("wu"), col("e2.v").as("wv"))
    val closed = wedges.join(oriented,
      col("wu") === col("u") && col("wv") === col("v"))
    // one-row answer: materialize it eagerly so the oriented pin can be
    // released here instead of leaking into the session's block manager
    val out = closed
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_triangles"))
      .localCheckpoint()
    oriented.unpersist(blocking = false)
    out
  }
}
