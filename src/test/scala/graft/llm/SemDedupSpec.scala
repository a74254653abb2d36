package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Semantic dedup ([[Embeddings.semanticDedup]]) contracts. The registry
  * entry is rows-only (a SQL oracle can't re-run KMeans), so this spec
  * carries the correctness weight:
  *   - output ⊆ exact all-pairs cosine at the same threshold,
  *   - output == the exact pairs RESTRICTED to co-clustered ids (the
  *     clustering is the only recall loss — the verify arithmetic is
  *     bit-identical to the exact kernel),
  *   - sub-blocking is plan-shape only (subBlocks never changes rows),
  *   - planted near-dup groups are fully recalled and survivors keep
  *     exactly the min id per duplicate group.
  */
class SemDedupSpec extends SparkTestBase {

  private val dim = 8

  /** 60 base vectors with ~orthogonal noise + 20 planted near-dups
    * (cos ≥ 0.99 to their base, background pairs well below 0.6). */
  private def planted(): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val base = (0 until 60).map { i =>
      (i.toLong, unit(Array.fill(dim)(rnd.nextGaussian().toFloat)))
    }
    val dups = (0 until 20).map { j =>
      val (bid, bv) = base(j * 3)
      val noisy = unit(bv.map(x => x + 0.02f * rnd.nextGaussian().toFloat))
      (1000L + bid, noisy)
    }
    (base ++ dups).toDF("vec_id", "embedding")
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("id1"), col("id2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("subset of exact; equal to exact restricted to co-clustered pairs") {
    val emb = graft.core.Tables.embeddings(spark, sf0001)
    val thr = 0.45
    val sem = pairSet(Embeddings.semanticDedup(
      emb, "vec_id", "embedding", 64, thr, nlist = 16, corpusKey = "semspec1"))
    val exact = pairSet(Embeddings.cosineDedup(emb, "vec_id", "embedding", 64, thr))
    assert(sem.subsetOf(exact), s"${(sem -- exact).take(5)} not in exact")
    val cells = Ivf.cachedIndex(emb, "vec_id", "embedding", 64, 16, 42L, "semspec1")
      .assigned.select(col("id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val coClustered = exact.filter { case (a, b) => cells(a) == cells(b) }
    assert(sem == coClustered,
      s"missing=${(coClustered -- sem).take(5)} extra=${(sem -- coClustered).take(5)}")
  }

  test("sub-blocking never changes the output rows") {
    val emb = planted()
    val a = pairSet(Embeddings.semanticDedup(
      emb, "vec_id", "embedding", dim, 0.9, nlist = 8, subBlocks = 1,
      corpusKey = "semspec2"))
    val b = pairSet(Embeddings.semanticDedup(
      emb, "vec_id", "embedding", dim, 0.9, nlist = 8, subBlocks = 7,
      corpusKey = "semspec2"))
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("planted near-dups are fully recalled; survivors keep min id per group") {
    val emb = planted()
    val sem = pairSet(Embeddings.semanticDedup(
      emb, "vec_id", "embedding", dim, 0.9, nlist = 8, corpusKey = "semspec3"))
    val exact = pairSet(Embeddings.cosineDedup(emb, "vec_id", "embedding", dim, 0.9))
    // the planted pairs sit at cos ≥ ~0.99 in a corpus whose background
    // similarity is far below the threshold: k-means must co-cluster them
    assert(sem == exact, s"recall loss: ${(exact -- sem).take(5)}")
    assert(exact.size >= 20) // every planted dup found

    val survivors = Embeddings.semanticSurvivors(
        emb, "vec_id", "embedding", dim, 0.9, nlist = 8, corpusKey = "semspec3")
      .collect().map(_.getLong(0)).toSet
    // expected survivors: union-find over the exact pair graph, keep the
    // minimum id of each component plus every unpaired id — computed
    // independently of semanticSurvivors' distributed components
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    exact.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val all = emb.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val expected = all.filter(id => !parent.contains(id) || find(id) == id)
    assert(survivors == expected,
      s"missing=${(expected -- survivors).take(5)} extra=${(survivors -- expected).take(5)}")
    // in particular every planted 1000+ dup is removed
    assert(exact.flatMap { case (a, b) => Seq(a, b) }.count(_ >= 1000L) >= 20)
  }
}
