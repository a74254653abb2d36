package graft.llm

import org.apache.spark.sql.functions._
import graft.{SparkTestBase}
import graft.core.Tables

/** Properties for the LLM-pipeline ops whose outputs are probabilistic
  * (SimHash, sign-LSH ANN) or need invariants beyond the DuckDB oracle. */
class LlmSpec extends SparkTestBase {

  private lazy val docs = Tables.documents(spark, sf0001).cache()
  private lazy val emb = Tables.embeddings(spark, sf0001).cache()

  test("exact dedup collapses planted duplicate texts") {
    import spark.implicits._
    val dup = docs.limit(3).select($"doc_id" + 10000, $"text")
      .toDF("doc_id", "text")
    val d = docs.select($"doc_id", $"text").union(dup)
    val res = TextDedup.exact(d, "doc_id", "text")
    assert(res.count() == docs.count()) // dup texts merged into one group
    assert(res.filter($"copies" === 2).count() == 3)
    assert(res.agg(sum($"copies")).first().getLong(0) == docs.count() + 3)
  }

  test("minhash-LSH pairs equal exact all-pairs Jaccard at the threshold") {
    val sh = TextDedup.shingles(docs, "doc_id", "text")
    // exact all-pairs via unrestricted candidate set (any shared shingle)
    val allCands = sh.as("x").join(sh.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id1"), col("y.id").as("id2")).distinct()
    val exact = TextDedup.verifyJaccard(allCands, sh)
      .filter(col("jaccard") >= 0.8)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TextDedup.minhashLsh(docs, "doc_id", "text", threshold = 0.8)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
    assert(exact.nonEmpty) // testdata plants near-dups; guard against vacuity
  }

  test("simhash: identical word multisets collide at hamming 0; bound holds") {
    import spark.implicits._
    val rows = TextDedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getInt(2) <= 3))
    // planted exact dup: same text under two ids must be found at hamming 0
    val dup = docs.limit(2).select($"doc_id" + 10000, $"text").toDF("doc_id", "text")
    val found = TextDedup.simhashPairs(
        docs.select($"doc_id", $"text").union(dup), "doc_id", "text", 3)
      .filter($"hamming" === 0 && $"id2" >= 10000)
    assert(found.count() >= 2)
  }

  test("simhash banding is lossless: equals brute-force hamming over signatures") {
    val sigs = TextDedup.simhashSignatures(docs, "doc_id", "text")
    val brute = sigs.as("a").join(sigs.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val banded = TextDedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute) // pigeonhole recall is exact, not probabilistic
  }

  test("sign-LSH ANN attains high recall vs brute-force top-k") {
    val qids = (0L until 8L)
    val brute = Embeddings.bruteForceKnn(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", 64, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Embeddings.annLshKnn(emb, qids, "vec_id", "embedding", 64, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect ann).size.toDouble / brute.size
    assert(recall >= 0.5, s"ANN recall $recall too low")
  }

  test("sign-LSH multi-word signatures: 128 bits / 32 bands matches 64-bit recall") {
    // the 100 TB knob: grow the bucket space by lengthening the signature
    // at the same per-band width — signatures are arrays of 64-bit words,
    // so bits > 64 must be first-class, deterministic, and at least as
    // recalled as the short signature at equal band width
    val qids = (0L until 8L)
    val brute = Embeddings.bruteForceKnn(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", 64, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def run() = Embeddings.annLshKnn(emb, qids, "vec_id", "embedding", 64, 5,
        bits = 128, bands = 32)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = run()
    assert(run() == ann) // deterministic hyperplanes -> same result on rerun
    assert(ann.map(_._1) == qids.toSet)
    val recall = (brute intersect ann).size.toDouble / brute.size
    assert(recall >= 0.5, s"128-bit ANN recall $recall too low")
  }

  test("hot-shingle split verify equals plain verify on a crowded corpus") {
    import spark.implicits._
    // 30-copy crowd => every crowd shingle has df ~30 (hot at cap 8);
    // plus a universal tail so even singleton docs share hot shingles
    val crowd = (0 until 30).map(i => (i.toLong,
      s"alpha beta gamma delta epsilon zeta v$i common tail words"))
    val singles = (100 until 120).map(i => (i.toLong,
      s"doc $i unique body number ${i * 7} common tail words"))
    val docs2 = (crowd ++ singles).toDF("doc_id", "text")
    val sh = TextDedup.shingles(docs2, "doc_id", "text")
    val allCands = sh.as("x").join(sh.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id1"), col("y.id").as("id2")).distinct()
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val plain = asMap(TextDedup.verifyJaccard(allCands, sh))
    val split = asMap(TextDedup.verifyJaccardSplit(allCands, sh, dfCap = 8))
    assert(split == plain) // same pairs, bit-identical jaccard
    assert(plain.nonEmpty)
    // end-to-end: the join is unchanged by the cap on this corpus
    val viaJoin = TextDedup.ngramJaccardJoin(docs2, "doc_id", "text", 0.5, dfCap = 8)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = plain.filter(_._2 >= 0.5).keySet
    assert(viaJoin == exact)
  }

  test("blocked cosine dedup equals the all-pairs form exactly") {
    val exact = Embeddings.cosineDedup(emb, "vec_id", "embedding", 64, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val blocked = Embeddings.cosineDedupBlocked(emb, "vec_id", "embedding", 64, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(blocked == exact) // same pairs AND bit-identical cosines
    assert(exact.nonEmpty)
  }

  test("LSH cosine dedup: verified subset always; full recall on a gapped corpus") {
    import spark.implicits._
    // registry corpus (gapless at 0.45): subset-of-exact must hold
    val exact = Embeddings.cosineDedup(emb, "vec_id", "embedding", 64, 0.45)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Embeddings.cosineDedupLsh(emb, "vec_id", "embedding", 64, 0.45,
        bits = 60, bands = 10)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    // gapped corpus (near-dups at cos ~0.99, background ~orthogonal):
    // deterministic fixed-seed vectors + fixed hyperplanes => no flake
    val rnd = new scala.util.Random(7)
    val base = (0 until 100).map(i => (i.toLong,
      Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)))
    val dups = base.take(20).map { case (id, v) =>
      (id + 1000L, v.map(x => x + (rnd.nextDouble() * 0.02 - 0.01).toFloat))
    }
    val corpus = (base ++ dups).toDF("vec_id", "embedding")
    val found = Embeddings.cosineDedupLsh(corpus, "vec_id", "embedding", 64, 0.9,
        bits = 60, bands = 10)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 20).map(i => (i.toLong, i + 1000L)).toSet
    assert(planted.subsetOf(found), s"missed ${planted -- found}")
  }

  test("fingerprint is deterministic and edit-sensitive") {
    import spark.implicits._
    val d = Seq((1L, "the quick brown fox jumps over the lazy dog"),
                (2L, "the quick brown fox jumps over the lazy dog"),
                (3L, "an entirely different document body here")).toDF("doc_id", "text")
    val fp = TextStats.fingerprint(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("graft_mingram equals the declarative min-over-md5-grams formula") {
    import spark.implicits._
    // exercises short-text clamping, the ASCII fast path, and the
    // multibyte char->byte offset table
    val d = Seq((1L, "ab"), (2L, "abcdefghijklmno"), (3L, "héllo wörld ünïcode"),
      (4L, "日本語のテキスト行です"), (5L, "mixed ascii と 日本語 text"))
      .toDF("doc_id", "text")
    val fast = TextStats.fingerprint(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val slow = d.selectExpr("doc_id",
      """array_min(transform(sequence(1, greatest(length(text) - 7, 1)),
        |  i -> md5(substr(text, i, 8)))) AS fp""".stripMargin).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fast == slow)
  }

  test("ngram prefix-filter join loses no qualifying pair (lossless filter)") {
    val sh = TextDedup.shingles(docs, "doc_id", "text")
    val allCands = sh.as("x").join(sh.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id1"), col("y.id").as("id2")).distinct()
    val exact = TextDedup.verifyJaccard(allCands, sh)
      .filter(col("jaccard") >= 0.5).count()
    val prefix = TextDedup.ngramJaccardJoin(docs, "doc_id", "text", 0.5).count()
    assert(prefix == exact)
  }

  test("signLshBands straddle stitching (bits=96) matches reference extraction") {
    import spark.implicits._
    // bandBits = 6 does not divide 64: bands at lo = 60, 120, ... span
    // two signature words — the mask-and-shift stitch is the scale knob
    // for >64-bit signatures and must agree with plain bit extraction.
    // Words chosen with high bits set to catch sign-extension leaks.
    val words = Seq(0xdeadbeefcafebabeL, 0x123456789abcdef0L)
    def ref(lo: Int, w: Int): Long =
      (0 until w).map { d =>
        val b = lo + d
        ((words(b / 64) >>> (b % 64)) & 1L) << d
      }.reduce(_ | _)
    val got = Embeddings.signLshBands(
        Seq((1L, words)).toDF("id", "lsh"), bits = 96, bands = 16)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    (0 until 16).foreach { j =>
      assert(got(j) == ref(j * 6, 6), s"band $j")
    }
  }
}
