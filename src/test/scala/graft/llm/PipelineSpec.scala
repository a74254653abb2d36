package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Tables

/** Invariants for the round-4 training-pipeline ops (sampling, cleaning,
  * ranking, packing) beyond what the DuckDB oracle hashes. */
class PipelineSpec extends SparkTestBase {

  private lazy val docs = Tables.documents(spark, sf0001).cache()

  test("hash sample: deterministic, subset-monotone, rate within tolerance") {
    val n = docs.count().toDouble
    val s10 = Sampling.hashSample(docs, "doc_id", Sampling.rateToHex(0.1))
    val s50 = Sampling.hashSample(docs, "doc_id", Sampling.rateToHex(0.5))
    val ids10 = s10.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids50 = s50.select("doc_id").collect().map(_.getLong(0)).toSet
    // rerun = identical selection (determinism, the whole point vs rand())
    val rerun = Sampling.hashSample(docs, "doc_id", Sampling.rateToHex(0.1))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids10 == rerun)
    // raising the rate only adds rows, never swaps them
    assert(ids10.subsetOf(ids50))
    // md5 is uniform: expect rate*n within generous binomial slack
    assert(math.abs(ids10.size - 0.1 * n) < 4 * math.sqrt(0.1 * 0.9 * n) + 3)
    assert(math.abs(ids50.size - 0.5 * n) < 4 * math.sqrt(0.25 * n) + 3)
  }

  test("rateToHex endpoints and rounding") {
    assert(Sampling.rateToHex(0.0) == "0000")
    assert(Sampling.rateToHex(0.5) == "8000")
    assert(Sampling.rateToHex(0.25) == "4000")
    // full rate is lossless: the sentinel sorts above every hex key,
    // including "ffff", so rate-1.0 keeps ALL rows (not 65535/65536)
    assert(Sampling.rateToHex(1.0) == Sampling.fullRateHex)
    assert("ffff" < Sampling.fullRateHex)
    val all = Sampling.hashSample(docs, "doc_id", Sampling.rateToHex(1.0))
    assert(all.count() == docs.count())
  }

  test("exact-k sample: exact size per stratum, deterministic, prefix-monotone") {
    val k10 = Sampling.exactKPerStratum(docs, "lang", "doc_id", 10, "k7")
    val k25 = Sampling.exactKPerStratum(docs, "lang", "doc_id", 25, "k7")
    val sizes = k10.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val strata = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // exactly min(k, |stratum|) rows — never "in expectation"
    strata.foreach { case (lang, n) =>
      assert(sizes(lang) == math.min(10L, n), s"$lang")
    }
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    // growing k only extends the sample (same hash order, longer cut)
    assert(ids(k10).subsetOf(ids(k25)))
    // rerun identical (salted hash, no rand())
    assert(ids(Sampling.exactKPerStratum(docs, "lang", "doc_id", 10, "k7"))
      == ids(k10))
    // a different salt draws a genuinely different sample
    assert(ids(Sampling.exactKPerStratum(docs, "lang", "doc_id", 10, "x1"))
      != ids(k10))
    // plan: bounded-buffer aggregate, never a per-stratum window sort
    val plan = k10.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("stratified sample equals per-stratum hash samples") {
    val rates = Map("src0" -> Sampling.rateToHex(0.5), "src1" -> Sampling.rateToHex(0.25))
    val dflt = Sampling.rateToHex(0.1)
    val strat = Sampling.stratifiedSample(docs, "doc_id", "source", rates, dflt)
    val expected = docs.collect().filter { r =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(("graft" + r.getAs[Long]("doc_id")).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      hex < rates.getOrElse(r.getAs[String]("source"), dflt)
    }.map(_.getAs[Long]("doc_id")).toSet
    val got = strat.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("mixture weights: fracs sum to 1, weight inverts actual toward target") {
    val res = Sampling.mixtureWeights(docs, "source", "text",
      Map("src0" -> 0.2), defaultTarget = 0.05).collect()
    val actualSum = res.map(_.getAs[Double]("actual_frac")).sum
    assert(math.abs(actualSum - 1.0) < 1e-9)
    res.foreach { r =>
      val w = r.getAs[Double]("weight")
      val a = r.getAs[Double]("actual_frac")
      val t = r.getAs[Double]("target_frac")
      assert(math.abs(w * a - t) < 1e-12) // weight * actual == target
    }
  }

  test("epoch shuffle: per-epoch permutations independent, reproducible") {
    val keys = Sampling.epochShuffleKeys(docs.select(col("doc_id")), "doc_id", 3)
      .collect()
      .groupBy(_.getAs[Int]("epoch"))
      .map { case (e, rows) =>
        e -> rows.sortBy(_.getAs[String]("sort_key")).map(_.getLong(0)).toSeq
      }
    assert(keys.size == 3 && keys.values.forall(_.size == docs.count()))
    // permutations differ pairwise (md5 independence across epochs)
    assert(keys(0) != keys(1) && keys(1) != keys(2) && keys(0) != keys(2))
    // reproducible: recomputing epoch 1 gives the identical order
    val again = Sampling.epochShuffleKeys(docs.select(col("doc_id")), "doc_id", 3)
      .filter(col("epoch") === 1).collect()
      .sortBy(_.getAs[String]("sort_key")).map(_.getLong(0)).toSeq
    assert(again == keys(1))
  }

  test("pii redaction: counts match plants, redacted text has no residual PII") {
    import spark.implicits._
    val d = Seq(
      (1L, "write a@b.com and c.d-e@f.org.uk ok"),
      (2L, "call 555-123-4567 or 555.987.6543"),
      (3L, "host 10.0.0.1 then 192.168.255.254"),
      (4L, "mixed bob@x.io 555-111-2222 8.8.8.8"),
      (5L, "clean text only")).toDF("doc_id", "text")
    val r = Cleaning.piiRedact(d, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1).getLong(1) == 2 && r(1).getLong(2) == 0 && r(1).getLong(3) == 0)
    assert(r(2).getLong(1) == 0 && r(2).getLong(2) == 2)
    assert(r(3).getLong(3) == 2)
    assert(r(4).getLong(1) == 1 && r(4).getLong(2) == 1 && r(4).getLong(3) == 1)
    assert(r(5).getString(4) == "clean text only")
    assert(r(4).getString(4) == "mixed <EMAIL> <PHONE> <IP>")
  }

  test("repetition stats: hand-computed doc") {
    import spark.implicits._
    // 6 words, 4 distinct, top word "aa" x3, chars = 17
    val d = Seq((1L, "aa aa aa bb cc dd")).toDF("doc_id", "text")
    val r = Cleaning.repetitionStats(d, "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("n_words") == 6)
    assert(r.getAs[Long]("n_distinct_words") == 4)
    assert(r.getAs[Long]("top_word_count") == 3)
    assert(r.getAs[Double]("dup_word_frac") == 2.0 / 6.0)
    assert(r.getAs[Double]("top_word_frac") == 0.5)
    assert(r.getAs[Double]("mean_word_len") == 2.0)
    assert(!r.getAs[Boolean]("keep")) // top_word_frac 0.5 > 0.2, mean len 2 < 3
  }

  test("bm25: score ordering matches tf_norm within a term; idf sane") {
    val perTerm = Ranking.bm25PerTerm(docs, "doc_id", "text",
      Seq("the", "and"), topK = 20)
    val scored = Ranking.withBm25Score(perTerm).collect()
    assert(scored.nonEmpty)
    scored.groupBy(_.getAs[String]("term")).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getAs[Int]("rank"))
      // within a term idf is constant -> bm25 ordering == tf_norm ordering
      val b = byRank.map(_.getAs[Double]("bm25"))
      assert(b.zip(b.tail).forall { case (x, y) => x >= y })
      rows.foreach { r =>
        val n = r.getAs[Long]("n_docs").toDouble
        val df = r.getAs[Long]("df_t").toDouble
        val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        assert(math.abs(r.getAs[Double]("bm25") - idf * r.getAs[Double]("tf_norm")) < 1e-12)
      }
    }
  }

  test("chunking: reconstruction and window invariants") {
    import spark.implicits._
    val d = Seq((7L, (1 to 25).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val ch = Packing.chunk(d, "doc_id", "text", size = 20, stride = 10)
      .orderBy("chunk_idx").collect()
    assert(ch.length == 3) // starts at 1, 11, 21
    assert(ch(0).getAs[String]("chunk_text").startsWith("w1 ") &&
      ch(0).getAs[Long]("chunk_tokens") == 20)
    assert(ch(1).getAs[String]("chunk_text").startsWith("w11 ") &&
      ch(1).getAs[Long]("chunk_tokens") == 15)
    assert(ch(2).getAs[String]("chunk_text") == (21 to 25).map(i => s"w$i").mkString(" ") &&
      ch(2).getAs[Long]("chunk_tokens") == 5)
    // every token of the doc appears in the non-overlapping prefix of some chunk
    val stitched = ch.map(_.getAs[String]("chunk_text").split(" ").take(10)).flatten
    assert(stitched.toSeq == (1 to 25).map(i => s"w$i"))
  }

  test("packing: bins respect capacity unless single doc overflows; order-dense") {
    val packed = Packing.nextFitPack(docs, "doc_id", "text",
      capacity = 200L, buckets = 8).collect()
    assert(packed.length == docs.count())
    packed.groupBy(p => (p.bucket, p.bin)).foreach { case ((_, _), ds) =>
      assert(ds.map(_.n).sum <= 200L || ds.length == 1) // oversize doc alone in its bin
    }
    packed.groupBy(_.bucket).foreach { case (_, ds) =>
      val bins = ds.sortBy(_.id).map(_.bin)
      assert(bins.head == 0L)
      // next-fit over id order: bin ids non-decreasing, no gaps
      assert(bins.zip(bins.tail).forall { case (a, b) => b == a || b == a + 1 })
    }
  }

  test("priority sample: exact k, deterministic, matches direct selection, estimator sane") {
    import org.apache.spark.sql.functions.{conv, md5, substring, concat, lit, split, size => asize}
    val weighted = docs.select(col("doc_id"),
      asize(split(col("text"), " ")).cast("long").as("w")).cache()
    val k = 40
    val s = Sampling.prioritySample(weighted, "doc_id", "w", k, "ps-test")
      .orderBy("rank").collect()
    assert(s.length == k)
    // rerun bit-identical (salted hash, no rand())
    val rerun = Sampling.prioritySample(weighted, "doc_id", "w", k, "ps-test")
      .orderBy("rank").collect()
    assert(s.map(_.toSeq).toSeq == rerun.map(_.toSeq).toSeq)
    // the TakeOrdered path selects exactly the k smallest u/w — pin
    // against a direct full-sort computation of the same priorities
    val direct = weighted.select(col("doc_id"),
        ((conv(substring(md5(concat(lit("ps-test"), col("doc_id").cast("string"))),
            1, 13), 16, 10).cast("long") + lit(1L)).cast("double")
          / col("w").cast("double")).as("p"))
      .orderBy(col("p"), col("doc_id")).limit(k)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s.map(_.getAs[Long]("id")).toSet == direct)
    // estimator contract: w_est >= w per row, and the sample's w_est sum
    // estimates the true corpus weight (deterministic given the salt;
    // DLT unbiasedness makes a wild miss a genuine bug, not noise)
    s.foreach(r =>
      assert(r.getAs[Double]("w_est") >= r.getAs[Long]("weight").toDouble))
    val est = s.map(_.getAs[Double]("w_est")).sum
    val truth = weighted.agg(org.apache.spark.sql.functions.sum("w"))
      .head.getLong(0).toDouble
    assert(est > 0.4 * truth && est < 2.5 * truth, s"est=$est truth=$truth")
    // equal weights degenerate to uniform sampling: the selection is the
    // k smallest hash values, i.e. exact-k uniform
    val ones = docs.select(col("doc_id"), lit(1L).as("w"))
    val uni = Sampling.prioritySample(ones, "doc_id", "w", 15, "ps-test")
      .select("id").collect().map(_.getLong(0)).toSet
    val uniDirect = ones.select(col("doc_id"),
        (conv(substring(md5(concat(lit("ps-test"), col("doc_id").cast("string"))),
          1, 13), 16, 10).cast("long") + lit(1L)).as("u"))
      .orderBy(col("u"), col("doc_id")).limit(15)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(uni == uniDirect)
    // n <= k: everything returns and the estimate is exact (tau absent)
    val tiny = weighted.filter(col("doc_id") < 5)
    val allRows = Sampling.prioritySample(tiny, "doc_id", "w", k, "ps-test")
      .collect()
    assert(allRows.length == tiny.count())
    allRows.foreach(r =>
      assert(r.getAs[Double]("w_est") == r.getAs[Long]("weight").toDouble))
  }

  test("jaccard top-k: asymmetric query-vs-corpus ranking matches hand computation") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "a b c d"),   // shingles {a b c, b c d}
      (1L, "a b c e"),   // shingles {a b c, b c e} — J(0,1) = 1/3
      (2L, "x y z w"),   // disjoint from 0
      (3L, "a b c d")    // identical to 0 — J(0,3) = 1
    ).toDF("doc_id", "text")
    val top = Ranking.jaccardTopK(corpus, corpus.filter($"doc_id" === 0L),
        "doc_id", "text", k = 10)
      .orderBy("rank").collect()
    assert(top.map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank"),
      r.getAs[Double]("jac"))).toSeq
      == Seq((3L, 1, 1.0), (1L, 2, 1.0 / 3.0)))
  }

  test("rrf fusion: fused scores and ranks match the closed form") {
    import spark.implicits._
    // q1: dense ranks doc10=1, doc11=2; sparse ranks doc11=1, doc12=2
    val dense = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "neighbor_id", "rank")
    val sparse = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("query_id", "neighbor_id", "rank")
    val fused = Ranking.rrfFuse(Seq(dense, sparse), c = 60, k = 10)
      .orderBy("rank").collect()
    val expected = Seq(
      (11L, 1, 1.0 / 62 + 1.0 / 61), // in both lists — must outrank either alone
      (10L, 2, 1.0 / 61),
      (12L, 3, 1.0 / 62))
    assert(fused.map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank"),
      r.getAs[Double]("rrf"))).toSeq == expected)
  }
}
