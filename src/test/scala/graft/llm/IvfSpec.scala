package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Tables

class IvfSpec extends SparkTestBase {

  private lazy val emb = Tables.embeddings(spark, sf0001).cache()
  private lazy val index =
    Ivf.cachedIndex(emb, "vec_id", "embedding", 64, nlist = 8, 42L, "spec")

  private def knnSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("IVF with nprobe == nlist is exhaustive: equals brute force exactly") {
    val brute = knnSet(Embeddings.bruteForceKnn(emb,
      emb.filter(col("vec_id") < 6), "vec_id", "embedding", 64, 5))
    val full = knnSet(Ivf.probe(index, (0L until 6L), 64, 5, nprobe = 8))
    assert(full == brute)
  }

  test("probe metric matches build metric: top-1 probed cell == assigned cell") {
    // KMeans assigns by Euclidean distance, so each query's own cell must
    // rank first under the probe ordering. Ranking cells by raw dot
    // product (the bug this pins against) violates this for
    // non-normalized vectors and silently tanks recall at nprobe < nlist.
    val cells = Ivf.probeCells(index, (0L until 8L), 64, nprobe = 1).collect()
    assert(cells.nonEmpty)
    cells.foreach { r =>
      assert(r.getAs[Int]("cell") == r.getAs[Int]("assigned_cell"),
        s"query ${r.getLong(0)}: top probe ${r.getAs[Int]("cell")} != " +
          s"assigned ${r.getAs[Int]("assigned_cell")}")
    }
  }

  test("partial-probe IVF trades recall for touched fraction") {
    val brute = knnSet(Embeddings.bruteForceKnn(emb,
      emb.filter(col("vec_id") < 6), "vec_id", "embedding", 64, 5))
    val partial = knnSet(Ivf.probe(index, (0L until 6L), 64, 5, nprobe = 4))
    val recall = (brute intersect partial).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall $recall") // half the cells probed
    assert(partial.size == brute.size)       // still returns k per query
  }

  test("index is built once: cachedIndex returns the same instance") {
    val again = Ivf.cachedIndex(emb, "vec_id", "embedding", 64, 8, 42L, "spec")
    assert(again eq index)
  }

  test("cachedIndex survives a harness clearCache: assignment is re-persisted") {
    // Verify/Bench run spark.catalog.clearCache() between queries, which
    // unpersists the index's assignment — without the re-persist in
    // cachedIndex, every later probe re-runs model.transform and the
    // "repeat calls are probe-only" contract is silently false
    index.assigned.count() // ensure built + materialized
    spark.catalog.clearCache()
    assert(index.assigned.storageLevel ==
      org.apache.spark.storage.StorageLevel.NONE) // precondition: cleared
    val again = Ivf.cachedIndex(emb, "vec_id", "embedding", 64, 8, 42L, "spec")
    assert(again eq index)
    assert(again.assigned.storageLevel !=
      org.apache.spark.storage.StorageLevel.NONE,
      s"assignment not re-persisted: ${again.assigned.storageLevel}")
  }

  test("persisted index: cell filter prunes partitions; probe results identical") {
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    Ivf.save(index, dir)
    val loaded = Ivf.load(spark, dir)
    // the 100 TB claim, pinned: a cell predicate on the stored layout is a
    // PARTITION filter (file-level pruning), not a row filter after scan
    val probeScan = loaded.assigned.filter(col("cell").isin(1, 3))
    val explained = probeScan.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(explained.matches("(?s).*PartitionFilters: \\[[^\\]]*cell[^\\]]*\\].*"),
      explained)
    // probing the loaded index equals probing the in-memory one
    val mem = knnSet(Ivf.probe(index, (0L until 6L), 64, 5, nprobe = 4))
    val disk = knnSet(Ivf.probe(loaded, (0L until 6L), 64, 5, nprobe = 4))
    assert(disk == mem)
  }

  test("probeFromDisk: statically pruned probe equals the dynamic-join probe") {
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    Ivf.save(index, dir)
    val loaded = Ivf.load(spark, dir)
    val mem = knnSet(Ivf.probe(index, (0L until 6L), 64, 5, nprobe = 4))
    val disk = knnSet(Ivf.probeFromDisk(loaded, (0L until 6L), 64, 5, nprobe = 4))
    assert(disk == mem)
    // the scan probeFromDisk issues against the saved layout carries the
    // probed cells as PARTITION filters (file pruning), not a row filter
    val explained = Ivf.prunedScan(loaded, Seq(1, 3)).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(explained.matches("(?s).*PartitionFilters: \\[[^\\]]*cell[^\\]]*\\].*"),
      explained)
  }

  test("annKnnFromDisk: cold-session lifecycle — build+save once, probe from disk") {
    val dataPath = s"$sf0001/embeddings.parquet"
    def run() = knnSet(Ivf.annKnnFromDisk(emb, dataPath, (0L until 6L),
      "vec_id", "embedding", 64, 5, nlist = 8, nprobe = 4))
    val first = run()
    // second call must NOT rebuild: the marker short-circuits ensure
    val idxDir = IndexStore.indexDir(spark, "ivf8_42", dataPath)
    assert(!IndexStore.ensure(spark, idxDir) {
      fail("index rebuilt despite completion marker")
    })
    assert(run() == first)
    // same quantizer params + seed ⇒ same cells ⇒ same answer as the
    // in-memory probe path
    assert(first == knnSet(Ivf.probe(index, (0L until 6L), 64, 5, nprobe = 4)))
  }
}
