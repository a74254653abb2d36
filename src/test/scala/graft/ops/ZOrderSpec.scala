package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Morton-key correctness, the aligned-box contiguity property that
  * makes range-clustering on the key prune multi-dimensional boxes, and
  * a measured data-skipping win over a hash layout. */
class ZOrderSpec extends SparkTestBase {

  /** Driver-side reference interleave. */
  private def morton(bits: Int, x: Long, y: Long): Long =
    (0 until bits).foldLeft(0L) { (acc, b) =>
      acc | (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
    }

  test("zKey matches the reference bit interleave") {
    import spark.implicits._
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 1L),
      (1023L, 1023L), (512L, 256L))
    val got = pts.toDF("x", "y")
      .withColumn("z", ZOrder.zKey(10, col("x"), col("y")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z == morton(10, x, y), s"($x,$y)") }
  }

  test("aligned power-of-2 boxes are one contiguous key range") {
    import spark.implicits._
    // full 64x64 grid; the box [0,16)x[0,16) must map exactly onto
    // key range [0, 256) — that contiguity is what turns a 2-D box
    // predicate into a 1-D key-range prune after clustering
    val grid = spark.range(64L * 64)
      .select((col("id") % 64).as("x"), (col("id") / 64).as("y"))
      .withColumn("z", ZOrder.zKey(6, col("x"), col("y")))
    val inBox = grid.filter(col("x") < 16 && col("y") < 16)
      .agg(min("z"), max("z"), count(lit(1))).collect().head
    assert((inBox.getLong(0), inBox.getLong(1), inBox.getLong(2)) == (0L, 255L, 256L))
    // and nothing outside the box lands inside that key range
    assert(grid.filter(col("z") < 256 && (col("x") >= 16 || col("y") >= 16))
      .count() == 0)
  }

  test("normalize maps arbitrary ranges onto [0, 2^bits), clamping BOTH ends") {
    import spark.implicits._
    // -5000 is below the declared min (stale stats) and 999999 above the
    // max — both must clamp instead of wrapping through negative keys
    val vals = Seq(-5000L, -1000L, -1L, 0L, 999L, 123456L, 999999L).toDF("v")
      .withColumn("n", ZOrder.normalize(col("v"), -1000L, 123456L, 10))
      .collect().map(_.getLong(1))
    assert(vals.head == 0L && vals(1) == 0L && vals.last == 1023L)
    assert(vals.forall(n => n >= 0 && n < 1024))
  }

  test("clustered layout prunes a 2-D box scan; hash layout cannot") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zorder").toString
    val n = 256
    val grid = spark.range(n.toLong * n)
      .select((col("id") % n).as("x"), (col("id") / n).as("y"),
        (col("id") * 37 % 1000).as("payload"))

    ZOrder.cluster(grid.toDF(), bits = 8, numFiles = 16, col("x"), col("y"))
      .write.parquet(s"$dir/clustered")
    grid.repartition(16, col("payload")).write.parquet(s"$dir/hashed")

    def recordsRead(path: String): Long = {
      val (_, m) = Counters.withTaskMetrics(spark) {
        spark.read.parquet(path)
          .filter(col("x") < 32 && col("y") < 32).agg(sum("payload")).collect()
      }
      m("input_records")
    }
    val clustered = recordsRead(s"$dir/clustered")
    val hashed = recordsRead(s"$dir/hashed")
    // box = 1/64 of the grid; z-clustered files have tight x/y min/max so
    // parquet row-group stats skip all but the box's key range, while
    // every hash-layout file spans the full x/y range and none can skip
    assert(hashed == n.toLong * n, s"hash layout should scan everything, read $hashed")
    assert(clustered <= hashed / 4,
      s"clustered read $clustered vs hashed $hashed — no skipping happened")
  }
}
