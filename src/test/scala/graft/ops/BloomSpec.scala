package graft.ops

import graft.SparkTestBase
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

/** BloomMapFile-analog spec: parquet column bloom filters are written,
  * reject absent keys, and the Spark point-lookup plan pushes the
  * equality predicate down to the scan that consults them. */
class BloomSpec extends SparkTestBase {

  test("bloom filters written per row group; absent keys rejected") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bloom").toString
    // sparse keys: k = id * 1000 + 7, so most longs are absent
    val df = spark.range(0, 50000)
      .select((col("id") * 1000 + 7).as("k"), col("id").as("v"))
    Outputs.writeWithBloom(df, s"$dir/t", bloomCols = Seq("k"), ndv = 50000)

    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    val part = fs.globStatus(new Path(s"$dir/t/part-*.parquet")).head.getPath
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(part, conf))
    try {
      val blocks = reader.getRowGroups
      assert(!blocks.isEmpty)
      import scala.jdk.CollectionConverters._
      blocks.asScala.foreach { block =>
        val colMeta = block.getColumns.asScala
          .find(_.getPath.toDotString == "k").get
        val bloom = reader.getBloomFilterDataReader(block)
          .readBloomFilter(colMeta)
        assert(bloom != null, "bloom filter missing for column k")
        // every present key in this row group must pass the filter
        assert(bloom.findHash(bloom.hash(1007L))) // k for id=1
        // absent keys: no false negatives exist by construction, and the
        // false-positive rate makes 100 misses-in-a-row astronomically
        // unlikely unless the filter is broken (saturated/all-ones)
        val misses = (0 until 100).count(i => !bloom.findHash(bloom.hash(i * 1000L + 8)))
        assert(misses > 50, s"only $misses/100 absent keys rejected — filter saturated?")
      }
    } finally reader.close()

    // Spark-side point lookup: predicate reaches the parquet reader
    val probe = spark.read.parquet(s"$dir/t").filter(col("k") === 123456789L)
    val explained = probe.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(explained.contains("PushedFilters") &&
      explained.contains("EqualTo(k,123456789)"), explained)
    assert(probe.count() == 0)
    assert(spark.read.parquet(s"$dir/t").filter(col("k") === 1007L).count() == 1)
  }
}
