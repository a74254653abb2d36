package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The ValueAggregator framework (reference: `lib/aggregate/` — plug-ins
  * keyed by descriptor name, run in mapper+combiner+reducer with an
  * explicit partial/final split, `ValueAggregator.java:32-56`).
  *
  * Spark already splits aggregation into partial (map-side combine) and
  * final automatically in HashAggregateExec, so each descriptor compiles
  * to a plain `Column` where possible — codegen'd, shuffle-efficient at
  * any scale. `ValueHistogram` needs per-key distribution stats, which we
  * express as a two-level aggregation (scale-safe: state per (key,value)
  * pair is a single count, never an in-memory map — unlike the reference's
  * unbounded `ValueHistogram.java:38` TreeMap).
  */
object ValueAggregators {

  /** Descriptor-name → aggregation Column, mirroring the registry in
    * `lib/aggregate/ValueAggregatorBaseDescriptor.java:36`.
    * `uniqValueCount`'s cap reproduces `UniqValueCount.java:74-78`: the
    * reported count never exceeds the configured maximum. */
  def compile(descriptor: String, value: Column, cap: Long = Long.MaxValue): Column =
    descriptor match {
      case "LongValueSum"   => sum(value.cast("long"))
      case "LongValueMax"   => max(value.cast("long"))
      case "LongValueMin"   => min(value.cast("long"))
      case "DoubleValueSum" => sum(value.cast("double"))
      case "StringValueMax" => max(value.cast("string"))
      case "StringValueMin" => min(value.cast("string"))
      case "UniqValueCount" => least(countDistinct(value), lit(cap))
      case other => throw new IllegalArgumentException(s"unknown aggregator: $other")
    }

  /** ValueAggregatorJob analog: group by key, apply named descriptors.
    * specs: (descriptorName, inputColumn, outputAlias). */
  def aggregateJob(df: DataFrame, keyCol: String,
      specs: Seq[(String, String, String)]): DataFrame = {
    val aggs = specs.map { case (desc, in, out) => compile(desc, col(in)).as(out) }
    df.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** ValueHistogram report (`lib/aggregate/ValueHistogram.java:83,135`):
    * per key, the distribution of per-distinct-value frequencies —
    * unique-value count, min/median/max/average/stddev of the counts.
    *
    * Three-level aggregation, every step spillable: (key,value)→freq,
    * then (key,freq)→cnt (the frequency HISTOGRAM — its size is the
    * number of distinct frequency values, far below the number of
    * distinct values), then per-key stats over the histogram. The median
    * comes from a cumulative-sum window over the histogram (the
    * wordMedianHist technique) instead of `percentile()`, whose
    * ObjectHashAggregate buffers every per-key frequency in memory — the
    * earlier version violated this scaladoc's own bounded-state claim
    * for keys with ~10^9 distinct values. Sort-based windows spill;
    * nothing here holds per-key state proportional to distinct values.
    * stddev/median are computed from exact integer sums so the DuckDB
    * oracle matches bit-for-bit (see queries.Ops).
    */
  def valueHistogram(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perValue = df.groupBy(col(keyCol), col(valueCol))
      .agg(count(lit(1)).as("freq"))
    val hist = perValue.groupBy(col(keyCol), col("freq"))
      .agg(count(lit(1)).as("cnt"))
    val cum = hist
      .withColumn("upto", sum(col("cnt")).over(
        Window.partitionBy(col(keyCol)).orderBy(col("freq"))))
      .withColumn("total", sum(col("cnt")).over(Window.partitionBy(col(keyCol))))
    // middle positions (1-based): lo = (n+1) div 2, hi = (n+2) div 2;
    // median = mean of the frequencies at those positions — identical to
    // percentile(0.5) linear interpolation, which for 0.5 is exactly the
    // two-middle average.
    val atLo = min(when(col("upto") >= expr("(total + 1) DIV 2"), col("freq")))
    val atHi = min(when(col("upto") >= expr("(total + 2) DIV 2"), col("freq")))
    cum.groupBy(col(keyCol))
      .agg(
        sum(col("cnt")).as("n_unique"),
        min(col("freq")).as("min_freq"),
        ((atLo + atHi) / 2.0d).as("median_freq"),
        max(col("freq")).as("max_freq"),
        (sum(col("freq") * col("cnt")).cast("double") / sum(col("cnt"))).as("avg_freq"),
        // sample stddev from exact integer sums: sqrt((Σx² − (Σx)²/n)/(n−1)).
        // Σx² stays integer (exact, order-independent); (Σx)² is squared in
        // double to avoid long overflow when Σx > ~3e9.
        when(sum(col("cnt")) > 1,
          sqrt((sum(col("freq") * col("freq") * col("cnt")).cast("double") -
            sum(col("freq") * col("cnt")).cast("double") *
              sum(col("freq") * col("cnt")).cast("double") / sum(col("cnt"))) /
            (sum(col("cnt")) - 1).cast("double")))
          .otherwise(lit(0.0)).as("stddev_freq"))
  }

  // --------------------------------------------------------------------
  // Typed Aggregator parity surface: the reference's ValueAggregator
  // contract (addNextValue / getCombinerOutput / getReport) is exactly
  // Aggregator[IN, BUF, OUT] (reduce / merge / finish). Provided for
  // group→1 typed pipelines; the Column forms above are preferred in SQL
  // plans (codegen'd).
  // --------------------------------------------------------------------

  /** Capped distinct-count, reference `UniqValueCount.java:35`: the buffer
    * set never grows past `cap` (bounded state — the reference's own
    * defense against hot keys, kept here for 100TB safety). */
  final class UniqValueCountAgg(cap: Int) extends Aggregator[String, Set[String], Long] {
    def zero: Set[String] = Set.empty
    def reduce(b: Set[String], v: String): Set[String] =
      if (b.size >= cap) b else b + v
    def merge(a: Set[String], b: Set[String]): Set[String] =
      if (a.size >= cap) a else (a ++ b).take(cap)
    def finish(r: Set[String]): Long = math.min(r.size.toLong, cap.toLong)
    def bufferEncoder: Encoder[Set[String]] = Encoders.kryo[Set[String]]
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Long sum with the reference's partial/final contract
    * (`LongValueSum.java:33`). */
  object LongValueSumAgg extends Aggregator[Long, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, v: Long): Long = b + v
    def merge(a: Long, b: Long): Long = a + b
    def finish(r: Long): Long = r
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
