package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sources.Formats

/** Interchange-format parity: each query writes a test table out through
  * one of Spark's wire formats, reads it back with the original schema,
  * and returns the full sorted relation. The DuckDB oracle reads the
  * SOURCE parquet — so a hash match certifies the entire write+read cycle
  * was lossless, per row and per column (types, text escaping, timestamp
  * precision, floating-point digits).
  *
  * This is the Spark-native closure of the reference's format matrix
  * (SURVEY §2.1/§2.8: Text/KeyValueText/SequenceFile Input+OutputFormats,
  * `CORE/mapreduce/lib/input/TextInputFormat.java`,
  * `lib/output/TextOutputFormat.java`) — the formats a warehouse actually
  * exchanges with other engines today, each backed by Spark's codegen'd
  * vectorized readers rather than a custom RecordReader.
  */
object FormatQueries {

  private def out(fmt: String, table: String) =
    s"/tmp/graft-warehouse/format_roundtrip/${fmt}_$table"

  /** CSV stresses the text surface: longs, doubles (shortest-roundtrip
    * decimal digits), timestamps, and quoting; null vs empty-string kept
    * distinct via the `\N` sentinel (`sources/Formats.scala`). */
  private def csvOrders(s: SparkSession, d: String): DataFrame =
    Formats.roundtrip(Tables.orders(s, d), "csv", out("csv", "orders"))
      .orderBy(col("o_orderkey"))

  /** JSON-lines stresses string escaping on free text (embedded quotes,
    * backslashes, unicode) while staying line-delimited = splittable. */
  private def jsonDocuments(s: SparkSession, d: String): DataFrame =
    Formats.roundtrip(Tables.documents(s, d), "json", out("json", "documents"))
      .orderBy(col("doc_id"))

  /** ORC is the binary columnar cross-check on the largest table —
    * vectorized read path, predicate-pushdown-capable, zero text loss. */
  private def orcLineitem(s: SparkSession, d: String): DataFrame =
    Formats.roundtrip(Tables.lineitem(s, d), "orc", out("orc", "lineitem"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Schema evolution: a dataset whose early files predate a column.
    * v1 batches carry 3 columns, v2 batches add `o_orderpriority`;
    * a `mergeSchema` read reconciles the footers and null-fills the
    * missing column in old files — the append-a-column migration that
    * at 100 TB must NOT rewrite history. The oracle recreates the same
    * end state from the source table. */
  private def schemaEvolution(s: SparkSession, d: String): DataFrame = {
    val dir = "/tmp/graft-warehouse/evolution/orders"
    val o = Tables.orders(s, d)
    o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$dir/batch=1")
    o.filter(col("o_orderkey") % 2 =!= 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/batch=2")
    s.read.option("mergeSchema", "true").parquet(dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
  }

  val all: Seq[Q] = Seq(
    Q("schema_evolution", schemaEvolution,
      Some("""SELECT o_orderkey, o_custkey, o_totalprice,
             |  CASE WHEN o_orderkey % 2 = 0 THEN NULL
             |       ELSE o_orderpriority END AS o_orderpriority
             |FROM orders ORDER BY o_orderkey""".stripMargin)),
    Q("format_csv", csvOrders,
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             |  o_orderdate, o_orderpriority
             |FROM orders ORDER BY o_orderkey""".stripMargin)),
    Q("format_json", jsonDocuments,
      Some("""SELECT doc_id, text, lang, source, n_chars
             |FROM documents ORDER BY doc_id""".stripMargin)),
    Q("format_orc", orcLineitem,
      Some("""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
             |  l_quantity, l_extendedprice, l_discount, l_tax,
             |  l_returnflag, l_linestatus, l_shipdate
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)))
}
