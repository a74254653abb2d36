package graft.sources

import org.apache.spark.sql.DataFrame

/** Lossless roundtrips through Spark's interchange formats (csv / json /
  * orc), the Spark-native counterpart of the reference's pluggable
  * Input/OutputFormat pairs (SURVEY §2.1/§2.8 — e.g.
  * `CORE/mapreduce/lib/input/TextInputFormat.java`,
  * `lib/output/TextOutputFormat.java`): the same table must survive a
  * write+read cycle bit-identically, whatever the wire format.
  *
  * Scale notes (100 TB):
  *  - csv/json stay line-delimited here (no `multiLine`), so files are
  *    SPLITTABLE — a 1 GB file fans out across tasks exactly like the
  *    reference's FileInputFormat splits. Gzip would collapse each file
  *    to one split; leave compression to splittable codecs or none.
  *  - the read side always passes the ORIGINAL schema: schema inference
  *    is a full extra pass over 100 TB and can mis-type sparse columns.
  *  - csv writes nulls as `\N` (and empty string as ""), because Spark's
  *    default writes null as "" and reads "" back as null — silently
  *    conflating the two on any table that has either.
  */
object Formats {

  // null → the \N sentinel on both sides; empty string keeps Spark's
  // write default (a quoted "") and reads back as "" because \N — not
  // the empty field — now marks null. The two stay distinct.
  private val csvOpts = Map("header" -> "true", "nullValue" -> "\\N")

  /** Write `df` to `dir` as `format`, read it back with `df`'s schema.
    *
    * r15 note: spreading an under-parallelized input across the task
    * slots before the write ([[graft.core.Spread]]) was tried and
    * REVERTED — the roundtrip's payload IS every column of every row, so
    * the repartition serializes the same ~25 MB in the same single
    * scan task the serial encode used (measured: 1.0 s exchange map task
    * replacing a 0.8 s serial ORC encode, net zero), while fragmenting
    * the output into one file per slot. Write parallelism here is
    * input-split parallelism, which any real multi-split source already
    * has (guide §2.3: don't shuffle the payload to buy nothing). */
  def roundtrip(df: DataFrame, format: String, dir: String): DataFrame = {
    val opts = format match {
      case "csv" => csvOpts
      case _     => Map.empty[String, String]
    }
    df.write.mode("overwrite").format(format).options(opts).save(dir)
    df.sparkSession.read.format(format).options(opts).schema(df.schema).load(dir)
  }
}
