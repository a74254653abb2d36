package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cut-style field selection (reference: `lib/fieldsel/FieldSelectionHelper
  * .java:60`, spec parser `parseOutputKeyValueSpec :148`, extraction
  * `extractFields :79`; driven by `FieldSelectionMapper.java:61`).
  *
  * Spec grammar (reference-compatible): `keyFields ":" valueFields` where
  * each side is a comma-list of `n` (single 0-based field), `a-b`
  * (inclusive range) or `a-` (open range to the last field). Example:
  * `"6,5,1-3:0-"` → key = fields 6,5,1,2,3; value = all fields.
  *
  * Compiled to pure `Column` expressions over `split(line, sep)` — no UDF,
  * stays inside whole-stage codegen, scales linearly with no shuffle.
  */
object FieldSelection {

  sealed trait FieldSpec
  final case class Single(i: Int) extends FieldSpec
  final case class Range(from: Int, to: Int) extends FieldSpec
  final case class OpenRange(from: Int) extends FieldSpec

  /** Parse one side of the spec ("6,5,1-3,8-"). */
  def parseList(spec: String): Seq[FieldSpec] =
    spec.split(",").toIndexedSeq.filter(_.nonEmpty).map { part =>
      part.split("-", -1) match {
        case Array(a)     => Single(a.toInt)
        case Array(a, "") => OpenRange(a.toInt)
        case Array(a, b)  => Range(a.toInt, b.toInt)
        case _ => throw new IllegalArgumentException(s"bad field spec: $part")
      }
    }

  /** Parse a full `key:value` spec. Value side empty → all fields (`0-`). */
  def parseKeyValue(spec: String): (Seq[FieldSpec], Seq[FieldSpec]) = {
    val (k, v) = spec.indexOf(':') match {
      case -1 => (spec, "0-")
      case i  => (spec.substring(0, i),
                  if (i == spec.length - 1) "0-" else spec.substring(i + 1))
    }
    (parseList(k), parseList(v))
  }

  /** Selected fields of a split array, joined back with the separator.
    * Out-of-range fields vanish (null-safe `get` + `array_join` skipping
    * nulls) — ANSI mode is on in Spark 4, so `element_at` would throw. */
  private def project(arr: Column, specs: Seq[FieldSpec], sep: String): Column = {
    val parts: Seq[Column] = specs.map {
      case Single(i)    => array(get(arr, lit(i)))
      case Range(a, b)  => slice(arr, a + 1, b - a + 1)
      case OpenRange(a) => slice(arr, lit(a + 1), greatest(size(arr) - a, lit(0)))
    }
    array_join(flatten(array(parts: _*)), sep)
  }

  /** FieldSelectionMapper analog: line → (key, value) by the spec. */
  def selectFields(df: DataFrame, lineCol: String, spec: String,
      sep: String = "\t"): DataFrame = {
    val (kSpec, vSpec) = parseKeyValue(spec)
    val arr = split(col(lineCol), java.util.regex.Pattern.quote(sep))
    df.withColumn("fs_key", project(arr, kSpec, sep))
      .withColumn("fs_value", project(arr, vSpec, sep))
  }
}
