package graft.ops

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import org.apache.spark.util.LongAccumulator

/** Bad-record skipping (reference: skip-ranges machinery,
  * `CORE/mapred/SortedRanges.java` + Task skip logic, SURVEY.md §2.7).
  * The reference re-runs tasks to bisect crashing record ranges; the
  * Spark-idiomatic design is per-record containment: wrap the user
  * function, return null for poison records, count them in an
  * accumulator. No task re-execution, no lost good records. */
object Safe {

  def tryUdf[I, O](f: I => O, skipped: LongAccumulator)(
      implicit ot: reflect.runtime.universe.TypeTag[O],
      it: reflect.runtime.universe.TypeTag[I]): UserDefinedFunction =
    udf((i: I) =>
      try Option(f(i))
      catch { case scala.util.control.NonFatal(_) => skipped.add(1); None })
}
