package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PipesSpec extends SparkTestBase {

  test("pipe: identity through cat preserves every line") {
    import spark.implicits._
    val lines = (1 to 1000).map(i => s"line-$i")
    val df = lines.toDF("text").repartition(4)
    val got = Pipes.pipe(df, Seq("cat")).as[String].collect().toSet
    assert(got == lines.toSet)
  }

  test("pipe: transform via tr, multi-partition") {
    import spark.implicits._
    val df = Seq("abc", "xyz").toDF("text").repartition(2)
    val got = Pipes.pipe(df, Seq("tr", "a-z", "A-Z")).as[String].collect().toSet
    assert(got == Set("ABC", "XYZ"))
  }

  test("reporter:counter stderr protocol feeds accumulators (PipeMapRed)") {
    import spark.implicits._
    val df = (1 to 50).map(_.toString).toDF("text").repartition(2)
    val acc = Pipes.counter(spark, "g", "lines")
    acc.reset()
    val cmd = Seq("sh", "-c",
      """n=0; while read l; do echo "$l"; n=$((n+1)); done
        |echo "reporter:counter:g,lines,$n" >&2""".stripMargin)
    val out = Pipes.pipe(df, cmd, counters = Map("g,lines" -> acc)).count()
    assert(out == 50)
    assert(acc.value == 50)
  }

  test("non-zero exit of the child fails the task (reference fails the task too)") {
    import spark.implicits._
    val df = Seq("x").toDF("text").coalesce(1)
    val ex = intercept[Exception] {
      Pipes.pipe(df, Seq("sh", "-c", "read l; exit 3")).count()
    }
    assert(ex.getMessage != null)
  }

  test("streamJob: subprocess wordcount equals DataFrame wordcount") {
    import spark.implicits._
    val docs = Seq("a b a", "b c", "a").toDF("text")
    val mapper = Seq("sh", "-c", """awk '{for(i=1;i<=NF;i++) print $i"\t1"}'""")
    val reducer = Seq("awk", "-F", "\t",
      """{ if ($1 != prev && NR > 1) { print prev "\t" sum; sum = 0 }
        | prev = $1; sum += $2 }
        |END { if (NR > 0) print prev "\t" sum }""".stripMargin)
    val got = Pipes.streamJob(docs, mapper, reducer, numPartitions = 3)
      .select(split(col("line"), "\t").getItem(0).as("w"),
        split(col("line"), "\t").getItem(1).cast("int").as("n"))
      .as[(String, Int)].collect().toSet
    assert(got == Set(("a", 3), ("b", 2), ("c", 1)))
  }
}
