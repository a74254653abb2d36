package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Sort / partition / top-k surface (SURVEY.md §2.5).
  *
  * The reference's cluster-wide total sort = InputSampler split points +
  * TotalOrderPartitioner + per-reducer sort (`lib/partition/
  * TotalOrderPartitioner.java:50`, `InputSampler.java:314`, `EX/Sort
  * .java:57`). Spark's `orderBy` IS that design: reservoir-sample →
  * RangePartitioning exchange → per-partition sort, with codegen'd
  * comparators (the reference's byte-trie optimization is unnecessary).
  */
object Sorting {

  /** Total-order sort; part-file index order = global order, which is the
    * TeraSort output contract (concatenable sorted part files). */
  def totalSort(df: DataFrame, keys: Seq[Column]): DataFrame =
    df.orderBy(keys: _*)

  /** Explicit two-step form when the caller wants to keep the range
    * partitioning for a downstream stage (avoids a second exchange). */
  def rangeSorted(df: DataFrame, numPartitions: Int, keys: Seq[Column]): DataFrame =
    df.repartitionByRange(numPartitions, keys: _*).sortWithinPartitions(keys: _*)

  /** Top-k: TakeOrderedAndProjectExec — per-partition heap + driver merge
    * of k rows, never the reference's single-reducer bottleneck
    * (`EX/Grep.java:89-92`). */
  def topK(df: DataFrame, k: Int, keys: Seq[Column]): DataFrame =
    df.orderBy(keys: _*).limit(k)

  /** Secondary sort (`EX/SecondarySort.java:57,133,145,165`): partition by
    * the natural key, values arrive sorted by the secondary key within
    * each group. `partitionCols` ≙ FirstPartitioner, `sortCols` ≙
    * setSortComparatorClass, group-break detection ≙
    * FirstGroupingComparator. The caller's `mapPartitions` sees each
    * partition's rows natural-key-grouped and secondary-sorted — the exact
    * reducer-input contract, streaming (no per-group buffering).
    */
  def secondarySorted(df: DataFrame, numPartitions: Int,
      partitionCols: Seq[Column], sortCols: Seq[Column]): DataFrame =
    df.repartition(numPartitions, partitionCols: _*)
      .sortWithinPartitions(partitionCols ++ sortCols: _*)

  /** KeyFieldBasedComparator spec (`lib/partition/KeyFieldBasedComparator
    * .java:53`, offsets parsed by `KeyFieldHelper`): unix sort(1)-style
    * flags over key fields. Supported: `-kPOS1[,POS2][n][r]` where POS is
    * `field[.char]` — 1-based field positions with optional 1-based char
    * offset within the field (e.g. `-k2.3,2.5n` = chars 3..5 of field 2,
    * numeric). Compiled to `orderBy` columns over the split line
    * (SURVEY.md §7.3: a small spec compiler, not a Catalyst extension).
    */
  def keyFieldSortColumns(lineCol: Column, spec: String,
      sep: String = "\t"): Seq[Column] = {
    val arr = split(lineCol, java.util.regex.Pattern.quote(sep))
    def parsePos(p: String): (Int, Int) = p.split("\\.") match {
      case Array(f)    => (f.toInt, 0)
      case Array(f, c) => (f.toInt, c.toInt)
      case _ => throw new IllegalArgumentException(s"bad position: $p")
    }
    spec.trim.split("\\s+").toIndexedSeq.filter(_.nonEmpty).map { tok =>
      require(tok.startsWith("-k"), s"bad key spec token: $tok")
      val body = tok.drop(2)
      val flags = body.reverse.takeWhile(c => c == 'n' || c == 'r').reverse
      val pos = body.dropRight(flags.length).split(",")
      val (fromF, fromC) = parsePos(pos.head)
      val toC = if (pos.length > 1) parsePos(pos(1)) match {
        case (tf, tc) if tf == fromF && tc > 0 => Some(tc)
        case _ => None // cross-field ranges: compare whole start field
      } else None
      val whole = get(arr, lit(fromF - 1))
      val field = (fromC, toC) match {
        case (0, None)        => whole
        case (c, None)        => substring(whole, math.max(c, 1), Int.MaxValue)
        case (c, Some(t))     =>
          val start = math.max(c, 1)
          substring(whole, start, t - start + 1)
      }
      val typed = if (flags.contains('n')) field.cast("double") else field
      if (flags.contains('r')) typed.desc else typed.asc
    }
  }

  /** KeyFieldBasedPartitioner analog (`lib/partition/
    * KeyFieldBasedPartitioner.java:51`): hash-partition on key sub-fields
    * so all lines sharing those fields land in one partition. */
  def keyFieldPartition(df: DataFrame, lineCol: Column, fields: Seq[Int],
      numPartitions: Int, sep: String = "\t"): DataFrame = {
    val arr = split(lineCol, java.util.regex.Pattern.quote(sep))
    val keys = fields.map(i => get(arr, lit(i - 1)))
    df.repartition(numPartitions, keys: _*)
  }
}
