package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling for hot keys (SURVEY.md §7.4 "100 TB-scale
  * design rules": salting + AQE). AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin`) covers most cases at runtime; these
  * operators are the deterministic plan-level tools for when the skew is
  * known up front (a grouping key where one value holds half the data —
  * the classic web-log hot-key).
  */
object Skew {

  /** Two-phase (salted) aggregation: spread each hot key over `buckets`
    * partial groups, then merge. sum/count/min/max are algebraic so the
    * two-phase result is exact. Phase-1 shuffle keys are (key, salt) —
    * no reducer sees a whole hot key; phase 2 merges `buckets` rows per
    * key. Salt = row-hash of the whole row (deterministic, no RNG). */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], buckets: Int,
                aggs: (String, String, String)*): DataFrame = {
    // aggs: (function, inputCol, outAlias) with function in sum|count|min|max
    val salt = pmod(xxhash64(df.columns.map(col): _*), lit(buckets)).as("_salt")
    def phase1(f: String, in: String): Column = f match {
      case "count" => count(lit(1))
      case "sum"   => sum(col(in))
      case "min"   => min(col(in))
      case "max"   => max(col(in))
    }
    def phase2(f: String, a: String): Column = f match {
      case "count" | "sum" => sum(col(a))
      case "min"           => min(col(a))
      case "max"           => max(col(a))
    }
    val p1 = df.withColumn("_salt", salt)
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(aggs.head match { case (f, in, out) => phase1(f, in).as(out) },
        aggs.tail.map { case (f, in, out) => phase1(f, in).as(out) }: _*)
    p1.groupBy(keyCols.map(col): _*)
      .agg(aggs.head match { case (f, _, out) => phase2(f, out).as(out) },
        aggs.tail.map { case (f, _, out) => phase2(f, out).as(out) }: _*)
  }

  /** Salted join for a skewed fact against a replicable dimension: the
    * fact side gets a deterministic row-salt, the dimension is exploded
    * `buckets`-fold with every salt value, and the join key becomes
    * (key, salt) — a hot key's rows now land on `buckets` reducers
    * instead of one. Exact same rows as the unsalted join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(buckets)).cast("int"))
    val saltedDim = dim
      .withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Keys holding at least `minShare` of `df`'s rows (at most `k` of
    * them, hottest first), as typed values ready for [[hotIsolatedJoin]].
    * One partial-aggregated pass: the map-side combine collapses a hot
    * key per task before the shuffle, so the exchange carries one row
    * per DISTINCT key — the standard exact top-k; for a pre-filter that
    * never shuffles the distinct set there is the Misra–Gries
    * `graft_heavy_hitters` aggregate, whose guaranteed-count lower
    * bounds feed the same `hot` list. */
  def hotKeys(df: DataFrame, key: String, minShare: Double = 0.05,
              k: Int = 64): Seq[Any] = {
    require(minShare > 0 && minShare <= 1, s"minShare out of (0,1]: $minShare")
    // ONE scan of df: the per-key aggregate is one-row-per-distinct-key
    // small, so the total comes from summing IT — a separate count()
    // would re-scan the full fact this API exists to protect
    val perKey = df.groupBy(col(key)).agg(count(lit(1)).as("_n"))
      .localCheckpoint(true)
    val totalRow = perKey.agg(sum(col("_n"))).head()
    if (totalRow.isNullAt(0)) return Nil // empty input
    val total = totalRow.getLong(0)
    perKey
      .filter(col("_n") >= math.ceil(total * minShare).toLong &&
        col(key).isNotNull)
      .orderBy(col("_n").desc)
      .limit(k)
      .collect().map(_.get(0)).toSeq
  }

  /** The layout-aware skew join — what [[graft.sources.v2
    * .SnapshotProcedures]]' `advise_layout` points at when a re-split
    * cannot help (ONE dominant key keeps its rows together under any
    * bucket count): isolate the hot keys, join the COLD mass
    * co-partitioned (two co-bucketed snapshot tables keep their
    * zero-Exchange storage-partitioned join — the pushed NOT-IN filter
    * drops hot rows inside the scan), and join the hot keys' rows
    * against a BROADCAST of the dimension's matching rows — no shuffle
    * and no single-reducer sort ever touches the hot mass, and the
    * pushed IN predicate on the layout key bucket-prunes the hot-side
    * scan to the hot buckets' files (read in parallel per file: scan
    * partitions are per-file, bucket-grouping happens only when a join
    * demands it). INNER join semantics (hot/cold branches partition the
    * key space; NULL keys match nothing in either branch, exactly as
    * the plain inner join). Exact same rows as `fact.join(dim, key)` —
    * the probe suite proves it on a Zipf fixture. */
  def hotIsolatedJoin(fact: DataFrame, dim: DataFrame, key: String,
                      hot: Seq[Any]): DataFrame =
    splitJoin(fact, hotFact = fact, dim, key, hot)

  /** The one hot/cold split both entry points share — a semantics fix
    * (NULL handling, the union, the broadcast) lands in exactly one
    * place. `hotFact` is the fact source the HOT branch reads (the
    * table-name variant swaps in a file-split-parallel re-read). */
  private def splitJoin(fact: DataFrame, hotFact: DataFrame, dim: DataFrame,
                        key: String, hot: Seq[Any]): DataFrame = {
    require(hot.forall(_ != null), "hot keys must be non-null")
    if (hot.isEmpty) return fact.join(dim, Seq(key))
    val cold = fact.filter(!col(key).isin(hot: _*))
      .join(dim.filter(!col(key).isin(hot: _*)), Seq(key))
    val hotJ = hotFact.filter(col(key).isin(hot: _*))
      .join(broadcast(dim.filter(col(key).isin(hot: _*))), Seq(key))
    cold.unionByName(hotJ)
  }

  /** [[hotIsolatedJoin]] by CATALOG TABLE names, which unlocks the part
    * a DataFrame-in API cannot: the hot branch re-reads the fact with
    * `bucket_grouping=false` (a per-read snapshot-table option), so the
    * hot keys' rows come through the vectorized parquet delegate at
    * FILE-SPLIT parallelism instead of one bucket-grouped task per hot
    * bucket — the hot mass, by definition, lives in few buckets, and a
    * bucket-granular scan would put the whole straggler back on one
    * core. The cold branch still reads bucket-grouped and keeps its
    * zero-Exchange SPJ. */
  def hotIsolatedJoinTables(s: org.apache.spark.sql.SparkSession,
                            factTable: String, dimTable: String, key: String,
                            hot: Seq[Any]): DataFrame =
    splitJoin(s.table(factTable),
      hotFact = s.read.option("bucket_grouping", "false").table(factTable),
      s.table(dimTable), key, hot)
}
