package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types._

import graft.ops.Snapshots

/** Driver-side zone-map file skipping for the SQL read path: intercepts
  * the filters Catalyst pushes at a snapshot scan, maps their range
  * constraints through the version's stats sidecar
  * ([[Snapshots.statFilesBounds]]), and builds the delegated parquet scan
  * over ONLY the surviving files — so `SELECT … WHERE k BETWEEN …`
  * through the catalog plans O(matching files), not O(table), exactly
  * like the API-path `readPruned`. The pushed filters are then forwarded
  * into the narrowed parquet scan builder, so row-group pushdown, column
  * pruning, and aggregate pushdown all still apply below the file-level
  * skip. Conservative by construction: uncovered columns, non-range
  * predicates, or a missing sidecar prune nothing, and the delegate
  * re-evaluates every filter it doesn't fully push — skipping is an
  * optimization, never a correctness dependency.
  */
private[v2] class ZoneMapScanBuilder(spark: SparkSession, loc: String,
                                     version: Long, files: Seq[String],
                                     mkInner: Seq[String] => ScanBuilder,
                                     mkRowScan: StructType => ScanBuilder)
  extends ScanBuilder with SupportsPushDownCatalystFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownTopN
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit {

  // created on the FIRST pushdown callback: pushFilters arrives before
  // column/aggregate pruning in V2ScanRelationPushDown, so the file list
  // is settled by the time the delegate builder materializes; a filterless
  // query lazily gets the full list
  private var inner: ScanBuilder = _
  private var filtered = false
  // what the delegate was built FROM — replayed when runtime (join-
  // driven) filtering narrows the file list and the scan must rebuild
  private var currentFiles: Seq[String] = files
  private var savedFilters: Seq[Expression] = Nil
  private var savedSchema: StructType = _
  private var rowScanMode = false
  private def innerOrAll: ScanBuilder = {
    if (inner == null) inner = mkInner(files)
    inner
  }

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    filtered ||= filters.nonEmpty
    savedFilters = filters
    if (inner == null) {
      currentFiles = ZoneMapScanBuilder.prune(spark, loc, version, files, filters)
      inner = mkInner(currentFiles)
    }
    innerOrAll.asInstanceOf[SupportsPushDownCatalystFilters].pushFilters(filters)
  }
  override def pushedFilters: Array[Predicate] =
    innerOrAll.asInstanceOf[SupportsPushDownCatalystFilters].pushedFilters

  override def pruneColumns(requiredSchema0: StructType): Unit = {
    // read schemas go to the parquet reader asNullable: an evolution-
    // added NOT NULL DEFAULT column is missing from older files, and the
    // reader must fill its existence default (which rides the field
    // metadata, preserved here) rather than error on a required column
    val requiredSchema = V2ParquetRead.nullable(requiredSchema0)
    if (aggRow != null) () // metadata-answered aggregate: nothing to prune
    // the delegated parquet scan cannot synthesize the __graft_file
    // metadata column — a projection naming it switches to the per-file
    // row scan (filters stay residual above the scan, so dropping the
    // delegate's pushed set is safe; explain keeps the delegate's report)
    else if (requiredSchema.fieldNames.contains(SnapshotRowScan.FileCol)) {
      val rs = mkRowScan(requiredSchema)
      rs.asInstanceOf[SupportsPushDownRequiredColumns].pruneColumns(requiredSchema)
      inner = rs
      rowScanMode = true
    } else {
      savedSchema = requiredSchema
      innerOrAll.asInstanceOf[SupportsPushDownRequiredColumns]
        .pruneColumns(requiredSchema)
    }
  }

  // ---- top-n / limit file pruning ----
  // `ORDER BY k [DESC] LIMIT n` on a sidecar-covered column narrows the
  // scan to the files that can hold a top-n row (Snapshots.statTopFiles:
  // the "latest n events" plan reads O(files holding the top-n)); a bare
  // LIMIT keeps the shortest prefix whose counted rows prove n. Both are
  // PARTIAL pushes — Spark keeps the final sort/limit, the scan just
  // plans fewer files — and both decline when filters were pushed (the
  // counting proof is pre-filter) or nothing would be skipped.
  private def renarrow(keep: Seq[String]): Boolean = {
    if (keep.length >= files.length) return false
    currentFiles = keep
    inner = mkInner(keep)
    true
  }
  override def pushTopN(orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
                        limit: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, NullOrdering}
    if (filtered || aggRow != null || orders.isEmpty) return false
    val head = orders.head
    val colName = head.expression() match {
      case r: NamedReference if r.fieldNames.length == 1 => r.fieldNames.head
      case _ => return false
    }
    val desc = head.direction() == SortDirection.DESCENDING
    val nullsFirst = head.nullOrdering() == NullOrdering.NULLS_FIRST
    Snapshots.statTopFiles(spark, loc, version, files, colName, desc,
      nullsFirst, limit.toLong).exists(renarrow)
  }
  override def pushLimit(limit: Int): Boolean =
    !filtered && aggRow == null &&
      Snapshots.statLimitFiles(spark, loc, version, files, limit.toLong)
        .exists(renarrow)
  override def isPartiallyPushed(): Boolean = true

  // ---- metadata-only aggregates ----
  // A filterless, group-less COUNT(*) / MIN / MAX answers from the stats
  // sidecar's per-file row counts and bounds (Snapshots.statAggValues):
  // the scan becomes a driver-local single row — zero tasks, zero file
  // opens, O(1) in table size. This builder only serves DV-free versions
  // (SnapshotTable routes DV-bearing ones elsewhere), so physical counts
  // are logical counts. Anything the sidecar can't prove delegates to the
  // parquet builder's own (footer-level) aggregate pushdown.
  private var aggRow: Array[Any] = _
  private var aggSchema: StructType = _
  private def trySidecarAgg(aggregation: Aggregation): Boolean = {
    if (aggRow != null) return true
    if (filtered) return false
    val answered = ZoneMapScanBuilder.wants(aggregation)
      .flatMap { ws =>
        Snapshots.statAggValues(spark, loc, version, files, ws.map(_._1))
          .map { vals =>
            aggRow = vals.map(_._1).toArray
            aggSchema = StructType(ws.zip(vals).map { case ((w, name), (_, dt)) =>
              StructField(name, dt, nullable = w != Snapshots.StatCount)
            })
          }
      }
    answered.isDefined
  }
  // set when the DELEGATE accepted an aggregate pushdown: the runtime-
  // prune wrapper must then stay out of the way — its rebuild replays
  // only filters+schema, so a runtime filter firing on such a scan would
  // drop the aggregation and emit raw rows under the aggregate schema
  private var delegateAgg = false
  override def pushAggregation(aggregation: Aggregation): Boolean =
    trySidecarAgg(aggregation) || (innerOrAll match {
      case a: SupportsPushDownAggregates =>
        delegateAgg ||= a.pushAggregation(aggregation)
        delegateAgg
      case _ => false
    })
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    trySidecarAgg(aggregation) || (innerOrAll match {
      case a: SupportsPushDownAggregates => a.supportCompletePushDown(aggregation)
      case _ => false
    })

  /** Rebuild the delegated parquet scan over a NARROWED file list,
    * replaying the pushed filters and column pruning the planner already
    * applied — the runtime-filter path's re-plan. */
  private def rebuildScan(keep: Seq[String]): Scan = {
    val b = mkInner(keep)
    if (savedFilters.nonEmpty)
      b.asInstanceOf[SupportsPushDownCatalystFilters].pushFilters(savedFilters)
    if (savedSchema != null)
      b.asInstanceOf[SupportsPushDownRequiredColumns].pruneColumns(savedSchema)
    b.build()
  }

  override def build(): Scan =
    if (aggRow != null) new org.apache.spark.sql.connector.read.LocalScan {
      override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] =
        Array(org.apache.spark.sql.catalyst.InternalRow.fromSeq(
          aggRow.toIndexedSeq))
      override def readSchema(): StructType = aggSchema
      override def description(): String =
        s"SidecarAggregate v$version ${aggSchema.fieldNames.mkString(", ")}"
    }
    else if (rowScanMode) innerOrAll.build()
    else {
      // offer runtime (join-driven) file skipping on every sidecar-
      // covered column: a broadcast join's key values arrive as an IN
      // predicate at execution time and prune files exactly like a
      // static one would — the DPP analog for unpartitioned tables
      val covered = (Snapshots.sidecarCols(spark, loc, version) ++
        graft.ops.BloomSidecar.coveredCols(spark, loc, version)).distinct
      val base = innerOrAll.build()
      if (covered.isEmpty || delegateAgg) base
      else new RuntimePrunedScan(spark, loc, version, currentFiles, covered,
        base, rebuildScan)
    }
}

/** A delegating Scan that accepts RUNTIME filters
  * (`SupportsRuntimeV2Filtering`): Spark's dynamic-pruning rule injects
  * the build side's join-key values as an IN predicate when a snapshot
  * table is broadcast-joined on a sidecar-covered column, and this scan
  * maps them through the same zone-map + Bloom fold the static path uses
  * — then REBUILDS the delegated parquet scan over the surviving files,
  * so a selective dim filter prunes fact files the query text never
  * named. Conservative like every skip here: unparseable predicates
  * prune nothing, and the rebuilt scan re-applies all pushed filters. */
private[graft] class RuntimePrunedScan(spark: SparkSession, loc: String,
                                    version: Long, files0: Seq[String],
                                    covered: Seq[String], first: Scan,
                                    rebuild: Seq[String] => Scan)
  extends Scan with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  @volatile private var current: Scan = first
  @volatile private var kept: Seq[String] = files0

  /** The wrapped scan (post any runtime narrowing) — plan introspection
    * unwraps through this to reach the parquet scan's file index. */
  private[graft] def delegate: Scan = current

  override def readSchema(): StructType = current.readSchema()
  override def description(): String =
    s"RuntimePruned(${kept.length} files) ${current.description()}"
  override def toBatch: org.apache.spark.sql.connector.read.Batch =
    current.toBatch
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
    val inner = current match {
      case r: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
        Some(r.estimateStatistics())
      case _ => None
    }
    // sizeInBytes stays the delegate's (its filter-selectivity model);
    // numRows fills from the stats sidecar when the parquet scan reports
    // none — this wrapper only serves DV-free versions, so the sidecar's
    // physical per-file counts ARE the live counts (sidecarNumRows)
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        inner.map(_.sizeInBytes()).getOrElse(java.util.OptionalLong.empty())
      override def numRows(): java.util.OptionalLong =
        inner.map(_.numRows()).filter(_.isPresent).getOrElse(
          Snapshots.sidecarNumRows(spark, loc, version, kept, Nil)
            .map(java.util.OptionalLong.of)
            .getOrElse(java.util.OptionalLong.empty()))
      override def columnStats()
          : java.util.Map[org.apache.spark.sql.connector.expressions.NamedReference,
                          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] =
        SnapshotRowScan.v2ColumnStats(spark, loc, version, kept, Nil)
    }
  }

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    covered.map(org.apache.spark.sql.connector.expressions.Expressions.column).toArray

  override def filter(predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    val exprs = predicates.toSeq.flatMap(RuntimePrunedScan.toCatalyst)
    if (exprs.nonEmpty) {
      val narrowed = ZoneMapScanBuilder.prune(spark, loc, version, kept, exprs)
      if (narrowed.length < kept.length) {
        kept = narrowed
        current = rebuild(narrowed)
      }
    }
    RuntimePrunedScan.record(loc, kept.length)
  }
}

private[graft] object RuntimePrunedScan {
  // observability: the last post-runtime-filter plan size per table —
  // read by specs/fixtures, since the narrowed file list only exists
  // inside execution (the logical plan still shows the static list)
  private val last = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private[graft] def lastKeptFiles(loc: String): Option[Int] =
    Option(last.get(loc)).map(_.intValue)
  private def record(loc: String, n: Int): Unit = last.put(loc, n)

  /** Runtime V2 predicate → the catalyst conjunct the static prune fold
    * understands. Spark ships dynamic-pruning values as IN / = over a
    * plain column reference; anything else prunes nothing. */
  private def toCatalyst(p: org.apache.spark.sql.connector.expressions.filter.Predicate): Option[Expression] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    type V2Lit = org.apache.spark.sql.connector.expressions.Literal[_]
    def name(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case r: NamedReference if r.fieldNames.length == 1 => Some(r.fieldNames.head)
        case _ => None
      }
    (p.name(), p.children()) match {
      case ("IN", ch) if ch.length >= 2 =>
        val lits = ch.tail.toSeq.map {
          case l: V2Lit => Some(Literal(l.value, l.dataType))
          case _ => None
        }
        if (lits.exists(_.isEmpty)) None
        else name(ch.head).map(c =>
          In(AttributeReference(c, lits.head.get.dataType)(), lits.flatten))
      case ("=", Array(l, r)) =>
        (l, r) match {
          case (c, v: V2Lit) if name(c).isDefined =>
            Some(EqualTo(AttributeReference(name(c).get, v.dataType)(),
              Literal(v.value, v.dataType)))
          case (v: V2Lit, c) if name(c).isDefined =>
            Some(EqualTo(AttributeReference(name(c).get, v.dataType)(),
              Literal(v.value, v.dataType)))
          case _ => None
        }
      case _ => None
    }
  }
}

private[v2] object ZoneMapScanBuilder {

  /** The subset of `files` any of whose sidecar-covered columns might
    * satisfy every conjunct — the driver-side file skip. Range conjuncts
    * map through the zone-map sidecar; point conjuncts (=, IN)
    * additionally probe the Bloom sidecar
    * ([[graft.ops.BloomSidecar.bloomFiles]]), which prunes on
    * high-cardinality keys whose per-file [min, max] spans everything
    * (hash layouts, id columns uncorrelated with the clustering key). */
  def prune(spark: SparkSession, loc: String, version: Long,
            files: Seq[String], filters: Seq[Expression]): Seq[String] =
    filters.flatMap(splitAnd).foldLeft(files) { (keep, conjunct) =>
      val afterStats = bound(conjunct) match {
        case Some((column, lo, hi)) =>
          Snapshots.statFilesBounds(spark, loc, version, keep, column, lo, hi)
        case None => keep
      }
      val afterBloom = point(conjunct) match {
        case Some((column, vs)) =>
          graft.ops.BloomSidecar.bloomFiles(spark, loc, version, afterStats, column, vs)
        case None => afterStats
      }
      needle(conjunct) match {
        case Some((column, n)) =>
          graft.ops.BloomSidecar.gramFiles(spark, loc, version, afterBloom, column, n)
        case None => afterBloom
      }
    }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case x => Seq(x)
  }

  /** A literal rendered in the sidecar's encoding (CAST AS STRING,
    * compared as BigDecimal for numerics, lexicographically for strings).
    * Date/timestamp literals are internal ints/micros whose toString does
    * NOT match that encoding — excluded, so they never prune (wrongly). */
  private def litStr(l: Literal): Option[String] = l.dataType match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
         _: FloatType | _: DoubleType | _: DecimalType | _: StringType =>
      Option(l.value).map(_.toString)
    case _ => None
  }

  private def numeric(dt: DataType): Boolean = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
         _: FloatType | _: DoubleType | _: DecimalType => true
    case _ => false
  }

  /** Conjunct → over-approximating interval on one column. Strict
    * inequalities relax to inclusive bounds (file skipping only needs an
    * over-approximation); anything unrecognized prunes nothing. */
  private def bound(e: Expression)
      : Option[(String, Option[String], Option[String])] = e match {
    case EqualTo(a: AttributeReference, l: Literal) =>
      litStr(l).map(v => (a.name, Some(v), Some(v)))
    case EqualTo(l: Literal, a: AttributeReference) =>
      litStr(l).map(v => (a.name, Some(v), Some(v)))
    case EqualNullSafe(a: AttributeReference, l: Literal) =>
      litStr(l).map(v => (a.name, Some(v), Some(v)))
    case EqualNullSafe(l: Literal, a: AttributeReference) =>
      litStr(l).map(v => (a.name, Some(v), Some(v)))
    case GreaterThan(a: AttributeReference, l: Literal) =>
      litStr(l).map(v => (a.name, Some(v), None))
    case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
      litStr(l).map(v => (a.name, Some(v), None))
    case LessThan(a: AttributeReference, l: Literal) =>
      litStr(l).map(v => (a.name, None, Some(v)))
    case LessThanOrEqual(a: AttributeReference, l: Literal) =>
      litStr(l).map(v => (a.name, None, Some(v)))
    // literal-on-the-left spellings flip the side the bound lands on
    case GreaterThan(l: Literal, a: AttributeReference) =>
      litStr(l).map(v => (a.name, None, Some(v)))
    case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
      litStr(l).map(v => (a.name, None, Some(v)))
    case LessThan(l: Literal, a: AttributeReference) =>
      litStr(l).map(v => (a.name, Some(v), None))
    case LessThanOrEqual(l: Literal, a: AttributeReference) =>
      litStr(l).map(v => (a.name, Some(v), None))
    case In(a: AttributeReference, values)
        if values.nonEmpty && values.forall(_.isInstanceOf[Literal]) =>
      val strs = values.map { case l: Literal => litStr(l) }
      if (strs.exists(_.isEmpty)) None
      else {
        val vs = strs.flatten
        // numeric ordering parses each literal: NaN/Infinity don't —
        // decline the conjunct (no pruning) rather than fail planning.
        // Strings order by UTF-8 bytes, matching how the sidecar's
        // min/max were computed (Java UTF-16 disagrees past the BMP).
        val ord: Ordering[String] =
          if (numeric(a.dataType)) Ordering.by(BigDecimal(_))
          else new Ordering[String] {
            def compare(x: String, y: String): Int =
              java.util.Arrays.compareUnsigned(
                x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
                y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
        try Some((a.name, Some(vs.min(ord)), Some(vs.max(ord))))
        catch { case _: NumberFormatException => None }
      }
    case _ => None
  }

  /** The sidecar-answerable reading of a pushed aggregation: group-less,
    * every function a COUNT(*) / MIN(col) / MAX(col) on a top-level
    * column. Each want carries its output field name (mirroring the
    * names Spark's own pushed-aggregate scans report). */
  private[v2] def wants(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[Seq[(Snapshots.StatAgg, String)]] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Max, Min}
    import org.apache.spark.sql.connector.expressions.NamedReference
    if (agg.groupByExpressions.nonEmpty) return None
    def col(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case r: NamedReference if r.fieldNames.length == 1 => Some(r.fieldNames.head)
        case _ => None
      }
    val out = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some((Snapshots.StatCount: Snapshots.StatAgg, "count(*)"))
      case c: Count if !c.isDistinct => // non-null count: sidecar nn sums
        col(c.column).map(n => (Snapshots.StatCountCol(n): Snapshots.StatAgg, s"count($n)"))
      case m: Min => col(m.column).map(c => (Snapshots.StatMin(c): Snapshots.StatAgg, s"min($c)"))
      case m: Max => col(m.column).map(c => (Snapshots.StatMax(c): Snapshots.StatAgg, s"max($c)"))
      case _ => None
    }
    if (out.exists(_.isEmpty)) None else Some(out.flatten)
  }

  /** Conjunct → exact point set on one column, for the Bloom-sidecar
    * probe. Same literal encoding (and date/timestamp exclusion) as
    * [[litStr]], so the probe hashes exactly what the build hashed. */
  private def point(e: Expression): Option[(String, Seq[String])] = e match {
    case EqualTo(a: AttributeReference, l: Literal) =>
      litStr(l).map(v => (a.name, Seq(v)))
    case EqualTo(l: Literal, a: AttributeReference) =>
      litStr(l).map(v => (a.name, Seq(v)))
    case EqualNullSafe(a: AttributeReference, l: Literal) =>
      litStr(l).map(v => (a.name, Seq(v)))
    case EqualNullSafe(l: Literal, a: AttributeReference) =>
      litStr(l).map(v => (a.name, Seq(v)))
    case In(a: AttributeReference, values)
        if values.nonEmpty && values.forall(_.isInstanceOf[Literal]) =>
      val strs = values.map { case l: Literal => litStr(l) }
      if (strs.exists(_.isEmpty)) None else Some((a.name, strs.flatten))
    case _ => None
  }

  /** Conjunct → substring the column must CONTAIN for the row to match —
    * feeds the gram-bloom file skip ([[graft.ops.BloomSidecar.gramFiles]]).
    * `LIKE '%x%'` arrives as Contains after LikeSimplification; prefix /
    * suffix / equality all imply containment, so the same over-
    * approximation applies. Anything else prunes nothing. */
  private def needle(e: Expression): Option[(String, String)] = {
    import org.apache.spark.sql.catalyst.expressions.{Contains, EndsWith, StartsWith}
    def s(l: Literal): Option[String] =
      if (l.dataType == StringType) Option(l.value).map(_.toString) else None
    e match {
      case Contains(a: AttributeReference, l: Literal) => s(l).map((a.name, _))
      case StartsWith(a: AttributeReference, l: Literal) => s(l).map((a.name, _))
      case EndsWith(a: AttributeReference, l: Literal) => s(l).map((a.name, _))
      case EqualTo(a: AttributeReference, l: Literal) => s(l).map((a.name, _))
      case EqualTo(l: Literal, a: AttributeReference) => s(l).map((a.name, _))
      case _ => None
    }
  }
}
