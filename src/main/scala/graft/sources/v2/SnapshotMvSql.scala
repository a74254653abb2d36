package graft.sources.v2

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Literal}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, LongType}

import graft.ops.Mv

/** The STANDARD SQL spelling for the MV subsystem ([[graft.ops.Mv]]) —
  * what every warehouse user types first:
  *
  * {{{
  *   CREATE MATERIALIZED VIEW cat.mv AS
  *     SELECT k, count(*), sum(v) FROM cat.base GROUP BY k
  *   REFRESH MATERIALIZED VIEW cat.mv
  * }}}
  *
  * Spark's grammar has no MATERIALIZED VIEW statement, so
  * [[SnapshotViewParser]] recognizes these two shapes BEFORE
  * delegating. The defining query must be the exact shape the engine
  * maintains incrementally — single table, bare-column GROUP BY keys,
  * aggregates within count(*) / count(c) / sum(c) — anything else is
  * refused at CREATE time with a message naming the general tool
  * (`CALL system.create_mv`, which also takes `buckets` for the
  * bucket-granular scale path). The MV's stored schema is canonical
  * (keys…, n, s_<c>, c_<c>) regardless of the SELECT's aliases: the
  * definition IS (keys, sums), and the transparent rewrite serves any
  * alias spelling of it. DROP is `DROP TABLE` — an MV is a table. */
object SnapshotMvSql {

  private val CreateRe =
    """(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+([\w.`]+)\s+AS\s+(.+)""".r
  private val RefreshRe =
    """(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+(FULL\s+)?([\w.`]+)\s*;?\s*""".r

  /** Intercept the two MATERIALIZED VIEW statements; None = not ours,
    * delegate untouched. */
  def intercept(session: SparkSession, delegate: ParserInterface,
                sqlText: String): Option[LogicalPlan] = sqlText match {
    case CreateRe(identStr, query) =>
      val parts = delegate.parseMultipartIdentifier(identStr)
      SnapshotViews.viewLocation(session, parts).map { mvLoc =>
        val (baseParts, keys, sums) =
          extract(delegate.parseQuery(query)).fold(
            msg => throw new UnsupportedOperationException(
              s"CREATE MATERIALIZED VIEW maintains exactly " +
                "'SELECT keys…, count(*)/count(c)/sum(c)… FROM one_table " +
                s"GROUP BY keys…' — $msg. For anything else (or a " +
                "bucketed layout) use CALL <cat>.system.create_mv"),
            identity)
        require(baseParts.headOption.contains(parts.head),
          s"the base table must live in the same catalog '${parts.head}' " +
            s"(got ${baseParts.mkString(".")})")
        val baseLoc = graft.ops.Refs.resolve(
          SnapshotViews.viewLocation(session, baseParts).getOrElse(
            throw new IllegalArgumentException(
              s"unknown base table ${baseParts.mkString(".")}")))
        CreateSnapshotMvCommand(mvLoc, baseLoc, keys, sums)
      }
    case RefreshRe(full, identStr) =>
      val parts = delegate.parseMultipartIdentifier(identStr)
      SnapshotViews.viewLocation(session, parts).map(mvLoc =>
        RefreshSnapshotMvCommand(mvLoc, full != null))
    case _ => None
  }

  /** (base table parts, keys, sums) from the defining query — Left is
    * the human-readable reason the shape can't be maintained. */
  private def extract(plan: LogicalPlan)
      : Either[String, (Seq[String], Seq[String], Seq[String])] = plan match {
    case Aggregate(groupExprs, aggExprs, UnresolvedRelation(parts, _, _), _) =>
      val keys = groupExprs.map {
        case UnresolvedAttribute(Seq(n)) => n
        case other => return Left(s"GROUP BY must be bare columns, " +
          s"got ${other.sql}")
      }
      val sums = scala.collection.mutable.LinkedHashSet.empty[String]
      aggExprs.foreach { ne =>
        val e = ne match {
          case Alias(c, _) => c
          case ua: UnresolvedAlias => ua.child // unaliased select item
          case c => c
        }
        e match {
          case UnresolvedAttribute(Seq(n)) =>
            if (!keys.contains(n))
              return Left(s"non-aggregated column '$n' is not a GROUP BY key")
          case f: UnresolvedFunction if !f.isDistinct && f.filter.isEmpty &&
              f.nameParts.map(_.toLowerCase(java.util.Locale.ROOT)) == Seq("count") =>
            f.arguments match {
              case Seq(_: UnresolvedStar) => () // count(*): always stored as n
              case Seq(l: Literal) if l.value != null => ()
              case Seq(UnresolvedAttribute(Seq(c))) => sums += c
              case _ => return Left(s"unsupported count shape ${e.sql}")
            }
          case f: UnresolvedFunction if !f.isDistinct && f.filter.isEmpty &&
              f.nameParts.map(_.toLowerCase(java.util.Locale.ROOT)) == Seq("sum") =>
            f.arguments match {
              case Seq(UnresolvedAttribute(Seq(c))) => sums += c
              case _ => return Left(s"sum takes one bare column, got ${e.sql}")
            }
          case other => return Left(s"unsupported select item ${other.sql}")
        }
      }
      Right((parts, keys, sums.toSeq))
    case _: Aggregate => Left("the FROM clause must be one table " +
      "(no joins, subqueries, or WHERE)")
    case _ => Left("the defining query must be a GROUP BY aggregate")
  }
}

case class CreateSnapshotMvCommand(mvLoc: String, baseLoc: String,
                                   keys: Seq[String], sums: Seq[String])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("base_version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val r = Mv.create(session, mvLoc, baseLoc, keys, sums)
    Seq(Row(r.mvVersion, r.toBase))
  }
}

case class RefreshSnapshotMvCommand(mvLoc: String, full: Boolean)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("from_base", LongType, nullable = false)(),
    AttributeReference("to_base", LongType, nullable = false)(),
    AttributeReference("groups_touched", LongType, nullable = false)(),
    AttributeReference("refreshed", BooleanType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val r = Mv.refresh(session, mvLoc, full)
    Seq(Row(r.mvVersion, r.fromBase, r.toBase, r.groupsTouched,
      r.fromBase != r.toBase || full))
  }
}
