package graft.sources.v2

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedSubqueryColumnAliases}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, ShowViews, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

import graft.ops.Views

/** PERSISTED VIEWS over the snapshot catalog — the SQL wiring for
  * [[graft.ops.Views]] (view text as a versioned metadata object).
  *
  * Spark 4.1 ships the DSv2 `ViewCatalog` interface but no analyzer
  * integration (nothing in the analyzer references it), so the idiomatic
  * extension route is the one production catalogs use: a small parser
  * interceptor turns `CREATE [OR REPLACE] VIEW <cat>.<v> AS …` /
  * `DROP VIEW <cat>.<v>` into catalog commands when — and only when —
  * the identifier's head names a [[SnapshotCatalog]] (every other
  * statement passes through byte-identical), and an injected resolution
  * rule substitutes stored definitions at READ time: an
  * `UnresolvedRelation` the catalog could not resolve as a table, whose
  * location holds a `_view` log, re-parses its stored SQL in place
  * (late binding — underlying schema evolution flows through; a
  * `VERSION AS OF` pin inside the text stays pinned). Both are
  * registered by [[graft.functions.GraftExtensions]].
  *
  * Cycles: CREATE validates its query by analysis (a view over a
  * missing object fails at create), which makes a reference cycle
  * constructible only through OR REPLACE; the substitution rule bounds
  * expansion of any one view at [[SnapshotViewSubstitution.MaxNesting]]
  * and fails with the view's name rather than exhausting the analyzer.
  */
object SnapshotViews {

  /** The SnapshotCatalog registered under `name`, if any. */
  private[v2] def snapCatalog(session: SparkSession,
                              name: String): Option[SnapshotCatalog] =
    try {
      val cm = session.sessionState.catalogManager
      if (!cm.isCatalogRegistered(name)) None
      else cm.catalog(name) match {
        case c: SnapshotCatalog => Some(c)
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private[v2] def viewLocation(session: SparkSession,
                               parts: Seq[String]): Option[String] =
    if (parts.length < 2) None
    else snapCatalog(session, parts.head)
      .map(_.objectLocation(parts.tail.init, parts.last))
}

/** `CREATE [OR REPLACE] VIEW <cat>.<ns…>.<v> [(aliases)] AS <query>`:
  * validates the query by analyzing it against the CURRENT session
  * (invalid references fail the CREATE, not the first read), then
  * publishes the text as the view's next definition version. */
case class CreateSnapshotViewCommand(loc: String, name: String,
                                     viewText: String, aliases: Seq[String],
                                     replace: Boolean, ifNotExists: Boolean)
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val analyzed = session.sql(viewText) // throws on an invalid query
    val width = analyzed.schema.length
    require(aliases.isEmpty || aliases.length == width,
      s"CREATE VIEW $name: ${aliases.length} column aliases for a " +
        s"$width-column query")
    Views.define(session, loc, viewText, aliases, replace, ifNotExists)
    Seq.empty
  }
}

/** `DROP VIEW [IF EXISTS] <cat>.<ns…>.<v>`. */
case class DropSnapshotViewCommand(loc: String, name: String,
                                   ifExists: Boolean)
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (!Views.drop(session, loc) && !ifExists)
      throw new NoSuchElementException(s"view not found: $name")
    Seq.empty
  }
}

/** `SHOW VIEWS IN <cat>[.<ns>] [LIKE 'pattern']`: one directory listing
  * of the namespace — a child is a view iff it has a `_view` log.
  * Pattern semantics follow Spark's SHOW commands: `*` matches any
  * chars, `|` separates alternatives, case-insensitive. */
case class ShowSnapshotViewsCommand(nsLoc: String, ns: Seq[String],
                                    pattern: Option[String],
                                    override val output: Seq[Attribute])
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val dir = new org.apache.hadoop.fs.Path(nsLoc)
    val fs = dir.getFileSystem(session.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return Seq.empty
    val names = fs.listStatus(dir).toSeq
      .filter(st => st.isDirectory &&
        fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_view")))
      .map(_.getPath.getName).sorted
    val keep: String => Boolean = pattern match {
      case None => _ => true
      case Some(p) =>
        val res = p.split('|').map(alt => java.util.regex.Pattern.compile(
          java.util.regex.Pattern.quote(alt).replace("*", "\\E.*\\Q"),
          java.util.regex.Pattern.CASE_INSENSITIVE))
        n => res.exists(_.matcher(n).matches())
    }
    names.filter(keep).map(n => Row(ns.mkString("."), n, false))
  }
}

/** Parser interceptor: CREATE/DROP VIEW statements addressed at a
  * [[SnapshotCatalog]] become snapshot-view commands; everything else —
  * including view DDL for the session catalog — delegates untouched. */
class SnapshotViewParser(session: SparkSession, delegate: ParserInterface)
  extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    // MATERIALIZED VIEW statements are not in Spark's grammar at all,
    // so they intercept on the raw text BEFORE delegation
    SnapshotMvSql.intercept(session, delegate, sqlText).getOrElse(
    delegate.parsePlan(sqlText) match {
      case cv: CreateView =>
        cv.child match {
          case UnresolvedIdentifier(parts, _) =>
            SnapshotViews.viewLocation(session, parts).map { loc =>
              val text = cv.originalText.getOrElse(
                throw new UnsupportedOperationException(
                  s"CREATE VIEW ${parts.mkString(".")} needs literal query text"))
              CreateSnapshotViewCommand(loc, parts.mkString("."), text,
                cv.userSpecifiedColumns.map(_._1),
                cv.replace, cv.allowExisting): LogicalPlan
            }.getOrElse(cv)
          case _ => cv
        }
      case dv: DropView =>
        dv.child match {
          case UnresolvedIdentifier(parts, _) =>
            SnapshotViews.viewLocation(session, parts).map(loc =>
              DropSnapshotViewCommand(loc, parts.mkString("."),
                dv.ifExists): LogicalPlan
            ).getOrElse(dv)
          case _ => dv
        }
      case sv: ShowViews =>
        sv.namespace match {
          case UnresolvedNamespace(parts, _) if parts.nonEmpty =>
            SnapshotViews.snapCatalog(session, parts.head).map(cat =>
              ShowSnapshotViewsCommand(cat.namespaceLocation(parts.tail),
                parts.tail, sv.pattern, sv.output): LogicalPlan
            ).getOrElse(sv)
          case _ => sv
        }
      case p => p
    })

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** Read-side substitution: a relation the catalog left unresolved whose
  * identifier holds a stored view definition expands to that
  * definition's parsed query, aliased under the view's name (declared
  * column aliases apply through the standard
  * `UnresolvedSubqueryColumnAliases`). Runs after the built-in
  * ResolveRelations in the same batch, so real tables never pay the
  * filesystem probe. */
case class SnapshotViewSubstitution(session: SparkSession)
  extends Rule[LogicalPlan] {

  import SnapshotViewSubstitution.MaxNesting

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case u @ UnresolvedRelation(parts, _, false) if parts.length >= 2 =>
      SnapshotViews.viewLocation(session, parts)
        .flatMap(loc => Views.definition(session, loc)) match {
        case Some((text, aliases)) =>
          // recursion = SELF-NESTING depth (the view expanded inside its
          // own expansion), not total occurrences: a wide plan that
          // references one view from 16+ sibling branches is legitimate
          // and must not trip the guard
          if (SnapshotViewSubstitution.selfNestingDepth(plan, parts)
              >= MaxNesting)
            throw new IllegalStateException(
              s"view ${parts.mkString(".")} expands inside itself more " +
                s"than $MaxNesting deep — a recursive view definition " +
                "(constructible only via CREATE OR REPLACE) is not supported")
          val parsed = session.sessionState.sqlParser.parseQuery(text)
          val aliased =
            if (aliases.isEmpty) parsed
            else UnresolvedSubqueryColumnAliases(aliases, parsed)
          SubqueryAlias(parts, aliased)
        case None => u
      }
  }
}

object SnapshotViewSubstitution {
  /** Max SELF-NESTING depth of one view (its expansion inside its own
    * expansion) — the recursion bound. Distinct views nest unlimited;
    * sibling references to one view count once each, not cumulatively. */
  val MaxNesting = 16

  /** Deepest chain of same-name SubqueryAliases on any root-to-leaf
    * path (children and subquery expressions both descend). */
  private[v2] def selfNestingDepth(plan: LogicalPlan,
                                   parts: Seq[String]): Int = {
    def walk(p: LogicalPlan, depth: Int): Int = {
      val d = p match {
        case sa: SubqueryAlias if sa.identifier.name == parts.last &&
            sa.identifier.qualifier == parts.init => depth + 1
        case _ => depth
      }
      val below = p.children ++ p.subqueries
      if (below.isEmpty) d else (d +: below.map(walk(_, d))).max
    }
    walk(plan, 0)
  }
}
