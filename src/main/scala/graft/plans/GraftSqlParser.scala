package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StructType}
import org.apache.spark.sql.Row

/** Parser extension: first-class SQL syntax for the table-maintenance
  * and merge operations —
  * `GRAFT OPTIMIZE '<path>' [FILES n] [ZORDER BY (x, y)]`,
  * `GRAFT VACUUM '<path>' [RETAIN n HOURS]`, and
  * `GRAFT MERGE INTO '<path>' USING <source> KEY (k…)` — exactly how
  * production table formats
  * surface OPTIMIZE/VACUUM (a delegating parser that claims its own
  * statements and passes EVERYTHING else through untouched, so the
  * whole stock SQL surface is unaffected; ExtensionsSafetySpec's
  * all-queries-identical guarantee covers the delegation).
  *
  * Installed via [[GraftExtensions]] (`injectParser`). */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  // target alternatives shared by every maintenance statement: a
  // quoted path, or a catalog-qualified identifier resolved through
  // the session CatalogManager (the Delta/Iceberg surface shape)
  private val Target = """(?:'([^']+)'|([A-Za-z_][\w.]*))"""

  private val Optimize =
    (s"""(?is)\\s*GRAFT\\s+OPTIMIZE\\s+$Target(?:\\s+FILES\\s+(\\d+))?""" +
      """(?:\s+ZORDER\s+BY\s*\(\s*([A-Za-z_]\w*)\s*,\s*([A-Za-z_]\w*)\s*\))?\s*;?\s*""").r
  private val Vacuum =
    s"""(?is)\\s*GRAFT\\s+VACUUM\\s+$Target(?:\\s+RETAIN\\s+(\\d+)\\s+HOURS)?\\s*;?\\s*""".r
  private val Merge =
    s"""(?is)\\s*GRAFT\\s+MERGE\\s+INTO\\s+$Target\\s+USING\\s+(.+?)\\s+KEY\\s*\\(([^)]+)\\)\\s*;?\\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Optimize(path, ident, files, zx, zy) =>
      GraftOptimizeCommand(Option(path).getOrElse(ident),
        Option(files).map(_.toInt).getOrElse(1),
        Option(zx).map(x => (x, zy)), targetIsPath = path != null)
    case Vacuum(path, ident, retain) =>
      // Delta-style retention override; default 1 h protects files a
      // concurrent commit moved into the root before its manifest write
      GraftVacuumCommand(Option(path).getOrElse(ident),
        Option(retain).map(_.toLong * 3600000L).getOrElse(3600000L),
        targetIsPath = path != null)
    case Merge(path, ident, source, keys) =>
      GraftMergeCommand(Option(path).getOrElse(ident), source.trim,
        keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
        targetIsPath = path != null)
    case _ => delegate.parsePlan(sqlText)
  }

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
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** Shared target resolution for the maintenance statements: a quoted
  * path passes through; a catalog identifier resolves through the
  * session CatalogManager and must be a manifest table (a non-manifest
  * table is a loud error — maintenance must not guess a storage
  * location). */
private[plans] object GraftTarget {
  def resolvePath(spark: SparkSession, target: String, targetIsPath: Boolean,
      stmt: String): String =
    if (targetIsPath) target
    else {
      val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(target)
      require(parts.length >= 2,
        s"$stmt <ident> needs a catalog-qualified name, got '$target'")
      val catalog = spark.sessionState.catalogManager.catalog(parts.head)
      val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
        parts.tail.init.toArray, parts.last)
      catalog.asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
        .loadTable(ident) match {
          case mt: graft.sources.ManifestTable => mt.tablePath
          case other => throw new IllegalArgumentException(
            s"$stmt supports manifest tables only; " +
              s"'$target' resolved to ${other.getClass.getSimpleName}")
        }
    }
}

/** `GRAFT OPTIMIZE <'path'|catalog.db.table> [FILES n]
  * [ZORDER BY (x, y)]` — file compaction, optionally
  * multi-dimensionally clustered (see
  * [[graft.sources.ManifestOptimize.compactFiles]]). */
case class GraftOptimizeCommand(target: String, nFiles: Int,
    zorderBy: Option[(String, String)] = None, targetIsPath: Boolean = true)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq.empty
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftTarget.resolvePath(spark, target, targetIsPath, "GRAFT OPTIMIZE")
    graft.sources.ManifestOptimize.compactFiles(spark, path, nFiles, zorderBy)
    Seq.empty
  }
}

/** `GRAFT VACUUM <'path'|catalog.db.table> [RETAIN n HOURS]`. */
case class GraftVacuumCommand(target: String, graceMs: Long = 3600000L,
    targetIsPath: Boolean = true)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("reclaimed", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftTarget.resolvePath(spark, target, targetIsPath, "GRAFT VACUUM")
    Seq(Row(graft.sources.ManifestOptimize.vacuum(path, graceMs).toLong))
  }
}

/** `GRAFT MERGE INTO <'path'|catalog.db.table> USING <source>
  * KEY (k1, k2, …)` — keyed upsert (MERGE semantics) as first-class
  * SQL over a manifest table: source rows REPLACE current rows sharing
  * their key, everything else inserts
  * ([[graft.sources.ManifestUpsert]]'s copy-on-write swap under
  * optimistic concurrency). The target is a quoted path OR a catalog
  * identifier resolved through the session's CatalogManager to a
  * manifest table (a non-manifest table is a loud error — MERGE must
  * not guess a storage location). `<source>` is either a table/view
  * name or a parenthesized SELECT — parsed by the DELEGATE parser, so
  * the whole stock expression surface is available inside it. Returns
  * the table's new logical version (the merge is one more commit). */
case class GraftMergeCommand(target: String, source: String, keys: Seq[String],
    targetIsPath: Boolean = true)
    extends LeafRunnableCommand {
  require(keys.nonEmpty, "GRAFT MERGE INTO requires at least one KEY column")
  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  private def resolvePath(spark: SparkSession): String =
    GraftTarget.resolvePath(spark, target, targetIsPath, "GRAFT MERGE INTO")

  /** True iff the leading '(' matches the trailing ')' — i.e. the
    * outer parens wrap the WHOLE source. `(SELECT 1) UNION ALL
    * (SELECT 2)` starts with '(' and ends with ')' but stripping them
    * would leave unbalanced SQL; there the text goes to spark.sql
    * unchanged. (A paren inside a string literal would defeat a plain
    * balance scan, but then the stripped text still parses — this
    * check only decides which well-formed text to hand the parser.) */
  private def outerParensMatch(s: String): Boolean = {
    var depth = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          // closed the opener before the end → the outer pair doesn't
          // span the whole string
          if (depth == 0 && i < s.length - 1) return false
        case _ =>
      }
      i += 1
    }
    depth == 0
  }

  override def run(spark: SparkSession): Seq[Row] = {
    val path = resolvePath(spark)
    val batch =
      if (source.startsWith("(") && source.endsWith(")") && outerParensMatch(source))
        spark.sql(source.substring(1, source.length - 1))
      else if (source.startsWith("(")) spark.sql(source)
      else spark.table(source)
    graft.sources.ManifestUpsert.upsert(path, batch, keys)
    Seq(Row(graft.sources.ManifestSink.logicalCount(new java.io.File(path)).toLong))
  }
}
