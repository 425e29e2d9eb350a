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
  * operations — `GRAFT OPTIMIZE '<path>' [FILES n]` and
  * `GRAFT VACUUM '<path>' [RETAIN n HOURS]` — exactly how production
  * table formats
  * surface OPTIMIZE/VACUUM (a delegating parser that claims its own
  * statements and passes EVERYTHING else through untouched, so the
  * whole stock SQL surface is unaffected; ExtensionsSafetySpec's
  * all-queries-identical guarantee covers the delegation).
  *
  * Installed via [[GraftExtensions]] (`injectParser`). */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val Optimize =
    """(?is)\s*GRAFT\s+OPTIMIZE\s+'([^']+)'(?:\s+FILES\s+(\d+))?\s*;?\s*""".r
  private val Vacuum =
    """(?is)\s*GRAFT\s+VACUUM\s+'([^']+)'(?:\s+RETAIN\s+(\d+)\s+HOURS)?\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Optimize(path, files) =>
      GraftOptimizeCommand(path, Option(files).map(_.toInt).getOrElse(1))
    case Vacuum(path, retain) =>
      // Delta-style retention override; default 1 h protects files a
      // concurrent commit moved into the root before its manifest write
      GraftVacuumCommand(path,
        Option(retain).map(_.toLong * 3600000L).getOrElse(3600000L))
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

case class GraftOptimizeCommand(path: String, nFiles: Int)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq.empty
  override def run(spark: SparkSession): Seq[Row] = {
    graft.sources.ManifestOptimize.compactFiles(spark, path, nFiles)
    Seq.empty
  }
}

case class GraftVacuumCommand(path: String, graceMs: Long = 3600000L)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("reclaimed", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(graft.sources.ManifestOptimize.vacuum(path, graceMs).toLong))
}
