package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{
  FunctionCatalog, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.UnboundFunction
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** V2 catalog plugin exposing graft's DSv2 tables to plain SQL:
  *
  *   spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/some/dir")
  *   SELECT * FROM graft.db.image_catalog            -- generated catalog
  *   SELECT * FROM graft.db.`manifest:/path/to/tbl`  -- manifest table
  *
  * `image_catalog` maps to the pushdown-capable generated source
  * (row count via table option in the identifier is fixed at the
  * catalog default); `manifest:<path>` resolves a manifest-committed
  * table by path, and bare names resolve under the configured
  * warehouse directory — CREATE TABLE AS SELECT works against them
  * through the standard `createTable` path. Everything else
  * (alter/rename) is unsupported by design: the catalog is a window
  * onto immutable, manifest-committed data, not a mutable metastore.
  */
class GraftCatalog extends TableCatalog with FunctionCatalog {
  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      System.getProperty("java.io.tmpdir") + "/graft_warehouse")
  }
  override def name(): String = catalogName

  private def pathOf(ident: Identifier): String =
    if (ident.name.startsWith("manifest:")) ident.name.stripPrefix("manifest:")
    else s"$warehouse/${(ident.namespace :+ ident.name).mkString("/")}"

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new java.io.File(s"$warehouse/${namespace.mkString("/")}")
    val found = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && new java.io.File(f, ManifestSink.SchemaFile).exists())
      .map(f => Identifier.of(namespace, f.getName))
    found :+ Identifier.of(namespace, "image_catalog")
  }

  override def loadTable(ident: Identifier): Table =
    if (ident.name == "image_catalog")
      new ImageCatalogTable(10000L, 4)
    else {
      val path = pathOf(ident)
      if (!new java.io.File(path, ManifestSink.SchemaFile).exists())
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
      new ManifestTable(path, StructType(Nil))
    }

  /** SQL time travel: `SELECT … FROM graft.db.t VERSION AS OF n`
    * resolves here — the returned table is PINNED to the first `n`
    * logical commits (every commit is a retained snapshot boundary,
    * the `asOfManifest` contract), so the pin survives any reader
    * options downstream. Weight-aware: `n` counts logical commits even
    * after manifest compaction folded them into a checkpoint. */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (ident.name == "image_catalog")
      throw new UnsupportedOperationException(
        "image_catalog is a generated source with no commit history")
    val n = try version.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft versions are logical commit counts, got '$version'")
    }
    val path = pathOf(ident)
    if (!new java.io.File(path, ManifestSink.SchemaFile).exists())
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    new ManifestTable(path, StructType(Nil), pinnedAsOf = Some(n))
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty, "graft catalog tables are unpartitioned")
    val path = pathOf(ident)
    new java.io.File(path).mkdirs()
    val schemaFile = new java.io.File(path, ManifestSink.SchemaFile)
    if (!schemaFile.exists())
      java.nio.file.Files.write(schemaFile.toPath,
        schema.toDDL.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    new ManifestTable(path, schema)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft tables are immutable manifest logs; write a new table instead")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = new java.io.File(pathOf(ident))
    if (!dir.exists()) false
    else {
      Option(dir.listFiles()).foreach(_.foreach { f =>
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(_.delete()))
        f.delete()
      })
      dir.delete()
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("rename is not supported")

  // ---- FunctionCatalog: graft kernels callable from pure SQL ----

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    GraftFunctions.names.map(Identifier.of(namespace, _)).toArray

  override def loadFunction(ident: Identifier): UnboundFunction =
    GraftFunctions.load(ident.name).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(
        ident.namespace.mkString("."), ident.name))
}
