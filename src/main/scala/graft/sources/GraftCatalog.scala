package graft.sources

import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.etl.TxLog

/** Path-keyed `TableCatalog` for TxLog tables — the seam that gives the
  * format STOCK Spark SQL time travel: registering it as
  * `spark.sql.catalog.graft = graft.sources.GraftCatalog` makes
  *
  * {{{
  *   SELECT * FROM graft.`/data/events_t`                      -- latest
  *   SELECT * FROM graft.`/data/events_t` VERSION AS OF 3      -- by version
  *   SELECT * FROM graft.`/data/events_t` TIMESTAMP AS OF '…'  -- by commit ts
  *   CREATE TABLE graft.`/data/new_t` (id BIGINT, day DATE)
  *     PARTITIONED BY (day)
  *   INSERT INTO graft.`/data/new_t` …
  * }}}
  *
  * parse and resolve with NO custom parser: Spark's analyzer routes
  * `VERSION AS OF` to [[loadTable(Identifier,String)]] and
  * `TIMESTAMP AS OF` to [[loadTable(Identifier,Long)]] (micros), the
  * public DSv2 time-travel contract. The identifier IS the table path
  * (one backticked part, no namespaces) — the same authority model as
  * the rest of the format: the filesystem is the catalog, so there is
  * no second metadata store to drift from the log.
  *
  * CREATE TABLE through this catalog commits the declaration
  * immediately ([[TxLog.create]] — schema + partitioning as version 1),
  * unlike the OPTIONS-path provider where CREATE's metadata waits for
  * the first INSERT in the session catalog. DROP only unregisters
  * nothing (the catalog holds no state) and is refused to avoid
  * implying data deletion; VACUUM and filesystem lifecycle own that. */
class GraftCatalog extends TableCatalog {

  private var catalogName = "graft"

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
  }

  override def name(): String = catalogName

  /** The single identifier part is the table's filesystem path. */
  private def pathOf(ident: Identifier): String = {
    require(ident.namespace().isEmpty,
      s"graft catalog identifiers are table paths with no namespace " +
        s"(got ${ident.namespace().mkString(".")}.${ident.name()})")
    TxLogSource.normalize(ident.name())
  }

  override def tableExists(ident: Identifier): Boolean =
    TxLog.versions(pathOf(ident)).nonEmpty

  override def loadTable(ident: Identifier): Table = {
    val p = pathOf(ident)
    if (TxLog.versions(p).isEmpty) throw new NoSuchTableException(ident)
    new TxLogDsv2Table(p, TxLogSource.declaredOrInferred(p))
  }

  /** `VERSION AS OF v` — bind the snapshot AND its contemporary schema
    * (an evolved table reads each version with its own columns). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = pathOf(ident)
    val v = try version.trim.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"VERSION AS OF takes a numeric TxLog version, got '$version'")
    }
    require(TxLog.versions(p).contains(v),
      s"no committed version $v of $p (have ${TxLog.versions(p).mkString(", ")})")
    new TxLogDsv2Table(p, TxLogSource.declaredOrInferred(p, Some(v)), Some(v))
  }

  /** `TIMESTAMP AS OF ts` — Spark hands epoch MICROseconds; resolution
    * uses the log's monotonized in-commit timestamps
    * ([[TxLog.versionAsOf]] takes millis). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val p = pathOf(ident)
    val v = TxLog.versionAsOf(p, timestamp / 1000L).getOrElse(
      throw new IllegalArgumentException(
        s"no committed version of $p at or before timestamp " +
          s"${timestamp / 1000L} ms"))
    new TxLogDsv2Table(p, TxLogSource.declaredOrInferred(p, Some(v)), Some(v))
  }

  /** `CREATE TABLE … (c T DEFAULT expr, g T GENERATED ALWAYS AS (expr))`
    * support (round 15): with these capabilities the analyzer accepts
    * both clauses and ships each in the column's metadata
    * (CURRENT_DEFAULT / generationExpression); [[createTable]] converts
    * them to the log's own `default` / `gencol` declarations. */
  override def capabilities()
      : java.util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS)

  /** The analyzer's CREATE path (Spark 4 Column form): DEFAULT clauses
    * and GENERATED ALWAYS AS expressions arrive as FIRST-CLASS Column
    * fields here (the deprecated StructType bridge drops generation
    * expressions), converted to the log's own `default` / `gencol`
    * declarations — the LOG stays the source of truth. */
  override def createTable(ident: Identifier,
                           columns: Array[org.apache.spark.sql.connector.catalog.Column],
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    val schema = StructType(columns.map { c =>
      org.apache.spark.sql.types.StructField(
        c.name(), c.dataType(), c.nullable())
    })
    val defaults = columns.toSeq.collect {
      case c if c.defaultValue() != null => c.name() -> c.defaultValue().getSql
    }
    val gens = columns.toSeq.collect {
      case c if c.generationExpression() != null =>
        c.name() -> c.generationExpression()
    }
    val idents = columns.toSeq.collect {
      case c if c.identityColumnSpec() != null =>
        val s = c.identityColumnSpec()
        (c.name(), s.getStart, s.getStep, s.isAllowExplicitInsert)
    }
    createImpl(ident, schema, partitions, defaults, gens, idents, properties)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    // deprecated bridge form: DEFAULTs may still arrive as column
    // metadata (CURRENT_DEFAULT); generation expressions cannot
    val curKey = org.apache.spark.sql.catalyst.util
      .ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY
    val defaults = schema.fields.toSeq.collect {
      case f if f.metadata.contains(curKey) =>
        f.name -> f.metadata.getString(curKey)
    }
    createImpl(ident, schema, partitions, defaults, Nil, Nil, properties)
  }

  /** Engine-reserved property keys Spark injects into every CREATE —
    * never user intent, never persisted. */
  private val ReservedProps =
    Set("provider", "location", "owner", "external", "is_managed_location",
      "path")

  private def createImpl(ident: Identifier, schema: StructType,
                         partitions: Array[Transform],
                         defaults: Seq[(String, String)],
                         gens: Seq[(String, String)],
                         idents: Seq[(String, Long, Long, Boolean)] = Nil,
                         properties: java.util.Map[String, String] =
                           java.util.Collections.emptyMap()): Table = {
    val p = pathOf(ident)
    if (TxLog.versions(p).nonEmpty) throw new TableAlreadyExistsException(ident)
    val partCols = partitions.toSeq.map { t =>
      val refs = t.references()
      require(t.name() == "identity" && refs.length == 1 &&
        refs.head.fieldNames().length == 1,
        s"txlog supports PARTITIONED BY plain columns only, got $t")
      refs.head.fieldNames().head
    }
    val clean = StructType(schema.fields.map(
      _.copy(metadata = org.apache.spark.sql.types.Metadata.empty)))
    val spark = org.apache.spark.sql.SparkSession.active
    // validate EVERY declaration BEFORE the create commit (round-16,
    // ADVICE r15 #5): the per-verb DDL calls below run after TxLog.create
    // has already published version 1, so a declaration they would
    // refuse (IDENTITY on a non-BIGINT column, a non-constant DEFAULT,
    // a generation expression of the wrong type) must fail HERE — a
    // mid-way failure would otherwise leave a half-created table whose
    // corrected CREATE retry hits TableAlreadyExistsException. The
    // checks mirror setColumnDefault / addGeneratedColumn /
    // addIdentityColumn against the in-memory schema.
    locally {
      import org.apache.spark.sql.functions.expr
      val byName = clean.fields.map(f => f.name -> f).toMap
      val genNames = gens.map(_._1).toSet
      val defNames = defaults.map(_._1).toSet
      def emptyProbe(s: StructType) = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), s)
      def typeOk(resolved: org.apache.spark.sql.types.DataType,
                 declared: org.apache.spark.sql.types.DataType): Boolean =
        resolved == declared ||
          org.apache.spark.sql.catalyst.expressions.Cast
            .canUpCast(resolved, declared)
      defaults.foreach { case (n, sql) =>
        val f = byName.getOrElse(n, throw new IllegalArgumentException(
          s"DEFAULT on unknown column $n"))
        val resolved =
          try emptyProbe(StructType(Nil)).select(expr(sql)).schema.head.dataType
          catch { case e: org.apache.spark.sql.AnalysisException =>
            throw new IllegalArgumentException(
              s"DEFAULT for $n must be a constant expression: ${e.getMessage}")
          }
        require(typeOk(resolved, f.dataType),
          s"DEFAULT for $n yields ${resolved.simpleString} but the column " +
            s"is declared ${f.dataType.simpleString} — cast inside the " +
            "expression")
      }
      gens.foreach { case (n, sql) =>
        val f = byName.getOrElse(n, throw new IllegalArgumentException(
          s"GENERATED column $n is not in the declared schema"))
        val others = StructType(clean.fields.filterNot(x =>
          x.name == n || genNames(x.name)))
        val resolved = emptyProbe(others).select(expr(sql)).schema.head.dataType
        require(typeOk(resolved, f.dataType),
          s"generation expression for $n yields ${resolved.simpleString} " +
            s"but the column is declared ${f.dataType.simpleString} — cast " +
            "inside the expression")
      }
      idents.foreach { case (n, _, step, _) =>
        require(step != 0L, "IDENTITY step must be non-zero")
        val f = byName.getOrElse(n, throw new IllegalArgumentException(
          s"IDENTITY column $n is not in the declared schema"))
        require(f.dataType == org.apache.spark.sql.types.LongType,
          s"identity column $n must be declared BIGINT")
        require(!genNames(n) && !defNames(n),
          s"$n already carries a generated/default declaration")
      }
    }
    TxLog.create(p, clean, partCols)
    defaults.foreach { case (n, sql) =>
      TxLog.setColumnDefault(spark, p, n, sql)
    }
    // generated and identity columns declare on the still-empty table
    // (the creation-time rule both verbs enforce)
    gens.foreach { case (n, sql) =>
      TxLog.addGeneratedColumn(spark, p, n, sql)
    }
    idents.foreach { case (n, start, step, allowExplicit) =>
      TxLog.addIdentityColumn(p, n, start, step, allowExplicit)
    }
    // TBLPROPERTIES persist at create (round 15 — previously dropped):
    // the table property is how CDF and friends are enabled, so
    // `CREATE TABLE … TBLPROPERTIES ('graft.changeDataFeed'='true')`
    // must work through plain SQL. Spark-injected engine keys and
    // `option.`-prefixed reader options are never user intent.
    import scala.jdk.CollectionConverters._
    val userProps = properties.asScala.toMap.filterNot { case (k, _) =>
      ReservedProps(k) || k.startsWith("option.")
    }
    if (userProps.nonEmpty) TxLog.setProperties(p, userProps)
    new TxLogDsv2Table(p, TxLogSource.declaredOrInferred(p), None, partCols)
  }

  /** ADD-COLUMN changes only — the shape the analyzer's
    * ResolveMergeIntoSchemaEvolution rule emits for
    * `MERGE ... WITH SCHEMA EVOLUTION` over a catalog-identified target
    * (round-15, VERDICT r14 #2): Spark evolves the declaration through
    * the catalog at analysis time, then replans against the reloaded
    * table, so explicit-clause evolution works through plain SQL. Each
    * AddColumn maps to [[TxLog.addColumns]] (one metadata commit — the
    * SQL path's evolution is a separate commit from the merge, unlike
    * the API path's same-commit widening). Everything else stays
    * refused. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val p = pathOf(ident)
    val adds = changes.collect {
      case a: org.apache.spark.sql.connector.catalog.TableChange.AddColumn => a
    }
    if (adds.size != changes.size || adds.isEmpty)
      throw new UnsupportedOperationException(
        "ALTER through the graft catalog supports ADD COLUMNS only — use " +
          "the TxLog DDL statements (RENAME/DROP/TYPE via the session-" +
          "catalog table, or the TxLog API)")
    val cols = adds.map { a =>
      require(a.fieldNames().length == 1,
        s"txlog columns are top-level; got ${a.fieldNames().mkString(".")}")
      org.apache.spark.sql.types.StructField(
        a.fieldNames().head, a.dataType(), nullable = true)
    }
    TxLog.addColumns(p, StructType(cols.toArray))
    new TxLogDsv2Table(p, TxLogSource.declaredOrInferred(p))
  }

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "DROP through the graft catalog is refused: the path IS the table " +
        "and this catalog holds no registration to remove — delete the " +
        "directory (after VACUUM) to drop the data")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "RENAME through the graft catalog is not supported — the path is " +
        "the identity; CLONE to a new path instead")

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // pathless: the filesystem is the namespace
}
