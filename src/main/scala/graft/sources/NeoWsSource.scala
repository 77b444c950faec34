package graft.sources

import java.time.{LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.util.Locale

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for NASA NeoWs feed documents:
  * `spark.read.format("graft.sources.NeoWsSource").load(path)` yields the
  * flattened one-row-per-asteroid silver data columns directly (the S4+P1-P3
  * surface of `/root/reference/src/etl/bronze_to_silver.py:31-78` as a
  * first-class Spark table).
  *
  * Why a connector and not just the DataFrame path (`BronzeToSilver`):
  *   - one InputPartition PER FEED FILE — a year of daily feeds scans as 365
  *     parallel tasks with no driver-side loop;
  *   - column pruning is pushed into the reader
  *     (`SupportsPushDownRequiredColumns`): `select(asteroid_id)` converts
  *     only one field per row instead of 19 (the parse itself is shared);
  *   - no multiline-JSON inference pass, ever.
  *
  * Value semantics mirror the DataFrame path exactly (the
  * `NeoWsSourceSpec` asserts row-set equality on the fixtures): numerics-
  * in-strings parse leniently to null on malformed input (`try_cast`
  * parity), `close_approach_data[0]` null-safe, timestamps parsed as
  * `yyyy-MMM-dd HH:mm` in UTC with US month names.
  */
class NeoWsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NeoWsSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new NeoWsTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object NeoWsSource {
  /** The 19 silver data columns (audit columns are stamped by the ETL
    * layer, not the source — SURVEY §1.4). */
  val schema: StructType = StructType(Seq(
    StructField("asteroid_id", StringType),
    StructField("neo_id", StringType),
    StructField("asteroid_name", StringType),
    StructField("magnitude", DoubleType),
    StructField("is_hazardous", BooleanType),
    StructField("is_sentry", BooleanType),
    StructField("diameter_min_km", DoubleType),
    StructField("diameter_max_km", DoubleType),
    StructField("diameter_min_m", DoubleType),
    StructField("diameter_max_m", DoubleType),
    StructField("jpl_url", StringType),
    StructField("approach_date", DateType),
    StructField("approach_datetime", TimestampType),
    StructField("approaching_body", StringType),
    StructField("velocity_km_s", DoubleType),
    StructField("velocity_km_h", DoubleType),
    StructField("miss_distance_km", DoubleType),
    StructField("miss_distance_au", DoubleType),
    StructField("miss_distance_lunar", DoubleType)))

  private val tsFormat = DateTimeFormatter.ofPattern("yyyy-MMM-dd HH:mm", Locale.US)

  private def str(n: JsonNode): Any =
    if (n == null || n.isNull) null else UTF8String.fromString(n.asText)

  private def dbl(n: JsonNode): Any =
    if (n == null || n.isNull) null
    else if (n.isNumber) java.lang.Double.valueOf(n.doubleValue)
    else try java.lang.Double.valueOf(n.asText.trim.toDouble)
    catch { case _: NumberFormatException => null }

  private def bool(n: JsonNode): Any =
    if (n == null || !n.isBoolean) null else java.lang.Boolean.valueOf(n.booleanValue)

  private def date(n: JsonNode): Any =
    if (n == null || n.isNull) null
    else try Integer.valueOf(LocalDate.parse(n.asText.trim).toEpochDay.toInt)
    catch { case _: Exception => null }

  private def ts(n: JsonNode): Any =
    if (n == null || n.isNull) null
    else try {
      val ldt = LocalDateTime.parse(n.asText.trim, tsFormat)
      java.lang.Long.valueOf(ldt.toInstant(ZoneOffset.UTC).getEpochSecond * 1000000L +
        ldt.getNano / 1000L)
    } catch { case _: Exception => null }

  /** Full 19-value row for one asteroid node, in schema order. */
  private[sources] def values(ast: JsonNode): Array[Any] = {
    val approach =
      if (ast.get("close_approach_data") != null && ast.get("close_approach_data").size() > 0)
        ast.get("close_approach_data").get(0)
      else null
    def a(field: String): JsonNode = if (approach == null) null else approach.get(field)
    def sub(parent: JsonNode, field: String): JsonNode =
      if (parent == null) null else parent.get(field)
    val diam = ast.get("estimated_diameter")
    Array[Any](
      str(ast.get("id")),
      str(ast.get("neo_reference_id")),
      str(ast.get("name")),
      dbl(ast.get("absolute_magnitude_h")),
      bool(ast.get("is_potentially_hazardous_asteroid")),
      bool(ast.get("is_sentry_object")),
      dbl(sub(sub(diam, "kilometers"), "estimated_diameter_min")),
      dbl(sub(sub(diam, "kilometers"), "estimated_diameter_max")),
      dbl(sub(sub(diam, "meters"), "estimated_diameter_min")),
      dbl(sub(sub(diam, "meters"), "estimated_diameter_max")),
      str(ast.get("nasa_jpl_url")),
      date(a("close_approach_date")),
      ts(a("close_approach_date_full")),
      str(a("orbiting_body")),
      dbl(sub(a("relative_velocity"), "kilometers_per_second")),
      dbl(sub(a("relative_velocity"), "kilometers_per_hour")),
      dbl(sub(a("miss_distance"), "kilometers")),
      dbl(sub(a("miss_distance"), "astronomical")),
      dbl(sub(a("miss_distance"), "lunar")))
  }
}

private[sources] class NeoWsTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"neows($path)"
  override def schema(): StructType = NeoWsSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NeoWsScanBuilder(path)
}

private[sources] class NeoWsScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = NeoWsSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve source order; an empty prune (count(*)) keeps zero fields
    required = StructType(NeoWsSource.schema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new NeoWsScan(path, required)
}

private[sources] class NeoWsScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** One partition per feed file: a directory of daily feeds parallelizes
    * across the cluster with no driver-side parse. */
  override def planInputPartitions(): Array[InputPartition] = {
    val hconf = SparkSession.active.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.isFile)
          // skip metadata/hidden files by FILE NAME (_SUCCESS, _metadata,
          // .crc…), matching Spark's default PathFilter; the full URI
          // (file:/dir/_SUCCESS) never starts with '_', so a path-string
          // prefix test would let them through to the JSON parser
          .filter { st =>
            val n = st.getPath.getName
            !n.startsWith("_") && !n.startsWith(".")
          }
          .map(_.getPath.toString).sorted
      else Array(path)
    files.map(f => NeoWsInputPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // capture the session's Hadoop conf on the driver: executors must open
    // files with the user's fs.* options (S3 credentials, endpoints), not a
    // default Configuration() — same contract as Spark's file-based DSv2
    new NeoWsReaderFactory(NeoWsSource.schema.fieldNames.zipWithIndex.toMap,
      required.fieldNames,
      new org.apache.spark.util.SerializableConfiguration(
        SparkSession.active.sessionState.newHadoopConf()))
}

private[sources] case class NeoWsInputPartition(file: String) extends InputPartition

private[sources] class NeoWsReaderFactory(
    fullIndex: Map[String, Int], requiredFields: Array[String],
    hconf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[NeoWsInputPartition].file
    new NeoWsPartitionReader(file, requiredFields.map(fullIndex), hconf.value)
  }
}

/** Streams one feed document: Jackson tree parse (feed files are single
  * multiline JSON documents, so a whole-doc parse is the unit of work),
  * then an iterator over `near_earth_objects.{date}[*]` across ALL dates. */
private[sources] class NeoWsPartitionReader(
    file: String, projection: Array[Int], hconf: Configuration)
    extends PartitionReader[InternalRow] {

  private val asteroids: Iterator[JsonNode] = {
    val p = new Path(file)
    val fs = p.getFileSystem(hconf)
    val in = fs.open(p)
    val root = try new ObjectMapper().readTree(in) finally in.close()
    val neo = root.get("near_earth_objects")
    if (neo == null) Iterator.empty
    else {
      import scala.jdk.CollectionConverters._
      neo.properties().asScala.iterator.flatMap(_.getValue.elements().asScala)
    }
  }

  private var current: InternalRow = _

  override def next(): Boolean =
    if (asteroids.hasNext) {
      val full = NeoWsSource.values(asteroids.next())
      current = new GenericInternalRow(projection.map(full))
      true
    } else false

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
