package graft.catalog

import graft.dialect.DialectException
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Persistent catalog: one database = one directory holding
  * `schema.json` plus a parquet dataset directory per table — the Spark
  * re-expression of the reference's `schema.json` + `<table>.dat` NDJSON
  * layout (reference `pkg/schema/types.go:31-36`, SURVEY.md §1).
  *
  * The reference's 5 column types map to Spark types (SURVEY §1 table):
  * INT→LongType, TEXT→StringType, DECIMAL→DoubleType (the reference uses
  * float64, not exact decimal), BOOL→BooleanType, IMAGE→StringType
  * (a resolved filesystem path).
  *
  * At scale each table directory is just a parquet dataset — it can be
  * partitioned/bucketed and read by a 1000-executor cluster unchanged.
  */
final class Catalog(val spark: SparkSession, val dbPath: String) {
  import Catalog._

  private val root: Path = Paths.get(dbPath)
  private val schemaFile: Path = root.resolve("schema.json")
  Files.createDirectories(root)

  /** name → table spec (declared columns + partition columns). */
  @volatile private var tables: Map[String, TableSpec] = loadSchema()

  private def loadSchema(): Map[String, TableSpec] =
    if (!Files.exists(schemaFile)) Map.empty
    else parseSchemaJson(Files.readString(schemaFile))

  private def save(): Unit =
    Files.writeString(schemaFile, renderSchemaJson(tables))

  def listTables: Seq[String] = tables.keys.toSeq.sorted

  def exists(name: String): Boolean = tables.contains(name)

  def specOf(name: String): TableSpec =
    tables.getOrElse(name, throw DialectException(s"table not found: $name"))

  def columnsOf(name: String): Seq[(String, String)] = specOf(name).columns

  def sparkSchema(name: String): StructType =
    StructType(columnsOf(name).map { case (n, t) => StructField(n, toSparkType(t)) })

  /** Table directory under the DB root. Validates the name on EVERY
    * path resolution (not just create) so a quoted identifier like
    * `'../../x'` — reachable from the HTTP API via CREATE/DROP TABLE or
    * ?table= upload — can never escape the root: create would
    * `createDirectories` outside it and drop would `deleteRecursively`
    * an arbitrary directory. Mirrors the conversation-id check in
    * Server.convFile.
    */
  def tableDir(name: String): Path = {
    requireValidTableName(name)
    root.resolve(name)
  }

  /** Create a table; `partitionBy` columns become hive-style directory
    * partitions — the 100 TB layout where partition pruning turns a
    * full scan into a handful of directory reads.
    */
  def create(name: String, columns: Seq[(String, String)],
      partitionBy: Seq[String] = Nil): Unit = synchronized {
    requireValidTableName(name)
    if (tables.contains(name)) throw DialectException(s"table already exists: $name")
    columns.foreach { case (_, t) =>
      if (!dialectTypes.contains(t.toUpperCase))
        throw DialectException(s"invalid column type: $t")
    }
    partitionBy.foreach { p =>
      if (!columns.exists(_._1.equalsIgnoreCase(p)))
        throw DialectException(s"partition column not in schema: $p")
    }
    Files.createDirectories(tableDir(name))
    tables += name -> TableSpec(
      columns.map { case (n, t) => (n, t.toUpperCase) }, partitionBy)
    save()
  }

  def drop(name: String): Unit = synchronized {
    if (!tables.contains(name)) throw DialectException(s"table not found: $name")
    deleteRecursively(tableDir(name))
    tables -= name
    save()
  }

  /** Read a table; empty table (no parquet yet) yields an empty frame
    * with the declared schema. Partitioned tables are read without a
    * fixed schema (partition columns come from the directory layout)
    * and re-projected to declared column order.
    */
  def load(name: String): DataFrame = {
    val dir = tableDir(name)
    val spec = specOf(name)
    val schema = sparkSchema(name)
    val hasData = Files.exists(dir) && {
      val s = Files.walk(dir)
      try s.iterator.asScala.exists(_.toString.endsWith(".parquet"))
      finally s.close()
    }
    if (!hasData)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else if (spec.partitionBy.isEmpty)
      spark.read.schema(schema).parquet(dir.toString)
    else {
      import org.apache.spark.sql.functions.col
      spark.read.parquet(dir.toString)
        .select(schema.fields.toSeq.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
    }
  }

  /** Append rows (the reference's buffered AppendRow, S2); partitioned
    * tables append into their hive-style partition directories.
    * Synchronized with overwrite(): an append landing between
    * overwrite's read and its directory swap would be silently lost
    * (the staged copy lacks it and the old dir is deleted) — same
    * coarse per-catalog locking the reference uses for its files.
    */
  def append(name: String, df: DataFrame): Unit = synchronized {
    val spec = specOf(name)
    val w = df.write.mode("append")
    (if (spec.partitionBy.nonEmpty) w.partitionBy(spec.partitionBy: _*) else w)
      .parquet(tableDir(name).toString)
  }

  /** Full-table replace via stage-to-temp + atomic directory swap —
    * Spark cannot overwrite its own input mid-read, so this mirrors the
    * reference's temp-file + fsync + rename (reference
    * `pkg/storage/storage.go:251-316`, SURVEY §7 "What's hard" #3).
    */
  def overwrite(name: String, df: DataFrame): Unit = synchronized {
    columnsOf(name)
    val dir = tableDir(name)
    val tmp = root.resolve(s".$name.tmp")
    val old = root.resolve(s".$name.old")
    deleteRecursively(tmp); deleteRecursively(old)
    val spec = specOf(name)
    val w = df.write.mode("overwrite")
    (if (spec.partitionBy.nonEmpty) w.partitionBy(spec.partitionBy: _*) else w)
      .parquet(tmp.toString)
    if (Files.exists(dir)) Files.move(dir, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
  }

  /** Register/refresh every table as a temp view. */
  def registerAll(): Unit =
    tables.keys.foreach(n => load(n).createOrReplaceTempView(n))

  /** Parquet file statistics for a table — the compaction signal.
    * Every append writes at least one new file per task, so a
    * frequently-appended table degrades into thousands of small files
    * whose per-file open/footer cost dominates scans at scale.
    */
  def fileStats(name: String): Catalog.FileStats = {
    columnsOf(name)
    val dir = tableDir(name)
    if (!Files.exists(dir)) return Catalog.FileStats(0, 0L, 0L)
    val s = Files.walk(dir)
    val sizes =
      try s.iterator.asScala.filter(_.toString.endsWith(".parquet"))
        .map(Files.size).toVector
      finally s.close()
    Catalog.FileStats(sizes.size, sizes.sum,
      if (sizes.isEmpty) 0L else sizes.max)
  }

  /** Rewrite a table into files sized near `targetFileBytes` via the
    * same atomic staged-overwrite swap (readers never see a partial
    * table). Partitioned tables are re-split on their partition
    * columns; maxRecordsPerFile (rows estimated from the current
    * bytes/row) then caps every output file, so one huge hive
    * partition still lands as several right-sized files instead of a
    * single task-sized one. The row data is unchanged — this is pure
    * layout maintenance.
    */
  def compact(name: String, targetFileBytes: Long = 128L << 20): Unit = synchronized {
    val stats = fileStats(name)
    // already one right-sized file (or empty): nothing to rewrite
    if (stats.fileCount <= 1 && stats.totalBytes <= targetFileBytes) return
    val nFiles = math.max(1,
      math.ceil(stats.totalBytes.toDouble / targetFileBytes).toInt)
    val spec = specOf(name)
    val df = load(name)
    // near-free: counting a parquet scan projects zero columns, so
    // only footers/row-group metadata are read, not data pages
    val totalRows = df.count()
    val bytesPerRow = math.max(1L, stats.totalBytes / math.max(1L, totalRows))
    val rowsPerFile = math.max(1L, targetFileBytes / bytesPerRow)
    val reshaped =
      if (spec.partitionBy.nonEmpty)
        df.repartition(nFiles, spec.partitionBy.map(org.apache.spark.sql.functions.col): _*)
      else df.repartition(nFiles)
    val prev = spark.conf.getOption("spark.sql.files.maxRecordsPerFile")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", rowsPerFile.toString)
    try overwrite(name, reshaped)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.files.maxRecordsPerFile", v)
      case None => spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    }
  }
}

object Catalog {
  /** Declared columns (name, dialect type) + hive-style partition cols. */
  final case class TableSpec(columns: Seq[(String, String)], partitionBy: Seq[String] = Nil)

  /** Parquet layout stats: data-file count, total bytes, largest file. */
  final case class FileStats(fileCount: Int, totalBytes: Long, maxFileBytes: Long)

  val dialectTypes: Set[String] = Set("INT", "TEXT", "DECIMAL", "BOOL", "IMAGE")

  private val validTableName = "^[A-Za-z0-9_]{1,64}$".r

  /** Strict identifier check for anything that becomes a filesystem
    * path component under the DB root.
    */
  def requireValidTableName(name: String): Unit =
    if (!validTableName.matches(name))
      throw DialectException(
        s"invalid table name: $name (allowed: letters, digits, _, max 64 chars)")

  def toSparkType(dialectType: String): DataType = dialectType.toUpperCase match {
    case "INT" => LongType
    case "TEXT" => StringType
    case "DECIMAL" => DoubleType
    case "BOOL" => BooleanType
    case "IMAGE" => StringType
    case other => throw DialectException(s"invalid column type: $other")
  }

  def fromSparkType(t: DataType): String = t match {
    case ByteType | ShortType | IntegerType | LongType => "INT"
    case FloatType | DoubleType | _: DecimalType => "DECIMAL"
    case BooleanType => "BOOL"
    case _ => "TEXT"
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).iterator.asScala.toSeq.reverse.foreach(Files.delete)
    }

  // ---- minimal hand-rolled JSON for the catalog file (schema is flat,
  // identifiers are word-like; avoids pulling a JSON dependency) ----
  def renderSchemaJson(tables: Map[String, TableSpec]): String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    tables.toSeq.sortBy(_._1).map { case (name, spec) =>
      val colJson = spec.columns.map { case (n, t) =>
        s"""{"name":"${esc(n)}","type":"${esc(t)}"}"""
      }.mkString("[", ",", "]")
      val partJson = spec.partitionBy.map(p => s""""${esc(p)}"""").mkString("[", ",", "]")
      s""""${esc(name)}":{"columns":$colJson,"partitionBy":$partJson}"""
    }.mkString("{", ",", "}")
  }

  def parseSchemaJson(text: String): Map[String, TableSpec] = {
    // Tolerant scanner for the exact shape renderSchemaJson emits.
    val tablePat = """"([^"]+)"\s*:\s*\{"columns"\s*:\s*\[((?:[^\]])*)\]\s*,\s*"partitionBy"\s*:\s*\[([^\]]*)\]\}""".r
    val colPat = """\{"name"\s*:\s*"([^"]+)"\s*,\s*"type"\s*:\s*"([^"]+)"\}""".r
    val strPat = """"([^"]+)"""".r
    tablePat.findAllMatchIn(text).map { m =>
      val cols = colPat.findAllMatchIn(m.group(2)).map(c => (c.group(1), c.group(2))).toSeq
      val parts = strPat.findAllMatchIn(m.group(3)).map(_.group(1)).toSeq
      m.group(1) -> TableSpec(cols, parts)
    }.toMap
  }
}
