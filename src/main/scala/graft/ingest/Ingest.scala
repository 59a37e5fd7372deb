package graft.ingest

import graft.catalog.Catalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, when}

/** File ingestion (SURVEY.md §2.1 S7/S8).
  *
  * S8 is the reference's raison d'être — it shells out to parquet-tools
  * or python+pandas to convert parquet→CSV and re-ingests the CSV
  * (reference `pkg/importer/importer.go:89-205`). Here both formats are
  * native `spark.read` calls: schema comes from the parquet footer, the
  * read is distributed, and nothing leaves the JVM.
  */
object Ingest {

  /** S7: CSV import. Reference parity: header names become columns and
    * every cell is TEXT (`importer.go:38-52` infers all-TEXT; `:71-78`
    * appends strings regardless of declared types). Set
    * `inferTypes=true` for the useful superset (Spark schema inference).
    */
  def importCsv(catalog: Catalog, path: String, table: String,
      inferTypes: Boolean = false): Long = {
    val raw = catalog.spark.read
      .option("header", "true")
      .option("inferSchema", inferTypes.toString)
      .csv(path)
    val df = if (inferTypes) raw
      else raw.select(raw.columns.map(c => col(c).cast("string").as(c)): _*)
    appendCreating(catalog, df, table)
  }

  /** S8: native parquet import — the external-converter pipeline
    * collapses to one distributed read. `partitionBy` lays the table
    * out hive-partitioned for pruning at scale.
    */
  def importParquet(catalog: Catalog, path: String, table: String,
      partitionBy: Seq[String] = Nil): Long = {
    appendCreating(catalog, catalog.spark.read.parquet(path), table, partitionBy)
  }

  /** Compatibility reader for the reference's native storage: NDJSON
    * `.dat` files (one JSON object per row, reference
    * `pkg/storage/storage.go`). Quirk handling: the reference persists
    * nil values as the literal string "NULL" (`storage.go:56-61`) —
    * normalized back to real nulls here; missing keys become nulls
    * natively; malformed lines are dropped like the reference's
    * skip-with-warning scan (S1: mode=DROPMALFORMED).
    */
  def importNdjson(catalog: Catalog, path: String, table: String): Long = {
    val raw = catalog.spark.read
      .option("mode", "DROPMALFORMED")
      .option("primitivesAsString", "true")
      .json(path)
    val df = raw.select(raw.columns.map(c =>
      when(col(c) === "NULL", lit(null)).otherwise(col(c)).cast("string").as(c)): _*)
    appendCreating(catalog, df, table)
  }

  /** ORC import — the other columnar format Spark ships natively;
    * schema from the ORC footer, distributed read, same auto-create
    * path as parquet (beyond-reference: the reference only converts
    * through CSV).
    */
  def importOrc(catalog: Catalog, path: String, table: String,
      partitionBy: Seq[String] = Nil): Long =
    appendCreating(catalog, catalog.spark.read.orc(path), table, partitionBy)

  /** Table/result export — the write half of the IO surface. Each
    * export is a distributed write (one file per partition; pass
    * `singleFile=true` only for console-download-sized results — it
    * coalesces through one task). Returns the exported row count.
    */
  def exportCsv(catalog: Catalog, table: String, path: String,
      singleFile: Boolean = false): Long =
    exportFrame(catalog.load(table), path, singleFile) {
      _.option("header", "true").csv(path)
    }

  /** NDJSON export, symmetric with [[importNdjson]]: one JSON object
    * per line — the reference's own storage shape, so an exported table
    * is readable by BOTH engines.
    */
  def exportNdjson(catalog: Catalog, table: String, path: String,
      singleFile: Boolean = false): Long =
    exportFrame(catalog.load(table), path, singleFile) { _.json(path) }

  /** ORC export, symmetric with [[importOrc]]. */
  def exportOrc(catalog: Catalog, table: String, path: String,
      singleFile: Boolean = false): Long =
    exportFrame(catalog.load(table), path, singleFile) { _.orc(path) }

  private def exportFrame(df: DataFrame, path: String, singleFile: Boolean)(
      write: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] => Unit): Long = {
    val out = if (singleFile) df.coalesce(1) else df
    write(out.write.mode("overwrite"))
    df.count()
  }

  /** Schema-evolution merge: union snapshots whose schemas drifted over
    * time (columns added/dropped between corpus versions — the normal
    * state of a multi-year 100 TB parquet lake). Columns are matched BY
    * NAME, missing ones null-fill, and each row carries its snapshot
    * version for provenance. Purely declarative (`unionByName` with
    * allowMissingColumns), so scans of each snapshot stay pruned and
    * parallel — no per-row conversion pass. Equivalent to SQL
    * `UNION ALL BY NAME`, which is what the oracle runs.
    */
  def mergeSnapshots(versions: Seq[(String, DataFrame)]): DataFrame = {
    require(versions.nonEmpty, "mergeSnapshots needs at least one snapshot")
    versions.map { case (v, df) => df.withColumn("_version", lit(v)) }
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Auto-create the table from the frame's schema if absent (reference
    * auto-creates on CSV import), then append.
    */
  private def appendCreating(catalog: Catalog, df: DataFrame, table: String,
      partitionBy: Seq[String] = Nil): Long = {
    if (!catalog.exists(table)) {
      val cols = df.schema.fields.toSeq.map(f => f.name -> Catalog.fromSparkType(f.dataType))
      catalog.create(table, cols, partitionBy)
    }
    // align to the declared schema (columns by name, declared types)
    val schema = catalog.sparkSchema(table)
    val aligned = df.select(schema.fields.toSeq.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
    val n = aligned.count()
    catalog.append(table, aligned)
    n
  }
}
