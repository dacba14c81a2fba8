package graft.sources

import org.apache.spark.sql.types._

/** Warehouse schema DSL — the analog of the reference's BigQuery schema
  * DSL (bq.clj:355-436): field types STRING/BYTES/INTEGER/FLOAT/BOOLEAN/
  * TIMESTAMP/DATE/TIME/DATETIME/JSON/NUMERIC/BIGNUMERIC/RECORD with
  * modes NULLABLE/REQUIRED/REPEATED, mapped onto Spark StructTypes
  * (SURVEY §1.3): NULLABLE ⇄ nullable, REPEATED ⇄ ArrayType, RECORD ⇄
  * nested StructType, NUMERIC ⇄ DecimalType(p,s).
  */
object SchemaDsl {

  sealed trait Mode
  case object Nullable extends Mode
  case object Required extends Mode
  case object Repeated extends Mode

  private def typeOf(t: String, precision: Int, scale: Int, sub: Seq[StructField]): DataType =
    t.toUpperCase match {
      case "STRING" | "JSON" | "GEOGRAPHY" => StringType
      case "BYTES"                          => BinaryType
      case "INTEGER" | "INT64"              => LongType
      case "FLOAT" | "FLOAT64"              => DoubleType
      case "BOOLEAN" | "BOOL"               => BooleanType
      case "TIMESTAMP" | "DATETIME"         => TimestampType
      case "DATE"                           => DateType
      case "TIME"                           => StringType // no TimeType in Spark
      case "NUMERIC"                        => DecimalType(if (precision > 0) precision else 38,
                                                           if (precision > 0) scale else 9)
      case "BIGNUMERIC"                     => DecimalType(38, 18)
      case "RECORD" | "STRUCT"              => StructType(sub)
      case other => throw new IllegalArgumentException(s"unknown field type $other")
    }

  /** One field (bq.clj:368-392). */
  def field(name: String, t: String, mode: Mode = Nullable,
            precision: Int = 0, scale: Int = 0,
            fields: Seq[StructField] = Nil,
            description: Option[String] = None): StructField = {
    val base = typeOf(t, precision, scale, fields)
    val dt = if (mode == Repeated) ArrayType(base, containsNull = false) else base
    val meta = description.fold(Metadata.empty)(d =>
      new MetadataBuilder().putString("description", d).build())
    StructField(name, dt, nullable = mode != Required, metadata = meta)
  }

  /** Nested RECORD field (bq.clj:409-412). */
  def record(name: String, mode: Mode, fields: StructField*): StructField =
    field(name, "RECORD", mode, fields = fields)

  def schema(fields: StructField*): StructType = StructType(fields)
}
