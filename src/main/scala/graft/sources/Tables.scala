package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Table access layer for the driver-generated parquet corpus (TESTDATA.md).
  *
  * The one source quirk: `events.parquet` has shipped with two different `ts`
  * physical layouts across testdata generations, and the loader adapts to
  * whichever is on disk so every downstream plan sees the same logical column
  * (session-zone `TIMESTAMP`, micro precision):
  *
  *  - parquet `TIMESTAMP(NANOS)` — Spark's reader rejects it outright
  *    (PARQUET_TYPE_ILLEGAL), so we read with
  *    `spark.sql.legacy.parquet.nanosAsLong=true` (ts arrives as an epoch
  *    nanos long) and rebuild a micros timestamp with integer division —
  *    `DIV`, not `/`: a 2024 epoch-nanos value (~1.7e18) far exceeds a
  *    double's 53-bit mantissa, so float division would corrupt timestamps.
  *    Truncation (floor) matches how DuckDB converts nanos→micros.
  *  - parquet `TIMESTAMP(MICROS, isAdjustedToUTC=false)` — arrives as
  *    `TIMESTAMP_NTZ`; cast to session-zone `TIMESTAMP`, which is
  *    value-identical under the engine's pinned UTC session zone and keeps
  *    the column type (and therefore every result file) byte-identical to
  *    the nanos path.
  */
object Tables {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(s, dir)
    else s.read.parquet(s"$dir/$name.parquet")

  /** Normalize whatever `ts` layout the reader produced to micro-precision
    * session-zone TIMESTAMP. Long = legacy nanosAsLong read; NTZ = plain
    * micros file; already-TIMESTAMP passes through untouched.
    */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _                => df
    }

  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(s.read.parquet(s"$dir/events.parquet"))
  }
}
