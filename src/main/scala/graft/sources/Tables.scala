package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table access layer for the driver-generated parquet corpus (TESTDATA.md).
  *
  * The one source quirk: `events.parquet` stores `ts` as parquet
  * `TIMESTAMP(NANOS)`, which Spark's parquet reader rejects outright
  * (PARQUET_TYPE_ILLEGAL). We read it with
  * `spark.sql.legacy.parquet.nanosAsLong=true` (ts arrives as a nanosecond
  * epoch long) and rebuild a micros timestamp with integer division — `DIV`,
  * not `/`: a 2024 epoch-nanos value (~1.7e18) far exceeds a double's 53-bit
  * mantissa, so float division would corrupt timestamps. Truncation (floor)
  * matches how DuckDB converts nanos→micros for the oracle.
  */
object Tables {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(s, dir)
    else s.read.parquet(s"$dir/$name.parquet")

  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read
      .parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
}
