package graft.model

import org.apache.spark.sql.types._

/** Single source of truth for the trade-envelope schema.
  *
  * The reference declares this three times (Avro `trades.avsc`, Cassandra
  * DDL, and an implicit JSON column list — SURVEY.md §1.2); here it lives
  * once. Mirrors `scripts/StreamProcessing/schemas/trades.avsc:1-55`:
  * an envelope holding an array of trade records plus a type tag.
  */
object Schemas {

  /** One trade inside the envelope (`trades.avsc:7-48`). */
  val trade: StructType = StructType(Seq(
    StructField("c", ArrayType(StringType, containsNull = true), nullable = true),
    StructField("p", DoubleType, nullable = false),   // price
    StructField("s", StringType, nullable = false),   // symbol
    StructField("t", LongType, nullable = false),     // epoch millis
    StructField("v", DoubleType, nullable = false),   // volume
    StructField("cv", DoubleType, nullable = false))) // running cumulative volume

  /** The Kafka message envelope (`trades.avsc:1-55`). */
  val envelope: StructType = StructType(Seq(
    StructField("data", ArrayType(trade), nullable = false),
    StructField("type", StringType, nullable = false)))

  /** Flat trade row after decode/explode/rename/derive
    * (`ProcessStockStream.py:102-109`; FIXTURES.md §2). */
  case class Trade(
      symbol: String,
      timestamp: java.sql.Timestamp,
      price: Double,
      volume: Double,
      usd_volume: Double,
      cumulative_volume: Double)

  /** Windowed OHLC-style feature bar (`ProcessStockStream.py:143-161`). */
  case class FeatureBar(
      symbol: String,
      timestamp: java.sql.Timestamp,
      total_usd_volume: Double,
      total_btc_volume: Double,
      high: Double,
      low: Double,
      close: Double,
      num_trades: Long)
}
