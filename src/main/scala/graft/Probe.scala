package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.Wire

/** Scratch behavior probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val lines = Seq(
      "fitbit,2024-01-01 00:00:07,8,8,0,6.55,6.55,26,error,1704067207179",
      "fitbit,2024-01-01 00:03:52,46,46,1,bad,12.31,46,click,1704067432824",
      "fitbit,short",
      "sales,2024-01-01,42",
      "new-user-notification,30,M,athlete,80.5,1.8,24.8,15.2,HYP_1,130.0,85.0,u77,d9")
    val df = lines.toDF("value")
    val parsed = df.select(col("value"), Wire.parseCsv(col("value"), Wire.FitbitSchema).as("r"))
      .select(col("value"), col("r.*"))
    parsed.show(false)
    parsed.printSchema()
    spark.stop()
  }
}
