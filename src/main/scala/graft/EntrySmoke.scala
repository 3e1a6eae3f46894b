package graft

import org.apache.spark.sql.SparkSession

/** Smoke-run of the driver's flagship entry point (mirrors the driver's t1
  * check: rows > 0). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    df.show(5, truncate = false)
    spark.stop()
    assert(n > 0, "entry returned no rows")
  }
}
