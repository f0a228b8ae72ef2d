package graft

import org.apache.spark.sql.SparkSession

object GateCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    for (name <- args.drop(1)) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.mode("overwrite").parquet(s"/tmp/gatecheck/$name.parquet")
      println(s"WROTE $name rows=" + spark.read.parquet(s"/tmp/gatecheck/$name.parquet").count())
    }
    spark.stop()
  }
}
