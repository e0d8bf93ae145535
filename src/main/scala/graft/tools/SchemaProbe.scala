package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print the Spark-inferred schema of each test table. */
object SchemaProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- graft.Tables.all) {
      val df = spark.read.parquet(s"$dir/$t.parquet")
      println(s"== $t: ${df.schema.map(f => s"${f.name}:${f.dataType.sql}").mkString(", ")}")
    }
    spark.stop()
  }
}
