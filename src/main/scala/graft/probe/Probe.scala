package graft.probe
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.execution.datasources.{InMemoryFileIndex, PartitioningAwareFileIndex, FileStatusCache}
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScanBuilder, ParquetTable}
import org.apache.spark.sql.execution.datasources.v2.csv.CSVTable
import org.apache.spark.sql.execution.datasources.v2.json.JsonTable
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.catalyst.expressions.{StructsToJson, StructsToCsv}
import org.apache.spark.util.SerializableConfiguration
import org.apache.spark.sql.connector.write.V1Write

object Probe {
  def mk(spark: SparkSession, schema: StructType, opts: CaseInsensitiveStringMap): Unit = {
    val idx: PartitioningAwareFileIndex = new InMemoryFileIndex(
      spark, Seq(new org.apache.hadoop.fs.Path("/tmp/x")), Map.empty[String, String],
      Some(schema), FileStatusCache.getOrCreate(spark))
    val sb = ParquetScanBuilder(spark, idx, schema, schema, opts)
    val ws = new ParquetWriteSupport
    val sc = new SerializableConfiguration(new org.apache.hadoop.conf.Configuration())
    println(sb, ws, sc)
  }
}
