package graft.catalog

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

/** Typed catalog option parsing (R20): defaults, validation, and
  * fail-fast messages naming the option. */
class GraftConfSpec extends AnyFunSuite {

  private def opts(kv: (String, String)*) =
    new CaseInsensitiveStringMap(kv.toMap.asJava)

  test("warehouse is required and case-insensitive") {
    val e = intercept[IllegalArgumentException](
      GraftConf.Warehouse.get(opts(), "c"))
    assert(e.getMessage.contains("spark.sql.catalog.c.warehouse"))
    assert(GraftConf.Warehouse.get(opts("WAREHOUSE" -> "/w"), "c") === "/w")
  }

  test("defaultProvider defaults to parquet, normalizes case, rejects unknown") {
    assert(GraftConf.DefaultProvider.get(opts(), "c") === "parquet")
    assert(GraftConf.DefaultProvider.get(opts("defaultProvider" -> "CSV"), "c") === "csv")
    assert(GraftConf.DefaultProvider.get(opts("defaultProvider" -> "ORC"), "c") === "orc")
    assert(GraftConf.DefaultProvider.get(opts("defaultProvider" -> "Avro"), "c") === "avro")
    val e = intercept[IllegalArgumentException](
      GraftConf.DefaultProvider.get(opts("defaultProvider" -> "delta"), "c"))
    assert(e.getMessage.contains("defaultProvider"))
  }

  test("autoSizeUpdate defaults true, parses booleans, rejects garbage") {
    assert(GraftConf.AutoSizeUpdate.get(opts(), "c") === true)
    assert(GraftConf.AutoSizeUpdate.get(opts("autoSizeUpdate" -> "FALSE"), "c") === false)
    assert(GraftConf.AutoSizeUpdate.get(opts("autoSizeUpdate" -> "true"), "c") === true)
    val e = intercept[IllegalArgumentException](
      GraftConf.AutoSizeUpdate.get(opts("autoSizeUpdate" -> "yes"), "c"))
    assert(e.getMessage.contains("autoSizeUpdate"))
  }

  test("writeLockTimeoutSec defaults to 600, parses, rejects non-positive and garbage") {
    assert(GraftConf.WriteLockTimeoutSec.get(opts(), "c") === 600L)
    assert(GraftConf.WriteLockTimeoutSec.get(
      opts("writeLockTimeoutSec" -> "7200"), "c") === 7200L)
    intercept[IllegalArgumentException](
      GraftConf.WriteLockTimeoutSec.get(opts("writeLockTimeoutSec" -> "0"), "c"))
    val e = intercept[IllegalArgumentException](
      GraftConf.WriteLockTimeoutSec.get(opts("writeLockTimeoutSec" -> "fast"), "c"))
    assert(e.getMessage.contains("writeLockTimeoutSec"))
  }
}
