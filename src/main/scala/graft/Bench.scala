package graft

import org.apache.spark.sql.SparkSession

/** Benchmark harness (SURVEY.md §6): runs the full declared inventory at
  * `SPARK_GRAFT_SF_DIR`, prints one JSON line.
  *
  * Measurement validity (round-3 verdict, "What's wrong" #2):
  *  - every query executes through the `noop` sink, which consumes every
  *    row of the final physical plan — sorts, projections and limits all
  *    run, unlike `count()` which lets Catalyst prune unreferenced
  *    columns and drop top-level orderings;
  *  - one full warm-up pass first, so JIT/codegen compilation and the
  *    shared FileStatusCache don't land on whichever query happens to run
  *    first;
  *  - failures propagate: a broken query aborts the bench with a nonzero
  *    exit instead of being recorded as a fast success.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def execute(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(execute) // warm-up pass (unmeasured)
    // Min-of-2 measured passes per query: BASELINE.md documents min-of-2
    // as the jitter-robust statistic for this shared sandbox, where an
    // identical binary varies up to 1.6x run-to-run on a single pass.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    require(passes >= 1, s"SPARK_GRAFT_BENCH_PASSES must be >= 1, got $passes")
    val best = collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to passes; name <- names) {
      val t0 = System.nanoTime()
      execute(name)
      val sec = (System.nanoTime() - t0) / 1e9
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), sec)
    }
    val results = names.map(n => n -> best(n))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
