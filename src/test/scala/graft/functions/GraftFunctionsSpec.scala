package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Golden-result gates for the declared UDF surface (SURVEY.md §2.3
  * last paragraph). */
class GraftFunctionsSpec extends AnyFunSuite with SparkFixture {

  test("normalizeText golden cases") {
    assert(GraftFunctions.normalizeText("  Hello,  WORLD!! 42 ") === "hello world 42")
    assert(GraftFunctions.normalizeText("a\tb\nc") === "a b c")
    assert(GraftFunctions.normalizeText("@#$%") === "")
    assert(GraftFunctions.normalizeText(null) === null)
  }

  test("WeightedMean: golden value, merge order irrelevant, zero-weight NaN") {
    import spark.implicits._
    val wm = udaf(new GraftFunctions.WeightedMean)
    // (10.00 w2, 20.00 w1, 1.00 w1) -> (1000*2 + 2000 + 100)/4 = 1025 c -> 10.25
    val df = Seq((10.0, 2.0), (20.0, 1.0), (1.0, 1.0)).toDF("v", "w")
    val single = df.coalesce(1).agg(wm($"v", $"w")).head.getDouble(0)
    val sharded = df.repartition(3).agg(wm($"v", $"w")).head.getDouble(0)
    assert(single === 10.25)
    assert(sharded === 10.25)
    val empty = Seq((5.0, 0.0)).toDF("v", "w").agg(wm($"v", $"w")).head.getDouble(0)
    assert(empty.isNaN)
  }

  test("SQL registration exposes both functions") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq((3.0, 1.0)).toDF("v", "w").createOrReplaceTempView("t_gf")
    val r = spark.sql(
      "SELECT graft_normalize_text(' A b ') AS n, graft_weighted_mean(v, w) AS m FROM t_gf")
      .head
    assert(r.getString(0) === "a b")
    assert(r.getDouble(1) === 3.0)
  }

  test("graft_array_dot is callable from SQL and matches manual arithmetic") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_array_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d").head
    assert(r.getDouble(0) === 32.0)
    // shorter-length contract + null propagation
    val edge = spark.sql(
      "SELECT graft_array_dot(array(2.0d, 3.0d), array(10.0d)) AS s, " +
        "graft_array_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS n").head
    assert(edge.getDouble(0) === 20.0)
    assert(edge.isNullAt(1))
  }

  test("graft_array_sqdist matches the HOF fold it replaced, bit for bit") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_array_sqdist(array(1.0d, 2.0d, 3.0d), array(4.0d, 6.0d, 3.0d)) AS d").head
    assert(r.getDouble(0) === 25.0) // 9 + 16 + 0
    // the replaced form, evaluated on an adversarial irrational-heavy pair:
    // both must produce the identical double (same op sequence)
    val probe = spark.sql(
      """SELECT graft_array_sqdist(a, b) AS fast,
        |  aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)),
        |            0.0d, (acc, x) -> acc + x) AS hof
        |FROM (SELECT array(0.1d, 0.2d, 0.3d, 1e-17d) AS a,
        |             array(0.3d, 0.1d, 0.7d, 3e-17d) AS b)""".stripMargin).head
    assert(java.lang.Double.doubleToLongBits(probe.getDouble(0)) ===
      java.lang.Double.doubleToLongBits(probe.getDouble(1)))
    // shorter-length + null propagation, as graft_array_dot
    val edge = spark.sql(
      "SELECT graft_array_sqdist(array(2.0d, 3.0d), array(10.0d)) AS s, " +
        "graft_array_sqdist(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS n").head
    assert(edge.getDouble(0) === 64.0)
    assert(edge.isNullAt(1))
  }

  test("graft_minhash_sig matches the HOF form it replaced, bit for bit") {
    GraftFunctions.register(spark)
    // the replaced formulation: k array_min(transform(...)) lambdas —
    // both must produce the identical signature, including on a null
    // element (XxHash64 skips the null → the salted seed itself) and on
    // a single-element array
    val k = 8
    val hof = (0 until k).map(i =>
      s"array_min(transform(hs, h -> xxhash64($i, h)))").mkString("array(", ", ", ")")
    val probe = spark.sql(
      s"""SELECT graft_minhash_sig(hs, $k) AS fast, $hof AS hof
         |FROM (SELECT array(CAST(123 AS BIGINT), CAST(-9876543210 AS BIGINT),
         |                   CAST(NULL AS BIGINT), CAST(0 AS BIGINT)) AS hs
         |      UNION ALL SELECT array(CAST(42 AS BIGINT)))""".stripMargin)
      .collect()
    probe.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
    // empty input → null (callers band only docs with shingles)
    val empty = spark.sql(
      "SELECT graft_minhash_sig(CAST(array() AS ARRAY<BIGINT>), 4) AS s").head
    assert(empty.isNullAt(0))
  }

  test("graft_minhash_sig's GENERATED code runs and matches interpreted eval") {
    // The HOF-parity probe above computes hs in the same projection as
    // the signature — any lambda in a Project forces the WHOLE project
    // interpreted, so doGenCode never runs there. Here the input is a
    // plain attribute: the project whole-stage-compiles and the
    // generated loop must agree with nullSafeEval.
    GraftFunctions.register(spark)
    import spark.implicits._
    // a parquet round-trip defeats ConvertToLocalRelation's eager
    // (interpreted) evaluation of deterministic exprs over local rows
    val tmp = java.nio.file.Files.createTempDirectory("graft_mh_probe_").toString
    try {
      Seq(Seq(123L, -9876543210L, 0L), Seq(42L)).toDF("hs")
        .write.mode("overwrite").parquet(tmp)
      spark.read.parquet(tmp).createOrReplaceTempView("mh_codegen_probe")
      val q = spark.sql("SELECT graft_minhash_sig(hs, 8) AS s FROM mh_codegen_probe")
      // the `*(n)` prefix is the plan-string marker for WholeStageCodegen
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.linesIterator.exists(l =>
          l.contains("Project") && l.trim.startsWith("*(")),
        s"probe Project fell out of codegen — the generated path is untested:\n$plan")
      val viaCodegen = q.collect().map(_.getSeq[Long](0))
      val hof = (0 until 8).map(i =>
        s"array_min(transform(hs, h -> xxhash64($i, h)))").mkString("array(", ", ", ")")
      val viaHof = spark.sql(s"SELECT $hof AS s FROM mh_codegen_probe")
        .collect().map(_.getSeq[Long](0))
      assert(viaCodegen.toSeq === viaHof.toSeq)
    } finally {
      val p = new org.apache.hadoop.fs.Path(tmp)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
  }

  test("null ELEMENTS null the result — both expressions match the HOF forms") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_array_dot(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) AS d, " +
        "graft_array_sqdist(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) AS s").head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("BpeEncode's GENERATED code runs and matches the HOF fold it replaced") {
    import org.apache.spark.sql.graft.GraftSqlBridge.{column, expression}
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val merges = Seq(("a", "a"), ("t", "a"), ("ta", "b"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpe_probe_").toString
    try {
      Seq("aaaa", "tab", "tataab", "x", "atab").toDF("w")
        .write.mode("overwrite").parquet(tmp)
      val src = spark.read.parquet(tmp)
      val probe = src.select(col("w"), column(graft.functions.BpeEncode(
        expression(col("w")), merges)).as("p"))
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.linesIterator.exists(l =>
          l.contains("Project") && l.trim.startsWith("*(")),
        s"probe Project fell out of codegen — generated path untested:\n$plan")
      val got = probe.collect()
        .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
      // the HOF form BpeEncode replaced, stated verbatim
      val hofPieces = merges.foldLeft("array_remove(split(w, ''), '')") {
        case (e, (l, r)) =>
          s"""aggregate($e, cast(array() as array<string>),
             | (acc, x) -> if(get(acc, size(acc) - 1) = '$l' AND x = '$r',
             |   concat(slice(acc, 1, size(acc) - 1), array('$l$r')),
             |   concat(acc, array(x))))""".stripMargin
      }
      val want = src.selectExpr("w", s"$hofPieces AS p").collect()
        .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
      assert(got === want, "codegen'd greedy fold diverged from the HOF chain")
      // non-overlapping left-to-right semantics, spot-checked by hand:
      // (a,a) over "aaaa" merges positions (0,1) and (2,3), never the
      // overlapping middle pair
      assert(got("aaaa") === List("aa", "aa"))
      // rank order: (a,a) consumed the double-a before (t,a) could pair
      // the second t, and (ta,b) finds no "ta b" adjacency afterwards
      assert(got("tataab") === List("ta", "t", "aa", "b"))
    } finally {
      val p = new org.apache.hadoop.fs.Path(tmp)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
  }

  test("CmsCountString's GENERATED code runs and matches interpreted eval") {
    import org.apache.spark.sql.graft.GraftSqlBridge.{column, expression}
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // build a real sketch over a known stream, then probe through a
    // parquet-backed projection (whole-stage codegen) AND interpreted
    // eval — counts must agree, and known keys must be exact at this
    // width/vocabulary ratio
    val toks = Seq.fill(7)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val skBytes = toks.toDF("tok")
      .agg(count_min_sketch(col("tok"), lit(0.001), lit(0.99), lit(42)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val tmp = java.nio.file.Files.createTempDirectory("graft_cms_probe_").toString
    try {
      (toks.distinct :+ "absent").toDF("tok").write.mode("overwrite").parquet(tmp)
      val probe = spark.read.parquet(tmp)
        .select(col("tok"), column(graft.functions.CmsCountString(
          expression(col("tok")), skBytes)).as("est"))
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.linesIterator.exists(l =>
          l.contains("Project") && l.trim.startsWith("*(")),
        s"probe Project fell out of codegen — generated path untested:\n$plan")
      val got = probe.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got("alpha") === 7L && got("beta") === 3L && got("gamma") === 1L,
        s"exact counts expected at width 2000 vs 3 keys: $got")
      assert(got("absent") === 0L, "an unseen key estimates 0 (no collisions here)")
      // interpreted parity
      val sk = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(skBytes))
      got.foreach { case (t, e) =>
        val utf8 = org.apache.spark.unsafe.types.UTF8String.fromString(t).getBytes
        assert(sk.estimateCount(utf8) === e, s"codegen/interpreted split on $t")
      }
    } finally {
      val p = new org.apache.hadoop.fs.Path(tmp)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
  }
}
