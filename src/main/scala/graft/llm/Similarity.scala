package graft.llm

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.RelationalQueries.r4

/** Similarity search over an embedding column (SURVEY.md §7.1):
  * brute-force cosine top-k as the exactness baseline, and a
  * sign-random-projection LSH variant as the scale path.
  *
  * All arithmetic runs through the codegen'd [[graft.functions.ArrayDot]]
  * expression (double precision, left-to-right summation) whose order
  * DuckDB's list comprehension + `list_sum` reproduces bit-for-bit, so
  * the exact variant is hash-gateable.
  *
  * 100 TB posture:
  *  - brute force: the query set is a fixed small constant (top-k for a
  *    handful of probes), so it broadcasts by construction — the corpus
  *    is scanned exactly once with no shuffle; the only exchange is the
  *    per-query top-k (WindowGroupLimit keeps ≤ k rows per query per map
  *    task before the shuffle). This hint is NOT the round-3 antipattern:
  *    the broadcast side's cardinality is query-count, not SF-scaled.
  *  - LSH: corpus is bucketed once (`tables` codes per vector, an
  *    equality-join key); queries probe only their own buckets, so the
  *    exact re-rank touches the candidate set, not the corpus. Recall is
  *    tunable via (tables × bits); [[graft.SimilaritySpec]] measures it
  *    against the brute-force baseline.
  */
object Similarity {

  /** Left-to-right dot product — the summation order contract shared
    * with the DuckDB oracle. Backed by the codegen'd [[graft.functions.ArrayDot]]
    * (the `zip_with`+`aggregate` HOF form is bit-identical but ~25 µs/row
    * slower — see ArrayDot's scaladoc). */
  private[llm] def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.GraftSqlBridge.{column, expression}
    column(graft.functions.ArrayDot(expression(a), expression(b)))
  }

  /** Left-to-right squared Euclidean distance — same contract, backed by
    * the codegen'd [[graft.functions.ArraySqDist]] (bit-identical to the
    * HOF `aggregate(zip_with((a,b) => (a−b)·(a−b)))` form it replaced in
    * q64's outlier pass). */
  private[llm] def sqDist(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.GraftSqlBridge.{column, expression}
    column(graft.functions.ArraySqDist(expression(a), expression(b)))
  }

  /** Project (id, vector) to doubles and attach the L2 norm.
    *
    * Zero-norm vectors (padded/deleted embeddings) are EXCLUDED here,
    * at the single entry point every cosine consumer shares: a zero
    * vector has no direction, so every cosine against it is 0/0 = NaN —
    * and NaN sorts ABOVE every real score in a descending ranking, so
    * one degenerate row would hijack rank 1 of each query's top-k (the
    * round-13 q78 `anrm > 0` audit finding, generalized: that guard
    * protected only the ADC approximation, while the exact re-rank
    * divides by THIS frame's `nrm`). Excluding at the source makes the
    * rule uniform across q31/q32/q38/q40/q74/q75/q78/q78b instead of
    * per-stage. */
  def normalized(vecs: DataFrame, idCol: String, vecCol: String): DataFrame =
    vecs.select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .filter(col("nrm") > 0)

  /** Per-label centroid distance + top-k outliers: the label-noise
    * detector of an embedding-annotated training set. Centroids are
    * computed with integer-quantized per-dimension sums (round(x·10⁴)
    * as long) — exact, shuffle-order-free arithmetic, so the result is
    * bit-identical across engines and partitionings (the repo's
    * integer-cent accumulator pattern; a float sum's low bits would
    * depend on reduction order). The squared distance is a row-local
    * left-to-right fold, mirrored by the oracle's list comprehension.
    *
    * 100 TB posture: the per-(label, dim) partial sums combine
    * map-side, so the centroid shuffle carries labels × dims rows; the
    * centroid table (one array per label) is constant-size and
    * broadcasts back; the distance pass is one corpus scan. Output:
    * (label, rk, vec_id, dist4), the k farthest per label. */
  def labelOutliers(
      vecs: DataFrame, idCol: String, vecCol: String, labelCol: String,
      k: Int): DataFrame = {
    val centArr = quantizedCentroids(
      vecs.select(col(labelCol).as("label"),
        col(vecCol).cast("array<double>").as("v")))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("dist").desc, col("vec_id"))
    vecs.select(col(idCol).as("vec_id"), col(labelCol).as("label"),
        col(vecCol).cast("array<double>").as("v"))
      .join(centArr, "label")
      .withColumn("dist", sqDist(col("v"), col("cv")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("label"), col("rk"), col("vec_id"),
        r4(col("dist")).as("dist4"))
  }

  /** Per-group centroid arrays from (label, v) rows via the repo's
    * integer-cent accumulator pattern: per-(label, dim) sums of
    * round(x·10⁴) as long — exact, shuffle-order-free arithmetic, so
    * the centroids are bit-identical across runs, partitionings and
    * engines (a float sum's low bits would depend on reduction order).
    * ONE definition site for the determinism contract shared by
    * [[labelOutliers]] (q64's oracle restates it in SQL) and
    * [[lloydCentroids]]. Output: (label, cv). */
  private def quantizedCentroids(labeled: DataFrame): DataFrame = {
    val dims = labeled.select(col("label"),
      posexplode(col("v")).as(Seq("i", "x")))
    dims.groupBy("label", "i")
      .agg(sum(round(col("x") * 10000).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .select(col("label"), col("i"),
        (col("s").cast("double") / (col("n") * lit(10000.0))).as("c"))
      .groupBy("label")
      .agg(sort_array(collect_list(struct(col("i"), col("c")))).as("ic"))
      .select(col("label"), transform(col("ic"), e => e.getField("c")).as("cv"))
  }

  /** Shared scoring + ranking stage of the exact top-k family: join a
    * (q_id, qv, qn) query side against the corpus on q_id ≠ n_id, score
    * with the codegen'd cosine, keep the k best per query (row_number →
    * WindowGroupLimit caps per-task state at k rows per query). The
    * broadcast decision stays with the CALLER — [[cosineTopK]]'s probe
    * set broadcasts by construction, [[knnGraph]]'s corpus-sized query
    * side must not. */
  private def rankTopK(corpus: DataFrame, querySide: DataFrame, k: Int): DataFrame = {
    val sims = corpus.select(col("vec_id").as("n_id"), col("v"), col("nrm"))
      .join(querySide, col("n_id") =!= col("q_id"))
      .withColumn("sim", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"),
        (r4(col("sim"))).as("sim4"))
  }

  /** Exact cosine top-k of `corpus` for each row of `queries` (both in
    * [[normalized]] layout). Output: (q_id, n_id, rank, sim4). */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    rankTopK(corpus, broadcast(queries.select(
      col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))), k)

  /** Exact k-nearest-neighbor GRAPH of the corpus against itself — the
    * input of graph-based curation (SemDeDup cluster seeds, connectivity
    * stats, label propagation). Distinct from [[cosineTopK]] in its
    * scale posture: the query side IS the corpus, so it must NOT be
    * broadcast-hinted (the round-3 antipattern — an SF-scaled broadcast
    * side); the ≠-condition self-join is inherently all-pairs (q38's
    * cartesian class — that's what "exact baseline" means here), and
    * WindowGroupLimit caps per-query state at k before the rank
    * exchange.
    *
    * This exact all-pairs form is the declared exactness BASELINE of
    * the family (q38's role for near-dup pairs): at 100 TB the kNN
    * graph composes the same window over [[lshBucketed]] candidates or
    * [[ivfCosineTopK]]'s probed buckets instead of the full self-join
    * — both already shipped and property-gated; the baseline is what
    * their recall is measured AGAINST. Output: (q_id, n_id, rank, sim4)
    * with one row per (vector, rank ≤ k). */
  def knnGraph(corpus: DataFrame, k: Int): DataFrame = {
    // Spread the corpus across the cluster BEFORE checkpointing (guide
    // §2.5 "input skew": a single-file scan is one partition, and the
    // nested-loop pair join streams THIS side — unpartitioned, the whole
    // O(n²) scoring pass lands on one core). Scale-adaptive: sized from
    // defaultParallelism, not a constant; hash on vec_id (deterministic,
    // no round-robin pre-sort). Results are unchanged — row_number
    // orders totally by (sim desc, n_id).
    val c = spread(corpus).localCheckpoint() // both sides of the self-join
    rankTopK(c, c.select(
      col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn")), k)
  }

  /** Hash-repartition a [[normalized]]-layout frame across the cluster
    * (defaultParallelism — scale-adaptive, never a constant) so the
    * per-row compute that follows (pair scoring, plane projections)
    * parallelizes even when the upstream scan produced few partitions. */
  private[llm] def spread(norm: DataFrame): DataFrame =
    norm.repartition(
      norm.sparkSession.sparkContext.defaultParallelism, col("vec_id"))

  /** Vector dimensionality of a [[normalized]]-layout frame, derived
    * from its first row — None for an empty frame. Derived, never
    * assumed: ArrayDot dots the min of the two lengths, so a stale dim
    * constant would silently truncate hyperplane projections (degrading
    * LSH recall / the q38b miss bound) instead of failing. Shared by
    * [[lshCosineTopK]] and [[graft.llm.Dedup.embeddingNearDupPairsLsh]]. */
  private[llm] def derivedDim(norm: DataFrame): Option[Int] =
    norm.select(size(col("v")).as("d")).limit(1).collect()
      .headOption.map(_.getInt(0))

  /** Seeded ±1 hyperplanes: `tables` hash tables of `bits` planes each.
    * Fixed seed ⇒ identical buckets on every executor and every run. */
  private def planes(tables: Int, bits: Int, dim: Int): Array[Array[Seq[Double]]] = {
    val rnd = new Random(42)
    Array.fill(tables, bits)(Seq.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** Attach per-table LSH bucket codes: bit b of table t's code is the
    * sign of the projection onto plane (t,b). Rows: (vec_id, v, nrm,
    * table, code) — one per (vector, table), ready for an equality join. */
  def lshBucketed(norm: DataFrame, tables: Int, bits: Int, dim: Int): DataFrame = {
    val ps = planes(tables, bits, dim)
    val codes = (0 until tables).map { t =>
      (0 until bits).map { b =>
        when(dot(col("v"), typedlit(ps(t)(b))) >= 0, lit(1 << b)).otherwise(lit(0))
      }.reduce[Column](_ + _)
    }
    norm.select(col("vec_id"), col("v"), col("nrm"),
      posexplode(array(codes: _*)).as(Seq("table", "code")))
  }

  /** Top-`n` centroid ids of `vec` by cosine, descending — the shared
    * assignment expression of Lloyd training and IVF search. Ranking is
    * by dot/|centroid|: with |vec| constant per row this is cosine
    * order, while a bare dot would let centroid NORM (not direction)
    * dominate assignment — a 2×-norm centroid wins every vector up to
    * ~60° off a competitor's direction, collapsing IVF's pruning. |c|
    * is a driver-side constant per centroid. */
  private[llm] def nearestCentroids(
      cents: Array[(Long, Seq[Double])], vec: Column, n: Int): Column = {
    val sims = cents.map { case (cid, cv) =>
      val cnorm = math.sqrt(cv.map(x => x * x).sum)
      struct((dot(vec, typedlit(cv)) / cnorm).as("s"), lit(cid).as("cid"))
    }
    // top-n centroid ids by cosine (descending), tie-broken by cid
    slice(reverse(array_sort(array(sims: _*))), 1, n)("cid")
  }

  /** Training-set cap for the LOCAL Lloyd trainers below: quantizer
    * training runs on a bounded deterministic sample (the `MaxTrain`
    * smallest-id vectors), the FAISS convention — codebook quality needs
    * a representative sample, not the corpus, and the cap is what keeps
    * training cost CONSTANT in corpus size at 100 TB. Fixtures are
    * smaller than the cap, so training still sees every vector there. */
  private[llm] val MaxTrain = 16384

  /** `round(x·10⁴) as long` exactly as Spark's Round-then-cast computes
    * it (BigDecimal.valueOf, HALF_UP) — the [[quantizedCentroids]]
    * accumulator rule, replicated for the local trainers. */
  private def q4(x: Double): Long =
    java.math.BigDecimal.valueOf(x * 10000)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue

  /** Quantized per-label mean with [[quantizedCentroids]]' exact
    * arithmetic — long sums of q4 and PER-(label, dimension) counts
    * (the distributed form's posexplode counts one row per PRESENT
    * dimension, so a ragged short vector must not deflate the mean of
    * dimensions it lacks), then s/(n_i·10⁴). Label order and
    * accumulation order cannot change the result. Labels absent from
    * `assigned` keep their entry absent (caller falls back to the
    * previous centroid, the emptied-cluster rule). A dimension no
    * member has yields 0.0 — saner than the distributed collect_list
    * form, which would emit a gap-misaligned shorter array there; on
    * uniform-length input (every fixture) the two are bit-identical. */
  private def quantizedMeans(
      assigned: Iterable[(Long, Array[Double])], dim: Int): Map[Long, Array[Double]] = {
    val sums = collection.mutable.Map.empty[Long, (Array[Long], Array[Long])]
    assigned.foreach { case (label, v) =>
      val (s, n) = sums.getOrElseUpdate(label, (new Array[Long](dim), new Array[Long](dim)))
      var i = 0
      while (i < v.length && i < dim) { s(i) += q4(v(i)); n(i) += 1; i += 1 }
    }
    sums.iterator.map { case (label, (s, n)) =>
      label -> Array.tabulate(dim)(i =>
        if (n(i) == 0) 0.0 else s(i).toDouble / (n(i) * 10000.0))
    }.toMap
  }

  /** Cosine argmax over a centroid table with [[nearestCentroids]]'
    * exact scoring (left-to-right dot, driver-side cnorm) and its
    * top-1 tie rule (highest sim, ties to the LARGER centroid id —
    * `reverse(array_sort(...))` struct ordering).
    *
    * Documented divergence from the expression form on ONE degenerate
    * input: a zero-norm centroid scores sim = dot/0 = NaN, which
    * Spark's struct sort ranks ABOVE every real double (NaN-wins); here
    * such centroids are SKIPPED, so a real centroid always wins when
    * one exists — strictly saner, and unreachable on the normalized
    * (nrm > 0) fixtures where the two rules coincide bit-for-bit. If
    * every centroid is degenerate, the smallest id is returned
    * deterministically. */
  private def assignCosine(
      v: Array[Double], cents: Array[(Long, Array[Double], Double)]): Long = {
    var bestS = Double.NegativeInfinity
    var bestC = Long.MinValue
    cents.foreach { case (cid, cv, cn) =>
      if (cn > 0) {
        val n = math.min(v.length, cv.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += v(i) * cv(i); i += 1 }
        val sim = s / cn
        if (sim > bestS || (sim == bestS && cid > bestC)) { bestS = sim; bestC = cid }
      }
    }
    if (bestC == Long.MinValue && cents.nonEmpty) cents.iterator.map(_._1).min
    else bestC // Long.MinValue sentinel on an empty centroid table
  }

  /** Bounded deterministic training set: the [[MaxTrain]] smallest-id
    * rows of (vec_id, v) — ONE small job, shared by both trainers. */
  private def collectTraining(corpus: DataFrame): Array[(Long, Array[Double])] =
    corpus.orderBy(col("vec_id")).limit(MaxTrain)
      .select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  /** Spherical k-means centroids: deterministic seeds (the `nlist`
    * smallest-id corpus vectors) refined by `iters` Lloyd iterations —
    * assign every training vector to its nearest centroid (cosine),
    * recompute each centroid as its bucket's per-dimension
    * integer-quantized mean; an emptied cluster keeps its previous
    * centroid. Training runs LOCALLY on the bounded [[MaxTrain]]
    * sample (ONE collect, zero per-iteration jobs or expression
    * recompiles — the FAISS convention of training the quantizer on a
    * subset): [[assignCosine]]/[[quantizedMeans]] replicate the
    * distributed DataFrame math bit-for-bit (same dot/tie/rounding
    * rules), so results are unchanged wherever the corpus fits the
    * cap — fixtures do. */
  private[llm] def lloydCentroids(
      corpus: DataFrame, nlist: Int, iters: Int): Array[(Long, Seq[Double])] = {
    val train = collectTraining(corpus)
    var cents: Array[(Long, Seq[Double])] =
      train.take(nlist).map { case (id, v) => (id, v.toSeq) }
    for (_ <- 0 until iters) {
      val withNorm = cents.map { case (cid, cv) =>
        (cid, cv.toArray, math.sqrt(cv.map(x => x * x).sum))
      }
      val refined = quantizedMeans(
        train.iterator.map { case (_, v) => (assignCosine(v, withNorm), v) }.toSeq,
        dim = train.headOption.map(_._2.length).getOrElse(0))
      cents = cents.map { case (cid, cv) =>
        (cid, refined.get(cid).map(_.toSeq).getOrElse(cv))
      }
    }
    cents
  }

  /** IVF-style partitioned index: assign every vector to its nearest of
    * `nlist` centroids ([[lloydCentroids]] — deterministically seeded,
    * Lloyd-refined k-means, arriving as a small driver-side table as in
    * production). Queries probe the `nprobe` nearest centroid buckets
    * and re-rank exactly.
    *
    * Scale path: the corpus is scanned once for assignment (an
    * `nlist`-way argmin of codegen'd dots per row — `nlist` is a small
    * constant, the centroid table broadcasts by construction); probing
    * touches ~`nprobe/nlist` of the corpus per query via an equality
    * join on the bucket id, never the whole corpus. */
  def ivfCosineTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 3): DataFrame = {
    // One materialization serves the seed fetch, every Lloyd iteration
    // and the bucketing pass — without it each consumer re-evaluates
    // the scan+cast+norm lineage (iters + 2 extra corpus scans).
    val c = corpus.localCheckpoint()
    val cents = lloydCentroids(c, nlist, iters)
    def nearest(vec: Column, n: Int): Column = nearestCentroids(cents, vec, n)
    val bucketed = c.withColumn("bucket",
      nearest(col("v"), 1).getItem(0))
    val probed = queries
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        explode(nearest(col("v"), nprobe)).as("bucket"))
    val cands = bucketed
      .select(col("vec_id").as("n_id"), col("v"), col("nrm"), col("bucket"))
      .join(probed, "bucket")
      .filter(col("n_id") =!= col("q_id"))
    val sims = cands
      .withColumn("sim", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), r4(col("sim")).as("sim4"))
  }

  /** Candidate-pair count of the IVF join before top-k — the pruning
    * observable SimilaritySpec gates (a degenerate single-bucket
    * assignment would offer every (query, corpus) pair). */
  private[llm] def ivfCandidatePairs(
      corpus: DataFrame, queries: DataFrame, nlist: Int, nprobe: Int): Long = {
    // k=0 would filter everything; reuse the full pipeline's candidate
    // stage by ranking with an impossible cap and counting pre-top-k
    // pairs via a large k instead.
    ivfCosineTopK(corpus, queries, k = Int.MaxValue, nlist, nprobe)
      .select("q_id", "n_id").distinct().count()
  }

  // ----------------------------------------------------- persisted IVF
  /** PERSISTED IVF index as catalog tables — q40's structure promoted
    * from a per-query computation to MAINTAINED STATE (the q94/s19
    * maintenance posture applied to the ANN index): `centTable` holds
    * the trained centroids (the index metadata — small, broadcastable),
    * `idxTable` the assignments `(vec_id, v, nrm, bucket)` PARTITIONED
    * BY BUCKET, so an ingest appends only to the partitions its batch's
    * vectors land in and a probe reads only `nprobe` partitions per
    * query via the catalog-pruned file index. Centroids are FROZEN
    * after the build (the FAISS production convention — retraining is a
    * separate offline event, not an ingest-path cost), which is exactly
    * what makes the incremental ingest EXACT: assignment is a
    * deterministic function of (vector, centroids), so incremental
    * equals full reassignment, gated as set equality in SimilaritySpec.
    *
    * 100 TB: build trains on the [[MaxTrain]] bounded sample and scans
    * the base once; each ingest costs one batch-sized assignment pass +
    * one append commit; queries never touch the un-probed partitions.
    * The three entry points are the lifecycle a production vector store
    * exposes: build / ingest / query. */
  def ivfIndexBuild(
      spark: org.apache.spark.sql.SparkSession, centTable: String,
      idxTable: String, base: DataFrame, nlist: Int = 16,
      iters: Int = 3): Unit = {
    import spark.implicits._
    val c = base.localCheckpoint()
    val cents = lloydCentroids(c, nlist, iters)
    cents.toSeq.toDF("centroid_id", "centroid").writeTo(centTable).create()
    c.withColumn("bucket", nearestCentroids(cents, col("v"), 1).getItem(0))
      .select(col("vec_id"), col("v"), col("nrm"), col("bucket"))
      .writeTo(idxTable).partitionedBy(col("bucket")).create()
  }

  /** The persisted index metadata, re-read from the catalog — every
    * ingest/query consumes the STORED centroids, not a closure, so the
    * tables are the complete index state (a new session resumes it). */
  private[llm] def loadCentroids(
      spark: org.apache.spark.sql.SparkSession,
      centTable: String): Array[(Long, Seq[Double])] =
    spark.table(centTable).select(col("centroid_id"), col("centroid"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)

  /** Incremental ingest: assign the batch against the frozen stored
    * centroids, append. Cost ∝ batch; only the buckets present in the
    * batch receive files (asserted in SimilaritySpec).
    *
    * IDEMPOTENT BY KEY: vectors whose `vec_id` already sits in a
    * touched bucket are anti-joined away before the append, so a
    * replayed micro-batch (foreachBatch is at-least-once across
    * restarts) is a no-op instead of duplicating index rows — the
    * replay guard s12/s19 implement with MERGE, in the shape an
    * insert-only index wants. The existing-key read is pruned to the
    * buckets the batch actually touches (≤ nlist partitions — the
    * same static partition push as the query path), so the guard costs
    * a bounded bucket read, never an index scan. Re-ingesting a
    * CHANGED vector under an existing id is therefore a skip, not an
    * update — an upsert index would MERGE instead. */
  def ivfIndexIngest(
      spark: org.apache.spark.sql.SparkSession, centTable: String,
      idxTable: String, batch: DataFrame): Unit = {
    val cents = loadCentroids(spark, centTable)
    val assigned = batch
      .withColumn("bucket", nearestCentroids(cents, col("v"), 1).getItem(0))
      .select(col("vec_id"), col("v"), col("nrm"), col("bucket"))
      // WITHIN-batch dedup first: an at-least-once source can land the
      // same vec_id twice in one trigger, and the stored-index anti-join
      // below cannot see intra-batch duplicates
      .dropDuplicates("vec_id")
      .localCheckpoint() // feeds the touched-bucket probe AND the append
    val touched = assigned.select(col("bucket")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    if (touched.nonEmpty) {
      // anti-join on (bucket, vec_id): same key semantics (a vec_id's
      // bucket is a deterministic function of the frozen centroids),
      // and keeping the partition column in the join lets the planner
      // resolve the scan's partitioning (a vec_id-only projection
      // trips DPP's partition-ref resolution)
      val existing = spark.table(idxTable)
        .filter(col("bucket").isin(touched: _*))
        .select(col("bucket"), col("vec_id"))
      assigned
        .join(existing, Seq("bucket", "vec_id"), "left_anti")
        .writeTo(idxTable).append()
    }
  }

  /** Probe the maintained index: `nprobe` nearest stored centroids per
    * query, equality join on the bucket id, exact re-rank — the same
    * output contract as [[ivfCosineTopK]]. The UNION of probed buckets
    * is collected first (one tiny job over the query batch — bounded by
    * `min(queries × nprobe, nlist)` values) and pushed as a STATIC
    * partition filter on the index scan, so the catalog file index
    * prunes un-probed bucket partitions BEFORE any listing — a
    * join-driven plan would read every partition here (DPP does not
    * fire on an exploded probe side; verified against the executed
    * plan, and the pruned shape is pinned in SimilaritySpec). This is
    * the standard ANN-serving fetch: compute probe lists, read exactly
    * those shards. */
  def ivfIndexQuery(
      spark: org.apache.spark.sql.SparkSession, centTable: String,
      idxTable: String, queries: DataFrame, k: Int,
      nprobe: Int = 4): DataFrame = {
    val cents = loadCentroids(spark, centTable)
    val probed = queries
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        explode(nearestCentroids(cents, col("v"), nprobe)).as("bucket"))
    val probedBuckets = probed.select(col("bucket")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    val cands = spark.table(idxTable)
      .filter(col("bucket").isin(probedBuckets: _*))
      .select(col("vec_id").as("n_id"), col("v"), col("nrm"), col("bucket"))
      .join(probed, "bucket")
      .filter(col("n_id") =!= col("q_id"))
    val sims = cands
      .withColumn("sim", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), r4(col("sim")).as("sim4"))
  }

  /** Approximate cosine top-k: candidates from LSH bucket collisions in
    * any table, exact re-rank of candidates only. Same output shape as
    * [[cosineTopK]]; recall < 1 by design (property-gated, not
    * hash-gated). */
  def lshCosineTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      tables: Int = 8, bits: Int = 4): DataFrame = {
    val dim = derivedDim(corpus).getOrElse(return corpus
      .select(col("vec_id").as("q_id"), col("vec_id").as("n_id"),
        lit(0L).as("rank"), lit(0.0).as("sim4")).limit(0))
    val c = lshBucketed(corpus, tables, bits, dim)
      .select(col("vec_id").as("n_id"), col("v"), col("nrm"), col("table"), col("code"))
    val q = broadcast(lshBucketed(queries, tables, bits, dim)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("table"), col("code")))
    val cands = c.join(q, Seq("table", "code"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("qv"), col("qn"), col("n_id"), col("v"), col("nrm"))
      .dropDuplicates("q_id", "n_id")
    val sims = cands.withColumn("sim", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"),
        (r4(col("sim"))).as("sim4"))
  }

  // ----------------------------------------------------- product quantization

  /** Sub-space boundaries of a product quantizer: `m` contiguous slices
    * covering `dim` dims, the first `dim % m` slices one dim wider —
    * (1-based slice start, length) per sub-space. */
  private def pqSlices(dim: Int, m: Int): Array[(Int, Int)] = {
    require(m >= 1 && m <= dim, s"pq sub-spaces m=$m must be in [1, dim=$dim]")
    val base = dim / m
    val starts = (0 until m).scanLeft(1) { (s, j) =>
      s + base + (if (j < dim % m) 1 else 0)
    }
    (0 until m).map(j => (starts(j), starts(j + 1) - starts(j))).toArray
  }

  /** Per-query ADC tables adc(j)(cid) = <q_slice_j, book_j[cid]> as ONE
    * codegen'd [[graft.functions.PqSubDots]] loop — bit-identical to
    * the m·ksub `dot(slice(qv,…), lit(cv))` expression grid it replaced
    * (see PqSubDots for the compile-cost argument). */
  private def adcTables(
      qv: Column, books: Array[Array[Seq[Double]]], dim: Int): Column = {
    import org.apache.spark.sql.graft.GraftSqlBridge.{column, expression}
    column(graft.functions.PqSubDots(
      expression(qv), books.map(_.toSeq).toSeq,
      pqSlices(dim, books.length).toSeq))
  }

  /** Euclidean argmin over a sub-space codebook — [[graft.functions.PqAssign]]'s exact
    * scoring (left-to-right Σ(a−b)²) and tie rule (smallest distance,
    * ties to the SMALLER code id), used by the local PQ trainer. The
    * metric is Euclidean, NOT cosine: sub-vectors are unnormalized
    * fragments of the full vector, so direction-only assignment would
    * leave magnitude quantization error unpenalized and the ADC dot
    * estimates would drift. */
  private def assignSubCode(sv: Array[Double], book: Array[Seq[Double]]): Int = {
    var bestD = Double.PositiveInfinity
    var bestC = -1
    var cid = 0
    while (cid < book.length) {
      val cv = book(cid)
      val n = math.min(sv.length, cv.length)
      var s = 0.0
      var i = 0
      while (i < n) { val d = sv(i) - cv(i); s += d * d; i += 1 }
      if (s < bestD) { bestD = s; bestC = cid }
      cid += 1
    }
    bestC
  }

  /** Product-quantization codebooks: per sub-space, `ksub` centroids
    * trained by `iters` Euclidean Lloyd iterations (deterministic
    * seeds = the ksub smallest-id rows; integer-quantized means; an
    * emptied cluster keeps its previous centroid). Returns
    * books(sub)(code). Training runs LOCALLY on the bounded
    * [[MaxTrain]] sample: ONE collect replaces the seed fetch plus
    * `iters` corpus-wide jobs — and, measured as important at fixture
    * scale, `iters` Janino compilations of the m×ksub-literal
    * assignment expression tree. [[assignSubCode]]/[[quantizedMeans]]
    * replicate the distributed math bit-for-bit (same
    * sqDist/tie/rounding rules), so codebooks are unchanged wherever
    * the corpus fits the cap. */
  private[llm] def pqCodebooks(
      corpus: DataFrame, m: Int, ksub: Int, iters: Int,
      dim: Int): Array[Array[Seq[Double]]] = {
    val slices = pqSlices(dim, m)
    val train = collectTraining(corpus)
    val seedRows = train.take(ksub).map(_._2.toSeq)
    var books: Array[Array[Seq[Double]]] = slices.map { case (start, len) =>
      seedRows.map(v => v.slice(start - 1, start - 1 + len))
    }
    if (seedRows.isEmpty) return books
    val subVecs: Array[Array[Array[Double]]] = slices.map { case (start, len) =>
      train.map { case (_, v) => v.slice(start - 1, start - 1 + len) }
    }
    for (_ <- 0 until iters) {
      books = books.zipWithIndex.map { case (book, s) =>
        val refined = quantizedMeans(
          subVecs(s).iterator.map(sv => (assignSubCode(sv, book).toLong, sv)).toSeq,
          dim = slices(s)._2)
        book.zipWithIndex.map { case (cv, cid) =>
          refined.get(cid.toLong).map(_.toSeq).getOrElse(cv)
        }
      }
    }
    books
  }

  /** Attach the PQ code array: code(j) = Euclidean-nearest centroid of
    * sub-space j's slice, via the single codegen'd
    * [[graft.functions.PqAssign]] loop (bit-identical to the m
    * `array_sort(struct(sqDist))` argmin trees it replaced, which cost
    * more to Janino-compile than the fixture scan cost to run — see
    * PqAssign's scaladoc). One corpus pass; the output row carries
    * (id, code) — m small ints per vector, the compressed
    * representation the ADC scan reads. */
  private[llm] def pqEncode(
      norm: DataFrame, books: Array[Array[Seq[Double]]], dim: Int): DataFrame = {
    import org.apache.spark.sql.graft.GraftSqlBridge.{column, expression}
    norm.withColumn("code", column(graft.functions.PqAssign(
      expression(col("v")),
      books.map(_.map(_.toSeq).toSeq).toSeq,
      pqSlices(dim, books.length).toSeq)))
  }

  /** ANN through product quantization with asymmetric distance
    * computation (ADC) + exact re-rank — the MEMORY-scale path of the
    * ANN family (Jégou et al., "Product Quantization for Nearest
    * Neighbor Search"). The corpus is encoded once to `m` sub-space
    * code bytes per vector (m=8, ksub=16 ⇒ 8 B vs 4·dim=256 B float32:
    * 32×, the regime where a billion-vector index fits executor
    * memory); each query precomputes one m × ksub table of sub-space
    * dots (driver-free, a per-query-row columnar expression), and the
    * scan scores a candidate with m table LOOKUPS instead of dim
    * multiplies. The approximate top-`rerank` per query (WindowGroupLimit
    * caps per-task state) re-joins true vectors BY ID for an exact
    * cosine re-rank to top-k — join traffic is rerank-sized rows of
    * ids, never the corpus.
    *
    * 100 TB posture: queries are a fixed probe set (broadcast by
    * construction, q31's class); the ADC scan is one pass over the code
    * column with no shuffle before the per-query top-rerank; codebooks
    * are m × ksub × (dim/m) driver-side constants. Approximate ⇒
    * rows-only gated; recall, pruning and the zero-quantization-error
    * exactness property are SimilaritySpec-gated. */
  def pqCosineTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 8, ksub: Int = 16, iters: Int = 3,
      rerankFactor: Int = 4): DataFrame = {
    val dim = derivedDim(corpus).getOrElse(return corpus
      .select(col("vec_id").as("q_id"), col("vec_id").as("n_id"),
        lit(0L).as("rank"), lit(0.0).as("sim4")).limit(0))
    // One materialization serves codebook training, encoding and the
    // exact re-rank fetch (the ivfCosineTopK discipline).
    val c = corpus.localCheckpoint()
    val books = pqCodebooks(c, m, ksub, iters, dim)
    // ‖x‖ ≈ sqrt(Σ_j ‖c_{j,code_j}‖²): the reconstruction norm, a
    // per-sub-space lookup against driver-side constants.
    val sqNorms = books.map(book => book.map(cv => cv.map(x => x * x).sum).toSeq)
    val normApprox = sqrt((0 until m).map { j =>
      element_at(typedlit(sqNorms(j)), element_at(col("code"), j + 1) + 1)
    }.reduce[Column](_ + _))
    val codes = pqEncode(c, books, dim)
      .select(col("vec_id").as("n_id"), col("code"),
        normApprox.as("anrm")) // (id, m codes, approx norm) — no vector
      // an all-zero reconstruction (anrm=0) would make asim NaN, which
      // sorts ABOVE every real score descending — drop such degenerate
      // vectors from the shortlist instead of letting them displace it
      .filter(col("anrm") > 0)
    // Per-query ADC tables: adc(j)(cid) = <q_slice_j, c_{j,cid}> — one
    // columnar expression per query ROW, m·ksub doubles; never per pair.
    val q = broadcast(queries
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      .withColumn("adc", adcTables(col("qv"), books, dim)))
    val approxDot = (0 until m).map { j =>
      element_at(element_at(col("adc"), j + 1), element_at(col("code"), j + 1) + 1)
    }.reduce[Column](_ + _)
    val scored = codes.join(q.select(col("q_id"), col("qn"), col("adc")),
        col("n_id") =!= col("q_id"))
      .withColumn("asim", approxDot / (col("qn") * col("anrm")))
    val wa = Window.partitionBy(col("q_id")).orderBy(col("asim").desc, col("n_id").asc)
    val shortlist = scored.withColumn("ark", row_number().over(wa))
      .filter(col("ark") <= k * rerankFactor)
      .select(col("q_id"), col("n_id"))
    // Exact re-rank: fetch survivors' true vectors by id, score with the
    // codegen'd cosine, keep the k best (WindowGroupLimit again).
    val exact = shortlist
      .join(c.select(col("vec_id").as("n_id"), col("v"), col("nrm")), "n_id")
      .join(q.select(col("q_id"), col("qv"), col("qn")), "q_id")
      .withColumn("sim", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    exact.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), r4(col("sim")).as("sim4"))
  }

  // ------------------------------------------------------------------ IVFADC

  /** Shared candidate stage of [[ivfadcCosineTopK]] and its pruning
    * observable: (approximately scored candidates, checkpointed corpus
    * for the exact re-rank). See ivfadcCosineTopK for the algorithm. */
  private def ivfadcScoredCandidates(
      corpus: DataFrame, queries: DataFrame,
      nlist: Int, nprobe: Int, m: Int, ksub: Int, iters: Int,
      dim: Int): (DataFrame, DataFrame) = {
    val c = corpus.localCheckpoint()
    val cents = lloydCentroids(c, nlist, iters)
    val centMap: Map[Long, Seq[Double]] = cents.toMap
    val slices = pqSlices(dim, m)
    // Residual encoding: r = v − c_bucket (element-wise; the centroid
    // lookup is a driver-side map literal, the subtraction row-local).
    // Residuals are what PQ quantizes in IVFADC — they are centered near
    // zero within a list, so ksub codes spend their resolution on the
    // within-list variation instead of re-describing the centroid.
    val resid = c
      .withColumn("bucket", nearestCentroids(cents, col("v"), 1).getItem(0))
      .withColumn("rv", zip_with(col("v"),
        element_at(typedlit(centMap), col("bucket")), (a, b) => a - b))
      .localCheckpoint() // serves PQ training AND encoding
    val books = pqCodebooks(
      resid.select(col("vec_id"), col("rv").as("v")), m, ksub, iters, dim)
    // ‖x̂‖ = ‖c_b + r̂‖ = sqrt(‖c_b‖² + 2·Σ_j <c_b|_j, book_j[code_j]> +
    // Σ_j ‖book_j[code_j]‖²) — all three terms are lookups against
    // driver-side constants (nlist + nlist·m·ksub + m·ksub doubles).
    val cnorm2: Map[Long, Double] =
      cents.map { case (cid, cv) => cid -> cv.map(x => x * x).sum }.toMap
    val crossMap: Map[Long, Seq[Seq[Double]]] = cents.map { case (cid, cv) =>
      cid -> slices.zip(books).map { case ((start, len), book) =>
        val cslice = cv.slice(start - 1, start - 1 + len)
        book.map(bv => bv.zip(cslice).map { case (x, y) => x * y }.sum).toSeq
      }.toSeq
    }.toMap
    val sqNorms = books.map(book => book.map(cv => cv.map(x => x * x).sum).toSeq)
    def codeAt(j: Int): Column = element_at(col("code"), j + 1) + 1
    val crossSum = (0 until m).map { j =>
      element_at(element_at(element_at(typedlit(crossMap), col("bucket")), j + 1), codeAt(j))
    }.reduce[Column](_ + _)
    val rnorm2Sum = (0 until m).map { j =>
      element_at(typedlit(sqNorms(j)), codeAt(j))
    }.reduce[Column](_ + _)
    // greatest(0): the expression is a true squared norm, but float
    // rounding near zero could dip epsilon-negative under sqrt
    val anrm = sqrt(greatest(lit(0.0),
      element_at(typedlit(cnorm2), col("bucket")) + lit(2.0) * crossSum + rnorm2Sum))
    val codesDf = pqEncode(
      resid.select(col("vec_id"), col("bucket"), col("rv").as("v")), books, dim)
      .select(col("vec_id").as("n_id"), col("bucket"), col("code"), anrm.as("anrm"))
      // q78's degenerate-vector rule: an all-zero reconstruction would
      // score NaN, which sorts above every real sim — rank it out
      .filter(col("anrm") > 0)
    // Per-query: probe the nprobe nearest lists; carry the ADC tables
    // (residual-codebook sub-dots) and the per-probed-list <q, c_b> —
    // candidate rows then need only (qn, adc, qc), never the query vector.
    val q = broadcast(queries
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        explode(nearestCentroids(cents, col("v"), nprobe)).as("bucket"))
      .withColumn("adc", adcTables(col("qv"), books, dim))
      .withColumn("qc", dot(col("qv"), element_at(typedlit(centMap), col("bucket"))))
      .select(col("q_id"), col("bucket"), col("qn"), col("adc"), col("qc")))
    // <q, x̂> = <q, c_b> + Σ_j adc_j[code_j]: m lookups per candidate,
    // reached through an EQUALITY join on the probed list id — the scan
    // touches ~nprobe/nlist of the codes, never the corpus.
    val approxResDot = (0 until m).map { j =>
      element_at(element_at(col("adc"), j + 1), codeAt(j))
    }.reduce[Column](_ + _)
    val scored = codesDf.join(q, Seq("bucket"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("asim", (col("qc") + approxResDot) / (col("qn") * col("anrm")))
    (scored, c)
  }

  /** IVF+PQ (IVFADC proper, Jégou et al. §5): the coarse quantizer
    * prunes WHICH codes are scanned (only `nprobe` of `nlist` inverted
    * lists per query — [[ivfCosineTopK]]'s axis), product quantization
    * on the RESIDUAL v − c_bucket compresses WHAT is scanned (m code
    * bytes per vector — [[pqCosineTopK]]'s axis). This is the
    * composition every FAISS-class billion-vector deployment runs: q78
    * alone scans ALL codes per query; q40 alone moves full float
    * vectors through its probed lists; q78b scans nprobe/nlist of the
    * corpus as code bytes. Approximate ⇒ rows-only gated; recall vs
    * q31, strict candidate pruning, and a zero-quantization-error
    * exactness case are SimilaritySpec-gated.
    *
    * 100 TB posture: queries are a fixed probe set (broadcast by
    * construction); the candidate stage is an equality join on the
    * probed list id over (id, bucket, m bytes, anrm) rows — at m=8,
    * ksub=16 that is 32× smaller than the float corpus, the regime
    * where a billion-vector index fits executor memory; training
    * traffic is bounded (nlist + ksub·dim scalars per Lloyd step, on a
    * corpus SAMPLE at scale — the FAISS convention); the exact re-rank
    * joins true vectors BY ID for rerank-sized shortlists only. */
  def ivfadcCosineTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4,
      m: Int = 8, ksub: Int = 16, iters: Int = 3,
      rerankFactor: Int = 4): DataFrame = {
    val dim = derivedDim(corpus).getOrElse(return corpus
      .select(col("vec_id").as("q_id"), col("vec_id").as("n_id"),
        lit(0L).as("rank"), lit(0.0).as("sim4")).limit(0))
    val (scored, c) = ivfadcScoredCandidates(
      corpus, queries, nlist, nprobe, m, ksub, iters, dim)
    val wa = Window.partitionBy(col("q_id")).orderBy(col("asim").desc, col("n_id").asc)
    val shortlist = scored.withColumn("ark", row_number().over(wa))
      .filter(col("ark") <= k * rerankFactor)
      .select(col("q_id"), col("n_id"))
    val exact = shortlist
      .join(c.select(col("vec_id").as("n_id"), col("v"), col("nrm")), "n_id")
      .join(broadcast(queries.select(
        col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))), "q_id")
      .withColumn("sim", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    exact.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), r4(col("sim")).as("sim4"))
  }

  /** Codes offered to the ADC scan by the probed-list join — the pruning
    * observable SimilaritySpec gates against both all-pairs AND q78's
    * scan-everything count (that difference IS q78b's reason to exist). */
  private[llm] def ivfadcCandidatePairs(
      corpus: DataFrame, queries: DataFrame,
      nlist: Int = 16, nprobe: Int = 4,
      m: Int = 8, ksub: Int = 16, iters: Int = 3): Long = {
    val dim = derivedDim(corpus).getOrElse(return 0L)
    val (scored, _) = ivfadcScoredCandidates(
      corpus, queries, nlist, nprobe, m, ksub, iters, dim)
    scored.select(col("q_id"), col("n_id")).distinct().count()
  }
}
