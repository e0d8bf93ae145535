package graft.llm

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Semantics of the dedup operator family (SURVEY.md §7.1), on the
  * fixtures and on adversarial in-memory corpora. */
class DedupSpec extends AnyFunSuite with SparkFixture {

  private def fixtureDocs = graft.Tables(spark, sf0001, "documents")

  test("exact dedup groups identical content regardless of case/whitespace") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello   World"), (2L, "hello world"), (3L, "HELLO  WORLD "),
      (4L, "something else")).toDF("doc_id", "text")
    val groups = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(groups.length === 2)
    val dup = groups.find(_.getAs[Long]("n_copies") == 3L).get
    assert(dup.getAs[Long]("keep_id") === 1L)
  }

  test("richest-variant dedup keeps the longest raw rendering, id tiebreak") {
    import spark.implicits._
    val docs = Seq(
      // one content group, three renderings: #2 is richest (most raw
      // chars); #1 arrives first but must NOT win
      (1L, "hello world"), (2L, "Hello   World  "), (3L, "HELLO WORLD"),
      // a tie group: identical raw lengths → smaller id wins
      (4L, "aa bb"), (5L, "AA BB"),
      (6L, "something else")).toDF("doc_id", "text")
    val out = Dedup.exactKeepRichest(docs, "doc_id", "text").collect()
      .map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_raw_chars"),
        r.getAs[Long]("n_copies")))
    assert(out.length === 3)
    assert(out.contains((2L, 15L, 3L)), s"richest variant lost: ${out.toSeq}")
    assert(out.contains((4L, 5L, 2L)), s"tie must break to the smaller id: ${out.toSeq}")
    assert(out.contains((6L, 14L, 1L)))
    // same partition of the corpus as q27's policy — only the survivor
    // rule differs
    val q27 = Dedup.exactGroups(docs, "doc_id", "text").collect()
      .map(r => (r.getAs[String]("content_hash"), r.getAs[Long]("n_copies"))).toSet
    val q83 = Dedup.exactKeepRichest(docs, "doc_id", "text").collect()
      .map(r => (r.getAs[String]("content_hash"), r.getAs[Long]("n_copies"))).toSet
    assert(q27 === q83)
  }

  test("shingles of short docs are empty, not descending-sequence garbage") {
    import spark.implicits._
    val docs = Seq((1L, "only two"), (2L, "a b c d")).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
      TextOps.shingles(TextOps.tokens(col("text")), 3).as("s")).collect()
    assert(sh.find(_.getLong(0) == 1L).get.getSeq[String](1).isEmpty)
    assert(sh.find(_.getLong(0) == 2L).get.getSeq[String](1) === Seq("a b c", "b c d"))
  }

  test("minhash-LSH pairs equal the exact Jaccard pairs on the fixture") {
    val exact = Dedup.ngramJaccardPairs(fixtureDocs, "doc_id", "text", n = 3, tau = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    val lsh = Dedup.minhashLshPairs(fixtureDocs, "doc_id", "text",
      n = 3, tau = 0.8, bands = 16, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    assert(exact.nonEmpty, "fixture should contain injected near-duplicates")
    assert(lsh === exact)
  }

  test("SRP-LSH embedding near-dup pairs equal the exact all-pairs baseline") {
    // Deterministic under the seeded planes: the designed per-pair miss
    // bound at cos 0.45 is ~7e-7 (b=2, t=26), and this fixture draw has
    // zero misses — the same parity contract q29 holds against q28.
    val emb = graft.Tables(spark, sf0001, "embeddings")
    val exact = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", minCos = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    val lsh = Dedup.embeddingNearDupPairsLsh(emb, "vec_id", "embedding", minCos = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    assert(exact.nonEmpty, "fixture should contain qualifying pairs")
    assert(lsh === exact)
  }

  /** The production-regime corpus shared by the q38b and q75 tests: 150
    * random 64-dim gaussians (background cosines ~N(0, 1/64)) plus 30
    * tight perturbations of the first 30 (cos ~0.9995) — unlike the
    * driver fixture's tau=0.45 regime, here the angular gap is real.
    * Fully seeded, so every derived set is deterministic. */
  private def plantedNearDupCorpus = {
    import spark.implicits._
    val dim = 64
    val rnd = new scala.util.Random(13)
    def gauss() = Array.fill(dim)(rnd.nextGaussian())
    val base = (0L until 150L).map(id => (id, gauss()))
    val dups = (0L until 30L).map { i =>
      val noise = gauss()
      (200L + i, base(i.toInt)._2.zip(noise).map { case (x, e) => x + 0.03 * e })
    }
    (base ++ dups).toDF("vec_id", "embedding")
  }

  test("embedding LSH production regime (cos>=0.9, wide bits): prunes all-pairs AND stays complete") {
    val dim = 64
    val vecs = plantedNearDupCorpus
    val nAllPairs = 180L * 179L / 2L
    val exact = Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 30, s"fixture sanity: expected the 30 planted near-dups, got ${exact.size}")
    // completeness claim: at p_bit = 1 - acos(.9995)/pi ~ .990, a
    // 16-bit table catches a true pair with .86; 8 tables miss with
    // (1-.86)^8 ~ 2e-7 per pair — and the seeded planes make the
    // outcome deterministic, so equality (not "probably") is asserted
    val lsh = Dedup.embeddingNearDupPairsLsh(vecs, "vec_id", "embedding", 0.9,
      tables = 8, bits = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact, "wide-bit LSH lost or invented a near-dup pair")
    // pruning claim, asserted numerically: background pairs collide in a
    // 16-bit table with ~2^-16 per table, so candidates ~= true pairs,
    // orders of magnitude under n(n-1)/2
    val n = Similarity.normalized(vecs, "vec_id", "embedding").localCheckpoint()
    val nCands = Dedup.embeddingLshCandidates(n, tables = 8, bits = 16, dim = dim).count()
    val frac = nCands.toDouble / nAllPairs
    assert(nCands >= exact.size.toLong, "candidates cannot undercount the found pairs")
    assert(frac < 0.05, f"candidate fraction $frac%.4f (=$nCands/$nAllPairs) did not prune")
  }

  test("bloom decontamination equals the exact broadcast-join path on the fixture") {
    // FP-only error: the bloom can never MISS a contaminated n-gram, so
    // any divergence is an over-count. At default sizing (2^23 bits for
    // the fixture's ~10^3 probe shingles) expected FPs ≈ 10^-8 — this
    // equality is the deterministic zero-FP verification the q57b hash
    // gate rests on (same class as q38b's zero-miss check).
    def key(r: Row) = (r.getLong(0), r.getLong(1))
    val exact = Dedup.decontaminationHits(fixtureDocs, "doc_id", "text",
      n = 8, probeMod = 35).collect().map(key).toSet
    val bloom = Dedup.decontaminationHitsBloom(fixtureDocs, "doc_id", "text",
      n = 8, probeMod = 35).collect().map(key).toSet
    assert(exact.nonEmpty, "fixture sanity: probe slice found no hits")
    assert(bloom === exact,
      s"bloom path diverged: extra=${(bloom -- exact).take(5)} missing=${(exact -- bloom).take(5)}")
  }

  test("bloom decontamination on an empty probe slice reports nothing contaminated") {
    import spark.implicits._
    // no doc_id ≡ 0 (mod 97): the sketch aggregate returns null and the
    // operator must degrade to an empty result, not an NPE or all-hits
    val docs = Seq((1L, "a b c d e f g h i j"), (2L, "k l m n o p q r s t"))
      .toDF("doc_id", "text")
    val res = Dedup.decontaminationHitsBloom(docs, "doc_id", "text",
      n = 8, probeMod = 97)
    assert(res.count() === 0L)
    assert(res.columns.toSeq === Seq("doc_id", "n_contaminated_ngrams"))
  }

  test("containment catches a quoted excerpt that Jaccard misses") {
    import spark.implicits._
    val excerpt = "alpha beta gamma delta epsilon zeta eta theta"
    val page = s"intro words here $excerpt and then a very long tail " +
      "of unrelated content stretching on and on with many extra tokens " +
      "so the jaccard similarity collapses toward zero for this pair"
    val docs = Seq(
      (1L, excerpt), (2L, page),
      (3L, "completely different text with no shared trigrams at all here")
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text", n = 3, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cont.map(t => (t._1, t._2)).toSet === Set((1L, 2L)),
      s"expected exactly the excerpt⊂page pair, got ${cont.toSeq}")
    assert(cont.head._3 === 1.0, "a fully-quoted excerpt has containment 1")
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, tau = 0.8)
      .collect()
    assert(jac.isEmpty, "the excerpt pair must be invisible to Jaccard at 0.8")
  }

  test("cross-snapshot near-dups: only NEW×PREV pairs, verified exactly") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (3L, base),                       // prev (id % 3 == 0)
      (4L, base + " phi"),              // new, near-dup of prev 3 → flagged
      (5L, "completely unrelated words about database query planning"),
      (7L, base + " chi"),              // new near-dup of NEW 4 — intra-new,
      (6L, base + " psi")               // prev near-dup of prev 3 — intra-prev
    ).toDF("doc_id", "text")
    val out = Dedup.crossSnapshotNearDups(docs, "doc_id", "text",
      isPrev = col("doc_id") % 3 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every output pair crosses the boundary: new on the left, prev right
    assert(out.forall { case (n, p, _) => n % 3 != 0 && p % 3 == 0 })
    // doc 4 matches both prev 3 and prev 6; doc 7 likewise; 5 matches none
    assert(out.map(t => (t._1, t._2)).toSet ===
      Set((4L, 3L), (4L, 6L), (7L, 3L), (7L, 6L)))
    assert(out.forall { case (_, _, j) => j >= 0.8 && j <= 1.0 })
  }

  test("curate pipeline drops low-quality, duplicate and contaminated docs") {
    // q65's composition on the sf0.001 fixture: every survivor must be
    // (a) its content group's minimum id, (b) at or above the quality
    // floor, (c) free of probe 8-gram overlap — and every non-survivor
    // of the corpus slice must fail at least one of the three.
    val out = LlmQueries.q65_curate(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.nonEmpty)
    assert(out.forall(_._2 >= 0.5))
    val survivors = out.map(_._1).toSet
    assert(survivors.forall(_ % 35 != 0), "probe docs are not corpus members")
    val contaminated = Dedup.decontaminationHits(
        fixtureDocs, "doc_id", "text", n = 8, probeMod = 35)
      .collect().map(_.getLong(0)).toSet
    assert(survivors.intersect(contaminated).isEmpty,
      "no contaminated doc may survive curation")
  }

  test("simhash: identical docs collide at hamming 0; pairs respect the cap") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark shuffles data across the cluster for wide dependencies"),
      (2L, "spark shuffles data across the cluster for wide dependencies"),
      (3L, "an entirely different document about database query optimizers and planning"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L &&
      r.getInt(2) == 0), s"identical docs must collide: ${pairs.mkString(",")}")
    assert(pairs.forall(_.getInt(2) <= 3))
  }

  test("jaccard maxShingleDf cap drops ubiquitous shingles from the join") {
    import spark.implicits._
    // 'x y z' appears in every doc; with cap=2 it cannot generate pairs.
    val docs = Seq(
      (1L, "x y z a b c"), (2L, "x y z a b c"), (3L, "x y z q w e")).toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, tau = 0.9)
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, tau = 0.9,
      maxShingleDf = Some(2))
    assert(uncapped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 2L)))
    // capped drops 'x y z'-family shingles shared by all three docs but the
    // (1,2) pair still meets tau through its unique shingles
    assert(capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 2L)))
  }

  test("containment maxShingleDf cap bounds the probe join the same way") {
    import spark.implicits._
    // doc 4 is contained in doc 1; 'x y z'-rooted shingles are corpus-wide
    val docs = Seq(
      (1L, "x y z a b c d e"), (2L, "x y z q w e r t"),
      (3L, "x y z m n o p u"), (4L, "a b c d e")).toDF("doc_id", "text")
    val uncapped = Dedup.containmentPairs(docs, "doc_id", "text", n = 3, tau = 0.9)
    val capped = Dedup.containmentPairs(docs, "doc_id", "text", n = 3, tau = 0.9,
      maxShingleDf = Some(2))
    // the contained-quote pair survives the cap (its shingles are rare);
    // the ubiquitous shingles can no longer form candidates on either side
    assert(uncapped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 4L)))
    assert(capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 4L)))
  }

  /** Adversarial CC fixture: a path graph 10–11–12–…–19 has component
    * diameter 9 — min-label propagation needs multiple passes for the
    * minimum (10) to reach the far end, unlike the shallow star-shaped
    * clusters real near-dup output produces. Pins the converged result:
    * every vertex labels rep=10, size=10, alongside a separate pair and
    * a singleton-free vertex set (vertices only exist via pairs). */
  private def pathGraphPairs = {
    import spark.implicits._
    ((10L until 19L).map(i => (i, i + 1)) ++ Seq((30L, 31L)))
      .toDF("d1", "d2")
  }

  test("dedupClusters closes a long-chain component to its minimum label") {
    val out = Dedup.dedupClusters(pathGraphPairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected =
      (10L to 19L).map(i => (i, 10L, 10L)).toSet ++
        Set((30L, 30L, 2L), (31L, 30L, 2L))
    assert(out === expected)
  }

  test("dedupClusters with a reliable checkpoint dir produces the same clusters") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    try {
      val out = Dedup.dedupClusters(pathGraphPairs, checkpointDir = Some(dir))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expected =
        (10L to 19L).map(i => (i, 10L, 10L)).toSet ++
          Set((30L, 30L, 2L), (31L, 30L, 2L))
      assert(out === expected)
      // the durable path really did write checkpoint data
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "reliable checkpoint must persist files")
      // O(1) reliable storage in iterations: the release path deletes a
      // superseded iteration's rdd-* checkpoint dir inside the loop —
      // the diameter-9 chain runs ~10 iterations, so without deletion
      // ~11 dirs would remain. At exit only the live labels checkpoint
      // (and at most one in-flight peer) may survive.
      val rddDirs = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("rdd-"))
        .count()
      assert(rddDirs <= 2,
        s"superseded checkpoints must be deleted in-loop; found $rddDirs rdd-* dirs")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("semDedup: kept set pairwise < tau in-cluster; drops name smaller in-cluster witnesses") {
    val emb = graft.Tables(spark, sf0001, "embeddings")
    val tau = 0.45
    val res = Dedup.semDedup(emb, "vec_id", "embedding", tau = tau).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
    val vecs = Similarity.normalized(emb, "vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Double](1).toArray, r.getDouble(2))).toMap
    def cos(a: Long, b: Long): Double = {
      val ((va, na), (vb, nb)) = (vecs(a), vecs(b))
      va.zip(vb).map { case (x, y) => x * y }.sum / (na * nb)
    }
    // one verdict per vector
    assert(res.length === vecs.size)
    val cluster = res.map(t => t._1 -> t._2).toMap
    val dropped = res.filter(!_._3)
    assert(dropped.nonEmpty, "fixture's near-dup pairs should cause drops")
    // every drop names a smaller same-cluster witness at >= tau; every
    // keep is its own rep
    res.foreach { case (id, cl, keep, rep) =>
      if (keep) assert(rep === id)
      else {
        assert(rep < id, s"witness $rep must precede $id")
        assert(cluster(rep) === cl, s"witness $rep not in $id's cluster")
        assert(cos(rep, id) >= tau, s"witness cos(${rep}, $id) below tau")
      }
    }
    // the SemDeDup invariant: kept vectors are pairwise < tau within
    // every cluster — equivalently, every intra-cluster exact near-dup
    // pair (q38's baseline) lost at least one side
    val exact = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", minCos = tau)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val keptIds = res.filter(_._3).map(_._1).toSet
    val intraPairs = exact.filter { case (a, b) => cluster(a) == cluster(b) }
    assert(intraPairs.nonEmpty, "fixture near-dups should co-cluster")
    intraPairs.foreach { case (a, b) =>
      assert(!(keptIds(a) && keptIds(b)),
        s"intra-cluster near-dup pair ($a, $b) fully kept")
    }
  }

  test("semDedup production regime (cos>=0.9): planted pairs co-cluster and each loses one side") {
    // Where near-dups actually live (cos ~0.9995), a near-identical pair
    // assigns to the SAME Lloyd centroid — the designed cross-cluster
    // miss does not fire, so recall against the exact baseline is total,
    // and the min-id rule drops exactly the non-representative side.
    val vecs = plantedNearDupCorpus
    val tau = 0.9
    val res = Dedup.semDedup(vecs, "vec_id", "embedding", tau = tau).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
    val cluster = res.map(t => t._1 -> t._2).toMap
    val keptIds = res.filter(_._3).map(_._1).toSet
    val exact = Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding", minCos = tau)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(exact.length >= 30, s"fixture sanity: expected the planted pairs, got ${exact.length}")
    val intra = exact.count { case (a, b) => cluster(a) == cluster(b) }
    assert(intra === exact.length,
      s"only $intra/${exact.length} near-dup pairs co-clustered — recall lost")
    exact.foreach { case (a, b) =>
      assert(!(keptIds(a) && keptIds(b)), s"near-dup pair ($a, $b) fully kept")
    }
    // no false drops: every dropped vector is a member of some exact pair
    val inPairs = exact.flatMap(p => Seq(p._1, p._2)).toSet
    res.filter(!_._3).foreach { case (id, _, _, _) =>
      assert(inPairs(id), s"dropped $id has no near-duplicate at tau")
    }
  }

  // ------------------------------------------------- q84 substring dedup

  private def q84Out(docs: org.apache.spark.sql.DataFrame,
      k: Int = 8, minLen: Int = 16) =
    Dedup.stripDupSubstrings(docs, "doc_id", "text", k, minLen).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Long]("n_removed_tokens"), r.getAs[String]("kept_text"))))
      .toMap

  test("substring dedup excises a shared span from ALL hosts, exactly the span") {
    import spark.implicits._
    val quote = (1 to 20).map(i => s"q$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma $quote delta epsilon"),
      (2L, s"one two three four five $quote six seven"),
      (3L, "totally unique text with no duplicated content anywhere here at all")
    ).toDF("doc_id", "text")
    val out = q84Out(docs)
    // coverage is the union of duplicated 8-gram windows: grams
    // straddling the quote boundary differ by context, so the removed
    // span is EXACTLY the 20-token quote — no bleed into host text
    assert(out(1L) === ((25L, 1L, 20L, "alpha beta gamma delta epsilon")))
    assert(out(2L) === ((27L, 1L, 20L, "one two three four five six seven")))
    assert(out(3L)._2 === 0L)
    assert(out(3L)._4 === "totally unique text with no duplicated content anywhere here at all")
  }

  test("substring dedup counts WITHIN-document repetition; both occurrences go") {
    import spark.implicits._
    val span = (1 to 16).map(i => s"r$i").mkString(" ")
    val docs = Seq((1L, s"$span middle words $span")).toDF("doc_id", "text")
    val out = q84Out(docs)
    // two disjoint maximal runs (the straddling grams occur once), each
    // >= minLen — symmetric removal leaves only the unique middle
    assert(out(1L) === ((34L, 2L, 32L, "middle words")))
  }

  test("substring dedup keeps duplicated spans SHORTER than minLen") {
    import spark.implicits._
    val short = (1 to 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"first host context words $short tail one"),
      (2L, s"second host other context $short tail two")
    ).toDF("doc_id", "text")
    val out = q84Out(docs)
    // the 10-token run is detected as covered but fails the minLen=16
    // gate — reported clean, text intact ("tail one/two" differ)
    assert(out(1L)._2 === 0L)
    assert(out(1L)._3 === 0L)
    assert(out(1L)._4.contains(short))
    assert(out(2L)._4.contains(short))
  }

  test("substring dedup: exact-duplicate documents both empty out, auditable") {
    import spark.implicits._
    val body = (1 to 18).map(i => s"b$i").mkString(" ")
    val docs = Seq((1L, body), (2L, body), (3L, "tiny")).toDF("doc_id", "text")
    val out = q84Out(docs)
    // full-body duplication: one span covering everything, kept_text
    // empty but the ROW survives (verdict, not a silent drop)
    assert(out(1L) === ((18L, 1L, 18L, "")))
    assert(out(2L) === ((18L, 1L, 18L, "")))
    // sub-k doc: no grams, passes through untouched
    assert(out(3L) === ((1L, 0L, 0L, "tiny")))
  }

  test("surgical decontamination removes exactly the probe-overlapping spans; " +
    "probe docs excluded; clean docs untouched") {
    import spark.implicits._
    val question = (1 to 12).map(i => s"bench$i").mkString(" ")
    val docs = Seq(
      // probe doc (id % 35 == 0): the benchmark question
      (35L, s"intro words $question outro words"),
      // candidate quoting the question verbatim mid-page
      (1L, s"alpha beta gamma delta epsilon $question zeta eta theta"),
      // candidate with no overlap
      (2L, "completely original page content with no benchmark text at all present here"),
      // second probe doc — must not appear in the output
      (70L, "another benchmark prompt entirely")
    ).toDF("doc_id", "text")
    val out = Dedup.stripContaminatedSpans(docs, "doc_id", "text",
      k = 8, probeMod = 35).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_contaminated_spans"),
          r.getAs[Long]("n_removed_tokens"), r.getAs[String]("kept_text"))))
      .toMap
    assert(!out.contains(35L) && !out.contains(70L),
      "probe documents must be excluded from the cleaned corpus")
    // the quoted 12-token question is exactly the union of its probe
    // 8-gram windows; straddling grams differ by context — no bleed
    assert(out(1L) === ((20L, 1L, 12L,
      "alpha beta gamma delta epsilon zeta eta theta")))
    assert(out(2L)._2 === 0L && out(2L)._3 === 0L)
    assert(out(2L)._4 ===
      "completely original page content with no benchmark text at all present here")
  }

  test("substring dedup fixture invariants: token conservation and span consistency") {
    val out = Dedup.stripDupSubstrings(fixtureDocs, "doc_id", "text").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val removed = r.getAs[Long]("n_removed_tokens")
      val keptText = r.getAs[String]("kept_text")
      val keptN = if (keptText.isEmpty) 0L else keptText.split(" ").length.toLong
      assert(keptN === n - removed,
        s"doc ${r.getAs[Long]("doc_id")}: $n tokens, $removed removed, $keptN kept")
      val spans = r.getAs[Long]("n_dup_spans")
      // every reported span is >= minLen tokens; none without removal
      assert((spans == 0L) === (removed == 0L))
      if (spans > 0) assert(removed >= 16L * spans)
    }
  }
}
