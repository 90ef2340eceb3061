package graft

import graft.analysis.{Analyzer, AnalyzerConfig}
import graft.ops.{Curation, Decontaminate, Dedup, Knn, Repetition, Scrub, TextQuality}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val an = new Analyzer(AnalyzerConfig())

  private val docs = Seq(
    // a near-dup pair (one word changed out of 12)
    "d1" -> "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
    "d2" -> "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu",
    // an exact dup pair
    "d3" -> "same same same text here",
    "d4" -> "same same same text here",
    // unrelated docs
    "d5" -> "completely different words in this one right here now",
    "d6" -> "unrelated content again with other vocabulary entirely present",
    // too short to shingle
    "d7" -> "tiny doc"
  )

  private def corpusDF = {
    import spark.implicits._
    docs.toDF("docno", "content")
  }

  test("shingles: distinct word n-grams per doc, short docs excluded") {
    val sh = Dedup.shingles(corpusDF, an, 3).collect().map(r => (r.getString(0), r.getString(1)))
    assert(!sh.exists(_._1 == "d7")) // 2 tokens < n
    val d3 = sh.filter(_._1 == "d3").map(_._2).toSet
    assert(d3 == Set("same same same", "same same text", "same text here"))
    assert(sh.count(_._1 == "d1") == 10) // 12 tokens → 10 shingles, all distinct
  }

  test("minhash candidates find near-dups and exact dups, not unrelated docs") {
    val cand = Dedup.minHashCandidates(corpusDF, an, 3, 12, 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(cand.contains(("d1", "d2")))
    assert(cand.contains(("d3", "d4")))
    assert(!cand.contains(("d5", "d6")))
  }

  test("minhash bucket cap drops degenerate buckets entirely") {
    // every candidate pair above shares a bucket of size ≥ 2, so cap=1
    // must drop all buckets and yield zero candidates
    val capped = Dedup.minHashCandidates(corpusDF, an, 3, 12, 2, maxBucketSize = 1)
    assert(capped.count() == 0)
  }

  test("duplicatedSpans: maximal cross-doc covered runs; intra-doc repeats don't count") {
    import spark.implicits._
    val c = Seq(
      // s1/s2 share the prefix run "one two three four five" and the
      // suffix run "eight nine ten" at different offsets
      "s1" -> "one two three four five six seven eight nine ten",
      "s2" -> "zz one two three four five yy qq eight nine ten pp",
      // 3-gram repeated twice INSIDE one doc only — distinct-doc rule
      // must ignore it
      "s3" -> "foo bar baz foo bar baz").toDF("docno", "content")
    val sp = Dedup.duplicatedSpans(c, an, n = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // s1 duplicated 3-gram starts {1,2,3,8} → covered runs [1,5] and [8,10];
    // s2 starts {2,3,4,9} → [2,6] and [9,11]; s3 none
    assert(sp == Set(("s1", 1L, 5L, 5L), ("s1", 8L, 10L, 3L),
      ("s2", 2L, 6L, 5L), ("s2", 9L, 11L, 3L)))
  }

  test("lmScore: interpolated bigram cross-entropy, hand-checked") {
    import spark.implicits._
    val c = Seq("l1" -> "x y x y", "l2" -> "x z").toDF("docno", "content")
    val got = TextQuality.lmScore(c, an).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    // uni: x=3 y=2 z=1, T=6; bigrams: (x,y)=2 (y,x)=1 (x,z)=1
    def p(c12: Long, c1: Long, c2: Long) =
      0.9 * c12 / c1 + (1.0 - 0.9) * c2 / 6.0
    def bits(x: Double) = -(math.log(x) / math.log(2.0))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = (2 * bits(p(2, 3, 2)) + bits(p(1, 2, 3))) / 3
    val d2 = bits(p(1, 3, 1))
    assert(got("l1")._1 == 3L && got("l2")._1 == 1L)
    assert(math.abs(got("l1")._2 - r6(d1)) < 2e-6)
    assert(math.abs(got("l2")._2 - r6(d2)) < 2e-6)
    // the repetitive doc is more predictable than the unseen-pair doc
    assert(got("l1")._2 < got("l2")._2)
  }

  test("jaccard verification yields exact integer counts") {
    val sh = Dedup.shingles(corpusDF, an, 3)
    val cand = Dedup.minHashCandidates(corpusDF, an, 3, 12, 2)
    val ver = Dedup.verifyJaccard(cand, sh).collect()
      .map(r => ((r.getString(1), r.getString(0)), (r.getLong(2), r.getLong(3)))).toMap
    // exact dup: inter == uni
    val (i34, u34) = ver(("d4", "d3"))
    assert(i34 == u34 && i34 == 3)
    // near dup d1/d2: 12 tokens, differ in the last → 10 shingles each,
    // only the final shingle differs → inter 9, union 11
    val (i12, u12) = ver(("d2", "d1"))
    assert(i12 == 9 && u12 == 11)
  }

  test("scrub: emails/IPs/7+-digit runs redact; boundaries and threshold hold") {
    import spark.implicits._
    val df = Seq(
      ("d1", "mail a.b+c@x-y.org here"),
      ("d2", "ip 10.0.255.7 and 999.1.2.3 ok"),
      ("d3", "num 12345678901 short 123456 inner a1234567b"),
      ("d4", "clean text only")).toDF("docno", "content")
    val out = Scrub.redact(df).collect().map(r =>
      r.getString(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("d1") == (("mail <EMAIL> here", 1L, 0L, 0L)))
    assert(out("d2") == (("ip <IP> and <IP> ok", 0L, 2L, 0L)))
    // 6 digits below threshold; a1234567b has no word boundary
    assert(out("d3") == (("num <NUM> short 123456 inner a1234567b", 0L, 0L, 1L)))
    assert(out("d4") == (("clean text only", 0L, 0L, 0L)))
  }

  test("repetition signals: distinct, top bigram, max identical run") {
    import spark.implicits._
    val df = Seq(
      ("d1", "go go go stop la la La la"), // lowercase folds La
      ("d2", "one two one two one"),
      ("d3", "single"),
      ("d4", "")).toDF("docno", "content")
    val out = Repetition.repetitionSignals(df).collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("d1") == ((8L, 3L, 3L, 4L))) // "la la" x3; run la,La,la,la = 4
    assert(out("d2") == ((5L, 2L, 2L, 1L))) // "one two" x2, no runs
    assert(out("d3") == ((1L, 1L, 0L, 1L)))
    assert(out("d4") == ((0L, 0L, 0L, 0L)))
  }

  test("exact dedup groups by sha") {
    val g = Dedup.exactGroups(corpusDF).collect()
    assert(g.length == 1)
    assert(g.head.getAs[Long]("n_dups") == 2)
    assert(g.head.getAs[String]("first_docno") == "d3")
  }

  test("simhash: identical docs equal, near-dups close, unrelated far") {
    import spark.implicits._
    val fp = Dedup.simHash(corpusDF, an).as[(String, Long)].collect().toMap
    assert(fp("d3") == fp("d4"))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp("d1"), fp("d2")) <= 10)
    assert(ham(fp("d1"), fp("d6")) > ham(fp("d1"), fp("d2")))
    val pairs = Dedup.simHashPairs(Dedup.simHash(corpusDF, an), maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.contains(("d3", "d4")))
  }

  test("brute-force knn: cosine ordering is correct and excludes self") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f)),
      (4L, Array(0.5f, 0.5f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = vecs.where($"vec_id" === 0).select($"vec_id".as("qid"), $"embedding".as("qv"))
    val got = Knn.bruteForceTopK(vecs, q, 4).orderBy("rank")
      .collect().map(r => r.getLong(1))
    assert(got.toSeq == Seq(1L, 4L, 2L, 3L)) // by cosine to (1,0,0)
  }

  test("weighted sample: A-ES keys replay and favor heavy rows") {
    import spark.implicits._
    val corpus = (1 to 200).map { i =>
      (f"w-$i%03d", "x" * (if (i <= 20) 500 else 5)) // 20 heavy docs
    }.toDF("docno", "content")
    val got = Curation.weightedSample(corpus,
      org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("content")), "t1", 10)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    // brute replay of the exact key math
    def u(docno: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"t1:$docno".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(13), 16) / 4503599627370496.0
    }
    val brute = (1 to 200).map { i =>
      val d = f"w-$i%03d"; val w = if (i <= 20) 500.0 else 5.0
      (d, w, math.log(u(d)) / w)
    }.sortBy(t => (-t._3, t._1)).take(10)
      .zipWithIndex.map { case ((d, w, _), r) => (d, w, r.toLong) }
    assert(got.toSeq == brute)
    // the 100x weight skew should dominate the draw
    assert(got.count(_._2 == 500.0) >= 8)
  }

  test("filtered knn: pre-filter guarantees k passing neighbors") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 1),
      (1L, Array(0.9f, 0.1f, 0.0f), 1), // best unfiltered neighbor
      (2L, Array(0.0f, 1.0f, 0.0f), 2),
      (3L, Array(-1.0f, 0.0f, 0.0f), 2),
      (4L, Array(0.5f, 0.5f, 0.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val q = vecs.where($"vec_id" === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    // pre-filter: label-2 only — vec 1 never enters, and the query still
    // gets k=3 passing neighbors (post-filtering brute@3 would return 2)
    val got = Knn.filteredTopK(vecs, q, 3, $"label" === 2).orderBy("rank")
      .collect().map(_.getLong(1))
    assert(got.toSeq == Seq(4L, 2L, 3L))
  }

  test("lsh knn: deterministic and high recall vs brute force on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val brute = Knn.bruteForceTopK(emb, q, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Knn.lshTopK(emb, q, 10, nPlanes = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall=$recall") // 4-plane single-probe baseline
    // deterministic across runs
    val lsh2 = Knn.lshTopK(emb, q, 10, nPlanes = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == lsh2)
  }

  test("ivf knn: cell partition is total, recall reasonable, training improves assignment") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val seed = Knn.ivfSeedCentroids(emb, 8)
    assert(seed.map(_._1) == (0L until 8L))

    // every vector lands in exactly one cell, and only seed cids appear
    val cells = emb.select(col("vec_id"),
        Knn.ivfCellExpr(col("embedding"), seed).as("cid")).collect()
    assert(cells.length == emb.count())
    assert(cells.map(_.getLong(1)).forall(c => c >= 0 && c < 8))

    // probing ALL cells must recover brute force exactly (rank-identical)
    val brute = Knn.bruteForceTopK(emb, q, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = Knn.ivfTopK(emb, q, 10, seed, nProbe = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full == brute)

    // nProbe=2 of 8 cells: approximate, but far better than chance
    val ivf = Knn.ivfTopK(emb, q, 10, seed, nProbe = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteIds = brute.map(t => (t._1, t._2))
    val recall = (bruteIds & ivf).size.toDouble / bruteIds.size
    assert(recall >= 0.3, s"recall=$recall")

    // Lloyd refinement: same cell count, and mean assignment cosine does
    // not get worse (k-means' objective is monotone per iteration)
    val trained = Knn.ivfTrain(emb, 8, iters = 2)
    assert(trained.map(_._1) == seed.map(_._1))
    assert(trained.forall(_._2.length == seed.head._2.length))
    def meanAssignCos(cents: Seq[(Long, Seq[Float])]): Double = {
      val cdf = {
        import spark.implicits._
        cents.toDF("cid", "cv")
      }
      emb.withColumn("cid", Knn.ivfCellExpr(col("embedding"), cents))
        .join(cdf, "cid")
        .select(avg(Knn.cosine(col("embedding"), col("cv"))))
        .head().getDouble(0)
    }
    assert(meanAssignCos(trained) >= meanAssignCos(seed) - 1e-9)
  }

  test("decontamination: planted benchmark leaks flagged, clean docs kept, " +
    "argmax ties go to the lowest bench id") {
    import spark.implicits._
    val an = new Analyzer(AnalyzerConfig())
    val corpus = Seq(
      // verbatim leak of item b1 (9 shared 3-grams)
      "d1" -> "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda",
      // partial overlap: exactly 3 shared 3-grams with b1
      "d2" -> "alpha beta gamma delta epsilon unrelated words follow here now",
      // clean
      "d3" -> "completely different content with no overlap at all whatsoever",
      // equal overlap with b1 and b2 -> tie goes to b1
      "d4" -> "alpha beta gamma delta one two mu nu xi omicron three four"
    ).toDF("docno", "content")
    val bench = Seq(
      "b1" -> "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda",
      "b2" -> "mu nu xi omicron pi rho sigma tau"
    ).toDF("bench_id", "text")
    val got = Decontaminate.contaminationFlags(corpus, bench, an, n = 3, minShared = 3)
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(1), r.getLong(2), r.getString(3))).toMap
    assert(got("d1") == ((true, 9L, "b1")))
    assert(got("d2") == ((true, 3L, "b1")))
    assert(got("d3") == ((false, 0L, "")))
    // d4 shares 2 shingles with EACH item: the 2-2 tie reports b1 (lowest
    // id), and the threshold is per-ITEM, not total — 2+2 stays clean at 3
    assert(got("d4") == ((false, 2L, "b1")))
  }

  test("ivf training is bit-deterministic under any partitioning") {
    // the headline property behind the q_ivf_train exact oracle: in-row
    // IEEE folds + integer fixed-point cross-row sums make the trained
    // quantizer the same BITS regardless of partition count or reduce
    // order (Knn.ivfTrain scaladoc)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Knn.ivfTrain(emb.repartition(7), 8, iters = 2)
    val b = Knn.ivfTrain(emb.repartition(3), 8, iters = 2)
    val c = Knn.ivfTrain(emb.coalesce(1), 8, iters = 2)
    assert(a == b)
    assert(a == c)
  }

  test("dup clusters: chain components converge, singletons keep, cap is loud") {
    import spark.implicits._
    val corpus = Seq("a", "b", "c", "d", "e", "f").map(_ -> "x").toDF("docno", "content")
    // a chain a-b-c (diameter 2 forces >1 propagation round) + pair e-f
    val pairs = Seq(("a", "b"), ("b", "c"), ("e", "f")).toDF("docno_a", "docno_b")
    val got = Dedup.dupClusters(corpus, pairs).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(got == Map(
      "a" -> ("a", true), "b" -> ("a", false), "c" -> ("a", false),
      "d" -> ("d", true), "e" -> ("e", true), "f" -> ("e", false)))
    // keeping exactly the canonical rows dedups to one doc per class
    assert(got.count(_._2._2) == 3)
    // a too-small round cap fails loudly instead of answering wrong
    intercept[IllegalArgumentException] {
      Dedup.dupClusters(corpus, pairs, maxIter = 1)
    }
  }

  test("winnowing fingerprints: window coverage, rightmost-min, short docs") {
    import graft.ops.Fingerprint
    val toks = "alpha beta gamma delta epsilon zeta eta theta iota".split(" ").toIndexedSeq
    val k = 3; val w = 4
    val got = Fingerprint.winnow(toks, k, w)
    // independent brute-force reference: rightmost minimum of each window
    val hs = (0 to toks.length - k).map(i => Fingerprint.gramHash(toks.slice(i, i + k).mkString(" ")))
    val expect = (0 to hs.length - w).map { s =>
      val win = (s until s + w)
      val best = win.maxBy(i => (-hs(i), i)) // min hash, rightmost on ties
      (best, hs(best))
    }.distinct
    assert(got == expect)
    // guarantee: every window contributed a fingerprint that lies inside it
    (0 to hs.length - w).foreach { s =>
      assert(got.exists { case (p, _) => p >= s && p < s + w }, s"window $s uncovered")
    }
    // short docs: fewer grams than a window → exactly one fingerprint
    val short = Fingerprint.winnow(IndexedSeq("a", "b", "c", "d"), 3, 4)
    assert(short.size == 1)
    assert(Fingerprint.winnow(IndexedSeq("a", "b"), 3, 4).isEmpty) // < k tokens
    // shared text ⇒ shared fingerprints (the near-copy detection property)
    val df = Fingerprint.fingerprints(corpusDF, an, 3, 4)
    val byDoc = df.collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc("d1") & byDoc("d2")).nonEmpty) // near-dup docs share fps
    assert(byDoc("d3") == byDoc("d4"))           // identical docs: identical fps
  }

  test("embedding near-dups: planted dups found via LSH blocking, exact verify") {
    import spark.implicits._
    import graft.ops.Dedup
    val base = Array.tabulate(8)(i => (i + 1).toFloat)
    val noisy = base.clone(); noisy(0) += 0.01f
    val ortho = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val vecs = Seq((0L, base), (1L, noisy), (2L, ortho))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(vecs, minCos = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L))) // the planted near-dup, nothing else

    // Candidate-stream uniqueness (the reason embeddingNearDups needs no
    // distinct shuffle): a pair joins only at the single flip
    // f = bucketA XOR bucketB, so even a heavily bucket-collided fixture
    // (5 directions × 12 vectors, multi-probe on) yields each pair once.
    // minCos = -1 keeps EVERY candidate, exposing raw multiplicity.
    val many = (0 until 60).map(i =>
        (i.toLong, Array.tabulate(8)(d => ((i % 5) + 1 + d * 0.1).toFloat)))
      .toDF("vec_id", "embedding")
    val all = Dedup.embeddingNearDups(many, minCos = -1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(all.nonEmpty && all.size == all.distinct.size)
  }

  test("near-dup bucket caps drop degenerate buckets, leave normal recall intact") {
    import spark.implicits._
    import graft.ops.Dedup
    // embedding side: a planted near-dup pair plus a DEGENERATE bucket of
    // 30 identical vectors; capped at 10 the identical clique's bucket is
    // dropped (its quadratic pairs vanish) while the planted pair — alone
    // in its own bucket — survives with identical output.
    val base = Array.tabulate(8)(i => (i + 1).toFloat)
    val noisy = base.clone(); noisy(0) += 0.01f
    val boiler = Array.tabulate(8)(i => if (i % 2 == 0) -1.0f else 1.0f)
    val vecs = (Seq((0L, base), (1L, noisy)) ++
        (2 until 32).map(i => (i.toLong, boiler.clone())))
      .toDF("vec_id", "embedding")
    val uncapped = Dedup.embeddingNearDups(vecs, minCos = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((0L, 1L)) && uncapped.size > 100) // clique pairs present
    val capped = Dedup.embeddingNearDups(vecs, minCos = 0.99, maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((0L, 1L))) // clique dropped, planted pair kept

    // simhash side: same shape — 30 identical docs share every band; the
    // cap excludes those buckets, the distinct near-dup pair stays.
    val an = new graft.analysis.Analyzer(graft.analysis.AnalyzerConfig())
    val docs = (Seq( // n1 ≡ n2 (hamming 0): the guaranteed surviving pair
        ("n1", "alpha beta gamma delta epsilon zeta"),
        ("n2", "alpha beta gamma delta epsilon zeta")) ++
      (0 until 30).map(i => (f"b$i%02d", "same boilerplate text here")))
      .toDF("docno", "content")
    val fps = Dedup.simHash(docs, an)
    val un = Dedup.simHashPairs(fps, maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(un.exists(p => p._1 == "n1" && p._2 == "n2") && un.size > 100)
    val cap = Dedup.simHashPairs(fps, maxDist = 3, maxBucketSize = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(cap == Set(("n1", "n2")))
  }

  test("language classification: marker argmax, first-wins ties, und fallback") {
    import spark.implicits._
    val c = Seq(
      ("l1", "the cat and the dog of a house is here"), // en markers
      ("l2", "der hund und die katze ist das tier"),     // de markers
      ("l3", "xyzzy qwerty plugh"),                      // none → und
      ("l4", "the der")                                  // tie → first profile (en)
    ).toDF("docno", "content")
    val got = TextQuality.classifyLang(c).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got("l1")._1 == "en" && got("l1")._2 == 6)
    assert(got("l2")._1 == "de" && got("l2")._2 == 5)
    assert(got("l3") == ("und", 0L))
    assert(got("l4") == ("en", 1L)) // strict > keeps the earlier profile
  }

  test("topKeywords: tf·idf order with term-asc tie-break, df=N scores zero") {
    import spark.implicits._
    // N=4: "rare" df=1 beats "mid" df=2 at equal tf; "common" df=4 → idf 0
    val tf = Seq(
      ("d1", "common", 5L), ("d1", "rare", 1L), ("d1", "mid", 1L),
      ("d1", "beta", 1L), ("d1", "alpha", 1L)).toDF("docno", "term", "tf")
    val df = Seq(("common", 4L), ("rare", 1L), ("mid", 2L),
      ("alpha", 1L), ("beta", 1L)).toDF("term", "df")
    val got = TextQuality.topKeywords(tf, df, nDocs = 4, k = 4).collect()
      .map(r => (r.getLong(2), r.getString(1))).sorted.toSeq
    // alpha/beta/rare tie exactly (tf=1, df=1) → term asc; common (idf=0) last
    assert(got == Seq((0L, "alpha"), (1L, "beta"), (2L, "rare"), (3L, "mid")))
  }

  test("quality signals are exact integer counts") {
    import spark.implicits._
    val c = Seq(("x1", "The cat; sat!! on THE mat 42 times"),
                ("x2", "")).toDF("docno", "content")
    val rows = TextQuality.qualitySignals(c, Set("a", "the")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // tokens: the cat; sat!! on the mat 42 times → 8 raw, 2 stop
    assert(rows("x1")._1 == 8)
    assert(rows("x1")._2 == 2)
    // wordish: the cat sat on the mat times = 7 [a-z]+ runs
    assert(rows("x1")._3 == 7)
    assert(rows("x2") == ((0L, 0L, 0L, 0L)))
  }

  test("exactPercentiles: integer ceiling-rank rule, float-ceil hazard case") {
    import spark.implicits._
    // n=10 values 1..10: p=90 → rank ⌈900/100⌉=9 → value 9. A double
    // ceil(0.9*10)=ceil(9.000000000000002)=10 would pick 10 instead.
    val ten = (1 to 10).map(v => ("d" + v, v.toLong)).toDF("docno", "dl")
    val got = TextQuality.exactPercentiles(ten, "dl", Seq(1, 25, 50, 90, 100))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 25L -> 3L, 50L -> 5L, 90L -> 9L, 100L -> 10L))
    // ties: value domain smaller than n — cumulative counts decide
    val tied = Seq(0L, 0L, 0L, 7L, 7L, 9L).zipWithIndex
      .map { case (v, i) => ("t" + i, v) }.toDF("docno", "dl")
    val g2 = TextQuality.exactPercentiles(tied, "dl", Seq(50, 75, 100))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g2 == Map(50L -> 0L, 75L -> 7L, 100L -> 9L))
    // loud on bad percents and empty input
    intercept[IllegalArgumentException] {
      TextQuality.exactPercentiles(ten, "dl", Seq(0))
    }
    intercept[IllegalArgumentException] {
      TextQuality.exactPercentiles(ten.where(col("dl") < 0), "dl", Seq(50))
    }
  }
}
