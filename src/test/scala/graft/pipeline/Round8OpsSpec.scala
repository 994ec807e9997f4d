package graft.pipeline

import graft.SparkSpec

/** Round-8: the frequency cap wired into the near-dup cluster family.
  * The driver oracle proves cross-engine parity of the capped queries;
  * these pin the SCALE property (capped pair volume linear where the
  * uncapped join is quadratic in the hot-shingle multiplicity) and the
  * WIRING (components/degree actually consume the capped graph).
  */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  /** n boilerplate copies (all sharing the same 6-token text) plus one
    * rare identical pair (doc_ids 1001/1002).
    */
  private def writeBoilerplateCorpus(n: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"dcap8_$n").toString
    val boiler = (1 to 6).map(i => s"b$i").mkString(" ")
    val rare = (1 to 6).map(i => s"r$i").mkString(" ")
    val rows = (1L to n.toLong).map(i => (i, boiler, "s")) ++
      Seq((1001L, rare, "s"), (1002L, rare, "s"))
    rows.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("capped pair volume stays constant while the uncapped join grows quadratically") {
    // one hot shingle shared by n docs contributes C(n,2) uncapped
    // pairs: doubling n must ~quadruple the uncapped output while the
    // capped output (freq cap 2 < n) is exactly the one rare pair at
    // BOTH sizes — the linear-vs-quadratic scale contract of the cap
    val dirs = Seq(8, 16).map(writeBoilerplateCorpus)
    val Seq(unc8, unc16) = dirs.map { d =>
      val c = Dedup.ngramJaccard(spark, d).count()
      spark.catalog.clearCache()
      c
    }
    val Seq(cap8, cap16) = dirs.map { d =>
      val c = Dedup.ngramJaccardCapped(spark, d).count()
      spark.catalog.clearCache()
      c
    }
    assert(unc8 == 8L * 7 / 2 + 1, s"uncapped at n=8: $unc8")
    assert(unc16 == 16L * 15 / 2 + 1, s"uncapped at n=16: $unc16")
    assert(cap8 == 1L && cap16 == 1L,
      s"capped output must be the single rare pair at both sizes, got $cap8/$cap16")
  }

  test("the cluster family consumes the capped graph: boilerplate hubs never cluster") {
    val dir = writeBoilerplateCorpus(10)
    val comp = Dedup.components(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    spark.catalog.clearCache()
    assert(comp == Map(1001L -> ((1001L, 2L)), 1002L -> ((1001L, 2L))),
      s"only the rare pair may cluster under the capped source, got $comp")
    val deg = Dedup.dupDegree(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    assert(deg == Map(1L -> 2L),
      s"capped degree profile is two docs of degree 1, got $deg")
  }

  test("cms topk: the sketch-driven candidate pool covers the unconditional exact top-20") {
    // the operator's contract is "exact top-20 among the top-64
    // CMS-estimated keys"; this cross-checks that at gate scale the
    // pool loses nothing — the result must equal the top-20 computed
    // from FULL exact counts (the round-7 shape this replaced)
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val got = graft.queries.SketchQueries.cmsTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_exact")))
    val ev = graft.queries.Tables.events(spark, sf).filter(col("user_id").isNotNull)
    val full = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("user_id").asc).limit(20).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_exact")))
    assert(got.toSeq == full.toSeq,
      s"sketch-driven top-20 diverged from the exact top-20:\n got ${got.toSeq}\n exp ${full.toSeq}")
  }

  test("self repeat: the registered plant yields exactly the periodic span, unplanted docs stay clean") {
    val dir = java.nio.file.Files.createTempDirectory("selfrep8").toString
    // doc 14 (÷7): 14 unique tokens -> plant doubles it; expected span
    // is the whole first copy at period 14. doc 15 (not ÷7): same
    // shape, must produce nothing.
    val t14 = (1 to 14).map(i => s"a$i").mkString(" ")
    val t15 = (1 to 14).map(i => s"c$i").mkString(" ")
    Seq((14L, t14, "s"), (15L, t15, "s")).toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.selfRepeat(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start_a"),
        r.getAs[Long]("start_b"), r.getAs[Long]("span_len")))
    spark.catalog.clearCache()
    assert(out.toSeq == Seq((14L, 1L, 15L, 14L)),
      s"expected one whole-copy span on the planted doc only, got ${out.toSeq}")
  }

  test("knn graph cell cap: a planted giant cell keeps candidates inside the prototypical core") {
    import org.apache.spark.sql.functions._
    // one cell of 100 vectors on a line: d2 to centroid = i^2, so the
    // prototypical core under cap 8 is ids 0..7
    val assigned = (0 until 100).map { i =>
      (i.toLong, 0, (i * i).toDouble, Array(i.toDouble, 1.0), i * i + 1.0)
    }.toDF("vec_id", "cell", "d2", "embedding", "nsq")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val capped = Similarity.knnGraphOnAssigned(assigned, 8).collect()
    assert(capped.nonEmpty)
    val dsts = capped.map(_.getAs[Long]("dst")).toSet
    assert(dsts.subsetOf((0L to 7L).toSet),
      s"candidate fanout escaped the 8-member core: $dsts")
    // every source still resolves its KnnK neighbors (the core serves
    // all |cell| sources: fanout |cell|*cap, never |cell|^2)
    val perSrc = capped.groupBy(_.getAs[Long]("src")).view.mapValues(_.length)
    assert(perSrc.size == 100 && perSrc.values.forall(_ == Similarity.KnnK),
      "every vector must still get its k neighbors from the core")
    // the cap's effect on `mutual` is FLAGGED, not silent: sources
    // outside the core are candidate-ineligible (src_in_core = false)
    // and all their edges must report mutual = false; core members
    // carry src_in_core = true
    capped.foreach { r =>
      val inCore = r.getAs[Boolean]("src_in_core")
      assert(inCore == (r.getAs[Long]("src") <= 7L),
        s"src_in_core must mark exactly the 8-member core: $r")
      if (!inCore) assert(!r.getAs[Boolean]("mutual"),
        s"a non-core source can never be mutual (ineligible as candidate): $r")
    }
    // a cap >= |cell| reproduces the exact uncapped graph
    val full = Similarity.knnGraphOnAssigned(assigned, 100).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toSet
    val fullRef = Similarity.knnGraphOnAssigned(assigned, 1000000).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toSet
    assert(full == fullRef, "cap >= cell size must be a no-op")
  }

  test("passage anchor cap: boilerplate-only spans vanish, rare spans survive intact") {
    import org.apache.spark.sql.functions._
    // 20 docs all carrying the same 14-token boilerplate passage with
    // unique surroundings (every boilerplate anchor appears 20 times),
    // plus one rare pair sharing a distinct 14-token passage
    val boiler = (1 to 14).map(i => s"b$i").mkString(" ")
    val rare = (1 to 14).map(i => s"r$i").mkString(" ")
    val docs = ((1 to 20).map { i =>
      (i.toLong, s"u${i}_1 u${i}_2 u${i}_3 u${i}_4 $boiler v${i}_1 v${i}_2 v${i}_3 v${i}_4")
    } ++ Seq(
      (101L, s"w1 w2 w3 w4 $rare x1 x2 x3 x4"),
      (102L, s"y1 y2 y3 y4 $rare z1 z2 z3 z4"),
    )).toDF("doc_id", "text")
    def spans(cap: Long) = Dedup.dupPassagesOn(docs, cap).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[String]("passage")))
    val capped = spans(8L)
    spark.catalog.clearCache()
    val uncapped = spans(1000000L)
    spark.catalog.clearCache()
    assert(uncapped.count(_._3 == boiler) == 20 * 19 / 2,
      "uncapped finds all C(20,2) boilerplate span pairs")
    assert(capped.toSet == Set((101L, 102L, rare)),
      s"capped must keep exactly the rare span, got ${capped.toSet}")
  }

  test("minhash components: planted identical trio and pair resolve to min-root clusters") {
    val dir = java.nio.file.Files.createTempDirectory("mhc8").toString
    val trio = (1 to 20).map(i => s"t$i").mkString(" ")
    val pair = (1 to 20).map(i => s"p$i").mkString(" ")
    val rows = Seq((1L, trio, "s"), (2L, trio, "s"), (3L, trio, "s"),
      (10L, pair, "s"), (11L, pair, "s"),
      (20L, (1 to 20).map(i => s"u$i").mkString(" "), "s"))
    rows.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.minhashComponents(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    spark.catalog.clearCache()
    assert(got == Map(
      1L -> ((1L, 3L)), 2L -> ((1L, 3L)), 3L -> ((1L, 3L)),
      10L -> ((10L, 2L)), 11L -> ((10L, 2L))), s"got $got")
  }

  test("minhash components: a mega-bucket of identical copies is exact-dedup's job, not the band join's") {
    // 300 identical docs exceed MinhashBucketCap (256): their bucket
    // drops before the pair join (C(300,2) never materializes) while
    // the small rare pair still clusters — the LshState.MaxBucketMembers
    // assumption, enforced batch-side
    val dir = java.nio.file.Files.createTempDirectory("mhcap8").toString
    val mega = (1 to 20).map(i => s"m$i").mkString(" ")
    val rare = (1 to 20).map(i => s"r$i").mkString(" ")
    val rows = (1L to 300L).map(i => (i, mega, "s")) ++
      Seq((1001L, rare, "s"), (1002L, rare, "s"))
    rows.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.minhashComponents(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    spark.catalog.clearCache()
    assert(got == Map(1001L -> ((1001L, 2L)), 1002L -> ((1001L, 2L))),
      s"only the rare pair may cluster past the bucket cap, got ${got.size} rows")
  }

  test("minhash incremental: an edited re-crawl flags against its corpus holder, novel content is new") {
    val dir = java.nio.file.Files.createTempDirectory("mhi8").toString
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val edited = (1 to 40).map(i => if (i == 40) "CHANGED" else s"w$i").mkString(" ")
    val rows = Seq(
      (1L, base, "s"),                                        // corpus holder
      (2L, (1 to 40).map(i => s"x$i").mkString(" "), "s"),    // corpus, unrelated
      (5L, edited, "s"),                                      // incoming near-copy
      (10L, (1 to 40).map(i => s"z$i").mkString(" "), "s"))   // incoming novel
    rows.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.minhashIncremental(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_matches"), r.getAs[Int]("is_new"), Option(r.get(3)))))
      .toMap
    spark.catalog.clearCache()
    assert(got.keySet == Set(5L, 10L), s"exactly the incoming split reports: $got")
    assert(got(5L)._2 == 0 && got(5L)._3.contains(1L),
      s"edited re-crawl must flag against corpus doc 1: ${got(5L)}")
    assert(got(10L) == ((0L, 1, None)), s"novel doc must be new: ${got(10L)}")
  }

  test("keep list: near-dup clusters keep exactly one SURVIVING member, dup_of closes over keeps") {
    val sf = "/root/testdata/sf0.001"
    val rows = Curate.keepList(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("keep"), r.getAs[String]("reason"), Option(r.get(3)))))
      .toMap
    spark.catalog.clearCache()
    val comp = Dedup.components(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    val nearDups = rows.collect { case (id, (k, "near_dup", dupOf)) => (id, k, dupOf) }
    assert(nearDups.forall(!_._2), "a near_dup row must not be kept")
    nearDups.foreach { case (id, _, dupOf) =>
      val keeper = dupOf.get.asInstanceOf[Long]
      assert(rows(keeper)._1, s"dup_of $keeper of $id must itself be kept")
      assert(comp(id) == comp(keeper), s"$id and its keeper $keeper must share a cluster")
    }
    // among kept docs, each cluster contributes exactly one member
    val keptClustered = rows.collect { case (id, (true, _, _)) if comp.contains(id) => comp(id) }
    assert(keptClustered.size == keptClustered.toSet.size,
      "a near-dup cluster leaked two kept members")
    // curate-dropped docs keep their original reason (near_dup only ever
    // overrides 'keep')
    assert(rows.values.forall { case (k, r, _) => k == (r == "keep") })
  }

  test("capped containment: a popular quote is priced out, a rare quote still resolves") {
    val dir = java.nio.file.Files.createTempDirectory("ccap8").toString
    val rare = (1 to 6).map(i => s"r$i").mkString(" ")
    val pop = (1 to 6).map(i => s"q$i").mkString(" ")
    def uniq(tag: String) = (1 to 20).map(i => s"${tag}_$i").mkString(" ")
    // doc 1 = the rare quote alone; doc 2 embeds it (containment 1.0).
    // docs 101-112 = the popular quote alone; docs 201-212 embed it —
    // its shingles hit freq 24 > ClusterShingleFreqCap and vanish.
    val rows = Seq((1L, rare, "s"), (2L, s"${uniq("b")} $rare", "s")) ++
      (101L to 112L).map(i => (i, pop, "s")) ++
      (201L to 212L).map(i => (i, s"${uniq(s"c$i")} $pop", "s"))
    rows.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def keys(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val capped = keys(Dedup.containmentCapped(spark, dir))
    spark.catalog.clearCache()
    val uncapped = keys(Dedup.containment(spark, dir))
    spark.catalog.clearCache()
    assert(capped == Set((1L, 2L)),
      s"capped must keep exactly the rare-quote containment, got $capped")
    assert(uncapped.size > 100,
      s"uncapped pays the popular quote's all-carriers blowup (got ${uncapped.size})")
    assert(uncapped.contains((1L, 2L)))
  }

  test("componentsOfPairs resolves a planted chain to its minimum label") {
    // path graph 5-3-9-2: diameter 3, all four nodes one component
    // rooted at 2; plus the isolated edge (7, 8)
    val pairs = Seq((5L, 3L), (3L, 9L), (9L, 2L), (7L, 8L)).toDF("doc_a", "doc_b")
    val out = Dedup.componentsOfPairs(pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      2L -> ((2L, 4L)), 3L -> ((2L, 4L)), 5L -> ((2L, 4L)), 9L -> ((2L, 4L)),
      7L -> ((7L, 2L)), 8L -> ((7L, 2L))), s"got $out")
  }
}
