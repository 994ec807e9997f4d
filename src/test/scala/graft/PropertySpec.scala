package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Anomaly, WindowStats}

/** Property-based invariants from SURVEY.md §5.2, driven by ScalaCheck
  * generators with fixed seeds (deterministic across runs).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
  private def at(secAgo: Long) = new Timestamp(t0.getTime - secAgo * 1000)

  /** Draw `n` deterministic samples from a generator. */
  private def samples[T](g: Gen[T], n: Int = 10): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def forAllSampled[T](g: Gen[T], n: Int = 10)(body: T => Unit): Unit =
    samples(g, n).foreach(body)

  test("constant streams never alarm regardless of mean shift (F7 gate)") {
    // range within the engine's documented exact-decimal envelope
    // (graft.functions.Exact: |sum of squares| < 1e12)
    forAllSampled(Gen.zip(Gen.chooseNum(-1e4, 1e4), Gen.chooseNum(4, 30))) { case (level, n) =>
      val df = (1 to n).map(i => ("t", "f", level, at(i.toLong)))
        .toDF("topic", "path", "value", "produced")
      val stats = WindowStats.rawTrailingStats(df, Seq(3600L), lit(t0))
      assert(Anomaly.detect(df, stats, lit(t0)).isEmpty)
    }
  }

  test("a far outlier among a steady baseline always alarms") {
    forAllSampled(Gen.zip(Gen.chooseNum(1.0, 100.0), Gen.chooseNum(10, 25))) { case (base, n) =>
      // baseline with small jitter + one point 100x the spread away
      val steady = (1 to n).map(i => ("t", "f", base + (i % 3) * 0.1, at(i.toLong + 1)))
      val outlier = ("t", "f", base + 1000.0, at(1L))
      val df = (steady :+ outlier).toDF("topic", "path", "value", "produced")
      val stats = WindowStats.rawTrailingStats(df, Seq(3600L), lit(t0))
      val out = Anomaly.detect(df, stats, lit(t0)).collect()
      assert(out.exists(_.getAs[Double]("value") == base + 1000.0))
    }
  }

  test("multi-window monotonicity: counts never decrease as windows widen") {
    forAllSampled(Gen.listOfN(30, Gen.chooseNum(1L, 7000L)), n = 5) { ages =>
      {
        val df = ages.zipWithIndex.map { case (a, i) => ("t", "f", i.toDouble, at(a)) }
          .toDF("topic", "path", "value", "produced")
        val windows = Seq(600L, 1800L, 3600L, 7200L)
        val counts = df
          .withColumn("window_sec", explode(array(windows.map(lit): _*)))
          .filter(unix_micros(col("produced")) >= unix_micros(lit(t0)) - col("window_sec") * 1000000L)
          .groupBy(col("window_sec")).count()
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val ordered = windows.map(w => counts.getOrElse(w, 0L))
        assert(ordered == ordered.sorted, s"counts not monotone: $ordered")
      }
    }
  }

  test("decimal-exact sums are invariant under repartitioning") {
    forAllSampled(Gen.listOfN(50, Gen.chooseNum(-1e5, 1e5).map(v => math.round(v * 100) / 100.0)), n = 5) { vals =>
      {
        def sumOf(parts: Int): Double =
          vals.toDF("v").repartition(parts)
            .agg(graft.functions.Exact.exactSum(col("v"))).head.getDouble(0)
        val s1 = sumOf(1)
        val s8 = sumOf(8)
        assert(java.lang.Double.doubleToLongBits(s1) == java.lang.Double.doubleToLongBits(s8),
          s"partitioning changed the sum: $s1 vs $s8")
      }
    }
  }

  test("winnowing guarantee: any shared run of >= k+w-1 tokens leaves a common fingerprint") {
    import graft.pipeline.TextAnalysis
    val minRun = TextAnalysis.WinnowK + TextAnalysis.WinnowW - 1 // 6 tokens
    val word = Gen.chooseNum(0, 40).map(i => s"w$i")
    val gen = Gen.zip(
      Gen.listOfN(25, word), // prefix of doc A
      Gen.listOfN(minRun + 3, word), // the shared run (above the floor)
      Gen.listOfN(25, word), // suffix of doc B
    )
    forAllSampled(gen, n = 6) { case (pre, shared, post) =>
      import spark.implicits._
      val a = (pre ++ shared).mkString(" ")
      val b = (shared ++ post).mkString(" ")
      val fps = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
        .select(col("doc_id"), TextAnalysis.winnowFps(col("text")).as("f"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      assert((fps(1L) & fps(2L)).nonEmpty,
        s"no common fingerprint despite a ${shared.length}-token shared run")
    }
  }

  test("containment is directional and total on generated quote embeddings") {
    import graft.pipeline.{Dedup => D}
    // a quoted doc inside filler: the quote must be flagged contained
    val filler = Gen.chooseNum(100, 140).map(i => s"f$i")
    val gen = Gen.zip(Gen.chooseNum(10, 20), Gen.listOfN(60, filler))
    forAllSampled(gen, n = 4) { case (quoteLen, fill) =>
      import spark.implicits._
      val quote = (1 to quoteLen).map(i => s"q$i").mkString(" ")
      val host = (fill.take(30) :+ quote).mkString(" ") + " " + fill.drop(30).mkString(" ")
      val dir = java.nio.file.Files.createTempDirectory("cprop").toString
      Seq((1L, quote), (2L, host)).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = D.containment(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // release the scaffold's shingle cache per sample (caller contract)
      spark.catalog.clearCache()
      assert(out.contains((1L, 2L)), s"quote of $quoteLen tokens not flagged as contained")
      assert(!out.contains((2L, 1L)), "host flagged as contained in its quote")
    }
  }

  test("kmv_sketch == sorted k smallest distinct, for any data and partitioning") {
    import graft.functions.KmvAggregates.kmvSketch
    val gen = Gen.zip(
      Gen.listOfN(60, Gen.chooseNum(0L, 40L)), // dense domain -> many dups
      Gen.chooseNum(1, 8), // k
      Gen.chooseNum(1, 7)) // partition count (exercises merge paths)
    forAllSampled(gen) { case (vs, k, parts) =>
      if (vs.nonEmpty) {
        val got = vs.toDF("v").repartition(parts)
          .agg(kmvSketch(col("v"), k)).head().getSeq[Long](0)
        val want = vs.distinct.sorted.take(k)
        assert(got == want, s"k=$k parts=$parts: $got vs $want")
      }
    }
  }

  test("component resolver equals a driver-side union-find on arbitrary pair graphs") {
    // the min-label propagation loop is the completion step of EVERY
    // dedup family (shingle, MinHash, phash) — pin it against an
    // independent reference implementation on random graphs, including
    // chains (worst-case diameter), stars, and disconnected nodes
    val genEdges = Gen.listOfN(40, Gen.zip(Gen.chooseNum(0L, 25L), Gen.chooseNum(0L, 25L)))
      .map(_.filter { case (a, b) => a != b })
    forAllSampled(genEdges, n = 8) { edges =>
      if (edges.nonEmpty) {
        // reference: union-find with min-root canonicalization
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        def union(a: Long, b: Long): Unit = {
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra); parent(hi) = lo }
        }
        edges.foreach { case (a, b) => union(a, b) }
        val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
        val want = nodes.map(nd => nd -> find(nd)).toMap
        val sizes = want.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val got = graft.pipeline.Dedup.componentsOfPairs(
          edges.toDF("doc_a", "doc_b")).collect()
          .map(r => r.getAs[Long]("doc_id") ->
            (r.getAs[Long]("cluster_root"), r.getAs[Long]("cluster_size"))).toMap
        assert(got.keySet == want.keySet)
        want.foreach { case (nd, root) =>
          assert(got(nd) == (root, sizes(root)),
            s"node $nd: got ${got(nd)}, want ($root, ${sizes(root)}) over $edges")
        }
      }
    }
  }

  test("PhashState emissions are split-invariant and complete (pure update fn, no Spark)") {
    import graft.streaming.PhashState
    // random codes in a shared bucket, random trigger splits: the UNION
    // of emissions must be exactly the pairs within the radius, no
    // matter how arrivals are grouped into triggers
    val genRows = Gen.listOfN(12,
      Gen.zip(Gen.chooseNum(1L, 30L), Gen.chooseNum(0L, 255L)))
    val radius = 3
    forAllSampled(Gen.zip(genRows, Gen.chooseNum(1, 5)), n = 10) { case (raw, chunk) =>
      val rows = raw.distinctBy(_._1)
        .map { case (id, code) => PhashState.BandRow(0, 1L, id, code) }
      val state = new java.util.concurrent.atomic.AtomicReference[Option[PhashState.Bucket]](None)
      val emitted = scala.collection.mutable.Set.empty[(Long, Long, Int)]
      rows.grouped(chunk).foreach { g =>
        val gs = new org.apache.spark.sql.streaming.GroupState[PhashState.Bucket] {
          override def exists: Boolean = state.get.isDefined
          override def get: PhashState.Bucket = state.get.get
          override def getOption: Option[PhashState.Bucket] = state.get
          override def update(s: PhashState.Bucket): Unit = state.set(Some(s))
          override def remove(): Unit = state.set(None)
          override def hasTimedOut: Boolean = false
          override def setTimeoutDuration(d: Long): Unit = ()
          override def setTimeoutDuration(d: String): Unit = ()
          override def setTimeoutTimestamp(t: Long): Unit = ()
          override def setTimeoutTimestamp(t: Long, a: String): Unit = ()
          override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
          override def setTimeoutTimestamp(t: java.sql.Date, a: String): Unit = ()
          override def getCurrentWatermarkMs(): Long = 0L
          override def getCurrentProcessingTimeMs(): Long = 0L
        }
        PhashState.update(radius, 10000)((0, 1L), g.iterator, gs)
          .foreach(p => emitted += ((p.asset_a, p.asset_b, p.hamming)))
      }
      val want = (for {
        (i, ci) <- rows.map(r => r.assetId -> r.phash)
        (j, cj) <- rows.map(r => r.assetId -> r.phash) if i < j
        h = java.lang.Long.bitCount(ci ^ cj) if h <= radius
      } yield (i, j, h)).toSet
      assert(emitted.toSet == want,
        s"chunk=$chunk: emitted ${emitted.toSeq.sorted} want ${want.toSeq.sorted}")
    }
  }

  test("maxSharePpm: shares are a valid distribution and bound the even share from above") {
    import graft.pipeline.KmeansFit
    val genPts = Gen.listOfN(20, Gen.zip(Gen.chooseNum(-5.0, 5.0), Gen.chooseNum(1L, 9L)))
    forAllSampled(Gen.zip(genPts, Gen.chooseNum(1, 6)), n = 10) { case (raw, k) =>
      val pts = raw.map { case (x, w) => (Array(x, -x), w) }.toIndexedSeq
      val centers = KmeansFit.fit(pts, k, KmeansFit.Iters)
      val share = KmeansFit.maxSharePpm(pts, centers)
      assert(share <= 1000000L, s"share over 100%: $share")
      assert(share >= 1000000L / centers.length,
        s"max share must be >= the even share: $share with ${centers.length} cells")
    }
  }

  test("text-signal invariants: window accounting, readability bounds, code-flag monotonicity") {
    import graft.pipeline.TextSignals
    val word = Gen.oneOf("the", "cat", "de", "que", "la", "run", "tall", "word9", "x_y", "{a};")
    val gen = Gen.zip(Gen.chooseNum(1, 120), Gen.chooseNum(1L, 1000000L))
    forAllSampled(gen) { case (n, seed) =>
      val words = samples(word, n)
      val text = words.mkString(" ")
      val dir = java.nio.file.Files.createTempDirectory("prop").toString
      Seq((seed, text, "en", "s", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val mix = TextSignals.langMix(spark, dir).collect().head
      val nWin = mix.getAs[Long]("n_windows")
      // ceil(n / 25) windows, disagreements never exceed the window count
      assert(nWin == (n + TextSignals.MixWindow - 1) / TextSignals.MixWindow)
      assert(mix.getAs[Long]("n_mixed") <= nWin)
      val read = TextSignals.readability(spark, dir).collect().head
      assert(read.getAs[Long]("n_words") == n.toLong)
      assert(read.getAs[Long]("n_sentences") >= 1L)
      assert(read.getAs[Long]("n_syllables") >= 0L)
      val code = TextSignals.codeDetect(spark, dir).collect().head
      // counts bounded by the text itself
      assert(code.getAs[Long]("n_sym") <= code.getAs[Long]("n_chars"))
      assert(code.getAs[Long]("n_ident") <= n.toLong)
    }
  }

  test("phash index merge == whole-corpus write on arbitrary random corpora") {
    // the IndexMergeSpec invariant, property-driven: however a corpus
    // is split into snapshots (including codes shared across EVERY
    // lane), compacting the per-lane indexes equals indexing the whole
    // corpus — representative = global min, multiplicities sum, band
    // rows identical
    import graft.sources.PhashIndex
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val gen = Gen.zip(Gen.chooseNum(4, 14), Gen.chooseNum(2, 3))
    forAllSampled(gen, n = 4) { case (nDocs, nLanes) =>
      val docs = (1 to nDocs).map { i =>
        // few distinct texts → guaranteed cross-lane code collisions
        (i.toLong, samples(word, 40 + (i % 3)).mkString(" "))
      }.toDF("doc_id", "text")
      val laneNames = (0 until nLanes).map(l => s"prop_ph_$l")
      laneNames.zipWithIndex.foreach { case (t, l) =>
        PhashIndex.write(docs.filter(col("doc_id") % nLanes === l), t)
      }
      PhashIndex.write(docs, "prop_ph_full")
      PhashIndex.merge(spark, laneNames, "prop_ph_merged")
      try {
        val got = spark.table("prop_ph_merged").collect().map(_.toString).toSet
        val want = spark.table("prop_ph_full").collect().map(_.toString).toSet
        assert(got == want,
          s"merged != full for nDocs=$nDocs nLanes=$nLanes:\n missing=${want -- got}\n extra=${got -- want}")
      } finally (laneNames :+ "prop_ph_full" :+ "prop_ph_merged")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    }
  }

  test("audio agreement: the unrolled SQL expression == the JVM fold on random fingerprints") {
    // the codegen'd xor/shift CASE chain (graft.pipeline.Audio.agreeSql)
    // and the streaming twin's JVM fold (AudioState.agreement) must
    // count the same 9-bit groups for ANY packed pair — an off-by-one
    // in either shift chain silently reclassifies near-dups
    val fpGen = Gen.listOfN(7, Gen.chooseNum(0L, 511L))
      .map(_.zipWithIndex.map { case (lm, w) => lm << (9 * w) }.sum)
    val pairs = samples(Gen.zip(fpGen, fpGen), 40) ++
      samples(fpGen, 5).map(f => (f, f)) // identical pairs: agreement 7
    val df = pairs.toDF("fpa", "fpb")
      .withColumn("n_sql", expr(graft.pipeline.Audio.agreeSql("fpa", "fpb")))
    df.collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == graft.streaming.AudioState.agreement(a, b),
        s"disagreement for fpa=$a fpb=$b")
    }
  }
}
