package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Multimodal, Profile}

/** Round-6 hardening specs: truncated-IDAT loud failure (not a hang),
  * null-key heavy hitters, and the pigeonhole recall-bound guard. */
class Round6Spec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Rebuild a valid planted PNG with its IDAT zlib stream cut short but the
    * chunk length and CRC made consistent again — the adversarial shape an
    * externally produced file can take. */
  private def truncatedIdatPng(id: Long): Array[Byte] = {
    val good = Multimodal.pngBytesWithPixels(id, 4, 4)
    def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def readBe32(b: Array[Byte], off: Int) =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    val out = new java.io.ByteArrayOutputStream()
    out.write(good, 0, 8) // signature
    var off = 8
    while (off < good.length) {
      val len = readBe32(good, off)
      val typ = new String(good, off + 4, 4, "US-ASCII")
      if (typ == "IDAT") {
        val cut = len / 2 // drop the tail of the zlib stream
        val crc = new java.util.zip.CRC32()
        crc.update(good, off + 4, 4)
        crc.update(good, off + 8, cut)
        out.write(be32(cut)); out.write(good, off + 4, 4)
        out.write(good, off + 8, cut); out.write(be32(crc.getValue.toInt))
      } else out.write(good, off, 12 + len)
      off += 12 + len
    }
    out.toByteArray
  }

  test("pixel decode: CRC-consistent truncated IDAT fails loudly instead of spinning") {
    val bad = truncatedIdatPng(42L)
    val ex = intercept[IllegalArgumentException] {
      Multimodal.decodePixelStats(42L, bad)
    }
    assert(ex.getMessage.contains("inflated to"), ex.getMessage)
  }

  test("imageNearDup: maxHamming above the 4-chunk pigeonhole bound is refused") {
    val docs = Seq((0L, "x")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      Multimodal.imageNearDup(spark, docs, maxHamming = 4)
    }
    assert(ex.getMessage.contains("pigeonhole"), ex.getMessage)
  }

  test("late census: streaming watermark drops match the batch-replayed predicate and are non-vacuous") {
    import org.apache.spark.sql.functions._
    val census = graft.streaming.StreamGate
      .lateCensusEndState(spark, TestSpark.sf0001)
    val rows = census.collect()
    val dropped = rows.map(_.getAs[Long]("n_late_dropped")).sum
    assert(dropped > 0, "census is vacuous — no late rows were dropped")
    // batch replay of the documented contract: second-replay rows whose daily
    // window closed at or before (ms-floored max on-time ts) - 7 days
    val ev = Tables.events(spark, TestSpark.sf0001)
    val wmUs = ev.where(col("event_id") % 20 =!= 0)
      .agg(((floor(unix_micros(max(col("ts"))) / 1000) - 604800000L) * 1000)
        .as("wm")).head().getLong(0)
    val expected = ev.where(col("event_id") % 40 === 20)
      .where(unix_micros(date_trunc("day", col("ts"))
        + expr("INTERVAL 1 DAY")) <= wmUs)
      .count()
    assert(dropped == expected, s"census $dropped != batch replay $expected")
    // totals must reconcile: kept + dropped == static row count
    val total = rows.map(_.getAs[Long]("n_total")).sum
    val kept = rows.map(_.getAs[Long]("n_kept")).sum
    assert(total == kept + dropped && total == ev.count())
  }

  test("stereo PCM: per-channel decode matches the planted formula, mono path unchanged") {
    val id = 7L
    val frames = 10
    // stereo: 2*frames interleaved samples, channel = k % 2
    val stereo = Multimodal.wavBytesWithSamples(id, 16000, 2 * frames,
      channels = 2)
    val got = Multimodal.decodeWavChannelStats(id, stereo)
    assert(got.size == 2)
    for (c <- 0 to 1) {
      val samples = (0 until 2 * frames).filter(_ % 2 == c)
        .map(k => Multimodal.plantedSample(id, k))
      val s = got(c)
      assert(s.channel == c && s.n_samples == frames
        && s.peak_abs == samples.map(math.abs).max
        && s.sum_abs == samples.map(v => math.abs(v).toLong).sum
        && s.first_sample == samples.head, s"channel $c: $s")
    }
    // mono bytes through the channel decoder == the mono decoder's answer
    val mono = Multimodal.wavBytesWithSamples(id, 16000, frames)
    val viaChannels = Multimodal.decodeWavChannelStats(id, mono)
    val viaMono = Multimodal.decodeWavStats(id, mono)
    assert(viaChannels == Seq(Multimodal.WavChannelStats(id, 0,
      viaMono.n_samples, viaMono.peak_abs, viaMono.sum_abs,
      viaMono.first_sample)))
    // >2 channels refused loudly
    val quad = Multimodal.wavBytesWithSamples(id, 16000, 4 * frames,
      channels = 4)
    val ex = intercept[IllegalArgumentException] {
      Multimodal.decodeWavChannelStats(id, quad)
    }
    assert(ex.getMessage.contains("1-2 ch"), ex.getMessage)
  }

  test("kmeans: plan stays flat as iterations grow — round N re-plans from the checkpoint") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    def planSize(iters: Int): Int = {
      // unwrap the AQE root — AdaptiveSparkPlanExec exposes no children, so
      // a direct collect sees exactly 1 node for EVERY plan and the flatness
      // assertion would be vacuous (same bug class as PlanAudit's globalWin)
      val root = graft.ops.Ml.kmeansClusters(emb, k = 4, iters = iters)
        .queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      root.collect { case n => n }.size
    }
    val s2 = planSize(2)
    val s8 = planSize(8)
    assert(s8 == s2,
      s"plan grew with iterations: $s2 nodes at iters=2, $s8 at iters=8")
  }

  test("heavyHitters: a genuine null key is counted, not swallowed by the total row") {
    // 40 nulls + 40 "hot" dominate 20 singletons; with capacity 8 both must
    // be reported and n_total must be exactly 100 (nulls not double-counted)
    val rows: Seq[Option[String]] =
      Seq.fill(40)(None) ++ Seq.fill(40)(Some("hot")) ++
        (1 to 20).map(i => Some(s"cold_$i"))
    val df = rows.toDF("k").repartition(3)
    val got = Profile.heavyHitters(df, "k", capacity = 8, k = 5)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    assert(got.contains((None, 40L)), s"null key missing from $got")
    assert(got.contains((Some("hot"), 40L)), s"hot key missing from $got")
    // nothing with n*capacity <= n_total sneaks in
    assert(got.forall(_._2 * 8 > 100), s"under-threshold key in $got")
  }

  test("cdcChunks: cut rule matches direct recomputation; boundaries re-sync past an insertion") {
    // varied token stream long enough to hit several mod-32 cuts
    val ta = (0 until 400).map(i => s"w${(i * 7 + i * i) % 131}")
    val a = ta.mkString(" ")
    val b = "ins0 ins1 ins2 " + a // front insertion shifts every fixed-size boundary
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val got = graft.ops.Corpus.cdcChunks(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    // direct scalar replay of the cut rule: cut after token j+3 wherever the
    // 4-token shingle's 31-poly residue ≡ 0 (mod 32), final boundary appended
    def h(s: String) = s.foldLeft(0L)((acc, c) => (acc * 31 + c) % 2147483647L)
    val cuts = (0 to ta.length - 4).count { j =>
      h(ta.slice(j, j + 4).mkString(" ")) % 32 == 0 && j + 4 < ta.length
    }
    assert(got(1L)._1 == cuts + 1, s"expected ${cuts + 1} chunks, got ${got(1L)._1}")
    assert(cuts >= 3, s"fixture too short to exercise cutting: $cuts cuts")
    // the CDC property: content-defined boundaries re-synchronize after the
    // edit, so both documents still share chunks (fixed-size chunking would
    // share none) — and the unshared prefix region keeps the share partial
    assert(got(1L)._2 > 0 && got(2L)._2 > 0,
      s"no shared chunks across the insertion: $got")
    assert(got(2L)._2 < got(2L)._1, s"ALL chunks shared despite the edit: $got")
  }

  test("cmsEstimate: one-sided error — estimate >= truth, exact when unshadowed") {
    // planted counts: 'hot' 50x, 'warm' 20x, singles as background noise
    val docs = (
      Seq.fill(50)("hot") ++ Seq.fill(20)("warm") ++
        (0 until 30).map(i => s"bg$i")
    ).zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val got = graft.ops.Profile.cmsEstimate(docs, width = 1024, tracked = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val hot = got.find(_._1 == "hot").get
    assert(hot._2 == 50L, s"exact count wrong: $hot")
    // CMS contract: min-cell estimate never undercounts
    assert(got.forall(t => t._3 >= t._2), s"CMS undercount: ${got.toSeq}")
  }

  test("robustOutliers: one extreme value cannot blind the detector") {
    // 99 well-behaved prices + 1 catastrophic outlier per group; a z-score
    // with mean/stddev would absorb it (sigma explodes), median/MAD flags it
    val rows = (0 until 99).map(i => ("1-URGENT", 100.0 + (i % 7))) :+
      (("1-URGENT", 1e9))
    val df = rows.toDF("o_orderpriority", "o_totalprice")
    val got = graft.ops.Profile.robustOutliers(df).collect().head
    assert(got.getLong(1) == 100L)
    assert(got.getDouble(2) == 103.0, s"median off: $got") // 100..106 cycle
    assert(got.getLong(4) >= 1L, s"the planted outlier was not flagged: $got")
    assert(got.getLong(4) <= 30L, s"detector fired on the bulk: $got")
  }

  test("bm25TopK: a doc saturated with a query term outranks one with a single hit") {
    // corpus where tokens q0..q4 land at df-ranks 11..15: ten stop-words in
    // every doc (ranks 1..10), q-terms in a controlled subset
    val stop = (0 until 10).map(i => s"the$i").mkString(" ")
    val docs = ((0 until 40).map { i =>
      val extra =
        if (i == 0) " q0 q0 q0 q0 q0" // saturated in the query term
        else if (i < 25) " q0"         // single hit, 24 docs -> q0 df=25
        else ""
      (i.toLong, stop + extra + s" filler$i")
    } ++ (40 until 136).map { i =>     // q1..q4 at df=24 each (ranks 12-15)
      val qi = 1 + (i - 40) % 4
      (i.toLong, stop + s" q$qi")
    }).toDF("doc_id", "text")
    val got = graft.ops.TextOps.bm25TopK(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty && got.head._1 == 1, s"rank must start at 1: ${got.toSeq}")
    // scores are non-increasing in rank
    assert(got.sliding(2).forall(p => p.length < 2 || p(0)._3 >= p(1)._3),
      s"scores not monotone in rank: ${got.toSeq}")
    // with all five query terms at comparable df, tf saturation dominates:
    // the one doc with tf=5 must be the single best hit
    assert(got.head._2 == 0L,
      s"saturated doc is not rank 1: ${got.toSeq}")
    // and every single-hit doc scores strictly below it
    assert(got.tail.forall(_._3 < got.head._3),
      s"a single-hit doc tied the saturated doc: ${got.toSeq}")
  }

  test("kcore: pendant chain peels off in rounds, the clique survives") {
    // 4-clique {a,b,c,d} + chain d-e-f: degrees 3,3,3,4,2,1 -> k = ceil
    // (16/12) = 2. Round 0 drops f (deg 1); the peel CASCADES: e, fine at
    // deg 2 initially, falls to 1 once f is gone and drops in round 1.
    val cl = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
      ("c", "d"), ("d", "e"), ("e", "f"))
    val edges = cl.toDF("src", "dst")
      .withColumn("w", org.apache.spark.sql.functions.lit(1L))
    val got = graft.ops.Graph.kcore(edges).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq("a", "b", "c", "d"),
      s"core must be exactly the clique: ${got.toSeq}")
    assert(got.forall(t => t._2 == 3L && t._3 == 2L),
      s"in-core degrees must be the clique degrees: ${got.toSeq}")
  }

  test("bigramLogProb matches a direct scalar replay of the smoothed LM") {
    val texts = Seq((1L, "a b a b c"), (2L, "a b"), (3L, "c c c"),
      (4L, "solo")) // single token: no transitions, excluded by contract
    val docs = texts.toDF("doc_id", "text")
    val got = graft.ops.TextOps.bigramLogProb(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // corpus counts over docs with >= 2 tokens: unigrams a:3 b:3 c:4, V=3
    val uni = Map("a" -> 3L, "b" -> 3L, "c" -> 4L)
    val bi = Map(("a", "b") -> 3L, ("b", "a") -> 1L, ("b", "c") -> 1L,
      ("c", "c") -> 2L)
    // HALF_UP, matching Spark's round() on doubles (math.round floors .5s
    // toward +inf, which differs on negative values)
    def micro(w1: String, w2: String): Long =
      BigDecimal(math.log((bi(w1 -> w2) + 1.0) / (uni(w1) + 3)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val exp1 = micro("a", "b") + micro("b", "a") + micro("a", "b") +
      micro("b", "c")
    assert(got(1L) == ((4L, exp1)), s"doc 1: ${got(1L)} vs $exp1")
    assert(got(2L) == ((1L, micro("a", "b"))), s"doc 2: ${got(2L)}")
    assert(got(3L) == ((2L, 2 * micro("c", "c"))), s"doc 3: ${got(3L)}")
    assert(!got.contains(4L), "single-token doc must be excluded")
  }

  test("equidepthHist: uniform 1..100 lands 10 rows in every decile bucket") {
    val df = (1 to 100).map(i => i.toDouble).toDF("o_totalprice")
    val got = graft.ops.Profile.equidepthHist(df).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == 10, s"expected 10 buckets: ${got.toSeq}")
    assert(got.forall(_._2 == 10L), s"uneven buckets: ${got.toSeq}")
    // discrete bounds with ties-to-lower: bucket 1 = (..,10], bucket 10 = (90,..]
    assert(got.head == ((1, 10L, 1.0, 10.0)), s"bucket 1: ${got.head}")
    assert(got.last == ((10, 10L, 91.0, 100.0)), s"bucket 10: ${got.last}")
  }

  test("kAnonymity: small groups are counted as the at-risk population") {
    val rows = Seq.fill(6)((1, "A")) ++ Seq.fill(6)((2, "B")) ++
      Seq.fill(2)((3, "C"))
    val df = rows.toDF("c_nationkey", "c_mktsegment")
    val got = graft.ops.Profile.kAnonymity(df).collect().head
    assert(got.getInt(0) == 5)
    assert(got.getLong(1) == 3L, s"n_groups: $got")
    assert(got.getLong(2) == 1L, s"n_violating_groups: $got")
    assert(got.getLong(3) == 2L, s"n_rows_at_risk: $got")
    assert(got.getLong(4) == 2L, s"min_group_size: $got")
  }

  test("prefixFilterPairs: finds exactly the brute-force J>=t pairs (zero false negatives)") {
    import graft.functions.GraftFunctions.{shingles, tokens}
    import org.apache.spark.sql.functions._
    // near-dup pair (0,1): one-word edit; (2) shares vocabulary but not
    // order; (3) unrelated; (4,5) exact duplicates
    // one edit in 20 tokens: 3 of 18 shingles differ -> J = 15/21 ≈ 0.71
    val base = "the quick brown fox jumps over the lazy dog tonight " +
      "while the silver moon rises slowly above the quiet harbor"
    val docs = Seq(
      (0L, base),
      (1L, base.replace("jumps", "leaps")),
      (2L, "dog lazy the over jumps fox brown quick the tonight " +
        "harbor quiet the above slowly rises moon silver the while"),
      (3L, "entirely different content with no overlap at all here"),
      (4L, "twin text made of one repeated sentence for the test"),
      (5L, "twin text made of one repeated sentence for the test")
    ).toDF("doc_id", "text")
    val got = graft.ops.Dedup.prefixFilterPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over the same shingle sets, same integer threshold
    val sets = docs.select(col("doc_id"),
      array_distinct(shingles(tokens(col("text")), 3)).as("g"))
    val brute = sets.select(col("doc_id").as("a"), col("g").as("ga"))
      .crossJoin(sets.select(col("doc_id").as("b"), col("g").as("gb")))
      .where(col("b") > col("a"))
      .select(col("a"), col("b"),
        size(array_intersect(col("ga"), col("gb"))).as("i"),
        (size(col("ga")) + size(col("gb"))
          - size(array_intersect(col("ga"), col("gb")))).as("u"))
      .where(col("i") * 100 >= col("u") * 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.contains((0L, 1L)) && brute.contains((4L, 5L)),
      s"fixture lost its planted pairs: $brute")
    assert(got == brute, s"prefix-filtered $got != brute $brute")
  }

  test("scd2Lookup: each fact resolves to the one interval covering its ts") {
    import org.apache.spark.sql.functions._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), "view"),
      (2L, 10L, ts("2024-01-02 00:00:00"), "cart"),
      (3L, 10L, ts("2024-01-03 00:00:00"), "purchase"),
      (4L, 20L, ts("2024-01-05 00:00:00"), "view")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val dim = graft.ops.Star.scd2(events, "user_id", "ts", "event_type", "event_id")
      .select("user_id", "state", "valid_from", "valid_to")
    // a fact strictly inside user 10's second interval, and one at an
    // interval boundary (must land in the LATER interval, half-open)
    val facts = Seq(
      (100L, 10L, ts("2024-01-02 12:00:00")),
      (101L, 10L, ts("2024-01-03 00:00:00"))
    ).toDF("fact_id", "user_id", "ts")
    val got = graft.ops.Star.scd2Lookup(facts, dim, "user_id", "ts")
      .select("fact_id", "state").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(100L -> "cart", 101L -> "purchase"), s"$got")
  }

  test("transitionMatrix: ppm shares are exact integer floor division per source state") {
    val ts = (i: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$i%02d")
    // user 1: a->b, b->a, a->b ; user 2: a->b  =>  from a: b=3 (ppm 1000000);
    // from b: a=1 of 1
    val events = Seq(
      (1L, 1L, ts(1), "a"), (2L, 1L, ts(2), "b"),
      (3L, 1L, ts(3), "a"), (4L, 1L, ts(4), "b"),
      (5L, 2L, ts(1), "a"), (6L, 2L, ts(2), "b")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = graft.ops.Relational.transitionMatrix(events).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(("a", "b")) == ((3L, 1000000L)), s"$got")
    assert(got(("b", "a")) == ((1L, 1000000L)), s"$got")
    assert(got.size == 2, s"$got")
  }

  test("rrfFusion: a candidate topping both legs outranks one topping a single leg") {
    // 3 unit-ish vectors + query id 0: neighbor 1 is closest in BOTH angle
    // and distance; neighbor 2 is mid; neighbor 3 differs in norm only
    // (cosine-tied with 1, L2-far) — fusion must put 1 first
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.99f, 0.01f), 0),
      (2L, Array(0.5f, 0.5f), 0),
      (3L, Array(9.9f, 0.1f), 0)
    ).toDF("vec_id", "embedding", "label")
    val got = graft.ops.SimSearch.rrfFusion(vecs, nQueries = 1, k = 3)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(got.head._1 == 1L,
      s"neighbor 1 should fuse to rank 1: ${got.toSeq}")
    assert(got.map(_._2).toSeq == (1 to got.length).toSeq,
      s"fused ranks not contiguous: ${got.toSeq}")
  }

  test("retentionFunnel: each planted defect leaves at its own stage") {
    val bench = (0L to 4L).map(i =>
      (i, s"benchmark question $i about topic alpha$i beta$i gamma$i delta$i epsilon$i", "bench"))
    val good = "the weather in ulm stays calm while hikers cross green meadows every summer morning"
    val docs = (bench ++ Seq(
      (10L, good, "web"),
      (11L, good, "web"), // exact duplicate -> leaves at stage 1
      (12L, "a curious otter swims beneath the old stone bridge chasing silver fish at dawn today", "web"),
      // near-dup of 12: shares >= 2 rare 4-gram windows -> leaves at stage 2
      (13L, "a curious otter swims beneath the old stone bridge chasing golden fish at dusk today", "web"),
      // contains a bench 4-gram ("benchmark question 0 about") -> stage 3
      (14L, "this page quotes benchmark question 0 about topics and adds the usual filler words here", "web"),
      // no stopword + under 10 tokens -> quality reject at stage 4
      (15L, "zzz qqq xxx", "web"),
      (16L, "quiet rivers wind through the valley and carry small boats toward a distant harbor town", "web")
    )).toDF("doc_id", "text", "source")
    val got = graft.ops.Corpus.retentionFunnel(docs).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got("0_raw") == 12L, s"$got")
    assert(got("1_exact_dedup") == 11L, s"$got")
    assert(got("2_near_dedup") == 10L, s"$got")
    assert(got("3_decontaminated") == 4L, s"$got")
    assert(got("4_quality") == 3L, s"$got")
  }

  test("seasonalDow: weekday means in micro-units, residuals cancel per weekday") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    // two Mondays (2 and 4 events) and one Tuesday (3 events)
    val rows =
      Seq.tabulate(2)(i => (i.toLong, 1L, ts(s"2024-01-01 08:0$i:00"), "view")) ++
      Seq.tabulate(4)(i => (10L + i, 1L, ts(s"2024-01-08 08:0$i:00"), "view")) ++
      Seq.tabulate(3)(i => (20L + i, 1L, ts(s"2024-01-02 08:0$i:00"), "view"))
    val events = rows.toDF("event_id", "user_id", "ts", "event_type")
    val got = graft.ops.Relational.seasonalDow(events).collect()
      .map(r => (r.getDate(0).toString, (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // Monday mean = (2+4)/2 = 3.0 -> 3_000_000; residuals -1e6 and +1e6
    assert(got("2024-01-01") == ((2, 2L, 3000000L, -1000000L)), s"$got")
    assert(got("2024-01-08") == ((2, 4L, 3000000L, 1000000L)), s"$got")
    assert(got("2024-01-02") == ((3, 3L, 3000000L, 0L)), s"$got")
  }

  test("labelCentroids: micro-unit means are exact truncating division") {
    val vecs = Seq(
      (0L, Array(0.5f, -0.25f), 7),
      (1L, Array(0.25f, -0.5f), 7),
      (2L, Array(1.0f, 1.0f), 8)
    ).toDF("vec_id", "embedding", "label")
    val got = graft.ops.Ml.labelCentroids(vecs).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    // label 7 dim 0: (500000 + 250000) div 2 = 375000
    // label 7 dim 1: (-250000 + -500000) div 2 = -750000 div 2 = -375000
    // (truncation toward zero, matching DuckDB's integer //)
    assert(got((7, 0)) == ((2L, 375000L)), s"$got")
    assert(got((7, 1)) == ((2L, -375000L)), s"$got")
    assert(got((8, 0)) == ((1L, 1000000L)), s"$got")
  }
}
