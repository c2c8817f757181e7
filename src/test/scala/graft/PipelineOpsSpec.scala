package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.text.TextFunctions

/** LLM-pipeline operators (rounds 8-9): Unicode text normalization
  * ([[graft.functions.NfcNormalize]] + TextFunctions.normalizeText), URL
  * canonicalization (incl. the frozen public-suffix subset), interpolated
  * Kneser-Ney bigram scoring, margin-based bitext mining
  * ([[graft.operators.Bitext]]) with its threshold census and
  * cross-lingual dedup composition, and the cosine-ranked hubness
  * remediation family.
  */
class PipelineOpsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // ---- NfcNormalize kernel -------------------------------------------

  test("NfcNormalize composes NFD sequences and is a no-op on NFC/ASCII") {
    val nfdCafe = "Café" // e + COMBINING ACUTE
    val rows = Seq((1L, nfdCafe), (2L, "Café"), (3L, "plain ascii"), (4L, null))
      .toDF("id", "s")
      .select(col("id"), GraftFunctions.nfcNormalize(col("s")).as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(rows(1L) == "Café")
    assert(rows(1L).length == 4) // composed: 4 code points, not 5
    assert(rows(2L) == "Café")
    assert(rows(3L) == "plain ascii")
    assert(rows(4L) == null)
  }

  test("NfcNormalize compute: interpreted path matches codegen path") {
    import org.apache.spark.unsafe.types.UTF8String
    // the DataFrame above exercised codegen; this is the shared kernel
    val nfd = UTF8String.fromString("Ångström x")
    assert(graft.functions.NfcNormalize.compute(nfd).toString == "Ångström x")
    val ascii = UTF8String.fromString("abc 123")
    // ASCII fast path returns the SAME object (no decode, no copy)
    assert(graft.functions.NfcNormalize.compute(ascii) eq ascii)
    val nfc = UTF8String.fromString("Café")
    assert(graft.functions.NfcNormalize.compute(nfc) eq nfc)
  }

  test("normalizeText strips controls/zero-width and collapses whitespace") {
    val raw = "ab​c \t d\r\n\r\n e f  g "
    val out = Seq(Tuple1(raw)).toDF("s")
      .select(TextFunctions.normalizeText(col("s")).as("n"))
      .head().getString(0)
    assert(out == "abc d e f g")
  }

  // ---- url_canonicalize (via the registered query at sf0.001) --------

  test("url_canonicalize strips default port/fragment/utm and lowercases") {
    val out = SparkEntry.queries("url_canonicalize")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val url = r.getString(1); val host = r.getString(2)
      assert(!url.contains("#"), url)
      assert(!url.contains("utm_"), url)
      assert(!url.contains(":443"), url) // https default stripped
      assert(url.startsWith("https://") || url.startsWith("http://"), url)
      assert(host == host.toLowerCase, host)
      // reg_domain: doc_id % 7 == 0 rows sit under the two-level public
      // suffix .co.uk, so the PSL branch yields example.co.uk there
      val expectedDomain =
        if (r.getLong(0) % 7 == 0) "example.co.uk" else "example.com"
      assert(r.getString(3) == expectedDomain, r)
      assert(!url.endsWith("/"), url) // trailing slash trimmed
      // non-default port kept, aligned with the http arm
      if (url.startsWith("http://")) assert(url.contains(":8080"), url)
      // kept params survive in order
      assert(url.contains("?id="), url)
      assert(url.contains("&ref=home"), url)
    }
  }

  test("UrlFunctions.canonicalize: edge cases the fixture never produces") {
    import graft.text.UrlFunctions
    val cases = Seq(
      // no port, no qs, root path with trailing slash
      ("https://Example.COM/", "https://example.com"),
      // default http port stripped; non-default https port kept
      ("http://a.example.com:80/x", "http://a.example.com/x"),
      ("https://a.example.com:8443/x", "https://a.example.com:8443/x"),
      // only-utm query drops entirely (no dangling '?')
      ("https://e.com/p?utm_source=a&utm_medium=b", "https://e.com/p"),
      // fragment-only tail; multiple trailing slashes
      ("HTTP://E.com/a/b///#frag", "http://e.com/a/b"),
      // params keep order around the dropped utm
      ("https://e.com/p?a=1&utm_x=2&b=3", "https://e.com/p?a=1&b=3"))
    val got = cases.map(_._1).toDF("u")
      .select(UrlFunctions.canonicalize(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2))
    val parts = Seq(Tuple1("https://www.News.Example.com:443/a/b/c?x=1#f")).toDF("u")
      .select(UrlFunctions.host(col("u")), UrlFunctions.registeredDomain(col("u")),
        UrlFunctions.pathDepth(col("u")), UrlFunctions.port(col("u")))
      .head()
    assert(parts.getString(0) == "www.news.example.com")
    assert(parts.getString(1) == "example.com")
    assert(parts.getInt(2) == 3)
    assert(parts.getString(3) == "443")
  }

  test("crosslingual_dedup: pair canonicalization + keep-list invariants") {
    val dir = "/root/testdata/sf0.001"
    val pairs = SparkEntry.queries("bitext_margin")(spark, dir)
      .select(col("src_id"), col("tgt_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val keep = SparkEntry.queries("crosslingual_dedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(keep.length == total)
    // every mined pair drops exactly its higher id
    val keepMap = keep.map(t => t._1 -> ((t._2, t._3))).toMap
    pairs.foreach { case (a, b) =>
      val lo = math.min(a, b); val hi = math.max(a, b)
      assert(keepMap(lo) == ((lo, 1L)), s"pair ($a,$b) canonical")
      assert(keepMap(hi) == ((lo, 0L)), s"pair ($a,$b) dropped side")
    }
    // unpaired docs keep themselves; kept count = total − n_pairs
    assert(keep.count(_._3 == 1L) == total - pairs.length)
    keep.filter(t => !pairs.exists(p => p._1 == t._1 || p._2 == t._1))
      .foreach(t => assert(t._2 == t._1 && t._3 == 1L, t))
  }

  test("bitext_threshold_curve: yields match the mined pair margins") {
    val dir = "/root/testdata/sf0.001"
    val mined = SparkEntry.queries("bitext_margin")(spark, dir)
      .select(col("margin_ppm"), col("cos_q")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val curve = SparkEntry.queries("bitext_threshold_curve")(spark, dir)
      .orderBy(col("threshold_ppm")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(curve.length == 6 && curve.head._1 == 1000000L)
    curve.foreach { case (t, n, sc) =>
      val cleared = mined.filter(_._1 >= t)
      assert(n == cleared.length, s"threshold $t: pair yield")
      assert(sc == cleared.map(_._2).sum, s"threshold $t: cosine mass")
    }
    curve.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2, s"$a -> $b not nonincreasing")
    }
  }

  test("hubness remediation family: census mass conserved per variant") {
    val dir = "/root/testdata/sf0.001"
    val nBase = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 20 =!= 0).count()
    for ((q, variants) <- Seq(
        "hubness_centered" -> Seq("raw", "centered"),
        "hubness_whitened" -> Seq("raw", "whitened"),
        "hubness_zca" -> Seq("raw", "zca"))) {
      val rows = SparkEntry.queries(q)(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      for (v <- variants) {
        val c = rows.filter(_._1 == v)
        assert(c.map(_._3).sum == nBase, s"$q/$v: vector mass")
        // total in-degree mass = out-degree mass = degree · n
        assert(c.map(t => t._2 * t._3).sum == 16L * nBase, s"$q/$v: edge mass")
      }
    }
  }

  test("embedding decontamination: planted paraphrase caught by embedding, missed by 8-gram") {
    import spark.implicits._
    // doc 1 paraphrases benchmark doc 7 word for word — zero shared
    // 8-grams, so the exact screen is blind to it by construction
    val docs = Seq(
      (7L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (1L, "a speedy tan fox leaps above a sleepy hound close to the water edge now"),
      (2L, "completely unrelated text about spark shuffles and parquet file layouts")
    ).toDF("doc_id", "text")
    val gram = graft.text.Curation.contamination(docs, "doc_id", "text",
      col("doc_id") === 7L).collect()
    assert(gram.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((7L, 0L)),
      "8-gram screen should miss the paraphrase")
    // the paraphrase's embedding is near-identical; the unrelated doc's
    // points elsewhere — only the paraphrase clears cos >= 0.95
    val emb = Seq(
      (7L, Array(1.0f, 0.0f, 0.2f, 0.1f)),
      (1L, Array(0.99f, 0.01f, 0.21f, 0.1f)),
      (2L, Array(-0.5f, 0.8f, -0.1f, 0.3f))
    ).toDF("vec_id", "embedding")
    val e = graft.text.Curation.contaminationEmbedding(emb, "vec_id", "embedding",
      col("vec_id") === 7L, thresholdQ = 950000000L).collect()
    assert(e.length == 1 && e.head.getLong(0) == 7L)
    assert(e.head.getLong(1) == 1L, s"embedding screen should catch exactly the paraphrase: ${e.head}")
    assert(e.head.getLong(2) >= 950000000L, s"top margin should be the paraphrase: ${e.head}")
  }

  test("hubness_zca_cellblocked: blocked-rung census mass + remediation direction") {
    val dir = "/root/testdata/sf0.001"
    val nBase = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 20 =!= 0).count()
    val rows = SparkEntry.queries("hubness_zca_cellblocked")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for (v <- Seq("raw_blocked", "zca_blocked")) {
      val c = rows.filter(_._1 == v)
      assert(c.map(_._3).sum == nBase, s"$v: vector mass")
      // a blocked build emits AT MOST degree edges per node (a thin cell
      // can yield fewer candidates than the heap bound)
      val edges = c.map(t => t._2 * t._3).sum
      assert(edges <= 16L * nBase && edges >= 12L * nBase, s"$v: edge mass $edges")
    }
    // the treatment signal survives the blocked build: the ZCA space's
    // hub ceiling is no worse than the raw space's
    def maxK(v: String) = rows.filter(t => t._1 == v && t._3 > 0).map(_._2).max
    assert(maxK("zca_blocked") <= maxK("raw_blocked"),
      s"zca_blocked ${maxK("zca_blocked")} vs raw_blocked ${maxK("raw_blocked")}")
  }

  test("bpe_vocab_curve: char-level floor at rung 0, monotone fertility") {
    val dir = "/root/testdata/sf0.001"
    val curve = SparkEntry.queries("bpe_vocab_curve")(spark, dir)
      .orderBy(col("n_merges")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(curve.map(_._1).toSeq == Seq(0L, 3L, 6L))
    // rung 0 is the char-level encoding: n_bpe = total non-space chars
    val chars = spark.read.parquet(s"$dir/documents.parquet")
      .select(sum(length(regexp_replace(col("text"), "\\s+", ""))).cast("long"))
      .head().getLong(0)
    assert(curve.head._3 == chars, s"char floor ${curve.head._3} vs $chars")
    // every merge can only shorten sequences; word count is invariant
    assert(curve.map(_._2).distinct.length == 1)
    curve.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3 && b._4 <= a._4, s"$a -> $b not nonincreasing")
    }
  }

  test("bpe_sampled_curve: full rung matches full training; drift is bounded") {
    val dir = "/root/testdata/sf0.001"
    val curve = SparkEntry.queries("bpe_sampled_curve")(spark, dir)
      .orderBy(col("sample_mod")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(curve.map(_._1).toSeq == Seq(1L, 4L, 16L))
    // the re-encode always covers the WHOLE corpus: word mass invariant
    assert(curve.map(_._2).distinct.length == 1)
    // rung 1 IS the full 6-merge training: same fertility as the
    // bpe_vocab_curve's deepest rung, and trivially 6/6 shared merges
    val full = SparkEntry.queries("bpe_vocab_curve")(spark, dir)
      .filter(col("n_merges") === 6).head()
    assert(curve.head._4 == full.getLong(3), "full rung fertility mismatch")
    assert(curve.head._5 == 6L)
    // sampled vocabularies stay near the full one on this corpus:
    // every rung trains 6 merges and shares a majority with the full
    // table; fertility stays under the char-level floor's by a margin
    val charFloor = SparkEntry.queries("bpe_vocab_curve")(spark, dir)
      .filter(col("n_merges") === 0).head().getLong(3)
    curve.foreach { case (mod, _, _, fert, shared) =>
      assert(shared >= 3, s"mod=$mod shares only $shared/6 merges")
      assert(fert <= charFloor, s"mod=$mod fertility $fert above char floor $charFloor")
    }
  }

  test("UrlFunctions.registeredDomain: multi-label public suffixes") {
    import graft.text.UrlFunctions
    val cases = Seq(
      // two-level suffix: registration is one label deeper
      ("https://www.Shop.FOO.co.uk/x", "foo.co.uk"),
      ("http://a.b.example.com.au/", "example.com.au"),
      ("https://news.site.co.jp", "site.co.jp"),
      // bare registrable name directly under a multi-label suffix
      ("https://foo.co.uk/p", "foo.co.uk"),
      // NOT in the suffix set: plain last-two-labels rule
      ("https://deep.sub.example.com/x", "example.com"),
      // looks like a ccTLD second level but isn't in the frozen set
      ("https://a.b.co.xx/x", "co.xx"))
    val got = cases.map(_._1).toDF("u")
      .select(UrlFunctions.registeredDomain(col("u")).as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2))
  }

  // ---- Kneser-Ney bigram LM ------------------------------------------

  test("kneserNeyBigramScore matches the hand-computed integer rationals") {
    // corpus bigrams: d1 = (a,b),(b,a),(a,b),(b,c); d2 = (a,b)
    // c12: (a,b)=3 (b,a)=1 (b,c)=1; c1: a=3 b=2; N1+(w1.): a=1 b=2
    // N1+(.w2): a=1 b=1 c=1; N1+(..)=3
    // kn_ppm(a,b) = 1e6*(max(12-3,0)*3 + 3*1*1) / (4*3*3) = 833333
    // kn_ppm(b,a) = 1e6*(max(4-3,0)*3 + 3*2*1) / (4*2*3) = 375000
    // kn_ppm(b,c) = 375000
    val docs = Seq((1L, "a b a b c"), (2L, "a b")).toDF("doc_id", "text")
    val got = graft.text.ImportanceScoring
      .kneserNeyBigramScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == ((4L, 2L * 833333L + 2L * 375000L, (2L * 833333L + 2L * 375000L) / 4L)))
    assert(got(2L) == ((1L, 833333L, 833333L)))
  }

  test("kneserNey: per-context seen mass never exceeds 1 (discount reserve)") {
    // the KN invariant proper, asserted against the trained LM table on a
    // real corpus: for EVERY left context w1, Σ_seen-w2 P(w2|w1) ≤ 1
    // (floor-ppm sums ≤ 10⁶), and the discount genuinely reserves mass
    // somewhere (not every context saturates)
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val mass = graft.text.ImportanceScoring
      .kneserNeyTypeScores(docs, "doc_id", "text")
      .groupBy(col("w1")).agg(sum(col("kn_ppm")).as("mass_ppm"))
      .collect().map(_.getLong(1))
    assert(mass.nonEmpty)
    mass.foreach(m => assert(m > 0 && m <= 1000000L, s"context mass $m"))
    assert(mass.exists(_ < 1000000L))
    // and on the hand corpus the exact context masses are known:
    // w1=a: 833333; w1=b: 375000 + 375000 = 750000
    val tiny = graft.text.ImportanceScoring.kneserNeyTypeScores(
      Seq((1L, "a b a b c"), (2L, "a b")).toDF("doc_id", "text"), "doc_id", "text")
      .groupBy(col("w1")).agg(sum(col("kn_ppm")).as("mass_ppm"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tiny == Map("a" -> 833333L, "b" -> 750000L))
  }

  // ---- bitext margin mining ------------------------------------------

  test("bitext mutualMarginPairs finds the planted alignments") {
    // three src/tgt pairs of near-identical directions + one tgt decoy
    val src = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val tgt = Seq(
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.1f, 0.9f, 0.0f)),
      (5L, Array(0.0f, 0.1f, 0.9f)),
      (7L, Array(0.5f, 0.5f, 0.5f))).toDF("vec_id", "embedding")
    val pairs = graft.operators.Bitext.mutualMarginPairs(src, tgt, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((2L, 3L)))
    assert(pairs.contains((4L, 5L)))
    // mutuality: no src or tgt appears twice
    val all = graft.operators.Bitext.mutualMarginPairs(src, tgt, k = 2).collect()
    assert(all.map(_.getLong(0)).distinct.length == all.length)
    assert(all.map(_.getLong(1)).distinct.length == all.length)
    all.foreach { r =>
      assert(r.getLong(2) > 0) // cos_q positive by filter
      assert(r.getLong(3) > 0) // margin positive
    }
  }

  // ---- ROUGE-N clipped overlap ----------------------------------------

  test("rouge12 matches hand-computed clipped counts") {
    // cand "a a b c" vs ref "a b b d": clipped unigrams = min(2,1)[a] +
    // min(1,2)[b] = 2 of 4/4; bigrams share only "a b" = 1 of 3/3
    val pairs = Seq((0L, "a a b c", "a b b d")).toDF("pair_id", "cand_text", "ref_text")
    val r = graft.text.Rouge.rouge12(pairs).head()
    assert(r.getAs[Long]("m_1") == 2L)
    assert(r.getAs[Long]("t_cand_1") == 4L && r.getAs[Long]("t_ref_1") == 4L)
    assert(r.getAs[Long]("rouge1_r_ppm") == 500000L)
    assert(r.getAs[Long]("rouge1_f_ppm") == 500000L)
    assert(r.getAs[Long]("m_2") == 1L)
    assert(r.getAs[Long]("t_cand_2") == 3L && r.getAs[Long]("t_ref_2") == 3L)
    assert(r.getAs[Long]("rouge2_r_ppm") == 333333L)
    assert(r.getAs[Long]("rouge2_f_ppm") == 333333L)
  }

  test("rouge12: clipping caps repeated candidate grams; no-match pair is 0") {
    // candidate spams "a": clipped match stays at ref's multiplicity (1)
    val rows = graft.text.Rouge.rouge12(Seq(
      (0L, "a a a a", "a b"),
      (2L, "x y", "p q")).toDF("pair_id", "cand_text", "ref_text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(0L).getAs[Long]("m_1") == 1L)
    assert(rows(2L).getAs[Long]("m_1") == 0L)
    assert(rows(2L).getAs[Long]("rouge1_f_ppm") == 0L)
    assert(rows(2L).getAs[Long]("m_2") == 0L)
  }

  // ---- hubness census --------------------------------------------------

  test("hubness_stats: census covers every base vector, mass = degree * n") {
    val out = SparkEntry.queries("hubness_stats")(spark, "/root/testdata/sf0.001")
      .collect()
    val nBase = graft.sources.Tables
      .embeddingBase(spark, "/root/testdata/sf0.001").count()
    assert(out.map(_.getLong(1)).sum == nBase) // every vector binned once
    // every adjacency edge lands in exactly one bin: sum(k_occ * n) = 16n
    assert(out.map(r => r.getLong(0) * r.getLong(1)).sum == 16L * nBase)
  }

  test("bitext prefix variant: mutuality holds and full-prefix equals exact") {
    // 3-dim vectors with prefixDim = 3: the "cheap" pass sees the full
    // vector, so the prefix pipeline must reproduce the exact mining
    val src = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val tgt = Seq(
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.1f, 0.9f, 0.0f)),
      (5L, Array(0.0f, 0.1f, 0.9f)),
      (7L, Array(0.5f, 0.5f, 0.5f))).toDF("vec_id", "embedding")
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairsOf(graft.operators.Bitext.mutualMarginPairs(src, tgt, k = 2))
    val viaPrefix = pairsOf(graft.operators.Bitext.mutualMarginPairsPrefix(
      src, tgt, k = 2, prefixDim = 3, shortlist = 4))
    assert(viaPrefix == exact)
    // a genuinely partial prefix still yields a mutual matching
    val partial = graft.operators.Bitext.mutualMarginPairsPrefix(
      src, tgt, k = 2, prefixDim = 1, shortlist = 2).collect()
    assert(partial.map(_.getLong(0)).distinct.length == partial.length)
    assert(partial.map(_.getLong(1)).distinct.length == partial.length)
  }

  test("bitext margin: the aligned pair out-margins the hub decoy") {
    // tgt 7 is a "hub" (close to everything); margin normalization must
    // prevent it from claiming any src whose true twin exists
    val src = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val tgt = Seq(
      (1L, Array(0.95f, 0.05f, 0.0f)),
      (3L, Array(0.05f, 0.95f, 0.0f)),
      (7L, Array(0.7f, 0.7f, 0.0f))).toDF("vec_id", "embedding")
    val pairs = graft.operators.Bitext.mutualMarginPairs(src, tgt, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L), (2L, 3L)))
  }

  test("bitext ANN variant: mutual matching holds, recovery is consistent") {
    val dir = "/root/testdata/sf0.001"
    val ann = SparkEntry.queries("bitext_margin_ann")(spark, dir).collect()
    // mutual argmax ⇒ each src and each tgt appears in at most one pair
    assert(ann.map(_.getLong(0)).distinct.length == ann.length)
    assert(ann.map(_.getLong(1)).distinct.length == ann.length)
    // parity split respected: even src ids, odd tgt ids
    assert(ann.forall(r => r.getLong(0) % 2 == 0 && r.getLong(1) % 2 != 0))
    val rec = SparkEntry.queries("bitext_ann_recovery")(spark, dir).collect().head
    val (nExact, nAnn, nCommon, ppm) =
      (rec.getLong(0), rec.getLong(1), rec.getLong(2), rec.getLong(3))
    assert(nAnn == ann.length)
    assert(nCommon <= math.min(nExact, nAnn))
    assert(ppm == 1000000L * nCommon / math.max(nExact, 1L))
    // the scale-path claim at fixture scale: the ANN pass must recover a
    // MAJORITY of the exact mutual pairs (measured 66.7% here)
    assert(ppm >= 500000L, s"ANN recovery collapsed: $ppm ppm")
  }

  test("bitext_mix_compose: water-filling invariants over the composed domains") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("bitext_mix_compose")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // composed surface: monolingual sources AND at least one mined
    // bitext language-pair domain
    assert(rows.exists(_._1.startsWith("bitext:")))
    assert(rows.exists(!_._1.startsWith("bitext:")))
    val budget = rows.map(_._2).sum / 2 // budgetPctBps = 5000
    // saturated domains contribute their full capacity; unsaturated ones
    // share one equal floor allocation ≤ their capacity
    rows.filter(_._4).foreach { case (d, cap, alloc, _) =>
      assert(alloc == cap, s"$d saturated but alloc != cap") }
    val unsat = rows.filterNot(_._4)
    assert(unsat.map(_._3).distinct.length <= 1, "unsaturated allocs differ")
    unsat.foreach { case (d, cap, alloc, _) =>
      assert(alloc <= cap, s"$d unsaturated alloc exceeds cap") }
    // total allocation never exceeds the budget (floor division leaves
    // at most n_dom-1 tokens unassigned)
    assert(rows.map(_._3).sum <= budget)
  }

  test("bm25_prf: expanded retrieval emits a clean, deterministically ordered top-10") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("bm25_prf")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.length == 10)
    assert(rows.map(_._1).distinct.length == 10)
    // bm25TopK's (score desc, doc_id) order is preserved in the output
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1), s"order violated: $a then $b")
    }
    // the expanded query scores at least the seed-query mass for docs
    // carrying seed terms: every seed-only top-10 doc keeps a positive
    // score under expansion (expansion only ADDS terms)
    assert(rows.forall(_._2 > 0.0))
  }

  test("hybrid_rerank: shortlist rerank emits a clean top-10") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("hybrid_rerank")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._4)
    assert(rows.map(_._4).toSeq == (1L to 10L))
    assert(rows.map(_._1).distinct.length == rows.length)
    // rerank order is (cross_score desc, rrf desc, doc_id) — verify the
    // emitted ranks respect it
    rows.sliding(2).foreach { case Array(a, b) =>
      val ordered = a._3 > b._3 ||
        (a._3 == b._3 && (a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)))
      assert(ordered, s"rerank order violated: $a then $b")
    }
    // the cross-scorer's components stay in their integer envelopes:
    // coverage ≤ 3 terms ⇒ coverage² ≤ 9
    rows.foreach { case (_, _, cs, _) => assert(cs >= 0 && cs <= 90000 + 900 + 15) }
  }
}
