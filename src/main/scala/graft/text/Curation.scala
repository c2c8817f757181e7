package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators beyond dedup/quality-gating (builder
  * brief): PII redaction, context-window chunking, repetition filtering
  * (Gopher-style), benchmark-contamination detection, and domain mixing.
  *
  * Scale design: redaction/chunking/repetition signals are row-local or
  * keyed by doc_id (no cross-doc shuffle except the explode-aggregate
  * pattern, whose shuffle key is the natural partition key); contamination
  * reduces to an equi-join on shingle strings (broadcastable benchmark
  * side); domain mixing is one window over the (lang, source) partition —
  * exactly the keys a 100 TB corpus would already be bucketed by.
  */
object Curation {

  /** Email pattern — identical semantics in Java regex and RE2/DuckDB
    * (no lookarounds, no backreferences). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Long digit runs (phone/account/SSN-ish) — the blunt numeric PII net. */
  val LongNumRe = "[0-9]{6,}"

  /** PII redaction pass: per doc, occurrence counts per pattern and the
    * fingerprint of the redacted text (emails → <EMAIL>, long digit runs
    * → <NUM>). Purely row-local — scales as a map stage. */
  def piiRedact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val redacted = regexp_replace(
      regexp_replace(t, EmailRe, "<EMAIL>"), LongNumRe, "<NUM>")
    docs.select(
      col(idCol),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(t, lit(LongNumRe), lit(0))).as("n_long_numbers"),
      md5(redacted.cast("binary")).as("redacted_fp"))
  }

  /** Context-window chunking: sliding token windows of `chunkSize` with
    * `stride` (the LLM-pretokenization shape). Emits one row per chunk:
    * (id, chunk_idx, n_chunk_tokens, chunk_fp). Row-local explode — no
    * shuffle; chunk count ≈ n_tokens / stride. */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 128, stride: Int = 64): DataFrame = {
    val withToks = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      // last window start: smallest stride multiple covering the tail;
      // guarded to 0 for short docs (integer div of a negative differs
      // between engines — truncation vs floor — so never divide one)
      .withColumn("__smax",
        when(col("__n") <= chunkSize, lit(0)).otherwise(
          expr(s"((__n - $chunkSize + ${stride - 1}) div $stride) * $stride")))
    withToks
      .select(col(idCol), col("__toks"),
        explode(expr(s"sequence(0, __smax, $stride)")).as("__start"))
      .select(
        col(idCol),
        (col("__start") / stride).cast("int").as("chunk_idx"),
        expr(s"slice(__toks, __start + 1, $chunkSize)").as("__chunk"))
      .select(
        col(idCol), col("chunk_idx"),
        size(col("__chunk")).as("n_chunk_tokens"),
        md5(concat_ws(" ", col("__chunk")).cast("binary")).as("chunk_fp"))
  }

  /** Gopher-style repetition signals per doc: most-frequent-token and
    * most-frequent-bigram shares (basis points, integer-exact), plus the
    * pass verdict. Explode→aggregate keyed by doc id. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
      maxTopTokenBp: Long = 2000L, maxTopBigramBp: Long = 1800L): DataFrame = {
    // materialized once: both the token and the bigram aggregate consume
    // the tokenization (HOF pipelines re-evaluate per consumer otherwise)
    val base = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .localCheckpoint()
    val topTok = base
      .select(col(idCol), col("__n"), explode(col("__toks")).as("tok"))
      .groupBy(col(idCol), col("__n"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol), col("__n")).agg(max(col("c")).as("top_tok"))
    // raw (non-distinct) bigrams — same slice/join shape as shingles but
    // counts matter here, so no array_distinct
    val topBig = base
      .select(col(idCol), explode(expr(
        "transform(sequence(1, greatest(__n - 1, 1)), i -> array_join(slice(__toks, i, 2), ' '))"))
        .as("big"))
      .groupBy(col(idCol), col("big")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(max(col("c")).as("top_big"))
    topTok.join(topBig, Seq(idCol))
      .select(
        col(idCol),
        expr("(top_tok * 10000L) div __n").as("top_token_bp"),
        expr("(top_big * 10000L) div greatest(__n - 1, 1)").as("top_bigram_bp"))
      .withColumn("pass",
        col("top_token_bp") < maxTopTokenBp && col("top_bigram_bp") < maxTopBigramBp)
  }

  /** Benchmark-contamination scan: for each doc in the benchmark slice,
    * how many training docs share at least one word `n`-gram with it
    * (n-gram membership via the shingle equi-join — never a cross
    * product; the benchmark side is broadcastable by construction).
    * Emits every benchmark doc, zero-filled — absence of contamination
    * is a result, not a missing row. */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
      isBenchmark: Column, n: Int = 8): DataFrame = {
    // materialized once: consumed by the benchmark explode, the training
    // explode, and the zero-fill output — three plan subtrees that would
    // each re-run the shingle HOF over every document otherwise
    val sh = TextFunctions.withShingles(docs, textCol, n, "__sh")
      .select(col(idCol), col("__sh"), isBenchmark.as("__is_bench"))
      .localCheckpoint()
    val bench = sh.filter(col("__is_bench"))
      .select(col(idCol).as("bench_id"), explode(col("__sh")).as("g"))
    val train = sh.filter(!col("__is_bench"))
      .select(col(idCol).as("train_id"), explode(col("__sh")).as("g"))
    val hits = broadcast(bench).join(train, Seq("g"))
      .groupBy(col("bench_id"))
      .agg(countDistinct(col("train_id")).as("n_contaminated"))
    sh.filter(col("__is_bench")).select(col(idCol).as("bench_id"))
      .join(hits, Seq("bench_id"), "left")
      .select(col("bench_id"), coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
  }

  /** EMBEDDING-level decontamination (r10 verdict item 3) — the screen
    * the exact word-n-gram scan ([[contamination]]) cannot run:
    * paraphrased benchmark leakage shares no 8-gram with its source but
    * still sits next to it in embedding space. For each benchmark row,
    * count training rows whose quantized cosine clears `thresholdQ`
    * (cos_q = floor(cos·10⁹), the bitext-mining convention, so the
    * threshold decision is integer-exact in any engine) and carry the
    * top observed cos_q — the margin a reviewer reads before tightening
    * the threshold. Scale shape: the benchmark side is broadcastable by
    * construction (a held-out slice), so the screen is ONE linear scan
    * of the training corpus — the `Knn.spread` broadcast-NL pass, never
    * a self-join. Every benchmark row is emitted (zero-filled counts):
    * absence of contamination is a result, not a missing row. (The one
    * exception: an EMPTY training side yields an empty result — there
    * is no corpus to screen against, surfaced as empty rather than an
    * error; EdgeCaseSpec pins it.) */
  def contaminationEmbedding(vecs: DataFrame, idCol: String, embCol: String,
      isBenchmark: Column, thresholdQ: Long): DataFrame = {
    import graft.functions.VectorFunctions.cosine
    val v = vecs.select(col(idCol), col(embCol).as("__emb"), isBenchmark.as("__is_bench"))
    val bench = v.filter(col("__is_bench"))
      .select(col(idCol).as("bench_id"), col("__emb").as("b_emb"))
    val train = v.filter(!col("__is_bench"))
      .select(col(idCol).as("train_id"), col("__emb").as("t_emb"))
    // every bench id appears in the cross join, so the conditional sum
    // zero-fills without a second pass over the benchmark slice
    graft.operators.Knn.spread(train)
      .crossJoin(broadcast(bench))
      .select(col("bench_id"),
        floor(cosine(col("t_emb"), col("b_emb")) * lit(1000000000.0))
          .cast("long").as("cos_q"))
      .groupBy(col("bench_id"))
      .agg(sum(when(col("cos_q") >= thresholdQ, 1L).otherwise(0L)).as("n_contaminated_emb"),
        max(col("cos_q")).as("max_cos_q"))
  }

  /** Domain mixing: deterministic per-(group) downsampling to `cap` docs,
    * prioritized by the Knuth id-hash (graft.operators.Sampling.idBucket)
    * so the kept set is a pure function of doc identity — stable across
    * runs and engines. Emits per-group totals, kept counts, and the kept
    * id-sum (which pins the exact selection, not just its size). */
  def domainMix(docs: DataFrame, idCol: String, groupCols: Seq[String],
      cap: Int): DataFrame = {
    val bucket = graft.operators.Sampling.idBucket(col(idCol), 1000000)
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(bucket, col(idCol))
    docs
      .withColumn("__rn", row_number().over(w))
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("__rn") <= cap, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__rn") <= cap, col(idCol)).otherwise(lit(0L))).as("kept_id_sum"))
  }

  /** Token-budget allocation across domains by WATER-FILLING — the
    * mixture step of LLM pre-training data curation: a global token
    * budget (budgetPctBps of the corpus) is split equally across
    * domains, but no domain can contribute more tokens than it has;
    * capacity freed by small (saturated) domains is redistributed
    * equally among the rest. Closed form, no iteration: sort domains by
    * capacity ascending — the saturated set is then a prefix, found by
    * the progressive check capᵢ·(remaining domains) ≤ remaining budget —
    * and every unsaturated domain gets the same floor share of what the
    * saturated prefix left over.
    *
    * Scale: the per-domain capacities are one aggregate of the corpus
    * (shuffle keyed by domain); everything after runs on the
    * METADATA-sized domain table (single-partition windows over tens of
    * rows — deliberate, not a bottleneck). Exact int64 arithmetic end to
    * end, so any engine replays it bit-for-bit. Output: (domain,
    * cap_tokens, alloc_tokens, saturated). */
  def tokenBudgetAllocation(docs: DataFrame, domainCol: String,
      textCol: String, budgetPctBps: Int): DataFrame =
    tokenBudgetAllocationFromCaps(
      docs
        .select(col(domainCol).as("domain"),
          size(TextFunctions.tokens(col(textCol))).cast("long").as("__nt"))
        .groupBy(col("domain"))
        .agg(sum(col("__nt")).as("cap")),
      budgetPctBps)

  /** [[tokenBudgetAllocation]] over a PRE-AGGREGATED capacity table
    * `(domain, cap)` — the composition surface: lets mined pair-corpora
    * (e.g. bitext domains, whose capacity comes from a join, not a
    * single doc table) water-fill alongside the monolingual sources. */
  def tokenBudgetAllocationFromCaps(caps: DataFrame, budgetPctBps: Int): DataFrame = {
    val totals = caps.agg(sum(col("cap")).as("total"),
      count(lit(1)).as("n_dom"))
    val byCap = Window.orderBy(col("cap"), col("domain"))
    val before = byCap.rowsBetween(Window.unboundedPreceding, -1)
    val flagged = caps.crossJoin(totals)
      .withColumn("budget", expr(s"(total * $budgetPctBps) div 10000"))
      .withColumn("cumcap_b", coalesce(sum(col("cap")).over(before), lit(0L)))
      .withColumn("cumn_b", count(lit(1)).over(before))
      .withColumn("cond",
        (col("cap") * (col("n_dom") - col("cumn_b")) <=
          col("budget") - col("cumcap_b")).cast("int"))
      // saturation must be a prefix of the sort order: prefix-AND the check
      .withColumn("saturated",
        min(col("cond")).over(byCap.rowsBetween(Window.unboundedPreceding, 0)) === 1)
      // the global windows above read the DOMAIN-cardinality capacity
      // table; the guard enforces that claim at runtime (WindowAuditSpec
      // allowlists token_budget_mix / bitext_mix_compose on it)
      .transform(graft.functions.Guards.boundedWindow(_, "token_budget_allocation"))
    val satTotals = flagged.filter(col("saturated"))
      .agg(coalesce(sum(col("cap")), lit(0L)).as("satcap"),
        count(lit(1)).as("satn"))
    flagged.crossJoin(satTotals)
      .select(col("domain"), col("cap").as("cap_tokens"),
        when(col("saturated"), col("cap"))
          .otherwise(expr("(budget - satcap) div (n_dom - satn)"))
          .as("alloc_tokens"),
        col("saturated"))
  }

  /** Temperature-based domain resampling (the multilingual-LM mixing
    * rule: sample domain i with probability ∝ nᵢ^τ, τ < 1, so
    * low-resource domains are upsampled relative to their share — the
    * XLM-R / mT5 scheme, public across the multilingual pretraining
    * literature). τ is fixed at 1/2 and computed as `floor(sqrt(n))`:
    * IEEE sqrt of an exactly-representable integer is correctly rounded
    * in every engine, and from there every step is exact int64 (the
    * weight SUM is integer, so no float fold-order can leak in) — the
    * whole quota table replays bit-for-bit in an external oracle.
    *
    * Output per domain: (domain, n_docs, weight, quota,
    * upsample_bps = 10000·quota/n_docs — >10000 means the domain is
    * drawn more often than its natural share). The quota redistributes
    * the SAME total budget (Σ n_docs), matching the resampling
    * interpretation.
    *
    * Scale: one keyed aggregate of the corpus; everything after runs on
    * the metadata-sized domain table with a 1-row broadcast of the
    * totals. */
  def temperatureMix(docs: DataFrame, domainCol: String): DataFrame = {
    val counts = docs
      .groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("weight", floor(sqrt(col("n_docs").cast("double"))).cast("long"))
    val totals = counts.agg(
      sum(col("n_docs")).as("budget"), sum(col("weight")).as("wsum"))
    counts.crossJoin(broadcast(totals))
      .select(col("domain"), col("n_docs"), col("weight"),
        expr("(budget * weight) div wsum").as("quota"),
        expr("(10000 * ((budget * weight) div wsum)) div n_docs").as("upsample_bps"))
  }

  /** Boilerplate detection (the C4 repeated-line rule): a sentence that
    * appears in `minDf`+ DISTINCT documents is boilerplate (headers,
    * footers, cookie banners); each document reports its sentence count
    * and boilerplate share in basis points.
    *
    * Sentences travel as PolyHash int64 ids from the split on — one
    * corpus-sized explode, a distinct, and a document-frequency
    * aggregate, all keyed on the hash: the string leaves the row it was
    * born in, never a shuffle. Exact integer arithmetic end to end. */
  def boilerplate(docs: DataFrame, idCol: String, textCol: String,
      minDf: Int): DataFrame = {
    val sents = docs
      .select(col(idCol),
        explode(split(col(textCol), "\\. ")).as("sent"))
      .filter(length(trim(col("sent"))) > 0)
      .select(col(idCol),
        graft.functions.PolyHash.column(trim(col("sent")), 257L, 1000000007L).as("sh"))
      .distinct() // one vote per (doc, sentence)
    val df = sents.groupBy(col("sh"))
      .agg(count(lit(1)).as("sdf"))
    sents.join(df, Seq("sh"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_sents"),
        sum(when(col("sdf") >= minDf, 1L).otherwise(0L)).as("n_boiler"))
      .withColumn("boiler_bp", expr("n_boiler * 10000 div n_sents"))
  }

  /** Sequence packing (training-batch assembly): concatenate each shard's
    * documents in id order and cut every `capacity` tokens — the
    * GPT-style "concat and chunk" packing. Emits, per document, the bin
    * holding its first token and the offset within that bin; a document
    * crossing the cut spans into the next bin (`spans_bins`).
    *
    * The running token total is ONE window sum per shard — packing 100 TB
    * is a single shuffle keyed by shard, and shards (e.g. lang, or a
    * hash bucket) bound each partition's window to what one task can
    * stream. Everything is int64, so bin ids replay exactly anywhere. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      shardCol: String, capacity: Int): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(shardCol), col(idCol),
        // NULL text = 0 tokens, not a NULL that poisons the running sum
        coalesce(TextFunctions.tokenCount(col(textCol)).cast("long"), lit(0L))
          .as("n_tokens"))
      .withColumn("tok_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(
        col(shardCol), col(idCol), col("n_tokens"),
        expr(s"tok_before div $capacity").as("bin_id"),
        (col("tok_before") % capacity).as("bin_offset"),
        ((col("tok_before") % capacity) + col("n_tokens") > capacity).as("spans_bins"))
  }
}
