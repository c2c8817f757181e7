package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis kernels for the LLM-data-pipeline surface (builder brief):
  * tokenization, quality scoring, language ID, fingerprinting. All are
  * row-local Catalyst expressions (no UDFs, no shuffles) — they scale
  * embarrassingly and stay inside whole-stage codegen.
  */
object TextFunctions {

  /** Whitespace tokenizer (the BPE-ish regex split).
    *
    * ORACLE COUPLING: several oracles (`bigram_logprob`,
    * `kn_bigram_logprob`, `rouge_overlap`, …) replay this as DuckDB
    * `string_split(trim(text), ' ')`, which only matches `\s+` when the
    * fixture text is single-space separated with no tabs. That invariant
    * is asserted against the fixtures in TextSpec ("fixture text is
    * single-space separated"); if a fixture ever gains runs of
    * whitespace, either normalize it or port those oracles to a
    * regexp-based split. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Mean token length, rounded for oracle parity. */
  def avgTokenLen(text: Column): Column =
    round(
      aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t)).cast("double") /
        greatest(tokenCount(text), lit(1)),
      4)

  /** Count of tokens from a fixed stopword list. */
  def stopwordCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(lit): _*)))

  /** Stopword ratio — a quality-scoring feature. */
  def stopwordRatio(text: Column, words: Seq[String]): Column =
    round(stopwordCount(text, words).cast("double") / greatest(tokenCount(text), lit(1)), 4)

  /** Ratio of non-alphanumeric, non-space characters. */
  def punctRatio(text: Column): Column =
    round(
      (length(text) - length(regexp_replace(text, "[a-zA-Z0-9\\s]", ""))).cast("double") * -1
        / greatest(length(text), lit(1)) + 1.0,
      4)

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Token-based for the latin scripts, character-based for zh. */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une"),
    "de" -> Seq("der", "die", "und", "das", "ein", "nicht"),
    "es" -> Seq("el", "los", "y", "las", "una", "que"))

  /** Language-ID: argmax of per-language stopword hits with a fixed
    * preference order (en, fr, de, es, unknown) on ties — fully
    * deterministic and SQL-mirrorable. */
  def langId(text: Column): Column = {
    val scores = LangStopwords.map { case (lang, words) => lang -> stopwordCount(text, words) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best === 0, lit("unknown"))) { case (acc, (lang, score)) =>
      acc.when(score === best, lit(lang))
    }.otherwise(lit("unknown"))
  }

  /** Characters the cleaning pass strips AFTER NFC: C0 controls (minus
    * \t \n \r, which are whitespace and fold in the collapse step), DEL,
    * and ZERO WIDTH SPACE — the invisible-character set that fractures
    * exact dedup and inflates token counts in scraped text. VERTICAL TAB
    * (\x0B) is stripped here explicitly because Java's `\s` includes it
    * but RE2's does not — removing it first keeps the collapse step
    * engine-portable. */
  val StripClassJava = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\u200B]"

  /** Full text-normalization pass (the ftfy/clean step of a CCNet/Dolma
    * pipeline): Unicode NFC (native codegen kernel with an ASCII fast
    * path, [[graft.functions.NfcNormalize]]) → strip controls/zero-width
    * ([[StripClassJava]]) → collapse whitespace runs to one space → trim.
    * Row-local, no shuffle; DuckDB replays it as
    * `trim(regexp_replace(regexp_replace(nfc_normalize(x), strip, '',
    * 'g'), '\s+', ' ', 'g'))`. */
  def normalizeText(raw: Column): Column =
    trim(regexp_replace(
      regexp_replace(graft.functions.GraftFunctions.nfcNormalize(raw),
        StripClassJava, ""),
      "\\s+", " "))

  /** Document fingerprint: md5 of the whitespace-normalized, lowercased
    * text — the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " ").cast("binary"))

  /** Order-insensitive bag-of-words fingerprint — catches shuffled
    * near-duplicates exactly. */
  def bagFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(tokens(text))).cast("binary"))

  /** SimHash bit width: 60 = 4 chunks × 15 bits. 60 rather than 64 so the
    * portable token hash ([[tokenHashes]]) can be assembled from two
    * 30-bit polynomial hashes without any int64 overflow — the property
    * that makes the whole SimHash pipeline replayable in a SQL oracle. */
  val SimHashBits = 60

  /** SimHash over a precomputed token-hash array column: bit j of the
    * signature is the sign of Σ_tokens (±1 by bit j of the token hash).
    * Row-local (no shuffle); expressed as nested higher-order functions —
    * the DSL can't shift by a column, so this is a SQL expression over the
    * named array column. */
  def simhashFromHashes(hashArrayCol: String): Column =
    expr(
      s"""aggregate(
         |  transform(sequence(0, ${SimHashBits - 1}), j ->
         |    if(aggregate($hashArrayCol, 0L,
         |         (acc, h) -> acc + if(((shiftright(h, j)) & 1) = 1, 1L, -1L)) > 0,
         |       shiftleft(1L, j), 0L)),
         |  0L, (a, b) -> a | b)""".stripMargin)

  /** BPE-ish subword tokenizer: letter runs, digit runs, and single
    * punctuation marks — the GPT-2-pretokenizer shape without the
    * byte-level merge table. Regex is portable across Java and RE2
    * (no lookarounds), so the DuckDB oracle matches. */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeTokens(text: Column): Column = regexp_extract_all(text, lit(BpePattern), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Multiplicative finalizers for [[tokenHashes]]: a raw polynomial hash
    * of a short token has near-zero high bits (a 2-char token hashes
    * below 2¹⁷), which would leave the upper SimHash bits degenerate
    * across the corpus. (x·K mod 2³²) >> 2 spreads each 30-bit half over
    * the full range — exact int64 arithmetic (x < 2³⁰, K < 2³² ⇒
    * x·K < 2⁶²), so SQL oracles replay it. */
  val SimHashMixHi = 2654435761L // Knuth 2^32/phi
  val SimHashMixLo = 2246822519L // xxhash PRIME32_2

  /** Token-hash array for [[simhashFromHashes]]: a portable 60-bit hash
    * assembled from two independently-mixed 30-bit polynomial hashes —
    * every step exact int64, so a SQL oracle reproduces it bit-for-bit
    * (xxhash64 would not be). */
  def tokenHashes(text: Column): Column = {
    val two30 = 1073741824L // 2^30
    val two32 = 4294967296L
    transform(tokens(text), t =>
      shiftright(graft.functions.PolyHash.column(t, base = 313L, mod = two30)
        * SimHashMixHi % two32, 2) * two30 +
        shiftright(graft.functions.PolyHash.column(t, base = 257L, mod = two30)
          * SimHashMixLo % two32, 2))
  }

  /** Word n-gram shingles from a named, already-tokenized array column.
    * IMPORTANT: expressions inside HOF lambdas are re-evaluated per
    * element (no common-subexpression elimination), so the tokenization
    * must happen once in its own column — inlining `split(text)` here
    * costs |tokens| regex splits per row. */
  def shinglesOfTokens(tokensCol: String, n: Int): Column =
    if (n <= 1) expr(s"array_distinct($tokensCol)")
    else expr(
      s"""array_distinct(transform(
         |  sequence(1, greatest(size($tokensCol) - ${n - 1}, 1)),
         |  i -> array_join(slice($tokensCol, i, $n), ' ')))""".stripMargin)

  /** Convenience: tokenize-then-shingle in two columns; see
    * [[shinglesOfTokens]] for why the split must not be inlined. */
  def withShingles(df: org.apache.spark.sql.DataFrame, textCol: String, n: Int,
      outCol: String): org.apache.spark.sql.DataFrame =
    df.withColumn("__graft_toks", tokens(col(textCol)))
      .withColumn(outCol, shinglesOfTokens("__graft_toks", n))
      .drop("__graft_toks")
}
