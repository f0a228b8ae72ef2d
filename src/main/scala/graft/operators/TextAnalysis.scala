package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, heuristic language ID, and rolling-hash
  * fingerprinting — all pure Catalyst expressions (no UDFs), so every column
  * stays inside whole-stage codegen and scales linearly with the scan.
  *
  * Portability contract: every hash/score here is reproducible in ANSI-ish
  * SQL (md5 → bigint, fold-left rolling hash), which is what the DuckDB
  * oracle gate checks.
  */
object TextAnalysis {

  /** Large prime < 2^31 used by all modular hashing in this package; small
    * enough that (a*h+b) stays far below 2^63 under ANSI overflow checks.
    */
  val P: Long = 2147483647L

  /** First 15 hex chars of md5 as a non-negative bigint (60 bits) — the
    * deterministic, engine-portable base hash for shingles/tokens.
    */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace tokens of lower-cased text. */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => length(t) > 0)

  /** Word n-gram shingles (distinct) — the unit for Jaccard/MinHash dedup.
    * Compiled single-pass builder ([[graft.functions.ShingleArray]]);
    * bit-equal to [[shinglesInterpreted]] (property-tested), which is the
    * executable spec it replaced.
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.ShingleArray(text, n)

  /** Sliding-window document CHUNKING — the retrieval/context-window prep
    * stage: each document splits into token windows of `width` tokens
    * advancing by `stride` (overlap = width − stride), the shape a RAG
    * index or a fixed-context encoder ingests. Output one row per chunk:
    * `(doc_id, chunk_id, start_tok, n_tokens, chunk_text)`, chunk text in
    * the [[tokens]] normal form (lower-cased, single-spaced). Every token
    * position is covered; the final chunk shortens rather than pads.
    * Empty docs yield no chunks.
    *
    * A narrow per-row transform + explode — linear in total token count,
    * no shuffle, streaming-safe (row-local). The chunk count per doc is
    * ⌈max(n−width, 0) / stride⌉ + 1, all integer arithmetic so any engine
    * reproduces the exact row set.
    */
  def chunk(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      width: Int = 64, stride: Int = 48): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    require(stride >= 1 && stride <= width,
      s"stride must be in [1, width], got $stride")
    val t = tokens(col(textCol))
    df.select(col(idCol).as("doc_id"), t.as("__toks"),
        size(t).cast("long").as("__n"))
      .filter(col("__n") > 0)
      .withColumn("__chunks", // ⌈max(n−width,0)/stride⌉ + 1, in long math
        floor((greatest(col("__n") - width, lit(0L)) + (stride - 1))
          / lit(stride.toDouble)).cast("long") + 1)
      .select(col("doc_id"), col("__toks"), col("__n"),
        posexplode(sequence(lit(0L), col("__chunks") - 1)).as(Seq("__i", "chunk_id")))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn("n_tokens", least(lit(width.toLong), col("__n") - col("start_tok")))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"), col("n_tokens"),
        concat_ws(" ", slice(col("__toks"),
          (col("start_tok") + 1).cast("int"), col("n_tokens").cast("int")))
          .as("chunk_text"))
  }

  /** The original declarative shingle pipeline — higher-order functions,
    * whose lambdas Spark evaluates interpreted. Kept as the executable
    * SPEC for [[shingles]]: ShingleOpsSpec asserts value equality on
    * adversarial inputs (multi-space, unicode case, empty, short docs).
    */
  private[graft] def shinglesInterpreted(text: Column, n: Int): Column = {
    val t = tokens(text)
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(size(t) - n, lit(0))),
          i => concat_ws(" ", slice(t, i + 1, lit(n)))),
        s => size(split(s, " ")) === n))
  }

  /** Token statistics: whitespace token count, a BPE-ish regex piece count
    * (letter runs / digit runs / single other chars — the shape of a byte-pair
    * pre-tokenizer), and distinct-token count.
    */
  def tokenStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    df.select(
      col("doc_id"),
      size(t).as("n_tokens"),
      size(array_distinct(t)).as("n_distinct"),
      regexp_count(lower(col(textCol)), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))
        .as("n_pieces"))
  }

  /** Quality signals: length, token stats, mean token length, stopword ratio,
    * punctuation ratio, plus a composite [0,1] score — the usual cheap
    * pre-filters before expensive LLM-data processing.
    */
  def quality(df: DataFrame, textCol: String = "text",
      stopwords: Seq[String] = EnStopwords): DataFrame = {
    val t = tokens(col(textCol))
    val nTok = size(t)
    val nChars = length(col(textCol))
    val nStop = size(filter(t, w => w.isin(stopwords.map(lit(_)): _*)))
    val nPunct = length(regexp_replace(lower(col(textCol)), "[a-z0-9\\s]", ""))
    val safeTok = greatest(nTok, lit(1))
    val meanLen = length(regexp_replace(col(textCol), "\\s", ""))
      .cast("double") / safeTok
    val stopRatio = nStop.cast("double") / safeTok
    val punctRatio = nPunct.cast("double") / greatest(nChars, lit(1))
    df.select(
      col("doc_id"),
      nChars.as("n_chars"),
      nTok.as("n_tokens"),
      round(meanLen, 6).as("mean_token_len"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(punctRatio, 6).as("punct_ratio"),
      // composite: long enough, some stopwords, little punctuation
      round(
        least(nTok.cast("double") / 20.0, lit(1.0)) * 0.4
          + least(stopRatio * 5.0, lit(1.0)) * 0.3
          + (lit(1.0) - least(punctRatio * 10.0, lit(1.0))) * 0.3,
        6).as("quality_score"))
  }

  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  /** Per-group WINSORIZE + min-max normalize of a numeric column — the
    * score-calibration stage between quality scoring and mixture
    * sampling: raw scores are not comparable ACROSS sources (a clean-prose
    * source saturates the composite where a code-heavy one never does), so
    * each group's scores are clamped to its [pLo, pHi] quantiles and
    * rescaled to [0, 1]. Degenerate groups (hi == lo) normalize to 0.5.
    *
    * Scale design: one hash aggregation for the per-group bounds (|groups|
    * rows), broadcast back, then a pure row-local projection — the corpus
    * shuffles ZERO times. `exact = true` uses the exact interpolated
    * `percentile` (per-group value buffering — right for the oracle gate
    * and for bounded-cardinality groups); production at 100 TB sets
    * `exact = false` for `approx_percentile`, whose bounded-memory sketch
    * (accuracy 10⁴ ⇒ ~0.01% rank error) drops the buffering without
    * changing the plan shape. Bounds and outputs round to 6 dp so any
    * engine replays the clamp/rescale bit-for-bit.
    */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95,
      exact: Boolean = true): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad quantiles [$pLo,$pHi]")
    def pct(p: Double) =
      if (exact) percentile(col(valueCol), lit(p))
      else percentile_approx(col(valueCol), lit(p), lit(10000))
    val bounds = df.groupBy(col(groupCol))
      .agg(round(pct(pLo), 6).as("__lo"), round(pct(pHi), 6).as("__hi"))
    val c = least(greatest(col(valueCol), col("__lo")), col("__hi"))
    df.join(broadcast(bounds), groupCol)
      .withColumn("winsorized", c)
      .withColumn("norm_score",
        when(col("__hi") > col("__lo"),
          round((c - col("__lo")) / (col("__hi") - col("__lo")), 6))
          .otherwise(0.5))
      .withColumnRenamed("__lo", "lo").withColumnRenamed("__hi", "hi")
  }

  /** Top-`k` most frequent non-stopword tokens per document (ties broken
    * lexicographically) — the keyword/salient-term extraction step of a
    * text-curation pipeline. One explode + one count aggregation + one
    * per-doc top-k window; the explode relation shuffles once on
    * (doc, token) with map-side partial counts.
    */
  def topTerms(df: DataFrame, k: Int = 3, textCol: String = "text",
      stopwords: Seq[String] = EnStopwords): DataFrame = {
    val toks = Dedup.fanScan(df)
      .select(col("doc_id"), explode(tokens(col(textCol))).as("tok"))
      .filter(!col("tok").isin(stopwords.map(lit(_)): _*))
    val counts = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("n").desc, col("tok"))
    counts.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** TF-IDF top-`k` salient terms per document — [[topTerms]] upgraded with
    * corpus-level weighting so ubiquitous tokens stop winning.
    *
    * Shuffle budget at 100 TB: the corpus text is scanned and exploded
    * exactly ONCE, into the compact (doc, token, n) count relation
    * (map-side partial combine); document frequency is a window count over
    * that relation partitioned by token — NOT a second aggregation branch,
    * which would re-execute the corpus explode once per consumer. All
    * further exchanges move only the counts relation (≪ corpus). The 1-row
    * corpus size broadcasts.
    *
    * `idf = ln((N+1)/(df+1)) + 1` (smoothed; no zero/negative weights).
    * Ranking uses the ROUNDED tf-idf with a token tie-break, the same
    * engine-stable ordering trick as [[graft.operators.Similarity]]'s
    * cosine ranks.
    */
  def tfIdf(df: DataFrame, k: Int = 3, textCol: String = "text",
      stopwords: Seq[String] = EnStopwords): DataFrame = {
    val counts = Dedup.fanScan(df)
      .select(col("doc_id"), explode(tokens(col(textCol))).as("tok"))
      .filter(!col("tok").isin(stopwords.map(lit(_)): _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("n"))
    val nDocs = df.agg(countDistinct(col("doc_id")).as("nd"))
    val wDf = org.apache.spark.sql.expressions.Window.partitionBy("tok")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf").desc, col("tok"))
    counts
      .withColumn("df", count(lit(1)).over(wDf))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", round(
        col("n") * (log((col("nd") + 1.0) / (col("df") + 1.0)) + 1.0), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("tok"), col("n"), col("tfidf"), col("rk"))
  }

  /** BM25 retrieval scoring (Okapi, Lucene's +1-smoothed idf) of the corpus
    * against a fixed `query` term set: the standard relevance ranking an
    * IR-grade curation pipeline uses to mine topical subsets — tf
    * saturation via `k1`, document-length normalization via `b` against
    * the corpus mean length. Emits the top-`k` documents with their score
    * and matched-term count, rank broken by doc_id so the cut is
    * engine-stable.
    *
    * Shuffle budget at 100 TB: the corpus explodes ONCE into per-doc
    * token counts; the query filter collapses that relation to
    * |docs|×|query| rows BEFORE any join, so the scoring joins move only
    * query-matched counts. Document frequencies of the query terms
    * (≤ |query| rows) and the 1-row corpus stats broadcast; the per-doc
    * length relation joins hash-partitioned on doc_id. The final top-k is
    * a TakeOrdered — no global sort materializes.
    */
  def bm25(df: DataFrame, query: Seq[String], k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75,
      textCol: String = "text"): DataFrame = {
    require(query.nonEmpty, "bm25 needs at least one query term")
    val toks = Dedup.fanScan(df)
      .select(col("doc_id"), explode(tokens(col(textCol))).as("tok"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("nd"), avg(col("dl")).as("avgdl"))
    val tf = toks.filter(col("tok").isin(query.map(lit(_)): _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(dfreq), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("nd") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("s", col("idf") * col("tf") * (lit(k1) + 1.0) /
        (col("tf") + lit(k1) *
          (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), round(sum(col("s")), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
      .withColumn("rk", row_number().over(org.apache.spark.sql.expressions
        .Window.orderBy(col("bm25").desc, col("doc_id"))))
  }

  /** PII scrubbing: emails, then 6+-digit runs (account/phone/id numbers),
    * replaced by typed placeholders, with per-document match counts for
    * audit sampling. Pure per-row codegen regexes — zero shuffle, runs at
    * scan speed; the regex subset (character classes, bounded repetition)
    * means Java and RE2 engines match identically, so the oracle reproduces
    * the redaction byte-for-byte. Digit runs are counted AFTER email
    * removal, consistent with the replacement order.
    */
  def redact(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val num = "[0-9]{6,}"
    val deEmailed = regexp_replace(col(textCol), email, "<EMAIL>")
    df.select(col(idCol),
      regexp_count(col(textCol), lit(email)).as("n_emails"),
      regexp_count(deEmailed, lit(num)).as("n_numbers"),
      regexp_replace(deEmailed, num, "<NUM>").as("redacted"))
  }

  /** Per-language discriminator token sets for [[langId]]. CJK is scored by
    * codepoint class, not tokens.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein"),
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in"),
    "es" -> Seq("el", "los", "y", "es", "un", "una", "por"),
    "fr" -> Seq("le", "les", "et", "est", "un", "une", "pour"))

  /** Heuristic language ID: count marker-token hits per language (CJK
    * codepoints for zh), predict the argmax with deterministic lexicographic
    * tie-break. Emits per-language scores so the prediction is auditable.
    */
  def langId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    val scored = df.select(
      (col("doc_id") +:
        LangMarkers.map { case (lang, ws) =>
          size(filter(t, w => w.isin(ws.map(lit(_)): _*))).as(s"s_$lang")
        }) :+
        regexp_count(col(textCol), lit("[\\u4e00-\\u9fff]")).as("s_zh"): _*)
    val langs = LangMarkers.map(_._1) :+ "zh"
    // argmax with lexicographic tie-break: fold over (score, lang) pairs
    val best = langs.tail.foldLeft(
      struct(col(s"s_${langs.head}").as("s"), lit(langs.head).as("l"))) {
      (acc, lang) =>
        when(col(s"s_$lang") > acc.getField("s"),
          struct(col(s"s_$lang").as("s"), lit(lang).as("l"))).otherwise(acc)
    }
    scored.withColumn("predicted", best.getField("l"))
  }

  /** Benchmark DECONTAMINATION: flag corpus documents sharing ≥ `minShared`
    * word n-grams with any benchmark item — the standard eval-leakage check
    * a training-data pipeline runs before a corpus ships. Output is one row
    * per contaminated (doc, benchmark item) pair with the shared-shingle
    * count, so the pipeline can drop, mask or audit.
    *
    * Scale shape: the CORPUS is exploded to (doc, shingle) exactly once —
    * the dominant cost, linear in the scan; the benchmark side is small by
    * definition (eval sets are thousands of items, not billions) and
    * broadcasts, so the join is a map-side hash probe with NO shuffle of
    * corpus shingles. The count aggregation shuffles only matching pairs —
    * at a sane threshold that is ≈ the contamination itself, tiny.
    * Shingles are distinct per document ([[shingles]]), so the count IS the
    * intersection size.
    */
  def contamination(docs: DataFrame, bench: DataFrame, n: Int = 3,
      minShared: Int = 2, textCol: String = "text",
      idCol: String = "doc_id", benchIdCol: String = "bench_id"): DataFrame =
    contaminationFromShingles(
      Dedup.fanScan(docs).select(col(idCol).as("id"),
        explode(shingles(col(textCol), n)).as("sh")),
      bench, n, minShared, textCol, benchIdCol)

  /** [[contamination]] for a benchmark too large to BROADCAST-join — the
    * 100 TB shape when the eval-suite union reaches billions of n-grams: a
    * Bloom filter over the benchmark shingles (one distributed sketch
    * pass, a few MB at 1% FPP regardless of benchmark size) pre-filters
    * the corpus shingle stream ROW-LOCALLY, and only the ~FPP-sized
    * remainder pays the exact shuffle join that removes false positives —
    * so the output is EXACTLY [[contamination]]'s, while the shuffled
    * volume drops from |corpus shingles| to |true hits| + FPP·|corpus
    * shingles|. The classic sketch-semi-join reduction; the one UDF probe
    * is justified and sits behind the scan filter, off the join's hot path.
    *
    * Tried-once (r12, keep the UDF): Spark's internal runtime-filter
    * expression pair (`BloomFilterAggregate` over `xxhash64(sh)` +
    * `BloomFilterMightContain` on the serialized sketch as a binary
    * literal) IS reachable here and oracle-matches, but ABBA-measured
    * ~15% SLOWER on the gate at sf0.1 (medians 2.70 s vs 2.33 s over 3+3
    * alternated runs) — the codegen probe pays an extra xxhash64 per
    * shingle plus a plan-embedded multi-MB literal, while the UDF's string
    * probe hashes the bytes it already has. Negative result recorded in
    * BASELINE.md; revisit only if the probe ever dominates a profile.
    */
  def contaminationBloom(docs: DataFrame, bench: DataFrame, n: Int = 3,
      minShared: Int = 2, fpp: Double = 0.01, textCol: String = "text",
      idCol: String = "doc_id", benchIdCol: String = "bench_id"): DataFrame = {
    val b = bench.select(col(benchIdCol).as("bench_id"),
      explode(shingles(col(textCol), n)).as("sh"))
    val distinctSh = b.select("sh").distinct()
    // sketch sizing needs the distinct-gram count — one counting job (in
    // production: table statistics), driver holds one scalar + the sketch
    val nGrams = math.max(distinctSh.count(), 1L)
    val bf = distinctSh.stat.bloomFilter("sh", nGrams, fpp)
    val probe = udf((s: String) => s != null && bf.mightContainString(s))
    Dedup.fanScan(docs).select(col(idCol).as("doc_id"),
        explode(shingles(col(textCol), n)).as("sh"))
      .filter(probe(col("sh")))
      .join(b, "sh") // exact verify: no broadcast hint — the point is the
                     // shuffle join stays small because the bloom already
                     // dropped the non-matching corpus grams
      .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** [[contamination]] from a precomputed distinct `(id, sh)` corpus shingle
    * relation ([[Dedup.shingleRows]]) — the shareable form: a composed
    * pipeline (e.g. [[Curation.curate]]) shingles the corpus once for both
    * near-dup detection and this check, skipping the second explode scan.
    * Only the (small, broadcast) benchmark side is shingled here.
    */
  def contaminationFromShingles(docSh: DataFrame, bench: DataFrame,
      n: Int = 3, minShared: Int = 2, textCol: String = "text",
      benchIdCol: String = "bench_id"): DataFrame = {
    val b = bench.select(col(benchIdCol).as("bench_id"),
      explode(shingles(col(textCol), n)).as("sh"))
    docSh.select(col("id").as("doc_id"), col("sh"))
      .join(broadcast(b), "sh")
      .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Intra-document REPETITION score: the fraction of duplicate token
    * n-grams inside each document — boilerplate, keyword stuffing and
    * degenerate generation all show up as high `rep_ratio`, making this a
    * standard quality pre-filter. Pure per-row codegen expressions (no
    * explode, no shuffle): runs at scan speed over 100 TB. Documents with
    * fewer than `n` tokens score 0 (nothing to repeat).
    */
  def repetition(df: DataFrame, n: Int = 5, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val t = tokens(col(textCol))
    // NON-distinct grams — repetition is exactly what [[shingles]] erases
    val grams = filter(
      transform(sequence(lit(0), greatest(size(t) - n, lit(0))),
        i => concat_ws(" ", slice(t, i + 1, lit(n)))),
      s => size(split(s, " ")) === n)
    val total = size(grams)
    val uniq = size(array_distinct(grams))
    df.select(col(idCol),
      total.cast("long").as("n_grams"),
      uniq.cast("long").as("n_uniq"),
      when(total > 0,
        round(lit(1.0) - uniq.cast("double") / total, 6)).otherwise(0.0)
        .as("rep_ratio"))
  }

  /** Corpus-trained UNIGRAM language-model score per document: each doc's
    * mean token log-probability under the maximum-likelihood unigram model
    * of the corpus itself, plus the perplexity of that mean. The classic
    * cheap "how typical is this text" quality signal — gibberish, wrong-
    * language and degenerate docs score far below the corpus mode, and the
    * score needs no external model, so it runs in any pipeline bootstrap.
    *
    * Scale shape: one explode (linear in tokens) collapsed IMMEDIATELY to
    * term frequency per (doc, token) — so the vocabulary join sees one row
    * per DISTINCT (doc, token), not one per occurrence. Under a Zipfian
    * corpus the hot tokens ("the", …) would otherwise each land on a
    * single shuffle partition and the join would be skew-bound; the tf
    * pre-aggregation shrinks every hot key by its average within-doc
    * repeat factor and, more importantly, spreads the residual across doc
    * boundaries. The vocabulary stays shuffled, NOT broadcast: a 100 TB
    * corpus has a vocabulary far beyond the driver (production would floor
    * rare counts into an OOV bucket first; MLE on the full vocab keeps the
    * oracle exact here). The 1-row total count is the only broadcast. The
    * doc mean is the tf-weighted mean sum(tf·logp)/sum(tf) — identical to
    * the per-occurrence average. Perplexity is exp of the ROUNDED mean,
    * keeping the emitted pair internally consistent and engine-stable.
    */
  def unigramLogProb(df: DataFrame, textCol: String = "text"): DataFrame = {
    val tf = Dedup.fanScan(df)
      .select(col("doc_id"), explode(tokens(col(textCol))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy("tok").agg(sum(col("tf")).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("total"))
    tf.join(vocab, "tok")
      .crossJoin(broadcast(total))
      .withColumn("logp", log(col("cnt").cast("double") / col("total")))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"),
        round(sum(col("tf").cast("double") * col("logp")) / sum(col("tf")), 6)
          .as("avg_logp"))
      .withColumn("ppl", round(exp(-col("avg_logp")), 4))
  }

  /** Corpus-trained BIGRAM language-model score per document: each doc's
    * mean bigram conditional log-probability ln c(w₁w₂)/c(w₁·) under the
    * corpus MLE, plus perplexity — the fluency complement to
    * [[unigramLogProb]] (word-order sensitivity: shuffled or concatenated
    * boilerplate scores low even when its unigram profile is typical).
    * The marginal c(w₁·) sums the bigram counts, so the model is exactly
    * normalized over observed continuations (docs with < 2 tokens carry no
    * bigrams and are omitted, like the unigram scorer omits empty docs).
    *
    * Scale shape mirrors the unigram scorer: bigrams build per-row from
    * the token array (one transform + explode, linear, no shuffle), then
    * collapse IMMEDIATELY to tf per (doc, w₁, w₂) so both probability
    * joins see one row per distinct (doc, bigram) — Zipfian hot bigrams
    * ("of the") partial-aggregate before any shuffle. The bigram-count and
    * marginal relations join shuffled, never broadcast (corpus-scale
    * vocabulary), and NO corpus total is needed — conditional probability
    * cancels it, so the plan has no 1-row cross join at all.
    */
  /** One row per adjacent token pair, with the token ARRAY materialized in
    * its own projection first: inlining `tokens(text)` into the transform
    * lambda makes codegen re-run the split/filter for every element_at —
    * O(tokens²) splits per document (measured 4× the whole query at g1).
    * As a named column the array is evaluated once per row and the lambda
    * reads a bound reference.
    */
  private def bigrams(df: DataFrame, textCol: String,
      keep: Seq[Column]): DataFrame = {
    val tk = col("__toks")
    df.select(keep :+ tokens(col(textCol)).as("__toks"): _*)
      .select(keep :+ explode(when(size(tk) >= 2,
        transform(sequence(lit(0), size(tk) - 2), i =>
          struct(element_at(tk, i + 1).as("w1"),
            element_at(tk, i + 2).as("w2"))))).as("b"): _*)
      .select(keep :+ col("b.w1").as("w1") :+ col("b.w2").as("w2"): _*)
  }

  def bigramLogProb(df: DataFrame, textCol: String = "text"): DataFrame = {
    val bi = bigrams(df, textCol, Seq(col("doc_id")))
    val tf = bi.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("tf"))
    val cb = tf.groupBy("w1", "w2").agg(sum(col("tf")).as("cnt"))
    val cu = cb.groupBy("w1").agg(sum(col("cnt")).as("tot"))
    tf.join(cb, Seq("w1", "w2")).join(cu, Seq("w1"))
      .withColumn("logp", log(col("cnt").cast("double") / col("tot")))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_bigrams"),
        round(sum(col("tf").cast("double") * col("logp")) / sum(col("tf")), 6)
          .as("avg_logp"))
      .withColumn("ppl", round(exp(-col("avg_logp")), 4))
  }

  /** INTERPOLATED bigram language-model score — the CCNet-style smoothed
    * perplexity filter real pretraining pipelines run (Wenzek et al. 2020
    * filter on a KenLM score; the interpolation λ·P(w₂|w₁) + (1−λ)·P(w₂)
    * is Jelinek-Mercer smoothing, the simplest member of that family):
    * per-doc mean of ln(λ·c(w₁w₂)/c(w₁·) + (1−λ)·c(w₂)/N) over the doc's
    * adjacent token pairs. Unlike the raw conditional MLE
    * ([[bigramLogProb]]) this never takes ln 0 conceptually — any bigram
    * backed by its unigram keeps a floor probability — so rare
    * continuations are scored smoothly instead of dominating; λ = 0.7
    * weights fluency (the bigram) over typicality (the unigram).
    *
    * Scale shape: the bigram side is [[bigramLogProb]]'s exactly (tf
    * pre-aggregation per (doc, w₁, w₂) before the count joins, so Zipfian
    * hot bigrams partial-aggregate map-side and never skew-bind a
    * shuffle); the unigram model adds one more linear token pass collapsed
    * to the vocabulary-sized count relation, joined shuffled on w₂, and
    * the 1-row corpus total is the only broadcast. Every probability is a
    * ratio of exact integer counts and the λ arithmetic is written
    * literally as 0.7·x + (1 − 0.7)·y — the oracle replays the identical
    * IEEE expression, so the rounded score is engine-exact.
    */
  def bigramInterpLogProb(df: DataFrame, lambda: Double = 0.7,
      textCol: String = "text"): DataFrame = {
    val bi = bigrams(df, textCol, Seq(col("doc_id")))
    val tf = bi.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("tf"))
    val cb = tf.groupBy("w1", "w2").agg(sum(col("tf")).as("cnt"))
    val cu = cb.groupBy("w1").agg(sum(col("cnt")).as("tot"))
    // unigram counts over the FULL token stream (doc-final tokens
    // included — the same model unigramLogProb scores with)
    val uni = Dedup.fanScan(df)
      .select(explode(tokens(col(textCol))).as("w2"))
      .groupBy("w2").agg(count(lit(1)).as("ucnt"))
    val total = uni.agg(sum(col("ucnt")).as("total"))
    tf.join(cb, Seq("w1", "w2")).join(cu, Seq("w1")).join(uni, Seq("w2"))
      .crossJoin(broadcast(total))
      .withColumn("logp",
        log(lit(lambda) * (col("cnt").cast("double") / col("tot")) +
          (lit(1.0) - lit(lambda)) * (col("ucnt").cast("double") / col("total"))))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_bigrams"),
        round(sum(col("tf").cast("double") * col("logp")) / sum(col("tf")), 6)
          .as("avg_logp"))
      .withColumn("ppl", round(exp(-col("avg_logp")), 4))
  }

  /** Pointwise-mutual-information COLLOCATIONS: the top-`k` adjacent token
    * pairs whose co-occurrence beats their marginals' independence
    * prediction — `pmi = ln(c₁₂·T / (c₁·Σ c·₂))` over corpus bigram counts
    * `c₁₂`, left/right marginals and the bigram total `T`. The classic
    * phrase/term-mining pass (Church & Hanks 1990); `minCount` suppresses
    * the low-frequency PMI explosion. Every quantity is an exact integer
    * count, so the rounded score is engine-exact by construction.
    *
    * Scale shape: one corpus explode → per-(w₁,w₂) partial-aggregated
    * counts (Zipfian hot pairs combine map-side); the count relation is
    * eagerly `localCheckpoint`ed because FOUR consumers read it (the pair
    * filter, both marginals, the total) — without the pin each one would
    * re-explode the whole corpus (with the array fix below, g1: 53 s →
    * 7.5 s total). The pinned relation is vocabulary²-bounded, never
    * corpus-sized. Marginals
    * join back shuffled on their own keys; the 1-row total broadcasts;
    * top-k is TakeOrdered.
    */
  def collocations(df: DataFrame, k: Int = 50, minCount: Long = 5L,
      textCol: String = "text"): DataFrame = {
    val cb = bigrams(df, textCol, Seq.empty)
      .groupBy("w1", "w2").agg(count(lit(1)).as("n12"))
      .localCheckpoint()
    val left  = cb.groupBy("w1").agg(sum(col("n12")).as("n1"))
    val right = cb.groupBy("w2").agg(sum(col("n12")).as("n2"))
    val total = cb.agg(sum(col("n12")).as("t"))
    cb.filter(col("n12") >= minCount)
      .join(left, "w1").join(right, "w2")
      .crossJoin(broadcast(total))
      .withColumn("pmi", round(
        log(col("n12").cast("double") * col("t") /
          (col("n1").cast("double") * col("n2"))), 6))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
      .select(col("w1"), col("w2"), col("n12"), col("pmi"))
  }

  /** Rolling polynomial hash fingerprint of the normalized document
    * (lower-case, [a-z0-9 ] only): fold-left acc*31 + codepoint, mod [[P]].
    * A stable content fingerprint for cheap exact-dup detection and
    * incremental re-crawl diffing. The fold runs as the codegen
    * [[graft.functions.FingerprintFold]] byte loop — value-identical to
    * the per-character interpreted fold it replaced because the
    * normalization guarantees single-byte ASCII (documented there).
    */
  def fingerprint(df: DataFrame, textCol: String = "text"): DataFrame = {
    val norm = regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", "")
    val fp = graft.functions.FingerprintFold(norm)
    df.select(col("doc_id"), length(norm).as("n_norm"), fp.as("fp"))
  }

  /** Subword-vocabulary CANDIDATE GENERATION — the counting pass a
    * WordPiece/BPE-style tokenizer trainer starts from: every word-internal
    * character n-gram of length `minLen..maxLen`, counted corpus-wide, top
    * `k` by frequency (count desc, then subword — a total order, so the
    * cut is deterministic on any engine). A production trainer iterates
    * merges from these counts; the counting pass is the part that must
    * scale, and it is one explode + one hash aggregation with map-side
    * partials (hot subwords collapse per partition) + a TakeOrdered top-k —
    * per-partition heaps of k rows merged on the driver, never a global
    * sort of the vocabulary.
    */
  def subwordVocab(df: DataFrame, textCol: String = "text",
      minLen: Int = 2, maxLen: Int = 6, k: Int = 100): DataFrame = {
    require(2 <= minLen && minLen <= maxLen, s"bad lengths [$minLen,$maxLen]")
    // compiled builder (graft.functions.SubwordArray — one static call per
    // doc); bit-equal to subwordVocabInterpreted (ShingleOpsSpec), which
    // is the executable spec it replaced: the HOF form cost ~10× at g1
    df.select(explode(graft.functions.SubwordArray(col(textCol),
        minLen, maxLen)).as("sw"))
      .groupBy("sw").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("sw"))
      .limit(k)
  }

  /** The original declarative subword pipeline — kept as the executable
    * SPEC for the compiled builder (see ShingleOpsSpec).
    */
  private[graft] def subwordVocabInterpreted(df: DataFrame,
      textCol: String = "text", minLen: Int = 2, maxLen: Int = 6,
      k: Int = 100): DataFrame = {
    val w = col("w")
    val subs = flatten(transform(
      sequence(lit(minLen), lit(maxLen)),
      l => when(length(w) >= l,
        transform(sequence(lit(0), length(w) - l), i => w.substr(i + 1, l)))
        .otherwise(array().cast("array<string>"))))
    Dedup.fanScan(df).select(explode(tokens(col(textCol))).as("w"))
      .select(explode(subs).as("sw"))
      .groupBy("sw").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("sw"))
      .limit(k)
  }

  /** Vocabulary COVERAGE profile — the out-of-vocabulary rate per language
    * under a top-`k` word vocabulary: the sizing measurement behind "how
    * large must the vocab be". The vocab is the global top-k by (count
    * desc, token) — TakeOrdered again, never a full-vocabulary sort — and
    * the coverage pass is a broadcast semi-join of k tokens against the
    * token stream followed by one aggregation per language.
    */
  def oovRate(df: DataFrame, k: Int = 500, textCol: String = "text",
      langCol: String = "lang"): DataFrame = {
    val toks = Dedup.fanScan(df)
      .select(col(langCol), explode(tokens(col(textCol))).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(k)
      .select(col("tok"), lit(1).as("__in"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(langCol).agg(
        count(lit(1)).as("n_tokens"),
        sum(coalesce(col("__in"), lit(0))).cast("long").as("n_covered"))
      .withColumn("oov_rate", round(
        (col("n_tokens") - col("n_covered")).cast("double") / col("n_tokens"), 6))
  }

  /** Canonical text NORMALIZATION — the pre-dedup cleanup stage: lower-case,
    * control characters (tabs/newlines included) to spaces, runs of spaces
    * collapsed, ends trimmed. Emits the normalized text's md5 rather than
    * the text itself (the hash is what downstream exact-dup grouping keys
    * on; re-materializing the corpus is the writer's job), plus before/after
    * lengths and a `changed` flag — the audit columns a curation report
    * aggregates. Pure row-local projection: zero shuffle, stays inside
    * whole-stage codegen, and the character classes are ASCII-explicit so
    * any engine computes the identical canonical form.
    */
  def normalize(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[\\x00-\\x1f\\x7f]", " "),
      " +", " "))
    df.select(col(idCol),
      length(col(textCol)).cast("long").as("n_chars"),
      length(norm).cast("long").as("n_chars_norm"),
      (norm =!= col(textCol)).as("changed"),
      md5(norm).as("norm_hash"))
  }

  /** Exact duplicate groups under [[normalize]]'s canonical form — catches
    * the trivially-reformatted copies (case, whitespace, control bytes)
    * that byte-exact dedup misses. One hash aggregation on the norm hash;
    * the representative is the smallest doc id, a `min` with map-side
    * partials — never a sort-rank.
    */
  def normalizedDupGroups(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    normalize(df, textCol, idCol)
      .groupBy("norm_hash").agg(
        count(lit(1)).as("n_docs"),
        min(col(idCol)).as("keep_id"))
      .filter(col("n_docs") >= 2)

  /** URL CANONICALIZATION — the first dedup key of every web-crawl
    * pipeline: the same page arrives under `HTTP://WWW.Example.COM:80/a/`
    * and `http://example.com/a?utm_source=feed`, and byte-exact URL
    * grouping misses all of it. Canonical form: scheme and host
    * lower-cased, leading `www.` and scheme-default ports (http:80,
    * https:443) stripped, trailing path slashes removed, tracking
    * parameters (`utm_*`, `fbclid`, `gclid`) dropped, surviving query
    * parameters SORTED (order never distinguishes resources in practice),
    * fragment discarded.
    *
    * Pure row-local projection over Spark's codegen `parse_url` + array
    * builtins — zero shuffle, zero UDF; grouping the result is one hash
    * aggregate, the same plan class as exact dedup.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(parse_url(url, lit("PROTOCOL")))
    val hostRaw = lower(parse_url(url, lit("HOST")))
    val host = regexp_replace(hostRaw, "^www\\.", "")
    val port = regexp_extract(parse_url(url, lit("AUTHORITY")),
      ":(\\d+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val path = regexp_replace(
      coalesce(parse_url(url, lit("PATH")), lit("")), "/+$", "")
    val params = filter(
      split(coalesce(parse_url(url, lit("QUERY")), lit("")), "&"),
      p => length(p) > 0 && !p.startsWith("utm_") &&
        !p.startsWith("fbclid=") && !p.startsWith("gclid="))
    val query = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(length(query) > 0, concat(lit("?"), query)).otherwise(lit("")))
  }

  /** Duplicate-URL groups under [[canonicalizeUrl]]: one hash aggregate on
    * the canonical form, smallest id as the kept representative (a `min`
    * with map-side partials, never a rank).
    */
  def urlDupGroups(df: DataFrame, urlCol: String,
      idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol), canonicalizeUrl(col(urlCol)).as("canon_url"))
      .groupBy("canon_url").agg(
        count(lit(1)).as("n_urls"),
        min(col(idCol)).as("keep_id"))

  /** ZIPF FIT per corpus segment — the rank-frequency diagnostic: natural
    * text follows `freq ∝ rank^s` with `s ≈ −1`; machine-generated or
    * template spam bends the log-log line, so the fitted slope (and its
    * r²) is a cheap corpus-health signal per source. Per segment: token
    * counts, frequency rank (ties broken lexically so the rank sequence is
    * engine-exact), top-`topN` terms only, then the OLS fit of ln(freq) on
    * ln(rank) — slope = cov/var (normalization cancels), intercept from
    * the means, r² = corr².
    *
    * Scale shape: the corpus explodes ONCE into (segment, token) counts
    * with map-side combine; the rank window runs per segment over its
    * VOCABULARY (sub-linear in corpus size), the topN cap bounds the fit
    * relation at |segments|·topN rows, and the final regression is a hash
    * aggregate over that. Nothing after the first aggregation touches
    * corpus-sized data.
    */
  def zipfFit(df: DataFrame, segCol: String = "source",
      textCol: String = "text", topN: Int = 200): DataFrame = {
    require(topN >= 3, s"need >= 3 rank points to fit, got $topN")
    val counts = Dedup.fanScan(df)
      .select(col(segCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(segCol), col("tok")).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(segCol).orderBy(col("n").desc, col("tok"))
    val ranked = counts
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topN)
      .select(col(segCol), log(col("rk").cast("double")).as("lx"),
        log(col("n").cast("double")).as("ly"))
    // division-free aggregates, guarded post-agg ratios: ANSI-mode corr()
    // throws DIVIDE_BY_ZERO on a zero-variance side (a flat frequency
    // profile) and aggregates evaluate before any CASE guard
    ranked.groupBy(col(segCol))
      .agg(covar_samp(col("ly"), col("lx")).as("cv"),
        var_samp(col("lx")).as("vx"),
        stddev_samp(col("lx")).as("sx"), stddev_samp(col("ly")).as("sy"),
        avg(col("ly")).as("my"), avg(col("lx")).as("mx"),
        count(lit(1)).as("n_terms"))
      .withColumn("slope0", when(col("vx") > 0, col("cv") / col("vx")))
      .withColumn("rho",
        when(col("sx") > 0 && col("sy") > 0,
          col("cv") / (col("sx") * col("sy"))))
      .select(col(segCol),
        round(col("slope0"), 6).as("zipf_slope"),
        round(col("my") - col("slope0") * col("mx"), 6).as("intercept"),
        round(col("rho") * col("rho"), 6).as("r2"),
        col("n_terms"))
  }
}
