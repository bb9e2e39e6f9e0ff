package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation (training-data extensions):
  * token counting, quality scoring, heuristic language ID, fingerprinting.
  * All pure column expressions — codegen-friendly, no UDFs.
  */
object TextOps {

  /** Whitespace tokens. */
  def words(textCol: Column): Column = split(trim(textCol), "\\s+")

  /** BPE-ish token count: alpha runs, digit runs, and single other
    * non-space symbols (a cheap proxy for subword tokenizers).
    */
  def bpeIshCount(textCol: Column): Column =
    size(regexp_extract_all(textCol, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  /** TF-IDF term scoring: tf = raw term count per (doc, term) over
    * lowercased whitespace tokens, idf = ln(n_docs / df). The corpus size
    * arrives via a broadcast 1-row aggregate (no driver-side count, the
    * operator stays lazy), and the whole computation is two hash
    * aggregations + one broadcast-join — shuffle-proportional to the
    * distinct (doc, term) pairs, never to raw token count, because tf
    * partials combine map-side. The score is quantized with the stable
    * `floor(x*1e6+0.5)/1e6` so downstream ranking can't be flipped by
    * last-ulp differences in `ln` across engines/libm builds.
    * Output: (doc_id, term, tf, tfidf).
    */
  def tfidf(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfx = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(countDistinct(col(idCol)).as("n_docs"))
    tf.join(dfx, "term").crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        floor(col("tf") * log(col("n_docs").cast("double") / col("df")) * 1e6 + 0.5) / 1e6)
      .select(col("doc_id"), col("term"), col("tf"), col("tfidf"))
  }

  /** BM25 (Okapi) term scoring: idf = ln((N - df + 0.5)/(df + 0.5) + 1)
    * (the non-negative variant), tf component saturates at k1 and is
    * normalized by relative document length with slope b. Same plan shape
    * as [[tfidf]] — two hash aggregations plus one broadcast of the 1-row
    * (n_docs, avg_len) aggregate — and the same stable quantization before
    * any downstream ranking. Output: (doc_id, term, tf, doc_len, bm25).
    */
  def bm25(docs: DataFrame, k1: Double = 1.2, b: Double = 0.75,
           textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val lens = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("doc_len"))
    val dfx = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val corpus = lens.agg(count(lit(1)).as("n_docs"),
      (sum(col("doc_len")).cast("double") / count(lit(1))).as("avg_len"))
    val idf = log((col("n_docs").cast("double") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val tfNorm = (col("tf") * (k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("doc_len") / col("avg_len")))
    tf.join(dfx, "term").join(lens, "doc_id").crossJoin(broadcast(corpus))
      .withColumn("bm25", floor(idf * tfNorm * 1e6 + 0.5) / 1e6)
      .select(col("doc_id"), col("term"), col("tf"), col("doc_len"), col("bm25"))
  }

  /** Quality features + score. Score favors documents that are long enough
    * and have a natural stopword ratio; deterministic arithmetic only.
    */
  def qualityFeatures(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                      stopwords: Seq[String] = Seq("the", "a", "of", "and", "in", "to", "is")): DataFrame = {
    val w = words(col(textCol))
    val nWords = size(w)
    val nonSpaceLen = length(regexp_replace(col(textCol), "\\s", ""))
    val stopCount = size(filter(w, x => x.isInCollection(stopwords)))
    val digitLen = length(regexp_replace(col(textCol), "[^0-9]", ""))
    docs.select(
      col(idCol).as("doc_id"),
      nWords.as("n_words"),
      (nonSpaceLen.cast("double") / nWords).as("avg_word_len"),
      (stopCount.cast("double") / nWords).as("stopword_ratio"),
      (digitLen.cast("double") / greatest(nonSpaceLen, lit(1))).as("digit_ratio"))
      .withColumn("quality_score",
        least(lit(1.0), col("n_words") / 100.0) * (lit(1.0) - abs(col("stopword_ratio") - 0.4)))
  }

  /** Heuristic language ID: per-language marker-word hit counts, argmax with
    * alphabetical tie-break, 'und' when nothing matches. (A real n-gram
    * profile model slots into the same shape; the operator contract is the
    * deterministic argmax.)
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "die", "nicht", "ist"),
    "en" -> Seq("the", "and", "of", "is", "a"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  def languageId(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = words(col(textCol))
    val scored = langProfiles.foldLeft(docs.select(col(idCol).as("doc_id"), w.as("__w"))) {
      case (df, (lang, markers)) =>
        df.withColumn(s"score_$lang", size(filter(col("__w"), x => x.isInCollection(markers))))
    }
    // argmax with alphabetical tie-break: langProfiles is sorted, greatest()
    // keeps the first on ties because later candidates must be strictly bigger.
    val best = langProfiles.map { case (lang, _) => col(s"score_$lang") }
      .reduce((a, b) => greatest(a, b))
    val pred = langProfiles.reverse.foldLeft(lit("und")) { case (acc, (lang, _)) =>
      when(col(s"score_$lang") === best && best > 0, lit(lang)).otherwise(acc)
    }
    scored.withColumn("top_score", best).withColumn("pred_lang", pred)
      .select(col("doc_id"), col("pred_lang"), col("top_score"))
  }

  /** Polynomial k-gram hash terms (base 131): char codes are < 256 and
    * 131^7 * 255 * 8 stays far inside int64, so no modulus is needed and
    * the arithmetic is identical on any engine. `elem(j)` renders the code
    * of the character at offset j from the window position — an O(1)
    * array-index into a precomputed code array, NEVER `substr(s, i, 1)`
    * (substring-by-char-index is O(i) on UTF8 strings, which turns the
    * whole fingerprint quadratic; measured 25s vs ~1s at sf0.1).
    */
  def polyTerms(k: Int, litSuffix: String)(elem: Int => String): String = {
    val pows = Array.iterate(1L, k)(_ * 131L).reverse
    (0 until k).map(j => s"${elem(j)} * ${pows(j)}$litSuffix").mkString(" + ")
  }

  /** Document fingerprints: md5 of the normalized text plus a winnowing-style
    * minimum over polynomial character k-gram hashes (min-hash of k-grams is
    * order-robust and cheap to compare).
    */
  def fingerprints(docs: DataFrame, k: Int = 8, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // map-only, no explode and no shuffle (the grouped-explode version
    // shuffled one row per character of the corpus); the min over k-gram
    // hashes is one zero-allocation codegen'd call per document
    // ([[graft.expressions.WinnowMin]] — see its scaladoc for the measured
    // costs of the composed-expression alternatives)
    val norm = lower(regexp_replace(trim(col(textCol)), "\\s+", " "))
    docs.select(col(idCol).as("doc_id"), norm.as("__norm"))
      .select(col("doc_id"), md5(col("__norm")).as("fp_md5"),
        graft.expressions.WinnowMin(col("__norm"), k).as("winnow_min"))
  }

  /** PII patterns shared by the redactor and its oracle: RE2-compatible (no
    * backrefs/lookaround), so Spark's Java regex and DuckDB's RE2 match the
    * same spans.
    */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  /** PII redaction: emails then phone-shaped digit runs replaced with typed
    * tokens — the scrub step a training corpus runs before anything else.
    * Map-only (two regex passes per document, no shuffle); emits match
    * counts for audit plus the digest of the redacted text (oracle-friendly
    * without shipping the full redacted body through the gate). Phones are
    * counted after email redaction so an address's digits can't double-count.
    * Output: (doc_id, n_emails, n_phones, redacted_md5).
    */
  def redactPii(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val noEmail = regexp_replace(col(textCol), EmailRe, "<EMAIL>")
    docs.select(col(idCol).as("doc_id"),
      size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(noEmail, lit(PhoneRe), lit(0))).as("n_phones"),
      md5(regexp_replace(noEmail, PhoneRe, "<PHONE>")).as("redacted_md5"))
  }

  /** Shard-local greedy sequence packing: documents stream in id order
    * within a deterministic shard (`doc_id mod shards`) and land in the bin
    * their exclusive prefix token count reaches — the "concatenate and cut
    * every `budget` tokens" packing every LLM pretraining pipeline runs
    * before batching. Per-shard windows keep it scale-safe: a global
    * ordering would serialize 100 TB through one partition, while shards
    * pack independently (each training shard is its own file anyway).
    * Output: (doc_id, n_tokens, shard, bin, bin_offset).
    */
  def packSequences(docs: DataFrame, budget: Int, shards: Int = 32,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs.select(col(idCol).as("doc_id"),
        size(words(col(textCol))).cast("long").as("n_tokens"),
        pmod(col(idCol), lit(shards)).as("shard"))
      .withColumn("cum_excl", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", expr(s"cum_excl div $budget"))
      .withColumn("bin_offset", col("cum_excl") - col("bin") * budget)
      .drop("cum_excl")
  }

  /** Deterministic vocabulary build over lowercased whitespace tokens:
    * document frequency + collection frequency per term, `minDf` floor,
    * top-`topK` by (df desc, cf desc, term asc) — a total order, so the
    * vocabulary is reproducible across runs and engines. The selection is a
    * global sort+limit (plans as TakeOrderedAndProject: per-partition
    * top-K then a K-sized merge — a web-scale vocab never lands on one
    * partition, which a global ranking window would force). Ranks are then
    * zipped onto the sorted take on the DRIVER: the take is bounded at
    * `topK` rows by construction (the MLlib bounded-collect pattern, same
    * as the IVF centroid path), so no Window operator — and no
    * single-partition WARN — appears anywhere in the plan.
    * Output: (term, df, cf, rank).
    */
  def vocabulary(docs: DataFrame, minDf: Int, topK: Int,
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val terms = docs.select(col(idCol).as("doc_id"),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
    val stats = terms.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("cf"))
      .filter(col("df") >= minDf)
    val top = stats.orderBy(col("df").desc, col("cf").desc, col("term").asc).limit(topK)
      .select(col("term"), col("df"), col("cf")).as[(String, Long, Long)].collect()
    top.zipWithIndex.toSeq
      .map { case ((term, df, cf), i) => (term, df, cf, i + 1) }
      .toDF("term", "df", "cf", "rank")
  }
}
