package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Config-driven corpus quality filtering — the C4/RefinedWeb-shaped
  * cleaning pass every pretraining pipeline runs before dedup.
  *
  * Each rule compiles to a codegen'd column predicate and the whole
  * config folds into ONE conjunction evaluated scan-side: a quality
  * pass over 100 TB is a single map-only scan with no shuffle, no
  * UDFs, and column pruning intact (only the columns the enabled
  * rules touch are read). Disabled rules (None) cost nothing — they
  * never enter the predicate.
  */
object QualityFilters {

  /** All thresholds optional: None disables the rule. */
  final case class FilterConfig(
      minChars: Option[Int] = None,
      maxChars: Option[Int] = None,
      minWords: Option[Int] = None,
      maxWords: Option[Int] = None,
      maxPunctRatio: Option[Double] = None,     // punct chars / text chars
      minMeanWordLen: Option[Double] = None,
      maxMeanWordLen: Option[Double] = None,
      minUniqueWordRatio: Option[Double] = None, // distinct words / words
      langAllow: Seq[String] = Nil)              // empty = all languages

  /** The combined keep-predicate for `config` over (textCol, langCol).
    * Word rules tokenize TRIMMED text (a padded doc must not count
    * leading/trailing whitespace as an extra empty "word"), and mean
    * word length sums actual token lengths — `length(text)/nWords`
    * would count the separators and overestimate by ~1.
    *
    * Degenerate docs (empty/whitespace-only text ⇒ zero denominators)
    * get every ratio defined as 0 rather than NULL: max-style rules
    * pass them, min-style rules fail them — deterministic either way,
    * never a silent NULL-drop when only max-rules are configured.
    */
  def predicate(config: FilterConfig, text: Column, lang: Column): Column = {
    val words = TextAnalysis.words(trim(text))
    val nWords = size(words)
    // ratio with a zero-denominator guard: empty docs score 0
    def ratio(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den).otherwise(lit(0.0))
    lazy val meanWordLen =
      ratio(aggregate(transform(words, w => length(w)), lit(0), _ + _), nWords)
    val rules = Seq(
      config.minChars.map(v => length(text) >= v),
      config.maxChars.map(v => length(text) <= v),
      config.minWords.map(v => nWords >= v),
      config.maxWords.map(v => nWords <= v),
      config.maxPunctRatio.map(v =>
        ratio(TextAnalysis.punctCount(text), length(text)) <= v),
      config.minMeanWordLen.map(v => meanWordLen >= v),
      config.maxMeanWordLen.map(v => meanWordLen <= v),
      config.minUniqueWordRatio.map(v =>
        ratio(size(array_distinct(words)), nWords) >= v),
      if (config.langAllow.isEmpty) None
      else Some(lang.isin(config.langAllow.map(l => l: Any): _*)),
    ).flatten
    rules.reduceOption(_ && _).getOrElse(lit(true))
  }

  /** Runs the filter. When the enabled rules are all expressible over
    * the single-pass `graft_text_stats` kernel (word, unique-word and
    * punctuation rules — everything except the mean-word-length pair,
    * which needs per-word length sums the kernel doesn't carry), the
    * scan tokenizes each document ONCE in one JIT'd loop instead of
    * once per rule through the interpreted HOF forms. `predicate`
    * stays the executable spec (OperatorSpec pins apply ≡ predicate
    * on adversarial docs across rule subsets); the kernel itself is
    * agreement-tested against the same column functions the oracle
    * replays, so oracle semantics are unchanged.
    */
  def apply(docs: DataFrame, textCol: String, langCol: String,
      config: FilterConfig): DataFrame = {
    val text = col(textCol)
    val lang = col(langCol)
    val needsMeanLen =
      config.minMeanWordLen.isDefined || config.maxMeanWordLen.isDefined
    val tokenRules = Seq(config.minWords, config.maxWords,
      config.minUniqueWordRatio.map(_ => 0), config.maxPunctRatio.map(_ => 0))
    if (needsMeanLen || tokenRules.forall(_.isEmpty))
      return docs.where(predicate(config, text, lang))
    // kernel route: ONE compiled pass per doc, GUARANTEED. A plain
    // Project(stats)+Filter(fields) shape does not guarantee it —
    // predicate pushdown substitutes the alias into the condition,
    // re-evaluating the kernel once per field access (measured 5x at
    // sf10: 17.9 s where one kernel pass costs ~5), and neither
    // filter-predicate codegen nor Catalyst's `With` common-expression
    // survives that substitution. The OncePerRow barrier (its scaladoc
    // documents the mechanism) pins the kernel in its own projection.
    // Rule split: cheap rules (char length, lang) filter BELOW the
    // projection — they reach the parquet scan as pushed filters and
    // shrink the rows the kernel ever touches; kernel rules filter
    // above it.
    import org.apache.spark.sql.graftbridge.SparkBridge
    val cheap = Seq(
      config.minChars.map(v => length(text) >= v),
      config.maxChars.map(v => length(text) <= v),
      if (config.langAllow.isEmpty) None
      else Some(lang.isin(config.langAllow.map(l => l: Any): _*)),
    ).flatten
    val st = SparkBridge.column(graft.functions.OncePerRow(
      SparkBridge.expression(
        graft.functions.TextKernelFunctions.textStats(trim(text)))))
    def ratio(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den).otherwise(lit(0.0))
    val qs = col("__graft_qs")
    val kernelRules = Seq(
      config.minWords.map(v => qs.getField("n_words") >= v),
      config.maxWords.map(v => qs.getField("n_words") <= v),
      config.maxPunctRatio.map(v =>
        ratio(qs.getField("n_punct"), length(text)) <= v),
      config.minUniqueWordRatio.map(v =>
        ratio(qs.getField("n_uniq"), qs.getField("n_words")) >= v),
    ).flatten
    cheap.reduceOption(_ && _).map(docs.where).getOrElse(docs)
      .withColumn("__graft_qs", st)
      .where(kernelRules.reduce(_ && _))
      .drop("__graft_qs")
  }
}
