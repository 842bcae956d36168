package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned / distribution-matching data-selection operators — the family
  * that decides WHICH documents enter the training mix (as opposed to the
  * rule-based filters in [[TextStats]] and the duplicate machinery in
  * [[Dedup]]):
  *
  *   - DSIR (Xie et al., NeurIPS 2023 "Data Selection for Language Models
  *     via Importance Resampling"): hashed-n-gram importance weights that
  *     score every raw document by how target-like its feature distribution
  *     is. The published recipe is float log-likelihood ratios; here the
  *     per-bucket log-ratio is QUANTIZED to integer floor-log2 (the same
  *     binary-digit-count trick as [[TextStats.bigramSurprisal]] and the
  *     HLL rho), so every document score is an exact integer that
  *     hash-gates cross-engine — no libm, no reduction-order channel.
  *   - A multinomial Naive Bayes quality classifier — the role fastText
  *     plays in the GPT-3 / LLaMA pipelines (train positive = a curated
  *     source, negative = the rest; keep raw documents the classifier
  *     scores positive). NB over token counts is the one classic text
  *     classifier whose training IS a groupBy — no SGD, no float
  *     accumulation order, fully SQL-replayable.
  *
  * Scale shape (both operators): one corpus tokenize pass; statistics
  * tables are bounded (DSIR: ≤ `buckets` rows — broadcast; NB: vocabulary-
  * sized, grows sublinearly — AQE-splittable join, same shape as
  * [[TextStats.rarityScore]]); per-doc scores are one map-side-combined
  * groupBy on the id. The corpus body never rides through a shuffle.
  */
object Selection {

  /** Integer floor-log2 via binary digit count (c >= 1). */
  private def flog2(c: Column): Column = (length(conv(c, 10, 2)) - 1).cast("long")

  /** Cross-engine feature-hash bucket: first 28 bits of md5, mod buckets
    * (DuckDB replays via `CAST(concat('0x', substr(md5(f),1,7)) AS
    * UBIGINT) % buckets`).
    */
  private def bucketOf(feat: Column, buckets: Int): Column =
    pmod(conv(substring(md5(feat), 1, 7), 16, 10).cast("long"), lit(buckets.toLong))

  /** Hashed unigram+bigram feature occurrences, one row per occurrence:
    * (idCol, __tgt, __b). The paper's feature space (§3.1: hashed n-grams,
    * unigrams and bigrams) with the n-gram extraction shared with
    * [[Fingerprints.shingles]]' windowing.
    */
  private def featureOccurrences(
      df: DataFrame,
      targetFilter: Column,
      idCol: String,
      textCol: String,
      buckets: Int
  ): DataFrame = {
    val toks = TextStats.tokens(col(textCol))
    val n = size(toks)
    val bigrams = when(
      n >= 2,
      transform(
        sequence(lit(0), n - 2),
        i => concat(element_at(toks, i + 1), lit(" "), element_at(toks, i + 2))
      )
    ).otherwise(array().cast("array<string>"))
    df.select(
      col(idCol).as("__id"),
      targetFilter.as("__tgt"),
      explode(concat(toks, bigrams)).as("__f")
    ).select(col("__id"), col("__tgt"), bucketOf(col("__f"), buckets).as("__b"))
  }

  /** DSIR importance scores: for every document, the quantized
    * log-importance weight of its hashed unigram+bigram bag under
    * target-vs-raw bucket distributions.
    *
    * Per bucket b (Laplace-smoothed, +1 over `buckets` extra mass):
    * {{{
    *   qlr(b) = (flog2(c_tgt(b)+1) − flog2(N_tgt+B)) − (flog2(c_raw(b)+1) − flog2(N_raw+B))
    * }}}
    * and `dsir_score(doc) = Σ_occurrences qlr(bucket(feature))` — an exact
    * integer (each term is a floor-log2 of an exact count). Documents from
    * the target slice itself are scored too (the paper scores the whole
    * raw pool; scoring the target rows costs nothing and gives the spec a
    * separation invariant: target-like docs score higher).
    *
    * At 100 TB: the bucket table is ≤ `buckets` rows at any corpus size —
    * explicitly broadcast — and the two normalizers are 1-row scalar cross
    * joins (the documented [[TextStats.tfidfTopTerms]] pattern). Selection
    * at scale is a threshold on the score (derive the cut from
    * hash-sampled quantiles, the [[Corpus.curriculumOrder]] discipline),
    * never a global sort.
    *
    * @param targetFilter rows where this is true form the target
    *                     distribution (e.g. `col("source") === "wiki"`)
    */
  def dsirScores(
      df: DataFrame,
      targetFilter: Column,
      idCol: String = "doc_id",
      textCol: String = "text",
      buckets: Int = 1024
  ): DataFrame = {
    require(buckets >= 2, "need at least 2 hash buckets")
    // read twice (bucket stats + the scoring join): snapshot the hashed
    // occurrences — (id, bool, long) rows, a fraction of corpus bytes —
    // rather than re-running the explode+md5 extraction per reference
    // (the Similarity.scala cache-lifecycle idiom; at multi-hour scale
    // prefer checkpoint() with a reliable dir, same shape)
    val occ = featureOccurrences(df, targetFilter, idCol, textCol, buckets).localCheckpoint(true)
    val bucketStats = occ
      .groupBy("__b")
      .agg(
        count(lit(1)).as("__craw"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("__ctgt")
      )
    val totals = bucketStats.agg(
      sum("__craw").as("__nraw"),
      sum("__ctgt").as("__ntgt")
    )
    val qlr = bucketStats
      .crossJoin(totals) // 1-row scalar: constant-cost broadcast at any scale
      .select(
        col("__b"),
        ((flog2(col("__ctgt") + 1L) - flog2(col("__ntgt") + buckets.toLong)) -
          (flog2(col("__craw") + 1L) - flog2(col("__nraw") + buckets.toLong))).as("__qlr")
      )
    val scored = occ
      .join(broadcast(qlr), "__b") // ≤ buckets rows at any corpus size
      .groupBy("__id")
      .agg(count(lit(1)).as("n_features"), sum("__qlr").as("dsir_score"))
    df.select(col(idCol))
      .join(scored.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_features"), lit(0L)).as("n_features"),
        coalesce(col("dsir_score"), lit(0L)).as("dsir_score")
      )
  }

  /** Multinomial Naive Bayes quality scores, trained in-engine on a label
    * column and scored over the same corpus (the GPT-3/LLaMA fastText
    * shape: positive = curated source, negative = everything else; a raw
    * document that scores positive "looks curated").
    *
    * Training is exactly two aggregations: per-token class occurrence
    * counts and the class totals. The per-token weight is the quantized
    * Laplace-smoothed log-likelihood ratio
    * {{{
    *   w(t) = (flog2(c_pos(t)+1) − flog2(T_pos+V)) − (flog2(c_neg(t)+1) − flog2(T_neg+V))
    * }}}
    * and `nb_score(doc) = prior + Σ_occurrences w(token)` with
    * `prior = flog2(n_posdocs+1) − flog2(n_negdocs+1)` — every term an
    * integer, so scores hash-gate cross-engine. `nb_positive = score > 0`
    * is the keep decision.
    *
    * At 100 TB: the weight table is vocabulary-sized (sublinear in corpus
    * bytes) and joins against token occurrences AQE-skew-splittable (the
    * [[TextStats.rarityScore]] shape — do NOT broadcast-hint a 100 TB
    * corpus's vocabulary); class totals and the prior are 1-row scalar
    * cross joins. Scoring a DIFFERENT corpus with a trained weight table
    * is the same join with a left join + the OOV constant
    * `flog2(T_neg+V) − flog2(T_pos+V)` in the coalesce.
    */
  def nbQualityScores(
      df: DataFrame,
      positive: Column,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val occ = df.select(
      col(idCol).as("__id"),
      positive.as("__pos"),
      explode(TextStats.tokens(col(textCol))).as("__tok")
    ).localCheckpoint(true) // read by training AND scoring — snapshot once
    val vocabStats = occ
      .groupBy("__tok")
      .agg(
        sum(when(col("__pos"), 1L).otherwise(0L)).as("__cpos"),
        sum(when(col("__pos"), 0L).otherwise(1L)).as("__cneg")
      )
    val classTotals = vocabStats.agg(
      sum("__cpos").as("__tpos"),
      sum("__cneg").as("__tneg"),
      count(lit(1)).as("__v")
    )
    val weights = vocabStats
      .crossJoin(classTotals) // 1-row scalar: constant-cost broadcast at any scale
      .select(
        col("__tok"),
        ((flog2(col("__cpos") + 1L) - flog2(col("__tpos") + col("__v"))) -
          (flog2(col("__cneg") + 1L) - flog2(col("__tneg") + col("__v")))).as("__w")
      )
    val docScores = occ
      .join(weights, "__tok") // vocab-sized, AQE-splittable — never broadcast at scale
      .groupBy("__id")
      .agg(count(lit(1)).as("n_tokens"), sum("__w").as("__tokscore"))
    val prior = df.agg(
      (flog2(sum(when(positive, 1L).otherwise(0L)) + 1L) -
        flog2(sum(when(positive, 0L).otherwise(1L)) + 1L)).as("__prior")
    )
    df.select(col(idCol), positive.as("is_positive_label"))
      .join(docScores.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .crossJoin(prior) // 1-row scalar
      .select(
        col(idCol),
        col("is_positive_label"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        (coalesce(col("__tokscore"), lit(0L)) + col("__prior")).as("nb_score"),
        ((coalesce(col("__tokscore"), lit(0L)) + col("__prior")) > 0L).as("nb_positive")
      )
  }

  /** Above-corpus-mean DSIR selection: keep docs whose score is at or
    * above the corpus mean, decided by CROSS-MULTIPLICATION
    * (`score·n ≥ Σscore`) rather than an integer-divided mean — DSIR
    * scores go negative, and integer division SEMANTICS differ across
    * engines on negatives (Spark's `div` truncates toward zero, DuckDB's
    * `//` floors), so a divided mean is a cross-engine hash trap the
    * multiply form sidesteps entirely. Magnitude envelope: |score| is
    * corpus-size-independent (~tens), so score·n stays far below 2^63 at
    * any corpus size. The corpus-relative rule is what survives SF/corpus
    * drift — an absolute threshold measured months apart selects a
    * different fraction (observed here: median −8 at sf0.01 vs +23 at
    * sf0.1 for identical generation parameters).
    */
  def dsirAboveMean(scored: DataFrame, idCol: String = "doc_id"): DataFrame =
    scored
      .crossJoin( // 1-row scalar: constant-cost broadcast at any scale
        scored.agg(sum("dsir_score").as("__ts"), count(lit(1)).as("__n"))
      )
      .select(
        col(idCol),
        col("n_features"),
        col("dsir_score"),
        (col("dsir_score") * col("__n") >= col("__ts")).as("dsir_keep")
      )

  // Cross-corpus NB scoring — the production shape: train on the labeled
  // corpus ([[nbFit]]), score UNLABELED ingest batches ([[nbScore]]).
  // Batch tokens absent from the training vocabulary take the OOV weight
  // flog2(T_neg+V) − flog2(T_pos+V) (the Laplace mass both classes give an
  // unseen token), applied as n_oov · oov_w — one scalar multiply, so the
  // left join stays a plain vocab join with a null-count aggregate.
  // Scale: vocab-sized weight join on the BATCH's occurrences (batch-sized,
  // not corpus-sized); constants are 1-row scalar cross joins; training
  // reads the corpus exactly once.

  /** A fitted NB model: the per-token weight table and the 1-row constants
    * table (prior + OOV weight). Both are snapshotted at fit time —
    * the model is FROZEN, so scoring many batches (or a stream's
    * micro-batches) re-reads the materialized tables instead of
    * re-deriving them from the training corpus per batch.
    *
    * Lifecycle caveat (same as Similarity's checkpoint idiom): the
    * default fit snapshots with `localCheckpoint`, which truncates
    * lineage — the blocks live on executors and do NOT survive executor
    * loss, so a multi-hour streaming job scoring with this model dies
    * unrecoverably if a holder executor is lost. For that shape fit with
    * `nbFit(..., reliable = true)` (requires
    * `spark.sparkContext.setCheckpointDir`): the tables are written to
    * the reliable checkpoint store and any executor can re-read them.
    * Call [[release]] when the model is retired to drop the cached
    * blocks eagerly instead of waiting for the ContextCleaner.
    */
  final case class NbModel(weights: DataFrame, consts: DataFrame) {

    /** Eagerly drop the model's cached blocks (no-op on already-released
      * or reliably-checkpointed models — those blocks are files, not
      * storage-level cache). Safe to call once scoring is finished.
      */
    def release(): Unit = {
      weights.unpersist(blocking = false)
      consts.unpersist(blocking = false)
    }
  }

  /** Train the NB model: one corpus tokenize pass, two aggregations.
    * See [[nbQualityScores]] for the weight formula. `reliable = true`
    * freezes the model via reliable `checkpoint` (survives executor
    * loss — use for multi-hour streaming scorers; needs a checkpoint
    * dir) instead of the default executor-local snapshot.
    */
  def nbFit(
      corpus: DataFrame,
      positive: Column,
      textCol: String = "text",
      reliable: Boolean = false
  ): NbModel = {
    def freeze(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(true) else df.localCheckpoint(true)
    val occ = corpus.select(
      positive.as("__pos"),
      explode(TextStats.tokens(col(textCol))).as("__tok")
    )
    val vocabStats = occ
      .groupBy("__tok")
      .agg(
        sum(when(col("__pos"), 1L).otherwise(0L)).as("__cpos"),
        sum(when(col("__pos"), 0L).otherwise(1L)).as("__cneg")
      )
    val classTotals = freeze( // feeds the weight projection AND the consts row
      vocabStats.agg(
        sum("__cpos").as("__tpos"),
        sum("__cneg").as("__tneg"),
        count(lit(1)).as("__v")
      )
    )
    val weights = freeze(
      vocabStats
        .crossJoin(classTotals) // 1-row scalar: constant-cost broadcast at any scale
        .select(
          col("__tok"),
          ((flog2(col("__cpos") + 1L) - flog2(col("__tpos") + col("__v"))) -
            (flog2(col("__cneg") + 1L) - flog2(col("__tneg") + col("__v")))).as("__w")
        )
    )
    val consts = freeze(
      corpus
        .agg(
          (flog2(sum(when(positive, 1L).otherwise(0L)) + 1L) -
            flog2(sum(when(positive, 0L).otherwise(1L)) + 1L)).as("__prior")
        )
        .crossJoin(classTotals)
        .select(
          col("__prior"),
          (flog2(col("__tneg") + col("__v")) - flog2(col("__tpos") + col("__v"))).as("__oovw")
        )
    )
    NbModel(weights, consts)
  }

  /** Score one (micro-)batch under a fitted model — the scoring half of
    * [[nbScoreAgainst]], usable from `foreachBatch` on a stream: per-doc
    * scores depend only on the batch's own rows and the frozen model, so
    * micro-batch boundaries cannot change any score.
    */
  def nbScore(
      batch: DataFrame,
      model: NbModel,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val batchScores = batch
      .select(col(idCol).as("__id"), explode(TextStats.tokens(col(textCol))).as("__tok"))
      .join(model.weights, Seq("__tok"), "left") // vocab-sized, AQE-splittable
      .groupBy("__id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__w").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(coalesce(col("__w"), lit(0L))).as("__known")
      )
    batch
      .select(col(idCol))
      .join(batchScores.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .crossJoin(model.consts) // 1-row scalar
      .select(
        col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        (coalesce(col("__known"), lit(0L)) +
          coalesce(col("n_oov"), lit(0L)) * col("__oovw") + col("__prior")).as("nb_score"),
        ((coalesce(col("__known"), lit(0L)) +
          coalesce(col("n_oov"), lit(0L)) * col("__oovw") + col("__prior")) > 0L).as("nb_positive")
      )
  }

  // Multiclass NB (round 13) — the language-ID shape: C classes instead
  // of a positive/negative pair, same quantized integer-LLR discipline
  // (flog2 Laplace weights — cross-engine hash-exact where float log
  // likelihoods would be at the mercy of libm ULPs). The weight table is
  // DENSE over vocab × classes (an unseen (feature, class) pair carries
  // the Laplace floor flog2(1) − flog2(T_c + V)), so scoring is ONE
  // vocab join producing C rows per in-vocab occurrence. Scale: weights
  // are (vocab · C)-sized, priors C rows (broadcast); the corpus is read
  // once at fit and the batch shuffles only on (id, class) aggregates.

  /** A fitted multiclass NB model: dense per-(feature, class) weights and
    * the C-row priors table (class prior + per-class OOV weight). Frozen
    * at fit like [[NbModel]] — same lifecycle caveats and [[NbModel.release]]
    * semantics.
    */
  final case class NbMultiModel(weights: DataFrame, priors: DataFrame) {

    /** Eagerly drop the model's cached blocks (see [[NbModel.release]]). */
    def release(): Unit = {
      weights.unpersist(blocking = false)
      priors.unpersist(blocking = false)
    }
  }

  /** Train the multiclass NB model on `corpus`: label per row from
    * `labelCol`, feature multiset per row from the `feats` array column
    * (token n-grams, char n-grams — [[TextStats.charNgrams]] for
    * language ID). One corpus pass, two vocab-sized aggregations, one
    * (vocab × C) dense-weight projection.
    *
    * Per-class weight: w(f, c) = flog2(count(f, c) + 1) − flog2(T_c + V)
    * (Laplace-smoothed multinomial with the shared train vocabulary V);
    * prior(c) = flog2(n_c + 1); OOV weight per class = −flog2(T_c + V)
    * (the floor mass every class gives a feature absent from the train
    * vocab — applied at scoring as n_oov · oovw, one scalar multiply).
    */
  def nbFitMulti(
      corpus: DataFrame,
      labelCol: String,
      feats: Column,
      reliable: Boolean = false
  ): NbMultiModel = {
    def freeze(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(true) else df.localCheckpoint(true)
    val occ = corpus.select(col(labelCol).as("__lab"), explode(feats).as("__tok"))
    val counts = occ.groupBy("__tok", "__lab").agg(count(lit(1)).as("__c"))
    val labTotals = occ.groupBy("__lab").agg(count(lit(1)).as("__t"))
    val vdf = occ.agg(countDistinct(col("__tok")).as("__v")) // 1-row scalar
    val weights = freeze(
      occ
        .select("__tok")
        .distinct()
        .crossJoin(broadcast(labTotals)) // C rows: vocab × classes dense grid
        .join(counts, Seq("__tok", "__lab"), "left")
        .crossJoin(vdf)
        .select(
          col("__tok"),
          col("__lab"),
          (flog2(coalesce(col("__c"), lit(0L)) + 1L) - flog2(col("__t") + col("__v"))).as("__w")
        )
    )
    val priors = freeze(
      corpus
        .groupBy(col(labelCol).as("__lab"))
        .agg(count(lit(1)).as("__n"))
        .join(labTotals, Seq("__lab"))
        .crossJoin(vdf)
        .select(
          col("__lab"),
          flog2(col("__n") + 1L).as("__prior"),
          (lit(0L) - flog2(col("__t") + col("__v"))).as("__oovw")
        )
    )
    NbMultiModel(weights, priors)
  }

  /** Score a batch under a fitted multiclass model and return each row's
    * argmax class: (idCol, nb_lang, nb_score, n_feats). Ties break on the
    * smallest class label (deterministic, SQL-replayable). Rows with an
    * EMPTY feature array produce no output (no evidence, no verdict) —
    * mirror the convention on the oracle side. Per-micro-batch safe: a
    * row's score depends only on its own features and the frozen model.
    */
  def nbScoreMulti(
      batch: DataFrame,
      model: NbMultiModel,
      idCol: String,
      feats: Column
  ): DataFrame = {
    val occ = batch.select(col(idCol).as("__id"), explode(feats).as("__tok"))
    val known = occ
      .join(model.weights, Seq("__tok")) // C rows per in-vocab occurrence
      .groupBy("__id", "__lab")
      .agg(sum("__w").as("__known"), count(lit(1)).as("__nk"))
    val tot = occ.groupBy("__id").agg(count(lit(1)).as("__nf"))
    val scored = tot
      .crossJoin(broadcast(model.priors)) // C rows per doc
      .join(known, Seq("__id", "__lab"), "left")
      .select(
        col("__id"),
        col("__lab"),
        col("__nf"),
        (coalesce(col("__known"), lit(0L)) +
          (col("__nf") - coalesce(col("__nk"), lit(0L))) * col("__oovw") +
          col("__prior")).as("__score")
      )
    scored
      .groupBy("__id")
      .agg(
        min_by(
          struct(col("__lab"), col("__score")),
          struct((-col("__score")).as("s"), col("__lab").as("l"))
        ).as("__best"),
        first(col("__nf")).as("n_feats")
      )
      .select(
        col("__id").as(idCol),
        col("__best.__lab").as("nb_lang"),
        col("__best.__score").as("nb_score"),
        col("n_feats")
      )
  }

  /** Train-then-score in one call: [[nbFit]] on the labeled corpus,
    * [[nbScore]] on the batch. See those for the per-piece shapes.
    */
  def nbScoreAgainst(
      corpus: DataFrame,
      batch: DataFrame,
      positive: Column,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame =
    nbScore(batch, nbFit(corpus, positive, textCol), idCol, textCol)
}
