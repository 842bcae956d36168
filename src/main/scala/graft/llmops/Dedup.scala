package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash-LSH near-dup, SimHash near-dup, exact n-gram Jaccard.
  *
  * 100 TB design rules baked in:
  *   - NO all-pairs comparison anywhere. Candidate pairs come from bucketed
  *     equi-joins (LSH bands / shared shingles / SimHash bands) — the only
  *     shuffles are on those bucket keys.
  *   - exact dedup shuffles a 32-char content hash, never the document body
  *     twice (the window ranks within hash partitions).
  *   - skew guard: pathological buckets (e.g. a boilerplate shingle shared
  *     by millions of docs) are dropped via `maxBucket`/`maxDf` caps —
  *     at 100 TB an uncapped hot bucket is a guaranteed straggler.
  */
object Dedup {

  /** Soft dedup (duplicate downweighting): keep EVERY copy, but weight each
    * row 1/count(key) so repeated content contributes one document's worth
    * of training mass in expectation — the alternative pipelines reach for
    * when hard dedup is too aggressive (templated-but-meaningful pages,
    * boilerplate-heavy domains). Adds `n_copies` and `weight` columns.
    * One hash-key aggregation (32-char keys, map-side partial) + a join
    * back on the key; the weight is one exact IEEE division of integers
    * per row, so it hash-gates cross-engine.
    *
    * `n_copies` and `weight` are RESERVED output names and `__k` a
    * reserved scratch name: an input already carrying any of them is
    * rejected loudly (withColumn would silently replace `__k`, and the
    * join-back would emit duplicate/ambiguous `n_copies`/`weight`
    * columns — round-9 advisor finding), instead of producing a
    * corrupted frame.
    */
  def softDedup(df: DataFrame, key: Column): DataFrame = {
    val reserved = Seq("__k", "n_copies", "weight").filter(df.columns.contains)
    require(
      reserved.isEmpty,
      s"softDedup reserves column name(s) ${reserved.mkString(", ")}; rename them on the input first"
    )
    val keyed = df.withColumn("__k", key)
    val counts = keyed.groupBy("__k").agg(count(lit(1)).as("n_copies"))
    keyed
      .join(counts, Seq("__k"))
      .withColumn("weight", lit(1.0) / col("n_copies"))
      .drop("__k")
  }

  /** Exact dedup: keep the row with the smallest `tieBreak` per identical
    * `key`. One shuffle on the content hash; window within hash partitions.
    */
  def dedupExact(df: DataFrame, key: Column, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(tieBreak)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Paragraph-level boilerplate removal (the C4/RefinedWeb "repeated
    * spans" step, at paragraph granularity): a paragraph (a `sep`-split
    * segment of `textCol`) appearing in MORE than `maxDocs` distinct
    * documents is boilerplate (nav bars, cookie banners, license
    * headers) and is removed from EVERY document; surviving paragraphs
    * are reassembled in their original order (`clean_text`, '' when
    * everything was boilerplate). Emits (input columns…, n_paragraphs,
    * n_kept, clean_text).
    *
    * Scale shape: one explode (row-local), one hash aggregation over the
    * paragraph universe for the distinct-doc counts — keyed on the
    * paragraphs' md5 so the count shuffle and the anti-join carry 32-char
    * hashes, never paragraph bodies (the count table is paragraph-
    * cardinality, not corpus-cardinality) — then one per-doc regroup (the
    * only shuffle that moves text, and it must: reassembly needs it). No
    * self-joins, no windows over the corpus; order reassembly sorts
    * WITHIN each doc's collected list (array_sort on (pos, para) structs
    * — row-local). Exact and engine-portable: paragraph identity is byte
    * equality (md5 is collision-free for any realistic paragraph
    * universe, and both engines hash identically), counts are integers.
    */
  def dropRepeatedParagraphs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDocs: Int,
      sep: String = "\n"
  ): DataFrame = {
    require(maxDocs >= 1, "maxDocs must be at least 1")
    val paras = df
      .select(col(idCol).as("__pid"), posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep), -1)).as(Seq("__pos", "__para")))
      .withColumn("__ph", md5(col("__para")))
    val boilerplate = paras
      .groupBy("__ph")
      .agg(countDistinct(col("__pid")).as("__docs"))
      .filter(col("__docs") > maxDocs)
      .select("__ph")
    val kept = paras
      .join(boilerplate, Seq("__ph"), "left_anti")
      .groupBy(col("__pid"))
      .agg(
        count(lit(1)).as("__nkept"),
        array_join(
          transform(array_sort(collect_list(struct(col("__pos"), col("__para")))), s => s.getField("__para")),
          sep
        ).as("__clean")
      )
    df.withColumn("n_paragraphs", size(split(col(textCol), java.util.regex.Pattern.quote(sep), -1)).cast("long"))
      .join(kept, col(idCol) === col("__pid"), "left")
      .withColumn("n_kept", coalesce(col("__nkept"), lit(0L)).cast("long"))
      .withColumn("clean_text", coalesce(col("__clean"), lit("")))
      .drop("__pid", "__nkept", "__clean")
  }

  /** Duplicated k-token span detection — the exact-substring dedup signal
    * (Gopher / RefinedWeb remove verbatim repeated spans, not just whole
    * near-dup documents) at sliding-window granularity, in the form that
    * distributes: every k-token window is fingerprinted (md5 of the
    * space-joined window); the CANONICAL occurrence of a fingerprint is
    * the (doc, pos)-smallest one, every other occurrence is duplicated;
    * consecutive duplicated windows merge into maximal spans. Emits
    * (idCol, span_start, span_end, n_windows) with token-index bounds —
    * the spans a removal pass would cut (suffix arrays give the same
    * answer but have no good distributed form; window fingerprints are
    * the standard Spark lowering).
    *
    * Scale shape: windows explode row-locally (n windows per doc);
    * canonicalization is ONE corpus-wide window function partitioned by
    * fingerprint (hash-partitioned shuffle on the 32-char md5 — bodies
    * never shuffle); span merging is per-doc (partitioned by id). Fully
    * deterministic — both window orders are total — hence engine-exact.
    */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 2, "k must be at least 2 (single-token spans are stopword noise)")
    val base = df
      .select(col(idCol).as("__did"), split(col(textCol), " ", -1).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") >= k)
    // native codegen'd window generator (TokenWindows) — the interpreted
    // transform/slice/concat_ws HOF formulation of the same array is the
    // per-row hotspot class the round-5 verdict flagged; the spec asserts
    // bit identity between the two
    val wins = base
      .select(
        col("__did"),
        posexplode(graft.functions.native.tokenWindows(col("__toks"), k)).as(Seq("__pos", "__w"))
      )
      .select(col("__did"), col("__pos"), md5(col("__w")).as("__fp"))
    // canonicalization as a MIN-AGGREGATION, not a per-fingerprint window:
    // a boilerplate window repeated across millions of docs is a hot
    // fingerprint, and row_number() would sort all its occurrences in one
    // task (the classic straggler); min(struct(did,pos)) combines
    // map-side, and the join back is AQE-skew-splittable. Identical
    // result: an occurrence is duplicated iff it is not the
    // (doc,pos)-smallest for its fingerprint.
    val canon = wins.groupBy("__fp").agg(min(struct(col("__did"), col("__pos"))).as("__min"))
    val dups = wins
      .join(canon, "__fp")
      .filter(struct(col("__did"), col("__pos")) =!= col("__min"))
      .select(col("__did"), col("__pos"))
    val wDoc = Window.partitionBy("__did").orderBy("__pos")
    dups
      .withColumn("__isl", col("__pos") - row_number().over(wDoc))
      .groupBy(col("__did"), col("__isl"))
      .agg(
        min(col("__pos")).cast("long").as("span_start"),
        (max(col("__pos")) + lit(k - 1)).cast("long").as("span_end"),
        count(lit(1)).as("n_windows")
      )
      .select(col("__did").as(idCol), col("span_start"), col("span_end"), col("n_windows"))
  }

  /** Cut the spans [[duplicateSpans]] flags: tokens covered by any
    * duplicated k-window are removed, survivors rejoin in order
    * (`clean_text`, plus `n_kept_tokens`); the canonical (first)
    * occurrence of every span is untouched, so exactly one copy of any
    * repeated substring survives corpus-wide.
    *
    * Scale shape: the span table gates everything — docs WITHOUT spans
    * (the overwhelming majority of a real corpus) pass through with
    * `clean_text = text` via one anti semi-join and never explode; only
    * flagged docs pay the token explode + range-filtered anti-join
    * (equi on doc id, range on position — never a cross join) + per-doc
    * regroup. The span table is eagerly snapshotted (it feeds the flag
    * set AND the cut join; recomputing [[duplicateSpans]] twice would
    * double the fingerprint shuffle).
    *
    * `df` itself is read FOUR times (span build, flag anti-join, token
    * explode, touched re-join) and is deliberately NOT snapshotted here:
    * for the common case — a bare columnar scan — re-reading beats
    * materializing the corpus. Callers whose `df` is an expensive
    * computed stage (e.g. the output of [[dropRepeatedParagraphs]] in a
    * cleaning chain) should `localCheckpoint` it first; the capstone
    * query does exactly that.
    */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val spans = duplicateSpans(df, idCol, textCol, k)
      .select(col(idCol).as("__sid"), col("span_start"), col("span_end"))
      .localCheckpoint(true)
    val flagged = spans.select(col("__sid")).distinct()
    val untouched = df
      .join(flagged, col(idCol) === col("__sid"), "left_anti")
      .withColumn("n_kept_tokens", size(split(col(textCol), " ", -1)).cast("long"))
      .withColumn("clean_text", col(textCol))
    val toks = df
      .join(flagged, col(idCol) === col("__sid"), "left_semi")
      .select(col(idCol).as("__tid"), posexplode(split(col(textCol), " ", -1)).as(Seq("__i", "__t")))
    val keptAgg = toks
      .join(
        spans,
        col("__tid") === col("__sid") && col("__i") >= col("span_start") && col("__i") <= col("span_end"),
        "left_anti"
      )
      .groupBy(col("__tid"))
      .agg(
        count(lit(1)).as("__nk"),
        array_join(
          transform(array_sort(collect_list(struct(col("__i"), col("__t")))), s => s.getField("__t")),
          " "
        ).as("__clean")
      )
    val touched = df
      .join(flagged, col(idCol) === col("__sid"), "left_semi")
      .join(keptAgg, col(idCol) === col("__tid"), "left")
      .withColumn("n_kept_tokens", coalesce(col("__nk"), lit(0L)))
      .withColumn("clean_text", coalesce(col("__clean"), lit("")))
      .drop("__tid", "__nk", "__clean")
    untouched.unionByName(touched)
  }

  /** Exact k-token-shingle Jaccard similar pairs via an inverted-index
    * self-join: explode distinct shingles, equi-join on the shingle,
    * count shared shingles per pair, compute exact Jaccard, keep >= tau.
    *
    * Exact (not approximate): every pair with Jaccard >= tau shares at
    * least one shingle, so the inverted index finds it. Cost is bounded by
    * the shingle document-frequency distribution — cap it with `maxDf`
    * (drops shingles appearing in more than maxDf docs; boilerplate
    * shingles add candidates, not discrimination). maxDf = 0 disables the
    * cap (needed when an exact oracle must match).
    *
    * Returns (a, b, jaccard) with a < b. The Jaccard double is an
    * int/int division — deterministic across engines.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      tau: Double,
      maxDf: Int = 0
  ): DataFrame = {
    val withSh = df.select(col(idCol).as("__id"), Fingerprints.shingles(col(textCol), k).as("__sh"))
    val exploded = withSh.select(col("__id"), explode(col("__sh")).as("__s"))
    val filtered =
      if (maxDf <= 0) exploded
      else {
        val dfreq = exploded.groupBy("__s").agg(count(lit(1)).as("__df"))
        exploded.join(dfreq.filter(col("__df") <= maxDf).select("__s"), "__s")
      }
    // per-doc set sizes must come from the SAME (possibly df-capped) shingle
    // universe as the intersection counts, or the jaccard is biased low for
    // docs dominated by capped shingles.
    val counts = filtered.groupBy("__id").agg(count(lit(1)).as("__n"))
    val left = filtered.select(col("__id").as("a"), col("__s"))
    val right = filtered.select(col("__id").as("b"), col("__s").as("__s2"))
    val inter = left
      .join(right, col("__s") === col("__s2") && col("a") < col("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("__inter"))
    inter
      .join(counts.withColumnRenamed("__id", "a").withColumnRenamed("__n", "__na"), "a")
      .join(counts.withColumnRenamed("__id", "b").withColumnRenamed("__n", "__nb"), "b")
      .withColumn(
        "jaccard",
        col("__inter").cast("double") / (col("__na") + col("__nb") - col("__inter")).cast("double")
      )
      .filter(col("jaccard") >= tau)
      .select("a", "b", "jaccard")
  }

  /** Winnowing fingerprint MATCH pairs — the cross-document half of the
    * MOSS pipeline (Schleimer et al. 2003 §4: report documents sharing
    * selected fingerprints). [[Fingerprints.winnowFingerprints]] gives the
    * per-document selection with the guarantee that any shared token run
    * of length ≥ w+k−1 contributes a SHARED fingerprint; this operator
    * joins those selections on the fingerprint value and emits, per
    * ordered pair, the shared-fingerprint count and the directed coverage
    * `n_shared / |fp(a)|` — near 1 when `a` is substantially excerpted in
    * `b`. This is the scalable stand-in for exact substring dedup (Lee et
    * al. 2021 use suffix arrays single-node; winnowed fingerprints give
    * the same long-shared-run signal as an equi-join).
    *
    * Scale: identical discipline to [[ngramJaccardPairs]] — the join key
    * is the fingerprint, `maxDf` caps its document frequency BEFORE the
    * self-join (a boilerplate run selected in millions of docs would
    * otherwise create a quadratic bucket), and per-doc fingerprint counts
    * come from the capped universe so numerator and denominator are
    * computed CONSISTENTLY over the same (capped) fingerprint set. Note
    * the cap is not bias-free: a doc whose fingerprints are mostly
    * boilerplate (df > maxDf) keeps only its rarer fingerprints in the
    * denominator, so sharing a few of those reports elevated coverage —
    * callers tuning `tau` on heavily-capped corpora should expect the
    * coverage of boilerplate-dominated docs to read high, not low.
    * Winnowing itself already thins the join input to
    * ~2/(w+1) of the k-gram stream — this pair join moves strictly less
    * data than the shingle-level containment join at the same guarantee
    * length.
    */
  def winnowPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      w: Int,
      tau: Double,
      maxDf: Int = 0
  ): DataFrame = {
    val fps = Fingerprints.winnowFingerprints(df, idCol, textCol, k, w)
      .select(col(idCol).as("__id"), col("fp"))
      // read by the df-cap, the per-doc counts, and BOTH sides of the
      // self-join: snapshot once (the Similarity.scala cache-lifecycle
      // idiom) instead of replaying the per-gram md5 window chain 4×
      .localCheckpoint(true)
    val filtered =
      if (maxDf <= 0) fps
      else {
        val dfreq = fps.groupBy("fp").agg(count(lit(1)).as("__df"))
        fps.join(dfreq.filter(col("__df") <= maxDf).select("fp"), "fp")
      }
    val counts = filtered.groupBy("__id").agg(count(lit(1)).as("__n"))
    val left = filtered.select(col("__id").as("a"), col("fp"))
    val right = filtered.select(col("__id").as("b"), col("fp").as("__fp2"))
    val inter = left
      .join(right, col("fp") === col("__fp2") && col("a") =!= col("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("n_shared"))
    inter
      .join(counts.withColumnRenamed("__id", "a").withColumnRenamed("__n", "__na"), "a")
      .withColumn("coverage", col("n_shared").cast("double") / col("__na").cast("double"))
      .filter(col("coverage") >= tau)
      .select(col("a"), col("b"), col("n_shared"), col("coverage"))
  }

  /** Directed n-gram CONTAINMENT pairs — the excerpt/quote detector
    * Jaccard misses: containment C(a→b) = |S(a) ∩ S(b)| / |S(a)| is ~1
    * when doc `a` is a snippet of doc `b` even though their Jaccard is
    * tiny (|S(b)| dominates the union). Emits (a, b, containment) for
    * a ≠ b with containment ≥ tau — DIRECTED, so both orientations are
    * evaluated and only the contained side fires. Same shared-shingle
    * equi-join + `maxDf` universe-cap discipline as
    * [[ngramJaccardPairs]] (set sizes come from the capped universe, so
    * the capped containment stays unbiased); at scale the cap is what
    * keeps the join off stop-shingles.
    */
  def ngramContainmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      tau: Double,
      maxDf: Int = 0
  ): DataFrame = {
    val withSh = df.select(col(idCol).as("__id"), Fingerprints.shingles(col(textCol), k).as("__sh"))
    val exploded = withSh.select(col("__id"), explode(col("__sh")).as("__s"))
    val filtered =
      if (maxDf <= 0) exploded
      else {
        val dfreq = exploded.groupBy("__s").agg(count(lit(1)).as("__df"))
        exploded.join(dfreq.filter(col("__df") <= maxDf).select("__s"), "__s")
      }
    val counts = filtered.groupBy("__id").agg(count(lit(1)).as("__n"))
    val left = filtered.select(col("__id").as("a"), col("__s"))
    val right = filtered.select(col("__id").as("b"), col("__s").as("__s2"))
    val inter = left
      .join(right, col("__s") === col("__s2") && col("a") =!= col("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("__inter"))
    inter
      .join(counts.withColumnRenamed("__id", "a").withColumnRenamed("__n", "__na"), "a")
      .withColumn("containment", col("__inter").cast("double") / col("__na").cast("double"))
      .filter(col("containment") >= tau)
      .select("a", "b", "containment")
  }

  /** Incremental exact dedup — the ingest-time variant of [[dedupExact]]:
    * drop from `batch` every row whose content `key` already exists in the
    * previously-ingested index (`existingKeys`), then dedup within the
    * batch itself. At 100 TB the index side is the stored fingerprint
    * column (32-char hashes), never the historical corpus — one anti-join
    * against it plus one within-batch window, both shuffling hashes only.
    * The surviving rows' keys are exactly what gets appended to the index
    * for the next batch.
    */
  def dedupIncremental(
      batch: DataFrame,
      existingKeys: DataFrame,
      existingKeyCol: String,
      key: Column,
      tieBreak: Column
  ): DataFrame = {
    val withKey = batch.withColumn("__ck", key)
    val fresh = withKey.join(
      existingKeys.select(col(existingKeyCol).as("__ck")).distinct(),
      Seq("__ck"),
      "left_anti"
    )
    dedupExact(fresh, col("__ck"), tieBreak).drop("__ck")
  }

  /** Bloom-filter bit table of a value column: `kHashes` md5-derived bit
    * positions per distinct value over an `mBits`-bit filter, returned as
    * the distinct set-position table (pos). ≤ mBits rows regardless of
    * input size — the broadcastable form of a membership filter. Like every
    * sketch here, a pure function of the data (seeded md5, no RNG), so a
    * cross-engine oracle derives the identical bit set.
    */
  def bloomBits(values: DataFrame, valueCol: String, mBits: Int, kHashes: Int): DataFrame = {
    require(mBits >= 2, "Bloom filter needs mBits >= 2")
    require(kHashes >= 1, "Bloom filter needs kHashes >= 1")
    values
      .select(explode(array((0 until kHashes).map(lit): _*)).as("__j"), col(valueCol).as("__v"))
      .select(
        pmod(
          Sketches.hash56(concat(col("__j").cast("string"), lit(":"), col("__v"))),
          lit(mBits.toLong)
        ).as("pos")
      )
      .distinct()
  }

  /** [[contaminationLedger]] with a Bloom prefilter in front of the exact
    * overlap join — the 100 TB shape when even the held-out DISTINCT
    * SHINGLE set is too large to broadcast raw (a large eval suite: shingle
    * strings are tens of bytes each) but its bit set is not (mBits bits
    * total). Corpus shingles pass through `kHashes` successive broadcast
    * LEFT SEMI joins on their bit positions — all map-side, ZERO shuffle of
    * the corpus shingle table — and only the survivors (true overlaps +
    * Bloom false positives, a vanishing fraction of a clean corpus) reach
    * the exact shingle equi-join, which removes the false positives. Result
    * is therefore IDENTICAL to [[contaminationLedger]] (spec-asserted);
    * false-positive rate ≈ (1 − e^(−kn/m))^k, tunable via mBits.
    */
  def bloomContaminationLedger(
      corpus: DataFrame,
      heldout: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      mBits: Int,
      kHashes: Int
  ): DataFrame = {
    val corpusSh =
      corpus.select(col(idCol).as("__id"), explode(Fingerprints.shingles(col(textCol), k)).as("__s"))
    val heldSh = heldout.select(explode(Fingerprints.shingles(col(textCol), k)).as("__s")).distinct()
    val bits = bloomBits(heldSh, "__s", mBits, kHashes)
    val candidates = (0 until kHashes).foldLeft(corpusSh) { (d, j) =>
      d.join(
        broadcast(bits),
        pmod(
          Sketches.hash56(concat(lit(s"$j:"), col("__s"))),
          lit(mBits.toLong)
        ) === col("pos"),
        "left_semi"
      )
    }
    candidates
      .join(heldSh, "__s")
      .groupBy("__id")
      .agg(count(lit(1)).as("n_shared"))
      .select(col("__id").as(idCol), col("n_shared"))
  }

  /** Benchmark-contamination ledger: for each `corpus` doc, the number of
    * distinct k-token shingles it shares with the held-out `heldout`
    * corpus (an eval/test set that must not leak into training data).
    * Docs with a high count are near-copies of held-out content.
    *
    * Shape at 100 TB: the held-out side is tiny next to the corpus, so its
    * distinct shingle set broadcasts (AQE picks this up from size
    * estimates) and the ledger is one scan of the corpus + a map-side
    * semi-join — no corpus self-join anywhere. `maxDf` drops shingles
    * appearing in more than `maxDf` corpus docs (boilerplate phrases match
    * everything and signal nothing; also the straggler guard, as in
    * [[ngramJaccardPairs]]). Returns (idCol, n_shared), docs with >= 1
    * shared shingle only.
    */
  def contaminationLedger(
      corpus: DataFrame,
      heldout: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      maxDf: Int = 0
  ): DataFrame = {
    val corpusSh = corpus.select(col(idCol).as("__id"), explode(Fingerprints.shingles(col(textCol), k)).as("__s"))
    val heldSh0 = heldout.select(explode(Fingerprints.shingles(col(textCol), k)).as("__s")).distinct()
    val heldSh =
      if (maxDf <= 0) heldSh0
      else {
        val dfreq = corpusSh.groupBy("__s").agg(count(lit(1)).as("__df"))
        heldSh0.join(dfreq.filter(col("__df") <= maxDf).select("__s"), "__s")
      }
    corpusSh
      .join(heldSh, "__s")
      .groupBy("__id")
      .agg(count(lit(1)).as("n_shared"))
      .select(col("__id").as(idCol), col("n_shared"))
  }

  /** Decontamination: drop every `corpus` doc sharing at least `minShared`
    * distinct k-shingles with `heldout` (see [[contaminationLedger]]).
    * One anti-join against the flagged id set — the corpus body never
    * rides through the shingle machinery's shuffles.
    */
  def decontaminate(
      corpus: DataFrame,
      heldout: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      minShared: Int,
      maxDf: Int = 0
  ): DataFrame = {
    val flagged = contaminationLedger(corpus, heldout, idCol, textCol, k, maxDf)
      .filter(col("n_shared") >= minShared)
      .select(idCol)
    corpus.join(flagged, Seq(idCol), "left_anti")
  }

  /** MinHash-LSH near-dup pairs: banded signature bucketing generates
    * candidates (never all-pairs), then candidates are verified with the
    * exact shingle Jaccard, keeping >= tau.
    *
    * With numHashes=128, bands=32 (r=4): P(candidate | jaccard = 0.8)
    * = 1-(1-0.8^4)^32 ≈ 1-5e-8 — recall at the threshold is effectively 1,
    * while pairs far below tau rarely surface (and verification removes
    * any that do, so precision is exact).
    *
    * `maxBucket` drops pathological LSH buckets (straggler guard; 0 = off).
    */
  def minhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      tau: Double = 0.8,
      maxBucket: Int = 0
  ): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands
    val withSh = df.select(col(idCol).as("__id"), Fingerprints.shingles(col(textCol), k).as("__sh"))
    val sig = withSh
      .filter(size(col("__sh")) > 0)
      .select(col("__id"), col("__sh"), Fingerprints.minhashSignature(col("__sh"), numHashes).as("__sig"))
    // Snapshotted: both sides of the candidate self-join read this, and
    // without a snapshot each side would recompute the full signature pass
    // (numHashes × shingles hashes per doc — the expensive step). The
    // snapshot holds ids + band hashes only, never the text: tiny even at
    // 100 TB corpus scale (rows = docs × bands). Lifecycle: an eager local
    // checkpoint's blocks are freed by the ContextCleaner when the result
    // DataFrame is garbage-collected — unlike `persist()`, no session-level
    // cache lingers and no `clearCache()` folklore is required of callers.
    val banded = sig.select(
      col("__id"),
      posexplode(Fingerprints.bandKeys(col("__sig"), bands, r)).as(Seq("__band", "__key"))
    ).localCheckpoint(true)
    val buckets =
      if (maxBucket <= 0) banded
      else {
        val sizes = banded.groupBy("__band", "__key").agg(count(lit(1)).as("__bs"))
        banded.join(sizes.filter(col("__bs") <= maxBucket).select("__band", "__key"), Seq("__band", "__key"))
      }
    val candA = buckets.select(col("__band"), col("__key"), col("__id").as("a"))
    val candB = buckets.select(col("__band").as("__band2"), col("__key").as("__key2"), col("__id").as("b"))
    val candidates = candA
      .join(candB, col("__band") === col("__band2") && col("__key") === col("__key2") && col("a") < col("b"))
      .select("a", "b")
      .distinct()
    verifyJaccard(candidates, sig.select(col("__id"), col("__sh")), tau)
  }

  /** Cross-table MinHash-LSH near-dup pairs (batch `a` vs corpus `b`) —
    * the near-dup analogue of [[dedupIncremental]]'s exact anti-join, and
    * the ingest-time question ("is this new doc a near-copy of anything
    * already stored?"). Same banded signature bucketing as
    * [[minhashNearDupPairs]], but neither side ever self-joins: the batch
    * side is typically orders of magnitude smaller than the corpus, and
    * the corpus side's snapshot holds ids + band keys only (never text) —
    * at 100 TB that index is the thing you precompute and keep. Candidates
    * are verified with the exact two-sided shingle Jaccard, so precision
    * is exact; recall at `tau` follows the (numHashes, bands) collision
    * curve (see [[minhashNearDupPairs]]). `maxBucket` caps CORPUS-side
    * bucket sizes (the side whose skew can straggle a task).
    *
    * RECALL CAVEAT at `maxBucket > 0`: over-cap (band, key) buckets are
    * dropped WHOLESALE from the corpus index — any true near-dup whose
    * only shared bands are boilerplate-hot buckets is then missed, and
    * that loss is config-dependent and NOT measured by the published
    * recall ledgers (which run at the default maxBucket = 0). Callers who
    * enable the cap should count the dropped buckets first
    * (`bandedCorpus.groupBy(band, key).count().filter(n > maxBucket)` —
    * one cheap aggregation on the ids+keys index) and price the loss, the
    * same way the `maxDf` shingle cap documents its drop semantics.
    */
  def minhashNearDupAgainst(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      tau: Double = 0.8,
      maxBucket: Int = 0
  ): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands
    def sigOf(df: DataFrame): DataFrame = df
      .select(col(idCol).as("__id"), Fingerprints.shingles(col(textCol), k).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .select(col("__id"), col("__sh"), Fingerprints.minhashSignature(col("__sh"), numHashes).as("__sig"))
    def bandsOf(sig: DataFrame): DataFrame = sig
      .select(
        col("__id"),
        posexplode(Fingerprints.bandKeys(col("__sig"), bands, r)).as(Seq("__band", "__key"))
      )
      .localCheckpoint(true)
    val sigA = sigOf(batch)
    val sigB = sigOf(corpus)
    val bandedB = bandsOf(sigB)
    val bucketsB =
      if (maxBucket <= 0) bandedB
      else {
        val sizes = bandedB.groupBy("__band", "__key").agg(count(lit(1)).as("__bs"))
        bandedB.join(sizes.filter(col("__bs") <= maxBucket).select("__band", "__key"), Seq("__band", "__key"))
      }
    val candidates = bandsOf(sigA)
      .select(col("__band"), col("__key"), col("__id").as("a"))
      .join(
        bucketsB.select(col("__band").as("__band2"), col("__key").as("__key2"), col("__id").as("b")),
        col("__band") === col("__band2") && col("__key") === col("__key2")
      )
      .select("a", "b")
      .distinct()
    // two-sided verification (each side against its own shingle table, so
    // overlapping id spaces across the two tables stay unambiguous)
    candidates
      .join(sigA.select(col("__id").as("a"), col("__sh").as("__sha")), "a")
      .join(sigB.select(col("__id").as("b"), col("__sh").as("__shb")), "b")
      .withColumn(
        "jaccard",
        size(array_intersect(col("__sha"), col("__shb"))).cast("double") /
          size(array_union(col("__sha"), col("__shb"))).cast("double")
      )
      .filter(col("jaccard") >= tau)
      .select("a", "b", "jaccard")
  }

  /** SimHash near-dup pairs: band the simhash into `bands` bit slices
    * (pigeonhole guarantees any pair within Hamming distance < bands shares
    * a band), bucket-join, then verify exact Hamming distance <= maxHamming.
    *
    * This is EXACT with respect to its own definition — "all pairs with
    * Hamming(simhash) <= maxHamming" — as long as maxHamming < bands: the
    * banding is a candidate *optimization*, never a semantics change. The
    * driver oracle exploits that: DuckDB computes the brute all-pairs
    * Hamming set from the portable simhash and the banded Spark plan must
    * hash-match it.
    *
    * `simFn` picks the hash: [[Fingerprints.simhash64]] (xxhash64 tokens,
    * 64 bits — the fast default) or [[Fingerprints.simhash56Md5]] (md5
    * tokens, 56 bits — bit-reproducible in DuckDB SQL for the oracle).
    * `simBits` must match the hash width so the band slices tile it.
    */
  def simhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bands: Int = 4,
      maxHamming: Int = 3,
      simFn: Column => Column = Fingerprints.simhash64,
      simBits: Int = 64
  ): DataFrame = {
    val sims = df.select(col(idCol).as("__id"), simFn(col(textCol)).as("__sim"))
    val banded = sims.select(
      col("__id"),
      col("__sim"),
      posexplode(Fingerprints.simhashBands(col("__sim"), bands, simBits)).as(Seq("__band", "__key"))
    )
    val a = banded.select(col("__band"), col("__key"), col("__id").as("a"), col("__sim").as("__sima"))
    val b = banded.select(
      col("__band").as("__band2"),
      col("__key").as("__key2"),
      col("__id").as("b"),
      col("__sim").as("__simb")
    )
    a.join(b, col("__band") === col("__band2") && col("__key") === col("__key2") && col("a") < col("b"))
      .select(col("a"), col("b"), bit_count(col("__sima").bitwiseXOR(col("__simb"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Cross-table SimHash near-dup pairs (batch `a` vs corpus `b`): the
    * ingest-time Hamming check, with the same pigeonhole exactness as
    * [[simhashNearDupPairs]] — any cross pair within Hamming < `bands`
    * shares a band slice, so banding is a candidate optimization, never a
    * semantics change, and the result EQUALS the brute cross-pair Hamming
    * set. Neither side self-joins; the corpus index is (id, simhash, band
    * keys) only — 3 longs per band per stored doc at 100 TB.
    */
  def simhashNearDupAgainst(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      bands: Int = 4,
      maxHamming: Int = 3,
      simFn: Column => Column = Fingerprints.simhash64,
      simBits: Int = 64
  ): DataFrame = {
    def bandedOf(df: DataFrame): DataFrame = df
      .select(col(idCol).as("__id"), simFn(col(textCol)).as("__sim"))
      .select(
        col("__id"),
        col("__sim"),
        posexplode(Fingerprints.simhashBands(col("__sim"), bands, simBits)).as(Seq("__band", "__key"))
      )
    val a = bandedOf(batch)
      .select(col("__band"), col("__key"), col("__id").as("a"), col("__sim").as("__sima"))
    val b = bandedOf(corpus).select(
      col("__band").as("__band2"),
      col("__key").as("__key2"),
      col("__id").as("b"),
      col("__sim").as("__simb")
    )
    a.join(b, col("__band") === col("__band2") && col("__key") === col("__key2"))
      .select(col("a"), col("b"), bit_count(col("__sima").bitwiseXOR(col("__simb"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact-Jaccard verification of candidate pairs: join the two shingle
    * sets back and compute |A∩B| / |A∪B| per pair (row-local array math —
    * the arrays are per-document, small, and only candidate pairs pay it).
    */
  def verifyJaccard(pairs: DataFrame, shingleSets: DataFrame, tau: Double): DataFrame =
    pairs
      .join(shingleSets.select(col("__id").as("a"), col("__sh").as("__sha")), "a")
      .join(shingleSets.select(col("__id").as("b"), col("__sh").as("__shb")), "b")
      .withColumn(
        "jaccard",
        size(array_intersect(col("__sha"), col("__shb"))).cast("double") /
          size(array_union(col("__sha"), col("__shb"))).cast("double")
      )
      .filter(col("jaccard") >= tau)
      .select("a", "b", "jaccard")

  /** Greedy near-dup removal from a pair list: drop every doc that has a
    * similar neighbor with a smaller id. Cheap (one semi-join), and the
    * same rule is ANSI-SQL-expressible for the oracle. NOTE: this is the
    * standard greedy approximation, not connected components — a doc whose
    * only smaller neighbor was itself dropped stays dropped. For true
    * transitive clusters use [[connectedComponents]].
    */
  def dropNearDuplicates(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    df.join(pairs.select(col("b").as(idCol)).distinct(), Seq(idCol), "left_anti")

  /** Connected components over a near-dup pair list: every doc labeled
    * with the smallest id reachable through similarity edges (transitive
    * closure), so each cluster's representative is its min id — the
    * correct "keep one per duplicate CLUSTER" semantics, where the greedy
    * rule above can over-drop.
    *
    * Implementation: iterative min-label propagation with pointer jumping.
    * Each round (1) takes the min of a node's label and its direct
    * neighbors' labels, then (2) compresses paths by one hop
    * (comp(n) ← comp(comp(n))) — the combination converges in O(log n)
    * rounds even on pathological chains, vs O(diameter) for plain
    * propagation (near-dup clusters are tiny in practice, so 2-4 shuffles;
    * `maxIter = 25` covers components beyond any realistic corpus, and
    * non-convergence throws rather than returning silently wrong labels).
    * Each round is equi-joins + a hash agg on the ids-only label table —
    * the standard Spark iterative-graph shape (a simplified
    * large-star/small-star), no GraphX dependency.
    */
  def connectedComponents(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      maxIter: Int = 25
  ): DataFrame = {
    val edges = pairs
      .select(col("a").as("__x"), col("b").as("__y"))
      .union(pairs.select(col("b").as("__x"), col("a").as("__y")))
      .distinct()
      .localCheckpoint(true)
    var labels = df
      .select(col(idCol).as("__n"))
      .withColumn("__comp", col("__n"))
      .localCheckpoint(true)
    // Convergence detection. For NUMERIC ids, the label-sum invariant:
    // labels are monotonically non-increasing per node, so the labeling
    // changed since the last probe iff sum(__comp) strictly decreased —
    // ONE bare aggregation job over the already-checkpointed ids-only
    // label table (summed as decimal(38,0) so id-scale sums can't
    // overflow). For NON-numeric ids (string/md5 content keys, which
    // least()/min() order fine) the cast would be NULL and the sum a
    // constant zero — silently "converged" after one round — so those fall
    // back to a join-based changed-rows check against the labels at the
    // last probe. Monotonicity makes multi-round probes exact either way:
    // unchanged across k rounds iff unchanged in each.
    val numericIds = df.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    def labelSum(l: DataFrame): java.math.BigDecimal =
      // empty input → null sum → treat as zero (loop exits on first round)
      Option(l.agg(sum(col("__comp").cast("decimal(38,0)"))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = if (numericIds) labelSum(labels) else null
    var prevProbedLabels = labels
    var probes = 0
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("__n", "__y").withColumnRenamed("__comp", "__nc"), Seq("__y"))
        .groupBy(col("__x").as("__n"))
        .agg(min(col("__nc")).as("__minNeighbor"))
      val propagated = labels
        .join(viaNeighbors, Seq("__n"), "left")
        .select(
          col("__n"),
          least(col("__comp"), coalesce(col("__minNeighbor"), col("__comp"))).as("__comp")
        )
      // pointer jumping: comp(n) <- comp(comp(n)). Labels always point at
      // an existing node, and comp is monotonically non-increasing, so the
      // lookup join always hits and only ever lowers the label.
      val next = propagated
        .join(
          propagated.select(col("__n").as("__comp"), col("__comp").as("__cc")),
          Seq("__comp")
        )
        .select(col("__n"), col("__cc").as("__comp"))
        .localCheckpoint(true)
      iter += 1
      // Each probe is a driver round-trip. Early rounds collapse most
      // labels (pointer jumping converges in O(log n)), so probe every
      // round through round 4, then every 2nd round — halving driver
      // traffic on deep graphs. Skipping a probe is safe (monotone
      // labels: unchanged across 2 rounds iff unchanged in each; a
      // converged labeling iterated once more is a fixpoint). Always
      // probe at the maxIter boundary so a graph converging exactly
      // there isn't mis-reported as divergent.
      if (iter <= 4 || iter % 2 == 0 || iter == maxIter) {
        probes += 1
        if (numericIds) {
          val nextSum = labelSum(next)
          converged = nextSum.compareTo(prevSum) == 0
          prevSum = nextSum
        } else {
          converged = next
            .join(prevProbedLabels.select(col("__n"), col("__comp").as("__prev")), Seq("__n"))
            .filter(col("__comp") =!= col("__prev"))
            .isEmpty
        }
        prevProbedLabels = next
      }
      labels = next
    }
    lastCcStats = CcStats(iter, probes)
    require(converged, s"connectedComponents did not converge within $maxIter rounds")
    labels.select(col("__n").as(idCol), col("__comp").as("component"))
  }

  /** Iteration/probe counts of the most recent `connectedComponents` run on
    * this JVM — observability for the probe-cadence spec (probes must stay
    * ≤ ⌈rounds/2⌉ + 2 on deep graphs). Not part of the data path.
    */
  final case class CcStats(iterations: Int, probes: Int)
  @volatile private[graft] var lastCcStats: CcStats = CcStats(0, 0)
}
