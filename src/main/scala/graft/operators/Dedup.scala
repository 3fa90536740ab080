package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection operators that go beyond the oracle-checkable
  * set in [[graft.queries.TextQueries]]: 64-bit SimHash with banded
  * Hamming candidate generation, and MinHash-LSH candidate pairs.
  *
  * Both are pure builtin-function plans (no UDFs): SimHash folds per-token
  * xxhash64 bit votes with higher-order array functions entirely map-side;
  * LSH banding turns the all-pairs problem into equi-joins on band keys.
  * At 100 TB: one scan + one shuffle per band join, with candidate volume
  * controlled by band width — the standard scalable shape.
  */
object Dedup {

  /** 64-bit SimHash per document over whitespace tokens.
    *
    * bit j of the hash = majority vote over tokens of bit j of
    * xxhash64(token). Implemented as explode → 64 codegen'd conditional
    * sums → bit reassembly: higher-order array functions are interpreted
    * (never codegen'd) in Spark, so the hash-aggregate shape is ~100×
    * faster despite the shuffle — and the shuffle is tiny because partial
    * aggregation reduces each partition to one row per doc before the
    * exchange. Only (id, votes) is aggregated; the hash joins back to
    * `docs` on the id column so all other columns survive.
    */
  def simhash(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", nBits: Int = 64,
      tokenHashExpr: String = "xxhash64(__token)"): DataFrame = {
    // no repartition here: the aggregation below shuffles on the id
    // anyway, and an unconditional exchange would re-shuffle the whole
    // corpus on well-partitioned production tables (callers that read
    // unsplittable single-row-group test files re-parallelize at the
    // source — Tables.read)
    val tokens = docs
      .select(col(idCol),
        explode(split(lower(trim(col(textCol))), "[ \\t\\n\\x0B\\f\\r]+")).as("__token"))
      .withColumn("__h", expr(tokenHashExpr))
    val voteCols = (0 until nBits).map { j =>
      sum(when(expr(s"(shiftright(__h, $j) & 1) = 1"), 1).otherwise(-1))
        .as(s"__v$j")
    }
    val assembled = (0 until nBits)
      .map(j => s"CASE WHEN __v$j > 0 THEN shiftleft(1L, $j) ELSE 0L END")
      .mkString(" | ")
    val hashes = tokens
      .groupBy(col(idCol))
      .agg(voteCols.head, voteCols.tail: _*)
      .select(col(idCol), expr(assembled).as("simhash"))
    docs.join(hashes, Seq(idCol))
  }

  /** Token hash shared by both engines: BIGINT from the first 15 hex chars
    * of md5 (60 bits, always positive) — DuckDB parses the same value with
    * `('0x' || substring(md5(t), 1, 15))::BIGINT`, which is what makes the
    * md5 simhash variant oracle-checkable. */
  val Md5TokenHash =
    "CAST(conv(substring(md5(__token), 1, 15), 16, 10) AS BIGINT)"

  /** 60-bit SimHash over an md5 hash family — identical semantics to
    * [[simhash]] but oracle-checkable (DuckDB shares md5); the xxhash64
    * default stays the fast path for production use. */
  def simhashMd5(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    simhash(docs, textCol, idCol, nBits = 60, tokenHashExpr = Md5TokenHash)

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * algorithm): hash every character `k`-gram of the normalized text,
    * slide a window of `w` consecutive gram hashes, and keep each
    * window's MINIMUM — the guarantee is that any shared substring of
    * length ≥ k + w − 1 contributes at least one IDENTICAL fingerprint
    * to both documents, so partial overlap and containment are caught
    * where whole-document hashing ([[graft.queries.TextQueries]]'s
    * `q_fingerprint`) sees nothing. The standard local-substring dedup
    * for code/boilerplate in LLM corpora.
    *
    * Emits per doc the sorted distinct fingerprint values (BIGINTs from
    * 60-bit md5 prefixes — the cross-engine-exact family). Map-only,
    * single scan: grams, windows, and minima are all array expressions;
    * pair generation downstream is an inverted-index equi-join on the
    * fingerprint value (the [[minhashCandidates]] shape), never
    * all-pairs. Docs shorter than k + w − 1 chars yield an empty
    * fingerprint list (nothing to share).
    */
  def winnow(docs: DataFrame, k: Int = 8, w: Int = 4,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")
    // Fingerprint extraction is the native codegen'd winnow_fps
    // expression (one decode + two linear passes; value-identical to
    // the interpreted-HOF spelling — DedupSpec asserts parity against
    // that reference spelling, and the oracle hashes are unchanged).
    // The earlier HOF chain, even with the evaluate-once transform
    // idiom, re-entered the lambda machinery per gram and per window
    // and was the most expensive battery query at every scale.
    // Normalization stays in builtin expressions so the native function
    // never replicates Spark's lower/trim semantics.
    docs.select(col(idCol),
      graft.functions.functions.winnowFps(
        regexp_replace(lower(trim(col(textCol))), "[ \\t\\n\\x0B\\f\\r]+", " "), k, w)
        .as("fingerprints"))
  }

  /** Local near-dup pairs from [[winnow]] fingerprints: explode each
    * doc's fingerprints, drop values whose document frequency exceeds
    * `maxDf` (ubiquitous boilerplate grams would otherwise fan out
    * df² pairs each — the hot-block guard every pair generator here
    * carries), inverted-index self-join on the fingerprint value, and
    * keep pairs sharing at least `minShared` fingerprints. One shuffle
    * on the fingerprint key — never all-pairs — so two documents
    * sharing any run of ≥ k+w−1 characters (minus capped boilerplate)
    * surface as a candidate pair. */
  def winnowPairs(docs: DataFrame, k: Int = 8, w: Int = 4,
      minShared: Int = 3, maxDf: Int = 20,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // MATERIALIZE the exploded fingerprints before fanning out into the
    // df-filter + both self-join sides: each fingerprint is computed
    // exactly once (without the barrier the winnow pass re-runs per
    // consumer — measured 4.5x slower at sf0.1 even with the native
    // kernel). The barrier is RELEASED before returning: the (small)
    // pair result is checkpointed eagerly, which truncates its lineage
    // off the fingerprint table, and the corpus-order fingerprint
    // blocks are freed — the previous version leaked them with no
    // release path, one corpus-order cache entry per call in any
    // long-lived session (the langId leak class). The returned frame
    // rides its own result-sized checkpoint (released by any
    // clearCache, as the bench does per query).
    val fp = Checkpoints.pin(winnow(docs, k, w, textCol, idCol)
      .select(col(idCol), explode(col("fingerprints")).as("fp")))
    try {
      val rare = fp.groupBy("fp")
        .agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxDf)
        .select("fp")
      val pruned = fp.join(rare, "fp")
      val a = pruned.toDF("fp", "doc_a")
      val b = pruned.toDF("fp", "doc_b")
      a.join(b, "fp")
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).cast("int").as("shared_fingerprints"))
        .filter(col("shared_fingerprints") >= minShared)
        .transform(Checkpoints.pin(_))
    } finally Checkpoints.release(fp)
  }

  /** SimHash near-dup candidate pairs: band the 64-bit hash into 4×16-bit
    * keys (a pair within Hamming distance 3 must agree on ≥1 band), join
    * per band, then verify with exact `bit_count(xor)`. */
  def simhashPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 3): DataFrame =
    simhashPairsFromHashes(
      simhash(docs, textCol, idCol)
        .select(col(idCol).as("doc_id"), col("simhash")),
      maxHamming)

  /** [[simhashPairs]] over the md5/60-bit simhash variant (4×15-bit
    * bands) — the oracle-checkable twin. */
  def simhashPairsMd5(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 3): DataFrame =
    simhashPairsFromHashes(
      simhashMd5(docs, textCol, idCol)
        .select(col(idCol).as("doc_id"), col("simhash")),
      maxHamming, bandBits = 15, hashBits = 60)

  /** Candidate generation over precomputed (doc_id, simhash) rows. The
    * band key masks with `& ((1<<bandBits)-1)` — a sign-extending modulo
    * would give negative hashes different keys for identical bit patterns
    * and silently lose near-dup pairs. */
  def simhashPairsFromHashes(
      hashed: DataFrame,
      maxHamming: Int = 3,
      bandBits: Int = 16,
      bands: Int = 4,
      hashBits: Int = 64): DataFrame = {
    // `bands` bands guarantee recall up to Hamming bands-1 (pigeonhole:
    // a pair differing in ≤ bands-1 bits agrees on ≥1 band — only if
    // the bands PARTITION all hashBits). A larger maxHamming would
    // SILENTLY lose pairs that differ in one bit per band while the
    // exact bit_count filter makes the output look exhaustive — fail
    // loud instead. The first bands-1 bands take bandBits each; the
    // LAST band takes every remaining bit, so uneven splits
    // (e.g. 9 bands over 64 bits = 8×7 + 1×8) still partition fully.
    require(maxHamming < bands,
      s"maxHamming=$maxHamming exceeds the $bands-band recall guarantee " +
        s"(pairs at Hamming $bands+ can disagree on every band); pass " +
        s"bands >= maxHamming + 1")
    val restBits = hashBits - (bands - 1) * bandBits
    require(restBits >= 1 && restBits < 64,
      s"$bands bands x $bandBits bits do not partition $hashBits hash bits")
    val mask = (1L << bandBits) - 1
    val lastMask = (1L << restBits) - 1
    val banded = hashed.select(
      col("doc_id"), col("simhash"),
      explode(expr(
        s"""transform(sequence(0, ${bands - 1}),
           |  b -> struct(b AS band,
           |       CASE WHEN b < ${bands - 1}
           |         THEN shiftright(simhash, CAST(b * $bandBits AS INT)) & $mask
           |         ELSE shiftright(simhash, ${(bands - 1) * bandBits}) & $lastMask
           |       END AS key))"""
          .stripMargin)).as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val a = banded.toDF("doc_a", "sim_a", "band", "key")
    val b = banded.toDF("doc_b", "sim_b", "band", "key")
    a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("CAST(bit_count(sim_a ^ sim_b) AS INT)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Rounds the most recent [[connectedComponents]] call took to
    * converge — test instrumentation for the one-action-per-round shape. */
  @volatile private[graft] var lastConnectedComponentsRounds: Int = 0

  /** Connected components over a candidate-pair graph: each vertex gets
    * `cluster_id` = the smallest doc id reachable from it — the transitive
    * closure step that turns pairwise near-dup candidates into dedup
    * groups (a pair a–b plus b–c must collapse into one {a,b,c} group).
    *
    * Min-label propagation with pointer jumping: labels start as own id;
    * each round takes the min over neighbors, then shortcuts through the
    * label's own current label (`cluster_id := label(cluster_id)`). The
    * jump turns O(diameter) convergence into O(log diameter) — a
    * 1000-link chain of near-dups (the adversarial shape at 100 TB)
    * converges in ~10 rounds instead of 1000, and each round stays a
    * constant number of shuffle joins. Lineage is cut through
    * [[Checkpoints.pin]] (executor-local by default, reliable under
    * `spark.graft.checkpoint.dir`) so the loop does not compound the
    * plan; the
    * per-row changed flag rides through the checkpoint so convergence
    * detection is a trivial scan, not an extra join.
    *
    * @param vertices single column `doc_id`
    * @param edges columns `doc_a`, `doc_b`
    */
  def connectedComponents(
      vertices: DataFrame,
      edges: DataFrame,
      maxIterations: Int = 25): DataFrame = {
    val undirected = Checkpoints.pin(edges.select(col("doc_a"), col("doc_b"))
      .union(edges.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .distinct())
    var labels = Checkpoints.pin(vertices
      .select(col("doc_id"), col("doc_id").as("cluster_id")))
    // the pin whose blocks back the CURRENT `labels` — released once the
    // round that consumed it has fully materialized, so peak block
    // storage is 2 vertex-table copies + the edge pin, not one copy per
    // round (O(maxIterations·|V|) mattered exactly on the adversarial
    // long-chain graphs that need many rounds)
    var labelsPin = labels
    var iteration = 0
    var converged = false
    while (!converged && iteration < maxIterations) {
      // one round = ONE join + ONE min-aggregate: a vertex's next label is
      // min(own label, labels of its neighbors). Tagging the vertex's own
      // row lets the same aggregate recover the previous label, so the
      // changed flag costs no extra join. (The earlier 3-join spelling —
      // neighbor-min, left-join back, parent lookup — spent ~2× the wall
      // clock per round on shuffle count alone; near-dup graphs are dense
      // near-cliques that converge in 2-3 rounds, so per-round constant
      // factor dominates end-to-end time.)
      val relabeled = undirected
        .join(labels.hint("shuffle_hash"),
          undirected("doc_b") === labels("doc_id"))
        .select(undirected("doc_a").as("doc_id"),
          col("cluster_id"), lit(false).as("__own"))
      val stepped = labels
        .select(col("doc_id"), col("cluster_id"), lit(true).as("__own"))
        .union(relabeled)
        .groupBy(col("doc_id"))
        .agg(min(col("cluster_id")).as("step_id"),
          min(when(col("__own"), col("cluster_id"))).as("__prev"))
        // an edge endpoint absent from `vertices` has no own-row: drop it
        // so the output stays exactly the vertex set (left-join semantics
        // of the original spelling)
        .where(col("__prev").isNotNull)
      // pointer jump — follow the tentative label to ITS current label —
      // only from round 3 on: labels only ever decrease, so the extra
      // lookup stays monotone and the fixed point (per-component min id)
      // is unchanged. Dense near-dup components have already converged by
      // then and never pay for the join; a long chain (the adversarial
      // shape: a 1000-link run of pairwise near-dups) still contracts in
      // O(log diameter) rounds once jumping kicks in.
      val jumped =
        if (iteration < 2) {
          stepped.select(col("doc_id"), col("step_id").as("new_cluster_id"),
            (col("step_id") < col("__prev")).as("__changed"))
        } else {
          val parents = labels.select(col("doc_id").as("__pid"),
            col("cluster_id").as("__parent_label"))
          stepped
            .join(parents.hint("shuffle_hash"),
              stepped("step_id") === parents("__pid"), "left")
            .select(stepped("doc_id"),
              least(col("step_id"),
                coalesce(col("__parent_label"), col("step_id")))
                .as("new_cluster_id"),
              col("__prev"))
            .select(col("doc_id"), col("new_cluster_id"),
              (col("new_cluster_id") < col("__prev")).as("__changed"))
        }
      // LAZY localCheckpoint + a changed-count aggregate as the round's
      // one materializing action: the count computes every partition, so
      // checkpoint materialization piggybacks on it and lineage is cut —
      // convergence detection costs no second pass over the data (the old
      // eager-checkpoint-then-isEmpty spelling ran one extra job per
      // round). Superseded rounds release below, so live blocks are two
      // vertex-table copies + the edge pin at any moment — not one copy
      // per round — and spill to disk under pressure.
      val updated = Checkpoints.pin(jumped, eager = false)
      val changed = updated
        .agg(count(when(col("__changed"), lit(1)))).first().getLong(0)
      converged = changed == 0L
      // the count computed EVERY partition of `updated` (lazy pins
      // complete any stragglers at end-of-action), so the previous
      // round's blocks — which only fed the join inside that plan —
      // are now dead; release them before they stack up
      Checkpoints.release(labelsPin)
      labelsPin = updated
      labels = updated
        .select(col("doc_id"), col("new_cluster_id").as("cluster_id"))
      iteration += 1
    }
    Dedup.lastConnectedComponentsRounds = iteration
    // the returned frame reads only the FINAL round's blocks (labels is
    // a projection over labelsPin's LogicalRDD), so the |E|-sized edge
    // pin is dead weight from here — release it in both exits
    Checkpoints.release(undirected)
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIterations rounds " +
          "(component diameter exceeds the cap — raise maxIterations)")
    labels
  }

  /** Materialize cluster assignments ONCE: run [[connectedComponents]]
    * and publish the (doc_id, cluster_id) table as a
    * [[graft.store.ClusterStore]] snapshot at `path`, returning a
    * reader over the committed copy. Every downstream consumer
    * (canonical selection, cluster stats, dedup filters) reads the
    * table instead of re-deriving edges + closure — at 100 TB the
    * clustering is the expensive step and its output is tiny
    * (two BIGINTs per doc), so this is the only sane production shape.
    * The returned frame's lineage starts at the committed snapshot's
    * scan: consumers cost one scan of |V| rows, not a CC re-run, and a
    * concurrent re-cluster is invisible until its own snapshot commits
    * (manifest CAS — never a half-overwritten table). `sourceId` names
    * the source data this clustering was derived from, so consumers
    * can DETECT a stale table instead of silently trusting it. */
  def clusterTable(
      vertices: DataFrame,
      edges: DataFrame,
      path: String,
      maxIterations: Int = 25,
      sourceId: String = ""): DataFrame = {
    val store = new graft.store.ClusterStore(vertices.sparkSession, path)
    store.write(
      connectedComponents(vertices, edges, maxIterations), sourceId)
    store.read().select(col("doc_id"), col("cluster_id"))
  }

  /** Per-document MinHash LSH band rows: 3-word shingles hashed through
    * `numHashes` md5 families, minhashed, and grouped into
    * `numHashes / rowsPerBand` band keys (md5 of the band's component
    * hashes). Returns (doc_id, band, key, sig) — one row per band per
    * doc. Two docs agreeing on ANY band key are near-dup candidates;
    * this is the shared signature step behind [[minhashCandidates]]
    * (batch self-join) and [[graft.store.NearDupIndex]] (probe against
    * persisted history postings). Exploded shingles + min aggregates
    * keep the hashing codegen'd (interpreted array lambdas are the
    * bottleneck at scale); no repartition — see [[simhash]]. */
  def minhashBands(
      docs: DataFrame,
      numHashes: Int = 8,
      rowsPerBand: Int = 4,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    minhashBandsOfSigs(minhashSigs(docs, numHashes, textCol, idCol),
      numHashes, rowsPerBand)

  /** The SIGNATURE half of [[minhashBands]]: per-doc 3-word shingles
    * hashed through `numHashes` md5 families and min-aggregated —
    * `(doc_id, h0..h{n-1})`, one row per doc. Split out (r17) so a
    * caller sweeping several band layouts over ONE signature table
    * (q_banding_curve: 3 configs of the same 8-hash signature) can pin
    * this frame once instead of re-running the shingle explode + 8
    * min-aggregates per config — the signature is the expensive leg
    * (full corpus scan + tokenize + hash), the banding a cheap local
    * projection over numHashes columns. */
  def minhashSigs(
      docs: DataFrame,
      numHashes: Int = 8,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val shingles = docs
      .withColumn("__w", split(lower(trim(col(textCol))), "[ \\t\\n\\x0B\\f\\r]+"))
      .select(col(idCol).as("doc_id"), explode(expr(
        "transform(sequence(0, greatest(size(__w) - 3, 0)), " +
          "i -> concat_ws(' ', __w[i], __w[i+1], __w[i+2]))")).as("__s"))
    val minCols = (0 until numHashes).map { k =>
      min(md5(concat(col("__s"), lit(s"#$k")))).as(s"h$k")
    }
    shingles.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
  }

  /** Band rows from a precomputed [[minhashSigs]] table — the banding
    * half of [[minhashBands]], bit-identical band keys. `carrySig`
    * controls whether the full signature array rides along: candidate
    * generators that only emit pairs (the banding recall/curve sweeps,
    * the edit-distance confirm feed) drop it, which removes the
    * ~numHashes·32-byte array from every row of the band self-join's
    * shuffle (guide §2.3: shuffle fewer bytes). */
  def minhashBandsOfSigs(
      sigs: DataFrame,
      numHashes: Int = 8,
      rowsPerBand: Int = 4,
      carrySig: Boolean = true): DataFrame = {
    // fail loud on a sigs frame from a DIFFERENT minhashSigs build
    // (ADVICE r17): a table built with more hashes would silently band
    // only its first numHashes columns — not an error Spark can see,
    // since the select below only asks for h0..h{numHashes-1}
    val hCols = sigs.columns.filter(_.matches("h\\d+")).toSet
    val expected = (0 until numHashes).map(k => s"h$k").toSet
    require(hCols == expected,
      s"minhashBandsOfSigs(numHashes=$numHashes) expects signature " +
        s"columns ${expected.toSeq.sorted.mkString(", ")} exactly; the " +
        s"sigs frame carries ${hCols.toSeq.sorted.mkString(", ")} — pass " +
        "the matching minhashSigs(docs, numHashes) build")
    val nBands = numHashes / rowsPerBand
    val bandCol = (0 until nBands).map { bnd =>
      val parts = (0 until rowsPerBand).map(r => s"h${bnd * rowsPerBand + r}")
      expr(s"struct($bnd AS band, md5(concat(${parts.mkString(", ")})) AS key)")
    }
    val banded = sigs
      .select((col("doc_id") +: (0 until numHashes).map(k => col(s"h$k"))): _*)
      .withColumn("bk", explode(array(bandCol: _*)))
    if (carrySig)
      banded.select(col("doc_id"), col("bk.band").as("band"),
        col("bk.key").as("key"),
        array((0 until numHashes).map(k => col(s"h$k")): _*).as("sig"))
    else
      banded.select(col("doc_id"), col("bk.band").as("band"),
        col("bk.key").as("key"))
  }

  /** Prefix-filtered candidate pairs for an exact set-similarity self-join
    * (Bayardo/Ma/Srikant "Scaling Up All Pairs Similarity Search" WWW'07;
    * Xiao et al. PPJoin) — the scale-safe replacement for joining on EVERY
    * token (VERDICT r12: stopword hot keys make the naive inverted-index
    * join per-block quadratic; this is the "weak component" fix).
    *
    * Tokens get a global total order by (document frequency asc, token
    * asc); each record emits only its first
    * `|x| - ceil(|x|*num/den) + 1` tokens in that order as join keys.
    * Lemma (All-Pairs): any pair with Jaccard >= num/den must share at
    * least one PREFIX token, because J >= t implies
    * `|x∩y| >= t*|x∪y| >= ceil(t*max(|x|,|y|))` and two sets whose
    * `(|x| - a + 1)`-prefixes under one total order are disjoint have
    * `|x∩y| < a`. So the candidate set is a lossless superset of the
    * qualifying pairs — and stopwords (max df, sorted LAST) drop out of
    * every prefix with more than `ceil(n*num/den) - 1` tokens, which
    * kills the hot join keys: candidate volume tracks the RARE-token df
    * distribution, not the stopword one. A length filter
    * (`den*min(|x|,|y|) >= num*max`) and the PPJoin positional filter
    * (at a shared token ranked r_x/r_y, overlap cannot exceed
    * `1 + min(|x|-r_x, |y|-r_y)`, which must reach
    * `ceil(num*(|x|+|y|)/(num+den))`; every qualifying pair keeps its
    * FIRST-shared-token row) prune survivors before the distinct. All
    * arithmetic is integer-exact (num/den is a rational threshold), so
    * candidates are deterministic.
    *
    * `base` must carry one row per record: `idCol`, the `blockCols` a
    * pair must agree on (pairs crossing blocks are out of scope by
    * design), and `wordsCol` as a DISTINCT-element array. Returns
    * `(doc_a, doc_b)` distinct candidate pairs with `doc_a < doc_b`.
    *
    * Shuffle budget at 100 TB: one word-keyed shuffle for df, one
    * id-keyed shuffle for the per-record rank window, one prefix-keyed
    * shuffle join — all linear in corpus size; the quadratic hot-key
    * blowup of the naive join cannot occur because a token with df above
    * a record's rare-token count never becomes a key. */
  def prefixFilterCandidates(
      base: DataFrame,
      idCol: String,
      wordsCol: String,
      blockCols: Seq[String],
      num: Int,
      den: Int): DataFrame = {
    val words = pinnedWords(base, idCol, wordsCol, blockCols, num, den)
    try {
      val (prefix, prefixPin) = prefixOf(words, idCol, wordsCol, blockCols,
        num, den)
      try Checkpoints.pin(rawCandidates(prefix, blockCols, num, den))
      finally prefixPin.foreach(Checkpoints.release)
    } finally Checkpoints.release(words)
  }

  /** Session conf key: vocabulary-size cap for the broadcast-df fast
    * path of [[prefixPinned]] (VERDICT r13 #1). When the corpus has at
    * most this many distinct tokens, the (token → df) map is collected
    * to the driver (two parallel sorted arrays, ~40 B + payload per
    * entry — the default 1M tokens ≈ tens of MB riding the task-binary
    * broadcast) and each record's prefix is derived MAP-SIDE by
    * [[graft.functions.DfPrefixExpr]] — no df join, no rank window, no
    * id-keyed shuffle; the shuffle path cost 1.41 s of fixed stage
    * dribble per build at sf0.1 (PROFILE round-13b). Vocabularies past
    * the cap fall back LOUDLY (one WARN) to the shuffle path, which
    * handles unbounded vocab at the cost of two extra linear shuffles.
    * `0` disables the fast path outright (the crossover-test hook). */
  val BroadcastVocabCapKey = "spark.graft.prefixJoin.broadcastVocabCap"
  private val DefaultVocabCap = 1000000L

  /** Session conf key: vocabulary-size cap (hard ceiling 64) for the
    * DENSE bitmask path of [[jaccardSelfJoin]] (r18). A ≤64-token
    * vocabulary defeats prefix filtering by construction — when every
    * token occurs in most records, the lowest-df "prefix" tokens still
    * hit nearly every record, so the candidate join degenerates to
    * all-pairs WITH a per-shared-token duplication factor (measured at
    * sf0.1: 6.75M pre-distinct rows for 588K within-block pairs, 568K
    * of which qualify — 96% pair density). The dense path instead
    * encodes each word set as one 64-bit mask
    * ([[graft.functions.VocabMaskExpr]]) and runs the block-keyed
    * all-pairs join directly: `|∩| = bit_count(m_a & m_b)` per pair,
    * exact, no explode, no distinct, no verify joins. Quadratic in
    * block size — but so is the prefix path on such corpora (the
    * OUTPUT itself is ~quadratic), with an ~12x row-duplication
    * constant on top. `0` disables (the equality-test hook); values
    * above 64 clamp to 64 (one long per mask). */
  val DenseVocabCapKey = "spark.graft.jaccard.denseVocabCap"
  private val DefaultDenseVocabCap = 64L

  /** The tokenized base, MATERIALIZED once: `(idCol, blockCols..., words,
    * __n, __plen)`. Every downstream consumer — the df aggregate, the
    * prefix derivation, and jaccardSelfJoin's verify word-sets — reads
    * these blocks instead of re-running the caller's tokenization
    * (typically a regex split over full documents, the single most
    * expensive map in the pipeline; before r14 it ran up to three
    * times per join). Corpus-sized like the winnowPairs fingerprint
    * barrier; callers must release it. */
  private def pinnedWords(
      base: DataFrame,
      idCol: String,
      wordsCol: String,
      blockCols: Seq[String],
      num: Int,
      den: Int): DataFrame = {
    require(num > 0 && den > 0 && num <= den,
      s"threshold num/den must be a rational in (0, 1]: $num/$den")
    Checkpoints.pin(base
      .select((col(idCol) +: blockCols.map(col) :+ col(wordsCol)): _*)
      .withColumn("__n", size(col(wordsCol)))
      // prefix length |x| - ceil(|x|*num/den) + 1, integer-exact
      .withColumn("__plen",
        expr(s"__n - ((__n * $num + ${den - 1}) div $den) + 1")))
  }

  /** The df-ordered prefix table over a [[pinnedWords]] frame, plus its
    * own barrier when one was needed (the caller releases it).
    *
    * Two equivalent derivations (bit-identical output — (df asc, word
    * asc) is a total order over a record's distinct words, so window
    * row_number and the map-side sort select the same rows):
    *   - BROADCAST (vocab ≤ [[BroadcastVocabCapKey]]): one partial-agg
    *     shuffle of distinct tokens for df, one driver collect, then a
    *     map-side [[graft.functions.DfPrefixExpr]] pass. Returned
    *     UNPINNED: both self-join sides re-derive it from the pinned
    *     words blocks — a cheap local pass, cheaper than writing the
    *     exploded prefix table to a second barrier;
    *   - SHUFFLE (unbounded vocab): df join against the exploded words
    *     plus a per-record rank window — two extra linear shuffles,
    *     expensive enough that the result IS pinned (without it the
    *     whole pipeline runs once per join side — measured ~2x). */
  private def prefixOf(
      words: DataFrame,
      idCol: String,
      wordsCol: String,
      blockCols: Seq[String],
      num: Int,
      den: Int): (DataFrame, Option[DataFrame]) = {
    val dfreq = pinnedDfreq(words, idCol, wordsCol, blockCols)
    try prefixFrom(words, dfreq, dfreq.count(), idCol, wordsCol, blockCols,
      num, den)
    finally Checkpoints.release(dfreq)
  }

  /** Global document frequency over a [[pinnedWords]] frame: words
    * arrays are distinct per record, so count == number of records
    * containing the token. Pinned ONCE: the vocab probe, the dense-path
    * gate, AND the over-cap fallback's join all read it — without the
    * pin an over-cap corpus (the production case past 1M tokens) paid
    * the full token aggregation twice per build, once for the discarded
    * probe and once inside the join. Callers release it. */
  private def pinnedDfreq(
      words: DataFrame,
      idCol: String,
      wordsCol: String,
      blockCols: Seq[String]): DataFrame = {
    val exploded = words.select(
      (col(idCol) +: blockCols.map(col) :+
        col("__n") :+ col("__plen") :+
        explode(col(wordsCol)).as("__w")): _*)
    Checkpoints.pin(
      exploded.groupBy(col("__w")).agg(count(lit(1)).as("__df")))
  }

  /** [[prefixOf]] continued: path choice + derivation over a PINNED df
    * table (released by the caller). */
  private def prefixFrom(
      words: DataFrame,
      dfreq: DataFrame,
      vocabN: Long,
      idCol: String,
      wordsCol: String,
      blockCols: Seq[String],
      num: Int,
      den: Int): (DataFrame, Option[DataFrame]) = {
    val spark = words.sparkSession
    val exploded = words.select(
      (col(idCol) +: blockCols.map(col) :+
        col("__n") :+ col("__plen") :+
        explode(col(wordsCol)).as("__w")): _*)
    val cap = longConf(spark, BroadcastVocabCapKey, DefaultVocabCap)
    // vocab probe: the caller's COUNT over the pinned df table decides
    // the path, and only an under-cap vocabulary is ever collected
    // (VERDICT r14 #7: the previous limit(cap+1).collect() shipped ~cap
    // rows — tens of MB at the 1M default — to the driver on every
    // over-cap build just to discard them; the count answers the
    // predicate from the barrier blocks without shipping tokens, and
    // driver memory stays bounded by construction at ANY vocab size)
    val collected =
      if (cap <= 0) None
      else if (vocabN <= cap) Some(dfreq.collect())
      else {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"prefix join: vocabulary exceeds $BroadcastVocabCapKey=$cap " +
            "— falling back to the shuffle-path prefix derivation " +
            "(df join + rank window; correct at any vocab size, two " +
            "extra linear shuffles per build)")
        None
      }
    collected match {
      case Some(rows) =>
        // broadcast path: (vocab, df) as parallel arrays sorted by token
        // binary order; DfPrefixExpr derives each record's prefix locally.
        // Null tokens (possible only from containsNull inputs) are
        // dropped from the map — they can never be join keys, matching
        // the shuffle path's null-rejecting dfreq join.
        val sorted = rows.iterator
          .filter(!_.isNullAt(0))
          .map(r => (org.apache.spark.unsafe.types.UTF8String
            .fromString(r.getString(0)), r.getLong(1)))
          .toArray.sortBy(_._1)
        val pre = graft.functions.functions.dfPrefix(
          col(wordsCol), num, den, sorted.map(_._1), sorted.map(_._2))
        val prefix = words
          .select((col(idCol) +: blockCols.map(col) :+ col("__n") :+
            posexplode(pre)): _*)
          .select((col(idCol) +: blockCols.map(col) :+ col("__n") :+
            (col("pos") + 1).as("__rank") :+ col("col").as("__w")): _*)
        (prefix, None)
      case None =>
        import org.apache.spark.sql.expressions.Window
        val prefix = Checkpoints.pin(exploded.join(dfreq, "__w")
          .withColumn("__rank", row_number().over(
            Window.partitionBy(col(idCol)).orderBy(col("__df"), col("__w"))))
          .filter(col("__rank") <= col("__plen"))
          .select((col(idCol) +: blockCols.map(col) :+ col("__n") :+
            col("__rank") :+ col("__w")): _*))
        (prefix, Some(prefix))
    }
  }

  /** Lazy candidate pairs over a pinned prefix table — shared by
    * [[prefixFilterCandidates]] (which pins the result) and
    * [[jaccardSelfJoin]] (whose verify consumes the candidates exactly
    * once, so a second barrier would only add a write). */
  private def rawCandidates(
      prefix: DataFrame,
      blockCols: Seq[String],
      num: Int,
      den: Int): DataFrame = {
    val a = prefix.toDF(("doc_a" +: blockCols :+ "n_a" :+ "r_a" :+ "__w"): _*)
    val b = prefix.toDF(("doc_b" +: blockCols :+ "n_b" :+ "r_b" :+ "__w"): _*)
    a.join(b, blockCols :+ "__w")
      .filter(col("doc_a") < col("doc_b"))
      // length filter: J >= num/den forces den*min(|x|,|y|) >= num*max
      .filter(least(col("n_a"), col("n_b")) * den >=
        greatest(col("n_a"), col("n_b")) * num)
      // positional filter (PPJoin): J >= num/den forces the overlap
      // alpha = ceil(num*(n_a+n_b)/(num+den)); all common tokens besides
      // this one sit AFTER rank r_a in x and r_b in y (same global
      // order), so overlap <= 1 + min(n_a - r_a, n_b - r_b). Rows where
      // even that bound misses alpha cannot be a qualifying pair's FIRST
      // shared token — and every qualifying pair keeps its first-token
      // row, so the distinct below still sees it (lossless, integer-
      // exact: a*(num+den) >= num*(n_a+n_b) <=> a >= alpha)
      .filter((lit(1) + least(col("n_a") - col("r_a"),
        col("n_b") - col("r_b"))) * (num + den) >=
        (col("n_a") + col("n_b")) * num)
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** Exact Jaccard self-join: the [[prefixFilterCandidates]] plan (run
    * unpinned off the shared prefix barrier — the verify consumes the
    * candidates exactly once) generates a lossless superset, then an
    * exact verify — join each
    * candidate pair back to its two word sets (sorted ONCE at source)
    * and compute `|∩|` with the zero-allocation codegen'd merge
    * [[graft.functions.SortedIntersectSizeExpr]]; the pair table is
    * candidate-proportional, so the two id-keyed verify joins are
    * linear (and broadcast when the set table is small). Keeps exactly
    * the pairs with `inter*den >= union*num` (J >= num/den) in integer
    * arithmetic — bit-identical to the naive join-on-every-token
    * formulation, without its stopword quadratic.
    * Returns `(doc_a, doc_b, inter_size, union_size)`.
    *
    * Contract (both latent by construction at every current call site):
    * `base` must be DETERMINISTIC across evaluations — the candidate
    * build, the broadcast df map, and the verify below each re-derive
    * from it, so a nondeterministic frame (e.g. an unseeded random
    * sample) would verify against different rows than the candidates
    * were built from (the broadcast path fails loud on the resulting
    * vocab mismatch; the shuffle path would not). Records whose
    * `wordsCol` is EMPTY never pair: an empty set has no prefix tokens
    * (and Jaccard against it is 0/|y| < any positive threshold), so
    * they are absent from both sides of the join by design.
    *
    * Cluster-mode note (the [[GraphOps.pageRank]] trade, same terms):
    * barriers default to `localCheckpoint` — executor-local blocks,
    * fastest, NOT recomputable after executor loss. On a cluster with
    * dynamic allocation set [[Checkpoints.ReliableDirKey]]
    * (`spark.graft.checkpoint.dir`) to switch every barrier here to
    * reliable checkpoints (identical results; PrefixJoinSpec pins
    * that); the words/prefix pins live only for the duration of one
    * build, the result pin until the caller's clearCache. */
  def jaccardSelfJoin(
      base: DataFrame,
      idCol: String,
      wordsCol: String,
      blockCols: Seq[String],
      num: Int = 1,
      den: Int = 4): DataFrame = {
    val words = pinnedWords(base, idCol, wordsCol, blockCols, num, den)
    try {
      val dfreq = pinnedDfreq(words, idCol, wordsCol, blockCols)
      try {
        val denseCap = math.min(64L, longConf(words.sparkSession,
          DenseVocabCapKey, DefaultDenseVocabCap))
        val vocabN = dfreq.count()
        if (denseCap > 0 && vocabN <= denseCap)
          // dense fast path (r18): a ≤64-token vocabulary defeats
          // prefix filtering (the low-df "prefix" tokens still occur in
          // most records), so skip candidates+verify entirely — word
          // sets become 64-bit masks and the block all-pairs join
          // computes exact |∩| per pair via bit_count
          denseSelfJoin(words, dfreq, idCol, wordsCol, blockCols, num, den)
        else {
          val (prefix, prefixPin) = prefixFrom(words, dfreq, vocabN,
            idCol, wordsCol, blockCols, num, den)
          try {
            val cands = rawCandidates(prefix, blockCols, num, den)
            // verify word-sets come from the SAME pinned blocks the
            // prefixes were derived from — no re-tokenization, and the
            // deterministic-base contract is structurally enforced
            // within one call
            val sets = words.select(col(idCol), col("__n"),
              sort_array(col(wordsCol)).as("__ws"))
            cands
              .join(sets.toDF("doc_a", "n_a", "w_a"), "doc_a")
              .join(sets.toDF("doc_b", "n_b", "w_b"), "doc_b")
              .withColumn("inter_size",
                graft.functions.functions.sortedIntersectSize(
                  col("w_a"), col("w_b")))
              .filter(col("inter_size") * den >=
                (col("n_a") + col("n_b") - col("inter_size")) * num)
              .select(col("doc_a"), col("doc_b"), col("inter_size"),
                (col("n_a") + col("n_b") - col("inter_size"))
                  .as("union_size"))
              // eager result pin + barrier release, the winnowPairs
              // shape: the pair table is the OUTPUT (pair-proportional
              // by definition), and consumers re-sort or iterate over
              // it — re-reading the barrier, never re-running the
              // verify
              .transform(Checkpoints.pin(_))
          } finally prefixPin.foreach(Checkpoints.release)
        }
      } finally Checkpoints.release(dfreq)
    } finally Checkpoints.release(words)
  }

  /** Dense (≤64-token-vocab) exact Jaccard self-join — bit-identical
    * output to the prefix-filter+verify path (DenseJaccardSpec pins the
    * equality, incl. empty/all-null word sets and threshold-boundary
    * pairs): each record's word set is one 64-bit vocabulary mask, the
    * block-keyed all-pairs join computes `|∩| = bit_count(m_a & m_b)`
    * per pair, and the J ≥ num/den filter is the same exact integer
    * arithmetic. No explode, no candidate distinct, no verify joins —
    * the 8-byte masks are the ONLY payload shuffled. Quadratic in block
    * size, but on a ≤64-token corpus so is the prefix path (output pair
    * density at sf0.1: 96%), with a per-shared-token duplication factor
    * (~12x measured) on top. */
  private def denseSelfJoin(
      words: DataFrame,
      dfreq: DataFrame,
      idCol: String,
      wordsCol: String,
      blockCols: Seq[String],
      num: Int,
      den: Int): DataFrame = {
    // sorted ascending in UTF8String binary order for the kernel's
    // binary search; bit index = sorted position (any consistent
    // indexing works — only mask EQUALITY of bits matters)
    val vocab = dfreq.select(col("__w")).collect().iterator
      .filter(!_.isNullAt(0))
      .map(r => org.apache.spark.unsafe.types.UTF8String
        .fromString(r.getString(0)))
      .toArray.sorted
    val mask = graft.functions.functions.vocabMask(col(wordsCol), vocab)
    // records with an EMPTY word set never pair (on the sparse path
    // they have no prefix tokens); sets with only null elements fall
    // out of the final filter like they do there (inter = 0 against a
    // union > 0)
    val masked = words
      .filter(size(col(wordsCol)) > 0)
      .select((col(idCol) +: blockCols.map(col) :+ col("__n") :+
        mask.as("__m")): _*)
    val a = masked.toDF(("doc_a" +: blockCols :+ "n_a" :+ "m_a"): _*)
    val b = masked.toDF(("doc_b" +: blockCols :+ "n_b" :+ "m_b"): _*)
    a.join(b, blockCols)
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("inter_size", expr("bit_count(m_a & m_b)").cast("int"))
      .filter(col("inter_size") * den >=
        (col("n_a") + col("n_b") - col("inter_size")) * num)
      .select(col("doc_a"), col("doc_b"), col("inter_size"),
        (col("n_a") + col("n_b") - col("inter_size")).as("union_size"))
      .transform(Checkpoints.pin(_))
  }

  /** A long-valued session conf with a LOUD parse failure naming the
    * key (a bare NumberFormatException names only the value). */
  private def longConf(spark: org.apache.spark.sql.SparkSession,
      key: String, default: Long): Long =
    spark.conf.getOption(key).map { s =>
      try s.toLong
      catch { case e: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$key must be a long, got '$s'", e)
      }
    }.getOrElse(default)

  /** MinHash-LSH candidate pairs on top of the md5 minhash signatures
    * (same family as `TextQueries.q_minhash_sig`): docs sharing either
    * 4-hash band are candidates; `min_band_matches` of the 8 component
    * hashes gives a cheap similarity estimate for ranking. */
  def minhashCandidates(
      docs: DataFrame,
      numHashes: Int = 8,
      rowsPerBand: Int = 4): DataFrame = {
    val banded = minhashBands(docs, numHashes, rowsPerBand)
    val a = banded.toDF("doc_a", "band", "key", "sig_a")
    val b = banded.toDF("doc_b", "band", "key", "sig_b")
    a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))")
          .as("matching_hashes"))
      .distinct()
  }

  /** [[minhashCandidates]] restricted to the PAIRS — `(doc_a, doc_b)`
    * distinct, `doc_a < doc_b` — for consumers that never read
    * `matching_hashes` (the banding recall/curve truth joins, the
    * edit-distance confirm feed). Exactly the projection of
    * [[minhashCandidates]]'s output (`matching_hashes` is a function of
    * the pair, so the 2-column distinct selects the same pair set), but
    * the band self-join shuffles only `(doc_id, band, key)` rows — no
    * signature array on either side and no per-pair zip_with. */
  def minhashCandidatePairs(
      docs: DataFrame,
      numHashes: Int = 8,
      rowsPerBand: Int = 4,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    minhashCandidatePairsOfSigs(
      minhashSigs(docs, numHashes, textCol, idCol), numHashes, rowsPerBand)

  /** [[minhashCandidatePairs]] over a precomputed (typically pinned)
    * [[minhashSigs]] table — the band-layout sweep entry point. */
  def minhashCandidatePairsOfSigs(
      sigs: DataFrame,
      numHashes: Int = 8,
      rowsPerBand: Int = 4): DataFrame = {
    val banded = minhashBandsOfSigs(sigs, numHashes, rowsPerBand,
      carrySig = false)
    val a = banded.toDF("doc_a", "band", "key")
    val b = banded.toDF("doc_b", "band", "key")
    a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }
}
