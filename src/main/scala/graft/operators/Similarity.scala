package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search over an embedding column.
  *
  * The scale path is IVF-style: a coarse quantizer (per-cell centroid)
  * splits the corpus into cells; a query probes only the `nprobe` nearest
  * cells. Brute force within probed cells stays a broadcast join against
  * the (small) query set, so the 100 TB plan is: one centroid pass
  * (cached), then a partition-pruned scan of the probed cells only.
  */
object Similarity {

  /** Per-cell mean vector via posexplode + groupBy(cell, dim) — the
    * elementwise-average shape that scales to any dimension.
    *
    * Integer-exact across engines: components are quantized to micro-
    * scaled BIGINT before summing, so the per-(cell, dim) sum is exact
    * integer addition (order-independent, unlike a double `avg` whose
    * partial-aggregation order varies per engine/partitioning), and the
    * mean is ONE exact-integer-to-double division. Any engine that runs
    * the same quantize-sum-divide produces bit-identical centroids — the
    * property the DuckDB oracle for the ANN queries relies on. The
    * quantization error (≤0.5e-6 per component) is irrelevant for a
    * coarse quantizer. Sum headroom: micro values are ~1e6-scaled, so a
    * cell stays double-exact (< 2^53) up to ~9e9 members. */
  def centroids(
      emb: DataFrame,
      cellCol: String = "label"): DataFrame =
    emb
      .select(col(cellCol).as("cell"),
        posexplode(expr("CAST(embedding AS ARRAY<DOUBLE>)"))
          .as(Seq("dim", "component")))
      .groupBy("cell", "dim")
      .agg(
        sum(expr("CAST(round(component * 1000000) AS BIGINT)")).as("s_micro"),
        count(lit(1)).as("n"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("dim"),
        (col("s_micro").cast("double") /
          (col("n").cast("double") * lit(1000000.0d)))
          .as("mean_component")))).as("pairs"))
      .select(col("cell"),
        expr("transform(pairs, p -> p.mean_component)").as("centroid"))

  // native codegen'd dot product (graft.functions.DotProductExpr):
  // identical left-to-right IEEE summation to the interpreted
  // aggregate(zip_with(...)) spelling, minus the per-pair array
  // allocation — the inner loop these operators spend their time in.
  // Callers must have run functions.register (ensureDot below does).
  private val Dot = "vector_dot(%s, %s)"

  private def ensureDot(df: DataFrame): Unit =
    graft.functions.functions.register(df.sparkSession)

  /** Cosine of two double-array columns as a SQL expression (sequential
    * left-to-right sums — bit-stable across engines). */
  def cosineExpr(a: String, b: String): String =
    s"${Dot.format(a, b)} / (sqrt(${Dot.format(a, a)}) * sqrt(${Dot.format(b, b)}))"

  private def cosExpr(a: String, b: String): String = cosineExpr(a, b)

  /** Map-side nearest-centroid argmin over driver-held centroids:
    * `array_min` of (dist_micro, cluster) structs — lexicographic min is
    * exactly the tie-broken argmin the trainer and oracle use. Literal
    * doubles round-trip the driver exactly, so distances match an
    * in-engine computation bit for bit, and the expression shuffles
    * nothing (vs a crossJoin + groupBy argmin, which exchanges the full
    * corpus). `vCol` must be `array<double>`. */
  def nearestCentroidExpr(
      cents: Seq[(Any, scala.collection.Seq[Double])],
      vCol: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    nearestCentroidStruct(cents, vCol).getField("cl")

  /** The argmin above WITH its micro-distance: a struct `(d, cl)` where
    * `d` is the squared-Euclidean distance to the winning centroid,
    * micro-scaled to BIGINT. Callers that want assignment AND a drift
    * readout (e.g. [[CellIndex.append]]) evaluate this once instead of
    * running the argmin twice.
    *
    * Evaluation rides the native
    * [[graft.functions.NearestCentroidsExpr]] kernel (model as plain
    * reference arrays, one fused JVM loop) whenever the ids are
    * Int/Long/String and the centroids share a dimensionality —
    * bit-identical to the column spelling
    * ([[nearestCentroidStructGeneric]], kept as the exotic-id fallback
    * and the differential-spec reference): same accumulation order,
    * same HALF_UP micro-rounding, ties to the smallest cluster id
    * (centroids pre-sorted here — numerically, or UTF8String binary
    * order for strings, matching `array_min`'s struct comparison),
    * unroutable vectors yield the same `(null, min cl)` struct. The
    * column spelling falls out of whole-stage codegen past ~a few
    * hundred k×dim literal doubles and re-walks the literal per row
    * interpreted — 1000× the arithmetic cost at SemDeDup's auto-k. */
  def nearestCentroidStruct(
      cents: Seq[(Any, scala.collection.Seq[Double])],
      vCol: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    require(cents.nonEmpty, "need at least one centroid")
    val uniformDim = cents.map(_._2.length).distinct.size == 1
    val sorted: Option[Seq[(Any, scala.collection.Seq[Double])]] =
      cents.head._1 match {
        case _: Int if uniformDim =>
          Some(cents.sortBy(_._1.asInstanceOf[Int]))
        case _: Long if uniformDim =>
          Some(cents.sortBy(_._1.asInstanceOf[Long]))
        case _: String if uniformDim =>
          Some(cents.sortWith((a, b) =>
            org.apache.spark.unsafe.types.UTF8String
              .fromString(a._1.asInstanceOf[String])
              .compareTo(org.apache.spark.unsafe.types.UTF8String
                .fromString(b._1.asInstanceOf[String])) < 0))
        case _ => None
      }
    sorted match {
      case None => nearestCentroidStructGeneric(cents, vCol)
      case Some(s) =>
        val clType = s.head._1 match {
          case _: Int => org.apache.spark.sql.types.IntegerType
          case _: Long => org.apache.spark.sql.types.LongType
          case _ => org.apache.spark.sql.types.StringType
        }
        Bridge.column(graft.functions.NearestCentroidsExpr(
          Bridge.expression(vCol),
          s.map(_._1), s.map(_._2.toVector), clType))
    }
  }

  /** The pure-column spelling of [[nearestCentroidStruct]] — `array_min`
    * over a k-struct literal. Correct at any id type but interpreted
    * and literal-heavy at large k; kept as the fallback for ids that
    * are not Int/Long/String and as the reference implementation the
    * differential spec checks the native kernel against. */
  private[graft] def nearestCentroidStructGeneric(
      cents: Seq[(Any, scala.collection.Seq[Double])],
      vCol: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import graft.functions.functions.vectorDot
    require(cents.nonEmpty, "need at least one centroid")
    // cell ids go through lit(), so any literal-able type works (learned
    // Int clusters, Long or String labels); collection.Seq parameter +
    // toVector because Row.getAs/getSeq hand back mutable ArraySeq
    // wrappers and typedlit needs an immutable Seq
    val centsLit = array(cents.map { case (cl, cv) =>
      struct(lit(cl).as("cl"), typedlit(cv.toVector).as("cv"))
    }: _*)
    array_min(transform(centsLit, c =>
      struct(
        round((vectorDot(vCol, vCol) -
          lit(2.0d) * vectorDot(vCol, c.getField("cv")) +
          vectorDot(c.getField("cv"), c.getField("cv"))) * lit(1000000.0d))
          .cast("long").as("d"),
        c.getField("cl").as("cl"))))
  }

  /** Distributed Lloyd's k-means over the embedding column — the coarse-
    * quantizer TRAINING step of an IVF index (the battery's `label` cells
    * are a given partitioning; a real 100 TB index learns its cells).
    *
    * Deterministic and integer-exact cross-engine, the same discipline as
    * [[centroids]]:
    *   - seeds: the `k` vectors with the smallest `vec_id`, numbered in
    *     that order (no RNG — retries/reruns train the identical model);
    *   - assignment: argmin of squared L2 distance computed from three
    *     dot products (|v|² − 2·v·c + |c|², each a sequential
    *     left-to-right sum) micro-rounded to BIGINT, ties broken by
    *     cluster index;
    *   - update: quantize-sum-divide elementwise mean (order-independent
    *     integer sums, one exact division per component).
    *
    * Shuffle shape (the MLlib KMeans discipline): centroids round-trip
    * through the driver each round (k×dim doubles — MBs at coarse-
    * quantizer sizes) and the argmin is a MAP-SIDE expression over that
    * literal centroid array, so assignment shuffles NOTHING; the only
    * exchange per round is the centroid-update aggregate whose map-side
    * partials collapse to ≤ k×dim rows per partition. A `groupBy`-based
    * argmin would instead shuffle the full corpus (vector included)
    * every iteration — the dominant cost at scale. A cluster that loses
    * all members disappears (standard Lloyd behavior; both engines
    * agree).
    *
    * @return (cluster: Int, centroid: Array[Double], n_vectors: Long)
    *         after `iters` full assign+update rounds.
    */
  def kmeans(emb: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    val cents = kmeansModel(emb, k, iters)
    val session = emb.sparkSession
    import session.implicits._
    val model = cents.toDF("cluster", "centroid")
    emb.select(expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
      .withColumn("cluster", nearestCentroidExpr(cents, col("v")))
      .groupBy("cluster").agg(count(lit(1)).as("n_vectors"))
      .join(broadcast(model), Seq("cluster"))
      .select(col("cluster"), col("centroid"), col("n_vectors"))
  }

  /** The training loop behind [[kmeans]], returning the trained model
    * driver-side (cluster -> centroid) without the final assignment
    * pass — callers that only need the quantizer (e.g.
    * [[CellIndex.buildLearned]]) skip that extra corpus scan. */
  def kmeansModel(emb: DataFrame, k: Int, iters: Int)
      : Seq[(Int, Seq[Double])] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    ensureDot(emb)
    val vecs = emb.select(col("vec_id"),
      expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))

    def assign(cents: Seq[(Int, Seq[Double])]): DataFrame =
      vecs.withColumn("cluster", nearestCentroidExpr(cents, col("v")))

    /** Integer-exact per-cluster mean, then collect the (small) model to
      * the driver for the next round's literal. */
    def update(assigned: DataFrame): Seq[(Int, Seq[Double])] =
      assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "component")))
        .groupBy("cluster", "dim")
        .agg(sum(expr("CAST(round(component * 1000000) AS BIGINT)")).as("s"),
          count(lit(1)).as("n"))
        .groupBy("cluster")
        .agg(array_sort(collect_list(struct(col("dim"),
          (col("s").cast("double") /
            (col("n").cast("double") * lit(1000000.0d))).as("m"))))
          .as("pairs"))
        .select(col("cluster"),
          expr("transform(pairs, p -> p.m)").as("centroid"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1))
        .sortBy(_._1).toSeq

    var cents: Seq[(Int, Seq[Double])] = vecs.orderBy(col("vec_id")).limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Double](1) }.toSeq
    for (_ <- 1 to iters) cents = update(assign(cents))
    cents
  }

  /** Product-quantization codebook training — the PQ half of the
    * IVF-PQ design every billion-scale ANN index uses (IVF prunes which
    * vectors are read, PQ shrinks what is stored and compared: a
    * dim-64 float vector becomes `m` small codes). Each of the `m`
    * subspaces (contiguous dim/m-slices) trains its own k-centroid
    * quantizer with the exact same deterministic Lloyd loop as
    * [[kmeansModel]] (smallest-vec_id seeds, micro-BIGINT argmin with
    * index tie-break, quantize-sum-divide update), so the codebooks —
    * like the coarse quantizer — are bit-identical in any engine that
    * replays the arithmetic.
    *
    * Scale shape: `m` independent trainings, each the [[kmeansModel]]
    * shuffle discipline (corpus never shuffles; per-round exchange is
    * ≤ k×(dim/m) partials). The slice projection is map-side.
    *
    * @return (subspace, cluster, centroid) rows, centroids of length
    *         dim/m; driver-held (m×k×dim/m doubles — KBs)
    */
  def pqTrain(
      emb: DataFrame,
      m: Int = 4,
      k: Int = 4,
      iters: Int = 2): Seq[(Int, Int, Seq[Double])] = {
    require(m >= 1, s"m must be >= 1, got $m")
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    ensureDot(emb)
    val dim = emb.select(size(col("embedding")).as("d")).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m $m subspaces")
    val sub = dim / m
    val vecs = emb.select(col("vec_id"),
      expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))

    // All m subspaces train TOGETHER: one corpus pass per Lloyd round
    // (assign every subspace map-side, tag each component with
    // (subspace, cluster, dim), one aggregate, one k×dim collect) —
    // versus m separate kmeansModel runs, which would scan the corpus
    // m× per round for byte-identical results. Semantics per subspace
    // are EXACTLY kmeansModel's (the oracle unrolls them separately):
    // same smallest-vec_id seeds (slicing commutes with the float→
    // double cast, so driver-side slicing of the seed rows is the
    // engine's slice bit for bit), same micro-BIGINT argmin with
    // cluster tie-break, same quantize-sum-divide update; a cluster
    // losing all members disappears, per subspace.
    val seedRows = vecs.orderBy(col("vec_id")).limit(k).collect()
    var books: Seq[(Int, Int, Seq[Double])] =
      seedRows.zipWithIndex.flatMap { case (r, i) =>
        val v = r.getSeq[Double](1)
        (0 until m).map { j =>
          (j, i, v.slice(j * sub, (j + 1) * sub).toVector: Seq[Double])
        }
      }.toSeq.sortBy(t => (t._1, t._2))

    for (_ <- 1 to iters) {
      // Bind-once shape: each subspace's (winning cluster, slice) pair
      // is the ARGUMENT of an enclosing transform, so the argmin
      // evaluates once per row per subspace — the naive spelling would
      // let project collapsing inline it into every component's lambda.
      val taggedCols: Seq[org.apache.spark.sql.Column] =
        (0 until m).map { j =>
          val cents = books.filter(_._1 == j)
            .map { case (_, c, cv) =>
              (c: Any, cv: scala.collection.Seq[Double]) }
          val cl = nearestCentroidStruct(cents,
            expr(s"slice(v, ${j * sub + 1}, $sub)")).getField("cl")
          val sv = expr(s"slice(v, ${j * sub + 1}, $sub)")
          flatten(transform(array(struct(cl.as("cl"), sv.as("sv"))), p =>
            transform(p.getField("sv"), (x, i) =>
              struct(lit(j).as("j"), p.getField("cl").as("cluster"),
                i.as("dim"), x.as("comp")))))
        }
      books = vecs
        .select(explode(flatten(array(taggedCols: _*))).as("t"))
        .select(col("t.j").as("j"), col("t.cluster").as("cluster"),
          col("t.dim").as("dim"), col("t.comp").as("comp"))
        .groupBy(col("j"), col("cluster"), col("dim"))
        .agg(sum(expr("CAST(round(comp * 1000000) AS BIGINT)")).as("s"),
          count(lit(1)).as("n"))
        .groupBy(col("j"), col("cluster"))
        .agg(array_sort(collect_list(struct(col("dim"),
          (col("s").cast("double") /
            (col("n").cast("double") * lit(1000000.0d))).as("m"))))
          .as("pairs"))
        .select(col("j"), col("cluster"),
          expr("transform(pairs, p -> p.m)").as("centroid"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toVector
          : Seq[Double]))
        .toSeq.sortBy(t => (t._1, t._2))
    }
    books
  }

  /** PQ encoding: each vector's `m` nearest-sub-centroid codes plus the
    * total micro-scaled squared quantization error (the reconstruction-
    * quality audit signal). Pure map-side: every subspace's argmin is a
    * [[nearestCentroidStruct]] literal-array expression over the sliced
    * vector — no joins, no shuffle, the corpus is read once. At 100 TB
    * this is the compression pass that turns the stored index from
    * 4·dim bytes/vector into m bytes/vector.
    *
    * @return (vec_id, code_0 … code_{m-1}, err_micro)
    */
  def pqEncode(
      emb: DataFrame,
      books: Seq[(Int, Int, Seq[Double])],
      keep: Seq[String] = Nil): DataFrame = {
    ensureDot(emb)
    require(books.nonEmpty, "empty codebooks")
    val m = books.map(_._1).max + 1
    val sub = books.head._3.length
    require(books.forall(_._3.length == sub),
      "codebook centroids must share the subspace length")
    val structs = (0 until m).map { j =>
      val cents = books.filter(_._1 == j)
        .map { case (_, c, cv) => (c: Any, cv: scala.collection.Seq[Double]) }
      require(cents.nonEmpty, s"no centroids for subspace $j")
      nearestCentroidStruct(cents,
        expr(s"slice(CAST(embedding AS ARRAY<DOUBLE>), ${j * sub + 1}, $sub)"))
        .as(s"__s$j")
    }
    val kept = keep.map(col)
    emb.select((col("vec_id") +: kept) ++ structs: _*)
      .select((col("vec_id") +: kept) ++
        ((0 until m).map(j =>
          col(s"__s$j").getField("cl").cast("int").as(s"code_$j")) :+
          (0 until m).map(j => col(s"__s$j").getField("d"))
            .reduce(_ + _).as("err_micro")): _*)
  }

  /** Per-query PQ lookup table over the `embedding` column: one MAP per
    * subspace, cluster id → micro squared L2 between the row's j-slice
    * and that sub-centroid — the same three-dot-product spelling as
    * [[nearestCentroidStruct]], against literal codebooks (bit-
    * identical to an oracle recomputing it in-engine). Keyed by cluster
    * ID, not position: codes are ORIGINAL cluster ids, which can have
    * gaps when a subspace cluster empties during Lloyd training (the
    * documented kmeans behavior), so a positional array would read the
    * wrong centroid's distance. */
  private[operators] def pqLutExpr(
      books: Seq[(Int, Int, Seq[Double])], m: Int, sub: Int,
      srcCol: String = "embedding")
      : org.apache.spark.sql.Column = {
    import graft.functions.functions.vectorDot
    array((0 until m).map { j =>
      val s = s"slice(CAST($srcCol AS ARRAY<DOUBLE>), ${j * sub + 1}, $sub)"
      val entries = books.filter(_._1 == j).sortBy(_._2)
        .flatMap { case (_, cl, cv) =>
          val c = cv.toVector
          val sc = expr(s)
          Seq(lit(cl),
            round((vectorDot(sc, sc) -
              lit(2.0d) * vectorDot(sc, typedlit(c)) +
              vectorDot(typedlit(c), typedlit(c))) * lit(1000000.0d))
              .cast("long"))
        }
      map(entries: _*)
    }: _*)
  }

  /** The nprobe nearest cells per query by centroid cosine (micro-
    * rounded, cell-id tie-break) — the probe router shared by
    * [[ivfTopK]] and [[ivfPqTopK]]. `queries` must carry `query_id` and
    * `qv` (array<double>); all query columns ride along, plus `cell`. */
  private def probeCells(
      queries: DataFrame, cents: DataFrame, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cent_sim_micro").desc, col("cell"))
    queries.crossJoin(broadcast(cents))
      .withColumn("cent_sim_micro", expr(
        s"CAST(round(${cosExpr("qv", "centroid")} * 1000000) AS BIGINT)"))
      .withColumn("probe_rank", row_number().over(w))
      .filter(col("probe_rank") <= nprobe)
      .drop("centroid", "cent_sim_micro", "probe_rank")
  }

  /** ADC ranking shared by [[pqAdcTopK]] and [[ivfPqTopK]]: `cands`
    * rows carry (query_id, cand_id, code_0…code_{m-1}, __lut); the
    * candidate distance is m map lookups + an integer sum, then a
    * per-query top-k (ascending, cand_id tie-break). */
  private[operators] def adcRankTopK(
      cands: DataFrame, m: Int, k: Int,
      extraCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val adc = (0 until m).map(j =>
      element_at(element_at(col("__lut"), j + 1), col(s"code_$j")))
      .reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_micro").asc, col("cand_id"))
    cands.filter(col("query_id") =!= col("cand_id"))
      .withColumn("adc_micro", adc)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(Seq(col("query_id"), col("cand_id")) ++ extraCols.map(col) ++
        Seq(col("rank"), col("adc_micro")): _*)
      .orderBy(col("query_id"), col("rank"))
  }

  /** PQ asymmetric-distance (ADC) top-k: rank the ENCODED corpus
    * against exact query vectors by looking the per-subspace distances
    * up in a per-query table instead of touching any stored float —
    * the query-side half of IVF-PQ. Each query's lookup table
    * (m×k micro-BIGINT distances between its slice and every
    * sub-centroid) is computed in-engine from the literal codebooks
    * (bit-identical to the oracle's), broadcast with the query row, and
    * the candidate distance is `m` array lookups + an integer sum —
    * map-side over the codes table, shuffling nothing but the final
    * top-k.
    *
    * @return (query_id, cand_id, rank, adc_micro), `rank` by ascending
    *         ADC distance with cand_id tie-break
    */
  def pqAdcTopK(
      emb: DataFrame,
      books: Seq[(Int, Int, Seq[Double])],
      queryIds: Seq[Long],
      k: Int = 5): DataFrame = {
    ensureDot(emb)
    val m = books.map(_._1).max + 1
    val sub = books.head._3.length
    val codes = pqEncode(emb, books)
    val queries = emb.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"),
        pqLutExpr(books, m, sub).as("__lut"))
    adcRankTopK(
      codes.withColumnRenamed("vec_id", "cand_id")
        .crossJoin(broadcast(queries)),
      m, k)
  }

  /** The full IVF-PQ probe: queries pick their `nprobe` nearest cells
    * by centroid cosine (the [[ivfTopK]] router — at 100 TB this is the
    * partition-pruned read), then rank ONLY the probed cells' vectors
    * by PQ asymmetric distance through per-query lookup tables — no
    * stored float is touched in the ranking, the index serves
    * m bytes/vector. This is the composition billion-scale ANN ships:
    * IVF bounds what is read, PQ bounds what is stored and compared.
    *
    * Plan shape: centroid pass (one aggregate), tiny probe table
    * (queries × cells → nprobe rows/query, with the LUT riding along),
    * broadcast-joined against the encoded corpus on the cell key;
    * distance is `m` array lookups + an integer sum, map-side; the only
    * shuffle is the final per-query top-k.
    *
    * @return (query_id, cand_id, cell, rank, adc_micro), rank by
    *         ascending ADC with cand_id tie-break
    */
  def ivfPqTopK(
      emb: DataFrame,
      books: Seq[(Int, Int, Seq[Double])],
      queryIds: Seq[Long],
      k: Int = 5,
      nprobe: Int = 2,
      cellCol: String = "label"): DataFrame = {
    ensureDot(emb)
    val m = books.map(_._1).max + 1
    val sub = books.head._3.length
    val queries = emb.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)").as("qv"),
        pqLutExpr(books, m, sub).as("__lut"))
    val probes = probeCells(queries, centroids(emb, cellCol), nprobe)
      .select(col("query_id"), col("__lut"), col("cell"))
    val codes = pqEncode(emb, books, keep = Seq(cellCol))
      .withColumnRenamed("vec_id", "cand_id")
      .withColumnRenamed(cellCol, "cell")
    adcRankTopK(codes.join(broadcast(probes), Seq("cell")),
      m, k, extraCols = Seq("cell"))
  }

  /** IVF top-k: queries are assigned to their `nprobe` nearest cells by
    * centroid cosine, then brute-force ranked only within those cells. */
  def ivfTopK(
      emb: DataFrame,
      queryIds: Seq[Long],
      k: Int = 5,
      nprobe: Int = 2,
      cellCol: String = "label"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ensureDot(emb)
    val cents = centroids(emb, cellCol)
    val queries = emb.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)").as("qv"))
    // probe assignment: nprobe nearest centroids per query via the
    // shared router (micro-rounded cosine, integer-exact cross-engine,
    // cell id as the deterministic tie-break)
    val probes = probeCells(queries, cents, nprobe)
      .select(col("query_id"), col("qv"), col("cell"))
    // search only the probed cells (no repartition: the broadcast join
    // below is map-side, so an exchange here would shuffle the corpus
    // for nothing on well-partitioned tables)
    val cands = emb
      .select(col("vec_id").as("cand_id"),
      col(cellCol).as("cell"),
      expr("CAST(embedding AS ARRAY<DOUBLE>)").as("cv"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim_micro").desc, col("cand_id"))
    cands.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim_micro", expr(
        s"CAST(round(${cosExpr("qv", "cv")} * 1000000) AS BIGINT)"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("cell"), col("rank"),
        col("cos_sim_micro"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication by embedding-cluster blocking — cluster the corpus
    * with the exact integer k-means quantizer ([[kmeansModel]], the
    * `q_kmeans` training), then compare cosine similarity ONLY within a
    * cluster and drop every vector that has a lower-id cluster-mate
    * above the threshold (the paper keeps one representative per
    * semantic group; min-id is its deterministic spelling — a vector
    * survives iff no earlier vector is semantically equivalent, so
    * re-running over a grown corpus never un-keeps a survivor).
    *
    * This is the embedding-space sibling of MinHash near-dup dedup:
    * MinHash catches lexical overlap, SemDeDup catches paraphrases and
    * templated rewrites that share no shingles.
    *
    * Scale shape: the paper's key move IS the clustering — k clusters
    * cut candidate pairs ~k-fold vs all-pairs (they run k=11k on
    * LAION); pair generation here is an equi-join on the cluster id,
    * never a cross product. An oversized cluster (skewed corpora) is
    * sub-bucketed by [[hyperplaneLshMd5]] exactly like
    * [[cosineDupPairs]]' hot-label guard: bounded candidate volume for
    * a little recall, and only past `maxBlock`, so results are exact —
    * and oracle-checkable — unless the guard actually fires.
    *
    * Output: one row per input vector,
    * (vec_id, cluster, is_kept), `is_kept` false iff a lower-id
    * same-cluster vector has cos_sim_micro > `thresholdMicro`. */
  def semanticDedup(
      emb: DataFrame,
      k: Int = 4,
      iters: Int = 2,
      thresholdMicro: Long = 300000L,
      maxBlock: Long = 100000L,
      subBits: Int = 4,
      dim: Int = 64): DataFrame =
    semanticDedupWith(emb, kmeansModel(emb, k, iters),
      thresholdMicro, maxBlock, subBits, dim)

  /** [[semanticDedup]] at the paper's own scale configuration: k grows
    * with the corpus so the TARGET CLUSTER SIZE stays fixed (Abbas et
    * al. run k=11k on LAION-440M ≈ 40k vectors/cluster; they scale k,
    * not cluster size). A fixed k is quadratic — within-cluster pairs
    * grow (N/k)² — while fixed cluster size T keeps pair volume ≈ N·T/2,
    * LINEAR in the corpus. k = ⌈N/T⌉ (integer ceil-div, so both engines
    * and every replay agree on k for a given corpus).
    *
    * Honest cost note: exact nearest-centroid assignment is N·k = N²/T
    * distance evaluations — the same brute-force assignment the paper
    * runs (their FAISS GPU argmin is exact). That term is pure map-side
    * compute with a broadcast model; the SHUFFLE stays linear (the pair
    * join exchanges 2N rows regardless of k). At true 100 TB scale the
    * assignment leg would ride the [[CellIndex]] coarse-quantizer probe
    * instead of the flat argmin. */
  def semanticDedupAuto(
      emb: DataFrame,
      targetClusterSize: Long = 128L,
      iters: Int = 2,
      thresholdMicro: Long = 300000L,
      maxBlock: Long = 100000L,
      subBits: Int = 4,
      dim: Int = 64): DataFrame =
    semanticDedupWith(emb,
      kmeansModelAuto(emb, targetClusterSize, iters),
      thresholdMicro, maxBlock, subBits, dim)

  /** [[kmeansModel]] with k = ⌈N / targetClusterSize⌉ — the trained
    * quantizer for [[semanticDedupAuto]], exposed so serving pipelines
    * can train once and dedup many batches against it. */
  def kmeansModelAuto(emb: DataFrame, targetClusterSize: Long = 128L,
      iters: Int = 2): Seq[(Int, Seq[Double])] = {
    require(targetClusterSize >= 1,
      s"targetClusterSize must be >= 1, got $targetClusterSize")
    val n = emb.count()
    val k = math.max(1L,
      (n + targetClusterSize - 1L) / targetClusterSize).toInt
    kmeansModel(emb, k, iters)
  }

  /** [[semanticDedup]] against an ALREADY-TRAINED quantizer — the
    * serving shape (a production pipeline trains the clustering once
    * and dedups many batches/epochs against it; re-training per call
    * would both cost a corpus pass and shift cluster boundaries
    * between runs). */
  def semanticDedupWith(
      emb: DataFrame,
      model: Seq[(Int, Seq[Double])],
      thresholdMicro: Long = 300000L,
      maxBlock: Long = 100000L,
      subBits: Int = 4,
      dim: Int = 64): DataFrame = {
    ensureDot(emb)
    val assigned = emb
      .select(col("vec_id"), col("embedding"))
      .withColumn("cluster", nearestCentroidExpr(model,
        expr("CAST(embedding AS ARRAY<DOUBLE>)")))
    val hot = assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBlock)
      .select("cluster").collect().map(_.getInt(0)).toSeq
    val bucketed =
      if (hot.isEmpty) assigned.withColumn("__blk", lit(0L))
      else hyperplaneLshMd5(assigned, subBits, dim)
        .withColumn("__blk",
          when(col("cluster").isInCollection(hot), col("lsh_bucket"))
            .otherwise(lit(0L)))
        .drop("lsh_bucket")
    val withBlk = bucketed
      .withColumn("v", expr("CAST(embedding AS ARRAY<DOUBLE>)"))
      .withColumn("norm", expr("sqrt(vector_dot(v, v))"))
    val a = withBlk.select(col("cluster"), col("__blk"),
      col("vec_id").as("vec_a"), col("v").as("qv"), col("norm").as("qnorm"))
    val b = withBlk.select(col("cluster"), col("__blk"),
      col("vec_id").as("vec_b"), col("v").as("cv"), col("norm").as("cnorm"))
    val dropped = a.join(b, Seq("cluster", "__blk"))
      .filter(col("vec_a") < col("vec_b"))
      .filter(expr(
        "CAST(round(vector_dot(qv, cv) / (qnorm * cnorm) * 1000000) " +
          s"AS BIGINT) > $thresholdMicro"))
      .select(col("vec_b").as("vec_id")).distinct()
      .withColumn("__dup", lit(true))
    assigned
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(!col("__dup"), lit(true)).as("is_kept"))
  }

  /** Cosine near-duplicate pairs blocked on the cell/label column, with a
    * hot-block guard: pair generation inside one label is O(n²/label), so
    * any label whose population exceeds `maxBlock` is sub-bucketed by
    * [[hyperplaneLshMd5]] (`subBits` planes → 2^subBits buckets) and only
    * same-bucket pairs are compared — the standard LSH trade of bounded
    * candidate volume for a little recall on the hot block. Labels under
    * the cap keep exact within-label comparison, so results are unchanged
    * unless the guard actually fires. The hot-label list is a driver-side
    * broadcast-sized aggregate (one row per label).
    *
    * Output: (vec_a, vec_b, label, cos_sim_micro), vec_a < vec_b,
    * cos_sim_micro > `thresholdMicro`. */
  def cosineDupPairs(
      emb: DataFrame,
      thresholdMicro: Long = 300000L,
      maxBlock: Long = 100000L,
      subBits: Int = 4,
      dim: Int = 64): DataFrame = {
    ensureDot(emb)
    val hot = emb.groupBy(col("label")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBlock)
      .select("label").collect().map(_.get(0)).toSeq
    val bucketed =
      if (hot.isEmpty) emb.withColumn("__blk", lit(0L))
      else hyperplaneLshMd5(emb, subBits, dim)
        .withColumn("__blk",
          when(col("label").isInCollection(hot), col("lsh_bucket"))
            .otherwise(lit(0L)))
        .drop("lsh_bucket")
    val withBlk = bucketed
      .withColumn("v", expr("CAST(embedding AS ARRAY<DOUBLE>)"))
      .withColumn("norm", expr("sqrt(vector_dot(v, v))"))
    val a = withBlk.select(col("vec_id").as("vec_a"), col("label"),
      col("__blk"), col("v").as("qv"), col("norm").as("qnorm"))
    val b = withBlk.select(col("vec_id").as("vec_b"), col("label"),
      col("__blk"), col("v").as("cv"), col("norm").as("cnorm"))
    a.join(b, Seq("label", "__blk"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos_sim_micro", expr(
        "CAST(round(vector_dot(qv, cv) / (qnorm * cnorm) * 1000000) AS BIGINT)"))
      .filter(col("cos_sim_micro") > thresholdMicro)
      .select(col("vec_a"), col("vec_b"), col("label"), col("cos_sim_micro"))
  }

  /** Per-vector int8 quantization (min/max affine): each embedding maps
    * to TINYINT values in [-128, 127] (genuinely 1 byte per component —
    * 4× smaller than float32) with its own (scale, vmin) pair kept for
    * dequantization; reconstruction error is bounded by scale/2. */
  def quantizeInt8(emb: DataFrame): DataFrame =
    emb
      .withColumn("v", expr("CAST(embedding AS ARRAY<DOUBLE>)"))
      .withColumn("vmin", expr("array_min(v)"))
      .withColumn("vmax", expr("array_max(v)"))
      .withColumn("scale",
        expr("CASE WHEN vmax = vmin THEN 1D ELSE (vmax - vmin) / 255D END"))
      .withColumn("qvec", expr(
        "transform(v, x -> CAST(round((x - vmin) / scale) - 128 AS TINYINT))"))
      .drop("v")

  /** Dequantize back to doubles: `x ≈ (q + 128) * scale + vmin`. */
  def dequantizeInt8(quantized: DataFrame): DataFrame =
    quantized.withColumn("dequantized",
      expr("transform(qvec, q -> (CAST(q AS INT) + 128) * scale + vmin)"))

  /** ±1 hyperplane components derived from md5 parity: component (b, d)
    * is −1 iff the first hex char of md5("b:d") is odd. Deterministic and
    * recomputable in any engine with md5 — DuckDB derives the identical
    * planes in SQL, which makes the md5 LSH variant oracle-checkable. */
  def md5PlaneSigns(nbits: Int, dim: Int): Array[Array[Double]] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nbits, dim) { (b, d) =>
      val hex = digest.digest(s"$b:$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if ("13579bdf".contains(hex.charAt(0))) -1.0 else 1.0
    }
  }

  /** Hyperplane LSH with md5-derived planes embedded as literal arrays:
    * the planes are model parameters computed once on the driver (the
    * broadcast-constants shape — at scale this is strictly better than
    * re-hashing per row), and the sign/projection arithmetic matches the
    * DuckDB oracle bit-for-bit (sequential left-to-right double sums). */
  def hyperplaneLshMd5(emb: DataFrame, nbits: Int = 12, dim: Int = 64): DataFrame = {
    ensureDot(emb)
    val signs = md5PlaneSigns(nbits, dim)
    val signBits = (0 until nbits).map { b =>
      val arr = signs(b).map(s => if (s < 0) "-1D" else "1D").mkString(", ")
      val proj = s"vector_dot(v, array($arr))"
      s"CASE WHEN ($proj) > 0 THEN shiftleft(1L, $b) ELSE 0L END"
    }
    emb
      .withColumn("v", expr("CAST(embedding AS ARRAY<DOUBLE>)"))
      // fail LOUD on a dim mismatch: vector_dot returns null against a
      // wrong-length plane, every sign bit would become 0, and ALL rows
      // would land in bucket 0 — downstream hot-block sub-bucketing
      // silently degrades to the full O(n²) block it exists to prevent
      .withColumn("lsh_bucket", expr(
        s"""CASE WHEN size(v) = $dim THEN
           |  aggregate(array(${signBits.mkString(", ")}), 0L,
           |    (acc, x) -> acc | x)
           |ELSE CAST(raise_error(CONCAT(
           |  'hyperplane_lsh: embedding dim ', CAST(size(v) AS STRING),
           |  ' != configured dim $dim')) AS BIGINT) END""".stripMargin))
      .drop("v")
  }

  /** Random-hyperplane LSH bucketing: `nbits` deterministic pseudo-random
    * hyperplanes (components derived from xxhash64(bit, dim) mapped to
    * ±1), signature = sign pattern of the projections. Vectors sharing a
    * signature bucket are ANN candidates. */
  def hyperplaneLsh(emb: DataFrame, nbits: Int = 12): DataFrame = {
    ensureDot(emb)
    val signBits = (0 until nbits).map { b =>
      val proj =
        s"""vector_dot(v, transform(sequence(0, size(v) - 1),
           |  d -> CASE WHEN xxhash64($b, d) % 2 = 0 THEN 1D ELSE -1D END))""".stripMargin
      s"CASE WHEN ($proj) > 0 THEN shiftleft(1L, $b) ELSE 0L END"
    }
    emb
      .withColumn("v", expr("CAST(embedding AS ARRAY<DOUBLE>)"))
      .withColumn("lsh_bucket", expr(
        s"""aggregate(array(${signBits.mkString(", ")}), 0L,
           |  (acc, x) -> acc | x)""".stripMargin))
      .drop("v")
  }

  /** Signed feature hashing (Weinberger et al. 2009, "Feature Hashing
    * for Large Scale Multitask Learning"): text → a `dim`-bucket integer
    * vector ENTIRELY inside the engine — token t contributes ±1 to
    * bucket `h(t) mod dim`, sign from the next hash bit (the signed
    * trick keeps inner products unbiased under collisions). This is the
    * model-free bridge from the text column into every vector operator
    * here (cosine pairs, top-k, IVF cells): a pipeline without an
    * embedding model still gets vector-space near-dup and similarity,
    * and the vectors are exact integers — a pure function of the text —
    * so replays, engines, and oracle checks all agree bit-for-bit.
    *
    * Sparse cell form: (idCol, bucket, weight), zero cells (cancelled
    * signs) dropped. Dot products run RELATIONALLY on this form (join
    * on bucket, sum of weight products — see `q_hash_embed_topk`),
    * which at scale beats dense arrays when dim ≫ tokens-per-doc.
    * Shape: explode → one hash aggregate on (id, bucket), map-side
    * partials; no joins, no corpus shuffle beyond the aggregate. */
  def hashEmbedCells(docs: DataFrame, dim: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    docs
      .select(col(idCol),
        explode(split(lower(trim(col(textCol))), "[ \\t\\n\\x0B\\f\\r]+")).as("__t"))
      .withColumn("__h",
        conv(substring(md5(col("__t")), 1, 15), 16, 10).cast("long"))
      .withColumn("bucket", pmod(col("__h"), lit(dim.toLong)).cast("int"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(expr(s"CASE WHEN (__h div $dim) % 2 = 0 THEN 1 ELSE -1 END"))
        .as("weight"))
      .filter(col("weight") =!= 0)
  }

  /** [[hashEmbedCells]] assembled into a dense `array<bigint>` of
    * length `dim` — the shape the array-based vector operators consume
    * (`vector_dot`, int8 quantization, IVF training after a cast).
    * Every input doc id appears in the output: a doc with no cells
    * (empty token stream, or all buckets cancelling to zero weight)
    * gets the all-zero vector rather than silently vanishing — dropped
    * rows here would shrink IVF training sets and top-k candidate
    * pools downstream. */
  def hashEmbed(docs: DataFrame, dim: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol)).distinct()
      .join(hashEmbedCells(docs, dim, textCol, idCol)
        .groupBy(col(idCol))
        .agg(map_from_entries(collect_list(struct(col("bucket"),
          col("weight")))).as("__m")),
        Seq(idCol), "left")
      .select(col(idCol), expr(
        s"transform(sequence(0, ${dim - 1}), " +
          "i -> coalesce(element_at(__m, CAST(i AS INT)), 0L))")
        .as("features"))
}
