package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Dedup.{dotCol, withUnitVector}

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Two tiers:
  *  - `bruteForceTopK`: exact cosine top-k — the correctness baseline.
  *    Query set × corpus via broadcast of the (small) query side; ranking by
  *    a per-query window. At 100 TB this is the per-bucket inner loop, not
  *    the outer scan.
  *  - `lshTopK`: random-hyperplane LSH with `tables` independent hash tables
  *    of `planes` sign bits each. A vector lands in one bucket per table;
  *    candidates = any shared (table, bucket) — the classic recall lever
  *    (more tables → higher recall, more candidates). The candidate join is
  *    an equi-join on (table, bucket): no cross join anywhere.
  *
  * All vectors are unit-normalized once up front (`withUnitVector`), so
  * cosine = one dot-product fold per pair. Hyperplane weights are
  * integer-derived (`lcg/2^21 - 0.5`) — bit-identical across engines.
  */
object Similarity {

  /** Deterministic pseudo-random hyperplane weight for global plane index g,
    * component d: ((1103515245*(g*dim+d+1)+12345) mod 2^21)/2^21 - 0.5. */
  private def planeWeight(g: Column, d: Column, dim: Int): Column =
    ((lit(1103515245L) * (g * dim + d + 1) + lit(12345L)) % lit(2097152L))
      .cast("double") / lit(2097152.0) - lit(0.5)

  /** Hyperplane dot product for one (table-global plane g, vector vn) —
    * a single-level order-fixed fold over `dim` components. The bucket is
    * then assembled relationally (explode planes → sign → integer
    * groupBy-sum) rather than as a nested fold: flatter expressions stay
    * inside whole-stage codegen and the bit-packing sum is
    * order-independent. `dim` must match the embedding width — a shorter
    * array would null the fold and collapse every vector into bucket 0. */
  def planeDot(vn: Column, g: Column, dim: Int): Column =
    aggregate(
      sequence(lit(0), lit(dim - 1)), lit(0.0),
      (s, d) => s + planeWeight(g, d, dim) * element_at(vn, d + 1))

  /** Exact cosine top-k for each query vector (queries = vec_id < nQueries).
    * The query side is broadcast; ranking via row_number over (cosine desc,
    * id) — deterministic under ties. */
  def bruteForceTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val e = withUnitVector(emb).select(col("vec_id"), col("vn"))
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vn").as("qv"))
    val scored = broadcast(q).join(e, col("query_id") =!= col("vec_id"))
      .withColumn("cos", dotCol(col("qv"), col("vn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"),
        floor(col("cos") * 1000000.0 + 0.5).cast("long").as("cos_x1000000"))
  }

  /** IVF (inverted-file) ANN top-k: a k-means coarse quantizer assigns each
    * vector to a cell; a query probes its `nProbe` nearest cells and ranks
    * candidates by exact cosine. The other classic ANN scale path besides
    * LSH: cells are data-adaptive (better recall on clustered data), at the
    * cost of a training pass. Centroids are tiny (nCells × dim) and ride
    * along broadcast; the candidate join is an equi-join on `cell`.
    * Not oracle-checkable (k-means isn't reproducible in DuckDB) — covered
    * by the rows-only driver check + the cosine-consistency spec.
    *
    * `trainFraction` is the scale lever for the training pass: k-means
    * iterates over its input, so at 100 TB you fit on a deterministic
    * sample (centroid quality needs only a representative sample, and cell
    * ASSIGNMENT still covers every vector) — the standard IVF practice of
    * training the quantizer on a corpus subset. */
  def ivfTopK(emb: DataFrame, nQueries: Int, k: Int,
              nCells: Int = 16, nProbe: Int = 4,
              trainFraction: Double = 1.0): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(trainFraction > 0.0 && trainFraction <= 1.0,
      s"trainFraction $trainFraction must be in (0, 1]")
    val e = withUnitVector(emb).select(col("vec_id"), col("vn"))
      .withColumn("features", array_to_vector(col("vn")))
    // an over-aggressive fraction on a small corpus can undershoot nCells
    // and fail k-means with an opaque MLlib error — fall back to the full
    // corpus (the count is trivial next to the training passes it precedes)
    val trainSet =
      if (trainFraction < 1.0) {
        val sampled = e.sample(withReplacement = false, trainFraction, seed = 42L)
        if (sampled.count() >= nCells) sampled else e
      } else e
    // cap training iterations: coarse-quantizer quality plateaus within a
    // few Lloyd rounds and probe recall is insensitive to the tail — the
    // default 20 iterations just multiplies passes over the training set
    val model = new KMeans().setK(nCells).setSeed(42L).setMaxIter(8)
      .setFeaturesCol("features").fit(trainSet)
    val assigned = model.transform(e)
      .select(col("vec_id"), col("vn"), col("prediction").as("cell"))
    val spark = emb.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq.toDF("cell", "centroid")
    // per query: nProbe nearest cells by (exact) distance to the centroid
    val q = assigned.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vn").as("qv"))
    val wCell = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist"), col("cell"))
    val probes = broadcast(q).join(broadcast(centroids))
      // true squared distance: |q-c|^2 = 1 + |c|^2 - 2 q·c (centroids are
      // means of unit vectors, NOT unit themselves — the |c|^2 term matters)
      .withColumn("cdist",
        dotCol(col("centroid"), col("centroid")) - lit(2.0) * dotCol(col("qv"), col("centroid")))
      .withColumn("crank", row_number().over(wCell))
      .where(col("crank") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))
    val scored = probes.join(assigned, Seq("cell"))
      .where(col("query_id") =!= col("vec_id"))
      .withColumn("cos", dotCol(col("qv"), col("vn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"),
        floor(col("cos") * 1000000.0 + 0.5).cast("long").as("cos_x1000000"))
  }

  /** Deterministic IVF ANN top-k — the oracle-checkable sibling of
    * [[ivfTopK]]: the k-means coarse quantizer (not reproducible
    * cross-engine) is replaced by a FIXED random-hyperplane quantizer —
    * cell = `planes` packed sign bits from the same LCG plane family as
    * [[graft.plans.MultiPlaneBucketsExpr]] (2^planes cells) — and centroids
    * are derived from exact per-component integer sums (fixed-point
    * `floor(x·1e6+0.5)` then integer Σ), so they are order-independent and
    * bit-identical in DuckDB. Probe ranking (|c|² − 2·q·c, ties by cell) and
    * candidate ranking (exact cosine) are sequential double folds — the
    * proven-parity pattern. Same plan shape as [[ivfTopK]]: tiny broadcast
    * centroid table, candidate equi-join on `cell`. k-means stays the
    * adaptive default; this variant trades cell quality for a full
    * correctness gate on the probe/rank machinery they share. */
  def ivfTopKDet(emb: DataFrame, nQueries: Int, k: Int,
                 planes: Int = 4, nProbe: Int = 4, dim: Int = 64): DataFrame = {
    val S = 1000000.0
    val e = withUnitVector(emb).select(col("vec_id"), col("vn"))
    val assigned = e.withColumn("cell",
      element_at(graft.plans.ArrayExpressions.planeBuckets(
        col("vn"), planes, 1, dim), 1))
    // exact integer component sums per cell → deterministic centroids
    val comp = assigned
      .select(col("cell"), posexplode(col("vn")).as(Seq("d", "x")))
      .withColumn("xi", floor(col("x") * S + 0.5).cast("long"))
    val cellSums = comp.groupBy(col("cell"), col("d"))
      .agg(sum(col("xi")).as("sd"), count(lit(1)).as("cnt"))
    val centroids = cellSums
      .withColumn("cd", col("sd").cast("double") / (col("cnt").cast("double") * S))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("cd")))),
        x => x.getField("cd")).as("centroid"))
    val q = assigned.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vn").as("qv"))
    val wCell = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist"), col("cell"))
    val probes = broadcast(q).join(broadcast(centroids))
      // |q-c|² − 1 = |c|² − 2·q·c (q is unit; centroids are means, not unit)
      .withColumn("cdist",
        dotCol(col("centroid"), col("centroid")) -
          lit(2.0) * dotCol(col("qv"), col("centroid")))
      .withColumn("crank", row_number().over(wCell))
      .where(col("crank") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))
    val scored = probes.join(assigned, Seq("cell"))
      .where(col("query_id") =!= col("vec_id"))
      .withColumn("cos", dotCol(col("qv"), col("vn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"),
        floor(col("cos") * 1000000.0 + 0.5).cast("long").as("cos_x1000000"))
  }

  /** Int8 quantization of the unit vectors — the ANN STORAGE lever at
    * 100 TB: `q[i] = round(127·v[i]/amax)`, `scale = amax/127`, cutting
    * vector bytes 4× (the index shuffle and executor cache shrink with
    * them) at a bounded cosine error (≤ ~1/127 per component pair).
    * Quantized codes are integer-exact cross-engine, and the integer dot
    * product is order-independent — so unlike raw float sums, the
    * RANKING of a quantized ANN query is bit-reproducible and
    * oracle-checkable. Output: (vec_id, qv, scale). */
  def quantizeUnit(emb: DataFrame): DataFrame =
    withUnitVector(emb)
      .withColumn("amax", array_max(transform(col("vn"), x => abs(x))))
      .withColumn("qv",
        transform(col("vn"), x => floor(x * 127.0 / col("amax") + 0.5)))
      .select(col("vec_id"), col("qv"), (col("amax") / 127.0).as("scale"))

  /** Exact-over-quantized top-k: the [[bruteForceTopK]] shape ranked by the
    * approximate cosine `(scale_q · scale_v) · (q̂ · v̂)` — the integer dot
    * is exact, the two scale multiplies are fixed-order IEEE. The recall
    * spec quantifies what the 4× compression costs. */
  def bruteForceTopKQuantized(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val e = quantizeUnit(emb)
      .withColumn("dv", transform(col("qv"), x => x.cast("double")))
      .select(col("vec_id"), col("dv"), col("scale"))
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("dv").as("qq"),
        col("scale").as("qs"))
    val scored = broadcast(q).join(e, col("query_id") =!= col("vec_id"))
      .withColumn("cos_est", (col("qs") * col("scale")) * dotCol(col("qq"), col("dv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_est").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"),
        floor(col("cos_est") * 1000000.0 + 0.5).cast("long").as("cos_est_x1000000"))
  }

  /** Product-quantization ANN (deterministic) — the ANN COMPRESSION lever
    * beyond int8: each unit vector splits into `m` subvectors; each
    * subspace has a 2^`bits`-entry codebook, and a vector is stored as `m`
    * codebook indices — `m·bits` bits per vector (64 dims × f32 → 8×4 bits
    * is a 64× index compression; the corpus-side join ships codes, never
    * floats). Query scoring is ADC (asymmetric distance computation): the
    * query keeps full precision, a per-(query, subspace, code) lookup
    * table of partial dots is built against the codebooks (tiny:
    * `nQueries·m·2^bits` rows, broadcast), and a vector's estimated dot is
    * the sum of its `m` table entries.
    *
    * ADC generates a SHORTLIST which is then re-ranked by exact cosine
    * over the shortlist's full vectors (the FAISS refine step): at 64×
    * compression ADC cannot order true neighbors within a cluster — its
    * job is cheap candidate generation over codes; only `shortlist` rows
    * per query ever touch floats again.
    *
    * Deterministic end to end (so the whole query is oracle-exact):
    * codebook init from `bits` fixed hyperplane signs per subspace,
    * `refine` Lloyd rounds with argmin reassignment (the [[ivfTopKDet]]
    * probe comparison) and exact fixed-point integer re-means, and each
    * ADC entry rounded to integer ×10⁶ — the per-vector sum of `m`
    * entries is an ORDER-INDEPENDENT integer sum (a float sum over a hash
    * aggregation would not be reproducible).
    *
    * Plan shape: map-only code assignment → hash aggs (centroids, per
    * refine round one argmin window + re-mean) → broadcast LUT equi-join
    * on (subspace, code) → integer-sum agg → shortlist window → exact
    * re-rank join over `shortlist` rows per query. No cartesian: the LUT
    * join fans each corpus code row out only to the query rows of the
    * same (subspace, code). */
  def pqTopK(emb: DataFrame, nQueries: Int, k: Int,
             m: Int = 8, bits: Int = 4, dim: Int = 64,
             refine: Int = 1, shortlist: Int = 50): DataFrame = {
    require(dim % m == 0, s"dim ($dim) must split evenly into m ($m) subspaces")
    val S = 1000000.0
    val e = withUnitVector(emb).select(col("vec_id"), col("vn"))
    val (sub, codes, centroids) = pqTrain(e, m, bits, dim / m, refine)
    // ADC lookup table: per (query, subspace, code) the partial dot against
    // the codebook centroid, rounded to an integer — the per-vector sum of
    // m integers is then order-independent
    val q = sub.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("s"), col("sv").as("qsv"))
    val lut = q.join(centroids, Seq("s"))
      .withColumn("ci",
        floor(dotCol(col("qsv"), col("centroid")) * S + 0.5).cast("long"))
      .select(col("query_id"), col("s"), col("code"), col("ci"))
    val adc = codes.join(broadcast(lut), Seq("s", "code"))
      .where(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("ci")).as("est_dot_x1000000"))
    shortlistRerank(adc, e, k, shortlist)
  }

  /** PQ codebook training, shared by [[pqTopK]] and [[ivfPqTopK]]:
    * (vec, subspace) subvectors, initial codes from `bits` fixed
    * hyperplane signs per subspace (a deterministic k-means init; signs
    * alone place centroids too coarsely for ADC ranking — refinement is
    * what buys recall), then `refine` Lloyd rounds with argmin
    * reassignment (|c|² − 2·x·c, ties on code) and exact fixed-point
    * integer re-means. Empty cells drop out of the rebuilt codebook, so
    * every stored code keeps a centroid. Returns (sub, codes, centroids).
    *
    * `sub` is localCheckpoint'd: it feeds the code init, every refine
    * round's reassignment AND re-mean, and the query-side LUT — without
    * the lineage cut each consumer re-runs the scan + normalize + explode
    * chain from parquet. */
  private def pqTrain(e: DataFrame, m: Int, bits: Int, sd: Int,
                      refine: Int): (DataFrame, DataFrame, DataFrame) = {
    require(bits >= 1 && bits <= 8, "codebook bits in [1, 8]")
    require(refine >= 0, "refine rounds must be >= 0")
    val S = 1000000.0
    val sub = e
      .select(col("vec_id"), col("vn"),
        explode(sequence(lit(0), lit(m - 1))).as("s"))
      .withColumn("sv", slice(col("vn"), col("s") * sd + 1, lit(sd)))
      .localCheckpoint()
    // exact integer component sums per (subspace, code) → deterministic
    // centroids (the ivfTopKDet pattern)
    def centroidsOf(codes: DataFrame): DataFrame =
      sub.join(codes, Seq("vec_id", "s"))
        .select(col("s"), col("code"), posexplode(col("sv")).as(Seq("d", "x")))
        .withColumn("xi", floor(col("x") * S + 0.5).cast("long"))
        .groupBy(col("s"), col("code"), col("d"))
        .agg(sum(col("xi")).as("sd_"), count(lit(1)).as("cnt"))
        .withColumn("cd", col("sd_").cast("double") / (col("cnt").cast("double") * S))
        .groupBy(col("s"), col("code"))
        .agg(transform(array_sort(collect_list(struct(col("d"), col("cd")))),
          x => x.getField("cd")).as("centroid"))
    // codes are checkpointed per round: each round's table feeds BOTH its
    // centroid re-mean and (for the final round) every downstream consumer
    // (ADC join, artifact write) — uncheckpointed, the whole reassignment
    // join re-runs once per consumer (measured 11.7 → ~7 s on the
    // buildAnnIndex path). The table is (n·m) slim rows — cheap to hold.
    var codes = sub
      .select(col("vec_id"), col("s"), col("sv"),
        explode(sequence(lit(0), lit(bits - 1))).as("p"))
      .withColumn("dotp", planeDot(col("sv"), col("s") * bits + col("p"), sd))
      .groupBy(col("vec_id"), col("s"))
      .agg(sum(when(col("dotp") > 0, pow(lit(2.0), col("p")).cast("long"))
        .otherwise(0L)).as("code"))
      .localCheckpoint()
    var centroids = centroidsOf(codes)
    for (_ <- 1 to refine) {
      // argmin as a map-combinable min(struct(dist, code)) hash agg — the
      // same (dist, code)-ordered pick a row_number window makes, without
      // the per-(vec, s) sort shuffle
      codes = sub.join(centroids, Seq("s"))
        .withColumn("dist",
          dotCol(col("centroid"), col("centroid")) -
            lit(2.0) * dotCol(col("sv"), col("centroid")))
        .groupBy(col("vec_id"), col("s"))
        .agg(min(struct(col("dist"), col("code"))).as("m"))
        .select(col("vec_id"), col("s"), col("m").getField("code").as("code"))
        .localCheckpoint()
      centroids = centroidsOf(codes)
    }
    // the codebook is ≤ m·2^bits tiny rows but its lineage is a corpus
    // join+agg — materialize so the LUT and the artifact write reuse it
    (sub, codes, centroids.localCheckpoint())
  }

  /** ADC shortlist → exact re-rank (the FAISS refine step), shared by
    * [[pqTopK]] and [[ivfPqTopK]]: the codes-only estimates rank a
    * SHORTLIST cheaply (m integer adds per vector, floats never
    * shuffled); only the shortlist's full vectors are touched for exact
    * cosine. At 64× compression ADC alone cannot order true neighbors
    * within a cluster — its job is candidate generation. */
  private def shortlistRerank(adc: DataFrame, e: DataFrame, k: Int,
                              shortlist: Int): DataFrame = {
    val wShort = Window.partitionBy(col("query_id"))
      .orderBy(col("est_dot_x1000000").desc, col("vec_id"))
    val short = adc.withColumn("srank", row_number().over(wShort))
      .where(col("srank") <= shortlist)
      .select(col("query_id"), col("vec_id"))
    val scored = short
      .join(e.select(col("vec_id").as("query_id"), col("vn").as("qv")), Seq("query_id"))
      .join(e, Seq("vec_id"))
      .withColumn("cos", dotCol(col("qv"), col("vn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"),
        floor(col("cos") * 1000000.0 + 0.5).cast("long").as("cos_x1000000"))
  }

  /** IVF + PQ composed — the production ANN index layout (the FAISS
    * `IVFx,PQy` shape): the deterministic coarse quantizer of
    * [[ivfTopKDet]] restricts each query to `nProbe` cells' members, and
    * ONLY those candidates are scored by [[pqTopK]]'s integer ADC over
    * the 64×-compressed codes, then the shortlist is re-ranked exactly.
    * At 100 TB this is the index that actually ships: the coarse probe
    * bounds the candidate set (ADC cost per query drops from O(n) to
    * O(n·nProbe/2^planes)), the PQ codes bound the bytes per candidate,
    * and the exact re-rank touches only `shortlist` full vectors. Both
    * quantizers are the proven-parity deterministic machineries, so the
    * composition stays oracle-exact end to end.
    *
    * Plan shape: coarse cell assignment (map-only) → broadcast centroid
    * probe ranking → candidate equi-join on `cell` → codes equi-join +
    * broadcast-LUT ADC integer sum → shortlist window → exact re-rank
    * join. No cartesian anywhere; every join is key-bounded. */
  def ivfPqTopK(emb: DataFrame, nQueries: Int, k: Int,
                planes: Int = 4, nProbe: Int = 4,
                m: Int = 8, bits: Int = 4, dim: Int = 64,
                refine: Int = 1, shortlist: Int = 50): DataFrame = {
    require(dim % m == 0, s"dim ($dim) must split evenly into m ($m) subspaces")
    val e = withUnitVector(emb).select(col("vec_id"), col("vn"))
    // coarse tier: cells + integer-exact centroids (ivfTopKDet machinery);
    // checkpointed — feeds the centroid agg, the probe, and the candidate
    // join
    val assigned = coarseAssign(e, planes, dim)
    val cents = coarseCentroids(assigned)
    // PQ tier: codebook trained on the whole corpus (as pqTopK), ADC
    // restricted to the probed candidates
    val (_, codes, centroids) = pqTrain(e, m, bits, dim / m, refine)
    ivfPqProbe(assigned.select(col("vec_id"), col("vn")), assigned,
      cents, codes, centroids, nQueries, k, nProbe, m, dim, shortlist)
  }

  /** Coarse cell assignment shared by [[ivfPqTopK]] and [[buildAnnIndex]]:
    * `planes` fixed-hyperplane signs per vector, localCheckpoint'd — it
    * feeds the centroid agg, the probe, and the candidate join. */
  private def coarseAssign(e: DataFrame, planes: Int, dim: Int): DataFrame =
    e.withColumn("cell",
        element_at(graft.plans.ArrayExpressions.planeBuckets(
          col("vn"), planes, 1, dim), 1))
      .localCheckpoint()

  /** Per-(cell, dimension) integer component sums of a [[coarseAssign]]
    * table — the MERGEABLE form of the coarse centroids (the BM25 family's
    * uncapped-termdf idea, closed for ANN): integer sums are associative,
    * so the sums of base ∪ batch equal the merged sums of each part, and
    * the derived centroid doubles are bit-identical either way. */
  private def coarseSums(assigned: DataFrame): DataFrame = {
    val S = 1000000.0
    assigned
      .select(col("cell"), posexplode(col("vn")).as(Seq("d", "x")))
      .withColumn("xi", floor(col("x") * S + 0.5).cast("long"))
      .groupBy(col("cell"), col("d"))
      .agg(sum(col("xi")).as("sd"), count(lit(1)).as("cnt"))
  }

  /** Centroid arrays from a [[coarseSums]] table (exact fixed-order
    * division per component, array assembled in dimension order). */
  private def centroidsFromSums(sums: DataFrame): DataFrame = {
    val S = 1000000.0
    sums
      .withColumn("cd", col("sd").cast("double") / (col("cnt").cast("double") * S))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("cd")))),
        x => x.getField("cd")).as("centroid"))
  }

  /** Integer-exact per-cell centroids of a [[coarseAssign]] table. */
  private def coarseCentroids(assigned: DataFrame): DataFrame =
    centroidsFromSums(coarseSums(assigned))

  /** The IVF+PQ SERVE path, shared verbatim by [[ivfPqTopK]] (index built
    * in-plan) and [[annQueryIndex]] (index read from parquet), so the two
    * forms are byte-identical by construction: coarse probe ranking →
    * candidate equi-join on `cell` → broadcast-LUT integer ADC →
    * shortlist window → exact re-rank. Query subvectors are re-sliced
    * from the unit vector with the same `slice` expression [[pqTrain]]
    * uses, so the LUT's doubles are bit-equal either way. */
  private def ivfPqProbe(vectors: DataFrame, cells: DataFrame,
                         coarseCents: DataFrame, codes: DataFrame,
                         pqCents: DataFrame, nQueries: Int, k: Int,
                         nProbe: Int, m: Int, dim: Int,
                         shortlist: Int): DataFrame = {
    val S = 1000000.0
    val sd = dim / m
    val e = vectors.select(col("vec_id"), col("vn"))
    val q0 = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vn").as("qv"))
    val wCell = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist"), col("cell"))
    val probes = broadcast(q0).join(broadcast(coarseCents))
      .withColumn("cdist",
        dotCol(col("centroid"), col("centroid")) -
          lit(2.0) * dotCol(col("qv"), col("centroid")))
      .withColumn("crank", row_number().over(wCell))
      .where(col("crank") <= nProbe)
      .select(col("query_id"), col("cell"))
    val cand = probes
      .join(cells.select(col("vec_id"), col("cell")), Seq("cell"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"))
    val qsub = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vn"),
        explode(sequence(lit(0), lit(m - 1))).as("s"))
      .select(col("query_id"), col("s"),
        slice(col("vn"), col("s") * sd + 1, lit(sd)).as("qsv"))
    val lut = qsub.join(pqCents, Seq("s"))
      .withColumn("ci",
        floor(dotCol(col("qsv"), col("centroid")) * S + 0.5).cast("long"))
      .select(col("query_id"), col("s"), col("code"), col("ci"))
    val adc = cand.join(codes, Seq("vec_id"))
      .join(broadcast(lut), Seq("query_id", "s", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("ci")).as("est_dot_x1000000"))
    shortlistRerank(adc, e, k, shortlist)
  }

  // ---- Segmented (LSM) index artifacts -----------------------------------
  // The BM25 and ANN serving indexes share one layout discipline: every
  // ROW-WISE component is a union of SEGMENT directories
  // (`<component>/seg=base` from the build, `seg=s00001` per absorbed
  // batch, and a `deleted/seg=d00002` tombstone tier), read back through
  // Spark's partition discovery and aggregated/masked at query time.
  // WHY: in-place merges — however they are bucketed — rewrite every
  // bucket a batch's keys hash into, and real batches hash into ALL of
  // them, so per-batch maintenance cost tracked INDEX size (the round-11
  // write-amplification finding). A segment append writes O(batch) bytes
  // and touches nothing else; a takedown writes O(deleted) bytes
  // (tombstones + exact negative decrements of the mergeable statistics);
  // [[compactBm25Index]]/[[compactAnnIndex]] fold the log back to a
  // single base segment on cadence — the one deliberately index-sized
  // operation that amortizes the rest (the LSM contract: RocksDB/Lucene's
  // merge policy, expressed over parquet directories and the
  // [[graft.sources.AtomicSwap]] nested-component commit).

  private def artifactFs(spark: org.apache.spark.sql.SparkSession,
                         path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** True when `dir` exists and holds at least one data file (a swapped-in
    * EMPTY directory — a compacted-away tombstone tier — has none). */
  private def hasData(fs: org.apache.hadoop.fs.FileSystem,
                      dir: org.apache.hadoop.fs.Path): Boolean = {
    if (!fs.exists(dir)) return false
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val n = it.next().getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) return true
    }
    false
  }

  /** Union-of-segments read of one component; the `seg` and `pbucket`
    * partition columns are layout, not data. */
  private def readSegs(spark: org.apache.spark.sql.SparkSession,
                       path: String, c: String): DataFrame =
    spark.read.parquet(s"$path/$c").drop("seg").drop("pbucket")

  /** Default doc_id bucket count for the postings layout. Every postings
    * segment is sub-partitioned by `pbucket = hash(doc_id) mod B`, so a
    * takedown's df-decrement read (which needs ONLY the deleted docs' own
    * rows) partition-prunes to the buckets holding deleted ids instead of
    * scanning the whole postings log — the read-side twin of the
    * O(deleted) write contract. B is a BUILD/COMPACT parameter recorded
    * in the artifact's `meta/` (a fixed constant would leave the prune
    * factor flat while the index grows 100× — the O(index) slope would
    * return one decade later); this is the floor, [[autoBuckets]] scales
    * it to the build input, and probes read the artifact's own recorded
    * count. */
  private[graft] val DefaultPostingsBuckets = 32

  /** Auto-scale cap: each bucket is one directory per base segment, so
    * the count trades prune factor against listing cost; 4096 keeps
    * buckets ~GB-sized at 100 TB-class corpora without exploding file
    * counts. */
  private val MaxPostingsBuckets = 4096

  /** Bucket count scaled to the build input — target ≈1 GiB of estimated
    * input bytes per bucket, floored at the default, capped. Uses
    * Catalyst's plan-stats estimate: free (no extra pass), and only a
    * LAYOUT choice rides on it — any value is correct, the recorded count
    * is what probes must (and do) match. Plans Catalyst CANNOT size
    * (in-memory/RDD-backed inputs fall back to the
    * `spark.sql.defaultSizeInBytes` sentinel, Long.MaxValue by default)
    * would max the cap and 4096-way-repartition a tiny build — detect the
    * sentinel and size from the row-count estimate instead (~1 KiB/row
    * for text docs), or the floor when even that is unknown. */
  private def autoBuckets(df: DataFrame): Int = {
    val stats = df.queryExecution.optimizedPlan.stats
    val sentinel = df.sparkSession.sessionState.conf.defaultSizeInBytes
    val bytes: BigInt =
      if (stats.sizeInBytes < sentinel) stats.sizeInBytes
      else stats.rowCount.map(_ * 1024).getOrElse(BigInt(0))
    val target = bytes / (1L << 30)
    val t = if (target > MaxPostingsBuckets) MaxPostingsBuckets else target.toInt
    math.min(MaxPostingsBuckets, math.max(DefaultPostingsBuckets, t))
  }

  /** The id column CANONICALIZED for bucket hashing. Spark's hash() is
    * TYPE-sensitive — hash(INT 5) != hash(LONG 5) — and the takedown
    * probe hashes CALLER-supplied removeIds while the write side hashed
    * the index's own (Long) ids: an IntegerType request would prune to
    * the wrong buckets and the takedown would silently no-op. Every
    * integral id therefore hashes at LONG width on both sides;
    * non-integral key types (string ids) hash as themselves on both
    * sides. */
  private def canonId(df: DataFrame, idCol: String): Column =
    df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => col(idCol).cast("long")
      case _ => col(idCol)
    }

  /** The bucket function is a HASH mix, not a plain modulus: real ingest
    * batches arrive as modular or range slices of the id space, and a
    * correlated bucket (doc_id mod B) would leave most buckets empty per
    * segment — collapsing write parallelism and unbalancing reads. Layout
    * only: the oracle never sees pbucket, so the Spark-native hash is
    * fine (write and takedown-probe use this same function, over
    * [[canonId]]-canonicalized ids). */
  private def pbucketOf(id: Column, buckets: Int): Column =
    pmod(hash(id).cast("long"), lit(buckets.toLong)).cast("int")

  /** The artifact's RECORDED bucket count — what every probe must hash
    * against (a probe at any other count reads the wrong directories).
    * Artifacts from before the count was recorded were all written at
    * the then-hardcoded default, which is exactly the fallback. */
  private def readBuckets(spark: org.apache.spark.sql.SparkSession,
                          path: String): Int = {
    val fs = artifactFs(spark, path)
    if (hasData(fs, new org.apache.hadoop.fs.Path(s"$path/meta"))) {
      val m = spark.read.parquet(s"$path/meta")
      if (m.columns.contains("n_buckets"))
        m.select(col("n_buckets")).head().getInt(0)
      else DefaultPostingsBuckets
    } else DefaultPostingsBuckets
  }

  /** The DELTA segments' sentinel bucket: small append/tier segments skip
    * true bucketing (a bare partitionBy from a 32-task plan writes tasks ×
    * buckets ≈ 1024 small files, and a pre-repartition would charge every
    * absorb a shuffle) and land whole under `pbucket=-1`. The takedown's
    * pruned read always includes the sentinel — deltas are small by the
    * LSM invariant, so reading them fully costs O(deltas), while the
    * BASE (the index-sized component) prunes by true bucket. */
  private val DeltaBucket = -1

  /** Bucketed segment writer — shared by the BM25 postings layout (keyed
    * on doc_id) and the ANN vectors/cells layout (keyed on vec_id).
    * Base-sized writes (build, full compaction) pre-repartition on the
    * bucket so each bucket lands from ~one task and the segment is
    * O(buckets) files — the one narrow shuffle amortizes over every later
    * pruned read. Delta appends and tier folds instead write the whole
    * segment under the sentinel bucket ([[writeSentinelSeg]]): no
    * shuffle, O(tasks) files. Every segment of a component must carry the
    * pbucket directory level (mixed depths break partition discovery) —
    * hence the sentinel rather than a flat delta dir. */
  private def writeBucketedSeg(df: DataFrame, dir: String,
                               idCol: String, buckets: Int): Unit =
    df.withColumn("pbucket", pbucketOf(canonId(df, idCol), buckets))
      .repartition(buckets, col("pbucket"))
      .write.partitionBy("pbucket").mode("overwrite").parquet(dir)

  /** The delta-segment form: whole segment under the sentinel bucket. */
  private def writeSentinelSeg(df: DataFrame, dir: String): Unit =
    df.withColumn("pbucket", lit(DeltaBucket))
      .write.partitionBy("pbucket").mode("overwrite").parquet(dir)

  /** Layout of one LIVE component: Some(true) = bucketed (its segments
    * carry the pbucket directory level), Some(false) = legacy flat (a
    * pre-bucket artifact), None = no live data yet (a fresh build — the
    * new layout applies). */
  private def componentBucketed(fs: org.apache.hadoop.fs.FileSystem,
                                path: String,
                                c: String): Option[Boolean] = {
    val d = new org.apache.hadoop.fs.Path(s"$path/$c")
    if (!fs.exists(d)) return None
    val segs = fs.listStatus(d).toSeq.filter(st =>
      st.isDirectory && st.getPath.getName.startsWith("seg=") &&
        hasData(fs, st.getPath))
    if (segs.isEmpty) None
    else Some(segs.exists(st => fs.listStatus(st.getPath)
      .exists(_.getPath.getName.startsWith("pbucket="))))
  }

  /** Delta-segment writer that PRESERVES the live component's partition
    * depth: a pre-bucket (legacy) artifact's segments have no pbucket
    * level, and writing a sentinel-bucketed delta next to them would
    * leave MIXED depths under one component — Spark's partition discovery
    * then fails ("conflicting directory structures") for every read,
    * bricking the artifact including the compaction that could have
    * migrated it. Legacy components therefore take FLAT deltas (pruned
    * reads fall back to full scans there — correct, just unpruned) until
    * a full compaction rewrites the whole component bucketed in one
    * swap. */
  private def writeDeltaSeg(spark: org.apache.spark.sql.SparkSession,
                            path: String, c: String, df: DataFrame,
                            target: String): Unit =
    if (componentBucketed(artifactFs(spark, path), path, c).getOrElse(true))
      writeSentinelSeg(df, target)
    else df.write.mode("overwrite").parquet(target)

  /** Bucket-pruned component read for a takedown-shaped access: only the
    * buckets hashing a removed id — plus the sentinel delta bucket, small
    * by the LSM invariant — are scanned. `buckets` must be the artifact's
    * RECORDED count ([[readBuckets]]) — probing at any other count reads
    * the wrong directories. Falls back to the full read on a pre-bucket
    * artifact. `removeIds` is takedown-batch-sized; only the ≤ buckets+1
    * DISTINCT bucket values reach the driver. */
  private def readPrunedByIds(spark: org.apache.spark.sql.SparkSession,
                              path: String, c: String, idCol: String,
                              removeIds: DataFrame, buckets: Int,
                              touchedOpt: Option[Seq[Int]] = None): DataFrame = {
    val touched = touchedOpt.getOrElse(
      touchedBuckets(removeIds, idCol, buckets)) :+ DeltaBucket
    val raw = spark.read.parquet(s"$path/$c")
    (if (raw.columns.contains("pbucket"))
       raw.where(col("pbucket").isin(touched: _*))
     else raw)
      .drop("seg").drop("pbucket")
  }

  /** The DISTINCT bucket ids a takedown batch hashes into — computed once
    * per cycle and shared by every pruned component read (each collect is
    * its own Spark job; the vectors and cells reads paid it twice). */
  private def touchedBuckets(removeIds: DataFrame, idCol: String,
                             buckets: Int): Seq[Int] =
    removeIds
      .select(pbucketOf(canonId(removeIds, idCol), buckets).as("pb"))
      .distinct().collect().map(_.getInt(0)).toSeq

  /** Postings read with the layout columns dropped. */
  private def readPostings(spark: org.apache.spark.sql.SparkSession,
                           path: String): DataFrame =
    readSegs(spark, path, "postings")

  /** The build-time df cap, with a DEFAULT when `meta/` is absent — a
    * pre-pbucket artifact, or one whose (single, tiny) meta write was
    * interrupted, must stay queryable/compactable rather than fail at
    * read time. */
  private def readMaxDf(spark: org.apache.spark.sql.SparkSession,
                        path: String, default: Long = 1000L): Long = {
    val fs = artifactFs(spark, path)
    if (hasData(fs, new org.apache.hadoop.fs.Path(s"$path/meta")))
      spark.read.parquet(s"$path/meta").select(col("max_df")).head().getLong(0)
    else default
  }

  /** The tombstoned ids, or None when no takedown has ever landed (the
    * common case — query plans then carry no anti-join at all). */
  private def deletedIds(spark: org.apache.spark.sql.SparkSession,
                         path: String, key: String): Option[DataFrame] = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/deleted")
    if (hasData(artifactFs(spark, path), dir))
      Some(readSegs(spark, path, "deleted").select(col(key)).distinct())
    else None
  }

  private def minusDeleted(df: DataFrame, del: Option[DataFrame],
                           key: String): DataFrame =
    del.map(d => df.join(broadcast(d), Seq(key), "left_anti")).getOrElse(df)

  /** Next segment name (`s00012` appends, `d00012` tombstone tiers): one
    * monotone counter across all of the artifact's components, derived
    * from the max existing index (never the count — the chunk-naming
    * lesson: a compacted or gapped segment set must not recycle names). */
  private def nextSegName(spark: org.apache.spark.sql.SparkSession,
                          path: String, prefix: String,
                          components: Seq[String]): String = {
    val fs = artifactFs(spark, path)
    val maxIdx = components.flatMap { c =>
      val d = new org.apache.hadoop.fs.Path(s"$path/$c")
      if (!fs.exists(d)) Nil
      else fs.listStatus(d).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("seg="))
        .map(_.getPath.getName.stripPrefix("seg="))
        .filter(s => s.startsWith("s") || s.startsWith("d"))
        .map(_.drop(1).toLong)
    }.foldLeft(0L)(math.max)
    f"$prefix${maxIdx + 1}%05d"
  }

  private val AnnComponents =
    Seq("vectors", "cells", "codes", "coarse_sums", "deleted")
  private val Bm25Components =
    Seq("postings", "termdf", "doclen", "stats", "deleted")

  /** Per-cell coarse sums aggregated across segments; a cell whose live
    * count reached zero (everything in it deleted) vanishes. */
  private def aggSums(sums: DataFrame): DataFrame =
    sums.groupBy(col("cell"), col("d"))
      .agg(sum(col("sd")).as("sd"), sum(col("cnt")).as("cnt"))
      .where(col("cnt") > 0)

  /** Build the IVF+PQ index as a PERSISTED, SEGMENTED ARTIFACT — the
    * serving-side lifecycle the [[buildBm25Index]] family established,
    * closed for ANN: one training pass writes `cells/seg=base` (vec_id →
    * coarse cell), `coarse_centroids/`, `codes/seg=base` (vec_id,
    * subspace → PQ code), `pq_centroids/` (the codebook), and
    * `vectors/seg=base` (unit vectors, the FAISS IndexRefineFlat
    * companion for the exact re-rank); queries then run against the
    * artifact without re-training anything. At 100 TB the codebooks and
    * centroids train once per corpus snapshot and every search after is
    * probe-only — the train cost (the Lloyd rounds over all subvectors)
    * amortizes across every query batch. All doubles round-trip parquet
    * bit-exactly, so [[annQueryIndex]] equals [[ivfPqTopK]] byte-for-byte
    * (same oracle SQL). The mergeable `coarse_sums/` segments (per-cell
    * integer component sums) are what make the artifact UPDATABLE and
    * DELETABLE at O(batch) write cost — see [[updateAnnIndex]],
    * [[removeFromAnnIndex]], and the segment-layout note above. */
  def buildAnnIndex(emb: DataFrame, path: String,
                    planes: Int = 4, m: Int = 8, bits: Int = 4,
                    dim: Int = 64, refine: Int = 1,
                    buckets: Int = 0): Unit = {
    require(dim % m == 0, s"dim ($dim) must split evenly into m ($m) subspaces")
    // 0 = auto: scale the vec_id bucket count to the input so the
    // takedown prune factor grows with the index (recorded in meta/ —
    // probes must hash at the build's count)
    val b = if (buckets > 0) buckets else autoBuckets(emb)
    val e = withUnitVector(emb).select(col("vec_id"), col("vn"))
    val assigned = coarseAssign(e, planes, dim)
    val (_, codes, centroids) = pqTrain(e, m, bits, dim / m, refine)
    // sums feed their own write AND the centroid derivation — materialize
    val sums = coarseSums(assigned).localCheckpoint()
    // every component write reads only materialized inputs (assigned /
    // codes / centroids / sums are all checkpointed), so the seven jobs
    // are independent — overlap them ([[parallelWrites]]) instead of
    // serializing seven rounds of job-scheduling + file-commit latency.
    // vectors/cells carry the same doc-keyed bucket layout as the BM25
    // postings: a takedown's negative-sums read prunes to the buckets
    // holding removed ids instead of scanning every vector
    val spark = emb.sparkSession
    parallelWrites(spark)(
      () => writeBucketedSeg(assigned.select(col("vec_id"), col("vn")),
        s"$path/vectors/seg=base", "vec_id", b),
      () => writeBucketedSeg(assigned.select(col("vec_id"), col("cell")),
        s"$path/cells/seg=base", "vec_id", b),
      () => spark.range(1).select(lit(b).as("n_buckets"))
        .write.mode("overwrite").parquet(s"$path/meta"),
      () => sums.write.mode("overwrite").parquet(s"$path/coarse_sums/seg=base"),
      () => centroidsFromSums(sums)
        .write.mode("overwrite").parquet(s"$path/coarse_centroids"),
      () => codes.write.mode("overwrite").parquet(s"$path/codes/seg=base"),
      () => centroids.write.mode("overwrite").parquet(s"$path/pq_centroids"))
  }

  /** Incrementally ABSORB a new vector batch into a [[buildAnnIndex]]
    * artifact — the incremental tier that closes the ANN family's
    * lifecycle (BM25/minhash/spans/containment/clusters/NB each have one):
    * the expensive work (normalize + coarse-assign + PQ-encode) runs over
    * the NEW batch only, and the merge work is index-sized — the base
    * corpus is never re-scanned and nothing is re-trained.
    *
    * FROZEN-QUANTIZER semantics (how FAISS `IndexIVFPQ.add` behaves, and
    * the BM25 append-only contract's shape): both quantizers stay fixed —
    * the coarse tier is fixed hyperplanes by construction, and the PQ
    * codebook (`pq_centroids/`, the SERVING codebook) is not re-trained;
    * new vectors are encoded by argmin against it (the same |c|² − 2·x·c
    * fixed-point discipline as training reassignment). Re-training cadence
    * is a policy knob above this operator, exactly like the BM25 rebuild
    * cadence. What DOES move exactly: the per-cell coarse centroids that
    * rank the probe order — the mergeable `coarse_sums/` integer table
    * absorbs the batch's component sums, so the updated centroids are
    * bit-identical to a rebuild over base ∪ batch (associative integer
    * sums; the `sim_bm25_incr` uncapped-termdf idea). The `ann_index_incr`
    * oracle replays exactly this contract: base codes as trained, batch
    * codes argmin-vs-serving-codebook, coarse tier rebuilt over the union.
    *
    * Contract: APPEND-only (re-delivering a batch would double rows — the
    * batch_id ledger layer above this is the dedupe), vec_ids disjoint
    * from the base. Durability: the batch's segments stage to the
    * `_stage/` tree and swap in via [[graft.sources.AtomicSwap]]'s nested
    * components; the frozen codebook is never touched. WRITE COST is
    * O(batch): the new rows land as fresh `seg=sNNNNN` directories under
    * `vectors/`, `cells/`, `codes/`, `coarse_sums/` — no existing row is
    * rewritten (the round-11 per-batch index rewrite is gone); the one
    * always-rewritten component, `coarse_centroids/`, is CELL-count
    * bounded (2^planes rows), not corpus-bounded. */
  def updateAnnIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                     newEmb: DataFrame, planes: Int = 4, m: Int = 8,
                     dim: Int = 64): Unit =
    graft.sources.AtomicSwap.withLease(spark, path) {
      graft.sources.AtomicSwap.recover(spark, path)
      val comps = stageAnnMerge(spark, path, newEmb, planes, m, dim)
      graft.sources.AtomicSwap.commit(spark, path, comps)
    }

  /** Stage (not commit) the batch's ANN segments — shared by
    * [[updateAnnIndex]] and [[updateAnnIndexOnce]]. Returns the staged
    * component list. The batch is anti-joined against the tombstone tier
    * first — [[stageBm25Merge]]'s tombstone-ordering rule (a re-ingested
    * taken-down vec_id would otherwise stay masked forever while its
    * coarse_sums rows kept counting it; the takedown wins until a
    * compaction clears the tombstones). */
  private def stageAnnMerge(spark: org.apache.spark.sql.SparkSession,
                            path: String, newEmbRaw: DataFrame, planes: Int,
                            m: Int, dim: Int): Seq[String] = {
    require(dim % m == 0, s"dim ($dim) must split evenly into m ($m) subspaces")
    val newEmb = minusDeleted(newEmbRaw,
      deletedIds(spark, path, "vec_id"), "vec_id")
    val sd = dim / m
    val seg = nextSegName(spark, path, "s", AnnComponents)
    val e = withUnitVector(newEmb).select(col("vec_id"), col("vn"))
    // checkpointed (inside coarseAssign): feeds vectors/cells segments, the
    // subvector encode, and the sums segment
    val assigned = coarseAssign(e, planes, dim)
    val pqCents = spark.read.parquet(s"$path/pq_centroids")
    val newCodes = assigned
      .select(col("vec_id"), col("vn"),
        explode(sequence(lit(0), lit(m - 1))).as("s"))
      .withColumn("sv", slice(col("vn"), col("s") * sd + 1, lit(sd)))
      .join(broadcast(pqCents), Seq("s"))
      .withColumn("dist",
        dotCol(col("centroid"), col("centroid")) -
          lit(2.0) * dotCol(col("sv"), col("centroid")))
      .groupBy(col("vec_id"), col("s"))
      .agg(min(struct(col("dist"), col("code"))).as("mi"))
      .select(col("vec_id"), col("s"), col("mi").getField("code").as("code"))
    val stage = graft.sources.AtomicSwap.stageDir(path, _: String)
    // the batch's sums feed their own segment AND the centroid refresh
    val batchSums = coarseSums(assigned).localCheckpoint()
    // five independent staged writes (assigned/batchSums materialized;
    // the centroid leg reads LIVE sums, untouched until commit) — overlap
    // them (probe-order centroids stay rebuild-exact: live sums ∪ the
    // batch's, aggregated — associative integer sums, cell-bounded work)
    parallelWrites(spark)(
      () => writeDeltaSeg(spark, path, "vectors",
        assigned.select(col("vec_id"), col("vn")), stage(s"vectors/seg=$seg")),
      () => writeDeltaSeg(spark, path, "cells",
        assigned.select(col("vec_id"), col("cell")), stage(s"cells/seg=$seg")),
      () => newCodes.write.mode("overwrite").parquet(stage(s"codes/seg=$seg")),
      () => batchSums.write.mode("overwrite")
        .parquet(stage(s"coarse_sums/seg=$seg")),
      () => centroidsFromSums(
        aggSums(readSegs(spark, path, "coarse_sums").unionByName(batchSums)))
        .write.mode("overwrite").parquet(stage("coarse_centroids")))
    Seq(s"vectors/seg=$seg", s"cells/seg=$seg", s"codes/seg=$seg",
      s"coarse_sums/seg=$seg", "coarse_centroids")
  }

  /** DELETE vectors from a [[buildAnnIndex]] artifact — the ANN side of
    * [[removeFromBm25Index]]'s takedown leg, and (unlike BM25's one
    * documented upper-bound asymmetry) EXACT against a rebuild over the
    * survivors with the same frozen training. TOMBSTONE form: the deleted
    * ids land as a `deleted/seg=dNNNNN` segment (query reads mask
    * vectors/cells/codes by one anti-join — those components are never
    * rewritten), and the deleted vectors' per-cell integer component sums
    * are recomputed FROM THE INDEX ITSELF (vectors ⋈ cells, both
    * components already carry everything needed) and appended as a
    * NEGATIVE `coarse_sums/` segment — integer subtraction is as
    * associative as the addition, so the aggregated centroids are
    * bit-identical to [[buildAnnIndex]] run over the survivors (coarse
    * tier has no trained state) while the PQ codebook stays frozen. Cells
    * emptied by the delete drop out of the aggregation entirely. WRITE
    * COST is O(deleted) (tombstone + negative sums + the cell-bounded
    * centroid refresh); reads are index-sized, as any delete's must be.
    * Idempotent by construction: ids already tombstoned (or never
    * present) are filtered out up front, and a fully-redundant request
    * set is a no-op that writes nothing. [[compactAnnIndex]] physically
    * drops tombstoned rows on cadence. */
  def removeFromAnnIndex(spark: org.apache.spark.sql.SparkSession,
                         path: String, removeIds: DataFrame): Unit =
    graft.sources.AtomicSwap.withLease(spark, path) {
      graft.sources.AtomicSwap.recover(spark, path)
      val del = deletedIds(spark, path, "vec_id")
      val gone = broadcast(removeIds.select(col("vec_id")).distinct())
      // (vec_id, cell, vn) of the ids actually live — re-deliveries vanish
      // bucket-pruned: only the vectors/cells buckets hashing a removed id
      // (plus the small sentinel deltas) are scanned for the negative sums;
      // the touched-bucket set is collected ONCE and shared by both reads
      val b = readBuckets(spark, path)
      val touched = Some(touchedBuckets(gone, "vec_id", b))
      val removedAssigned =
        minusDeleted(
          readPrunedByIds(spark, path, "vectors", "vec_id", gone, b, touched),
          del, "vec_id")
          .join(gone, Seq("vec_id"))
          .join(minusDeleted(
            readPrunedByIds(spark, path, "cells", "vec_id", gone, b, touched),
            del, "vec_id"),
            Seq("vec_id"))
          .select(col("vec_id"), col("cell"), col("vn"))
          .localCheckpoint() // feeds tombstone, negative sums, no-op check
      if (!removedAssigned.isEmpty) {
        val seg = nextSegName(spark, path, "d", AnnComponents)
        val stage = graft.sources.AtomicSwap.stageDir(path, _: String)
        val negSums = coarseSums(removedAssigned.select(col("cell"), col("vn")))
          .select(col("cell"), col("d"), (-col("sd")).as("sd"),
            (-col("cnt")).as("cnt"))
          .localCheckpoint() // feeds its own segment AND the centroid refresh
        // three independent staged writes over materialized inputs —
        // overlap them (the parallelWrites discipline)
        parallelWrites(spark)(
          () => removedAssigned.select(col("vec_id"))
            .write.mode("overwrite").parquet(stage(s"deleted/seg=$seg")),
          () => negSums.write.mode("overwrite")
            .parquet(stage(s"coarse_sums/seg=$seg")),
          () => centroidsFromSums(
            aggSums(readSegs(spark, path, "coarse_sums").unionByName(negSums)))
            .write.mode("overwrite").parquet(stage("coarse_centroids")))
        graft.sources.AtomicSwap.commit(spark, path,
          Seq(s"deleted/seg=$seg", s"coarse_sums/seg=$seg", "coarse_centroids"))
      }
    }

  /** Fold a segmented ANN artifact back to a single base segment — the
    * LSM compaction cadence: tombstoned rows drop physically from
    * vectors/cells/codes, the tombstone tier empties, the sums segments
    * collapse to their aggregate (emptied cells gone), and the quantizers
    * are untouched. This is the ONE deliberately index-sized write — it
    * amortizes every O(batch) append and O(deleted) takedown since the
    * last fold, and bounds segment-count growth (each segment is a
    * directory the readers must list). Query results are identical
    * before and after (the spec pins it); wholesale component swaps keep
    * every crash window repairable. */
  def compactAnnIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String, buckets: Int = 0): Unit =
    graft.sources.AtomicSwap.withLease(spark, path) {
      graft.sources.AtomicSwap.recover(spark, path)
      // 0 = keep the recorded count; >0 re-buckets (the resize path — the
      // whole component rewrites here anyway). Also the MIGRATION point
      // for pre-bucket artifacts: the full fold rewrites every segment of
      // vectors/cells bucketed in one swap, so legacy layouts graduate.
      val b = if (buckets > 0) buckets else readBuckets(spark, path)
      val del = deletedIds(spark, path, "vec_id")
      val stage = graft.sources.AtomicSwap.stageDir(path, _: String)
      val sums = aggSums(readSegs(spark, path, "coarse_sums")).localCheckpoint()
      // six independent staged writes: each reads LIVE components (or the
      // materialized sums) and writes its own staged dir — overlap them
      // (the parallelWrites discipline). The recorded count commits WITH
      // the re-bucketed layout — a meta write outside the swap could
      // record a count the directories don't match after a crash, and
      // every later probe would read the wrong buckets
      parallelWrites(spark)(
        () => writeBucketedSeg(
          minusDeleted(readSegs(spark, path, "vectors"), del, "vec_id"),
          s"${stage("vectors")}/seg=base", "vec_id", b),
        () => writeBucketedSeg(
          minusDeleted(readSegs(spark, path, "cells"), del, "vec_id"),
          s"${stage("cells")}/seg=base", "vec_id", b),
        () => minusDeleted(readSegs(spark, path, "codes"), del, "vec_id")
          .write.mode("overwrite").parquet(s"${stage("codes")}/seg=base"),
        () => sums.write.mode("overwrite")
          .parquet(s"${stage("coarse_sums")}/seg=base"),
        () => centroidsFromSums(sums)
          .write.mode("overwrite").parquet(stage("coarse_centroids")),
        () => spark.range(1).select(lit(b).as("n_buckets"))
          .write.mode("overwrite").parquet(stage("meta")))
      val fs = artifactFs(spark, path)
      fs.mkdirs(new org.apache.hadoop.fs.Path(stage("deleted"))) // emptied
      graft.sources.AtomicSwap.commit(spark, path,
        Seq("vectors", "cells", "codes", "coarse_sums", "coarse_centroids",
          "deleted", "meta"))
    }

  /** EXACTLY-ONCE wrapper over [[updateAnnIndex]] — the ANN side of
    * [[updateBm25IndexOnce]]'s ledger pattern, for a streaming
    * `foreachBatch` maintenance loop: the applied-batch ledger
    * (`applied/`) rides the SAME atomic swap as the five index
    * components, so a re-delivered micro-batch is a no-op instead of
    * duplicated vectors/cells/codes and double-counted centroid sums.
    * Returns true when the batch was absorbed. */
  def updateAnnIndexOnce(spark: org.apache.spark.sql.SparkSession,
                         path: String, newEmb: DataFrame, batchId: Long,
                         planes: Int = 4, m: Int = 8,
                         dim: Int = 64): Boolean =
    graft.sources.AtomicSwap.withLease(spark, path) {
      import spark.implicits._
      graft.sources.AtomicSwap.recover(spark, path)
      val fs = artifactFs(spark, path)
      val applied =
        if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/applied")))
          spark.read.parquet(s"$path/applied")
        else Seq.empty[Long].toDF("batch_id")
      if (applied.where(col("batch_id") === batchId).isEmpty) {
        val comps = stageAnnMerge(spark, path, newEmb, planes, m, dim)
        applied.unionByName(Seq(batchId).toDF("batch_id"))
          .write.mode("overwrite")
          .parquet(graft.sources.AtomicSwap.stageDir(path, "applied"))
        graft.sources.AtomicSwap.commit(spark, path, comps :+ "applied")
        true
      } else false
    }

  /** Query a [[buildAnnIndex]] artifact: identical search to [[ivfPqTopK]]
    * (shared [[ivfPqProbe]]), but every input is an index read — no
    * normalization, no cell assignment, no codebook training. */
  def annQueryIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    nQueries: Int, k: Int, nProbe: Int = 4,
                    m: Int = 8, dim: Int = 64,
                    shortlist: Int = 50): DataFrame = {
    // finish any in-flight atomic swap left by a crashed updater
    graft.sources.AtomicSwap.recover(spark, path, cleanStale = false)
    // segment union + tombstone mask; with no takedowns ever landed the
    // plan carries no anti-join at all
    val del = deletedIds(spark, path, "vec_id")
    ivfPqProbe(
      minusDeleted(readSegs(spark, path, "vectors"), del, "vec_id"),
      minusDeleted(readSegs(spark, path, "cells"), del, "vec_id"),
      spark.read.parquet(s"$path/coarse_centroids"),
      minusDeleted(readSegs(spark, path, "codes"), del, "vec_id"),
      spark.read.parquet(s"$path/pq_centroids"),
      nQueries, k, nProbe, m, dim, shortlist)
  }

  /** ANN index evaluation — the harness that closes the loop: given a
    * ground-truth top-k table (`bruteForceTopK` output shape:
    * (query_id, neighbor_id, rank, ...)) and an approximate index's
    * answers in the same shape, per-query retrieval metrics:
    * recall@k ×10⁴ and reciprocal rank ×10⁴ of the first true neighbor in
    * the prediction list (0 when none hit). A production pipeline tunes
    * its index parameters (tables/planes, nProbe, shortlist) against
    * exactly this query on a sampled ground truth.
    *
    * Plan shape: one equi-join on (query_id, neighbor_id) + one agg —
    * both sides are top-k outputs (nQueries·k rows), so this costs
    * nothing next to the searches themselves. Fixed-point outputs keep it
    * engine-exact. */
  def annEval(truth: DataFrame, pred: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val t = truth.select(col("query_id"), col("neighbor_id"))
    val hits = pred.select(col("query_id"), col("neighbor_id"), col("rank"))
      .join(t, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_hit"), min(col("rank")).as("first_hit_rank"))
    t.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        floor(lit(10000.0) * coalesce(col("n_hit"), lit(0L)) / k + 0.5)
          .cast("long").as("recall_x10000"),
        coalesce(floor(lit(10000.0) / col("first_hit_rank") + 0.5).cast("long"),
          lit(0L)).as("rr_x10000"))
  }

  /** Binary-relevance nDCG@k weights ×1e6: `⌊1e6 / log2(r+1)⌋` for rank
    * r = 1..10, PRECOMPUTED as literals so both engines use identical
    * constants (a runtime `log` would be libm-dependent). */
  val NdcgWeightsX1e6: Array[Long] = Array(
    1000000L, 630929L, 500000L, 430676L, 386852L,
    356207L, 333333L, 315464L, 301029L, 289064L)

  /** nDCG@k of an approximate index against the exact baseline — the
    * position-sensitive sibling of [[annEval]]'s recall/MRR: recall can't
    * see WHERE in the list the hits sit; nDCG discounts each hit by
    * `1/log2(rank+1)`. Binary relevance (a predicted neighbor is in the
    * truth set or not); ideal DCG = all k truth entries up top. Integer
    * DCG sums of the precomputed weights; the one double division floors
    * identically cross-engine. */
  def ndcgEval(truth: DataFrame, pred: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= NdcgWeightsX1e6.length,
      s"k must be in [1, ${NdcgWeightsX1e6.length}]")
    val idcg = NdcgWeightsX1e6.take(k).sum
    val wCase = expr(NdcgWeightsX1e6.take(k).zipWithIndex
      .map { case (w, i) => s"WHEN ${i + 1} THEN ${w}L" }
      .mkString("CASE rank ", " ", " ELSE 0L END"))
    val hits = pred.select(col("query_id"), col("neighbor_id"), col("rank"))
      .join(truth.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .withColumn("w", wCase)
      .groupBy(col("query_id")).agg(sum(col("w")).as("dcg"))
    truth.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("dcg"), lit(0L)).as("dcg_x1e6"),
        lit(idcg).as("idcg_x1e6"),
        floor(lit(10000.0) * coalesce(col("dcg"), lit(0L)) / idcg + 0.5)
          .cast("long").as("ndcg_x10000"))
  }

  /** Multi-table LSH ANN top-k: candidates = vectors sharing any
    * (table, bucket) with the query; ranked by exact cosine within the
    * candidate set. Map-only hashing (one row per vector per table), then
    * one equi-join — this is the plan shape that survives 100 TB. */
  def lshTopK(emb: DataFrame, nQueries: Int, k: Int,
              planes: Int = 4, tables: Int = 2, dim: Int = 64): DataFrame = {
    val e = withUnitVector(emb).select(col("vec_id"), col("vn"))
    // Build the LSH index relationally: one row per (vector, table, plane),
    // sign of the hyperplane dot, then an integer groupBy-sum packs the
    // bits. No persist(): the index is referenced twice (query leg, corpus
    // leg), but Catalyst pushes the `vec_id < nQueries` filter all the way
    // to the query leg's scan, so that leg hashes only the handful of query
    // vectors — total fold work is n + nQueries ≈ n either way, and nothing
    // is left cached after the call (the previous persist() accumulated
    // across a bench session). At 100 TB the index would be written to a
    // table once and probed many times; within one query, recompute-with-
    // pushdown is the cheaper and leak-free shape.
    val buckets = e
      .select(col("vec_id"), col("vn"),
        explode(sequence(lit(0), lit(tables - 1))).as("t"))
      .select(col("vec_id"), col("vn"), col("t"),
        explode(sequence(lit(0), lit(planes - 1))).as("p"))
      .withColumn("dotp", planeDot(col("vn"), col("t") * planes + col("p"), dim))
      .groupBy(col("vec_id"), col("t"))
      .agg(sum(when(col("dotp") > 0, pow(lit(2.0), col("p")).cast("long"))
        .otherwise(0L)).as("bucket"))
    val cand = buckets.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("t"), col("bucket"))
      .join(buckets, Seq("t", "bucket"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct() // a pair may collide in several tables — count it once
    val scored = cand
      .join(e.select(col("vec_id").as("query_id"), col("vn").as("qv")), Seq("query_id"))
      .join(e, Seq("vec_id"))
      .withColumn("cos", dotCol(col("qv"), col("vn")))
      .select(col("query_id"), col("vec_id"), col("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"),
        floor(col("cos") * 1000000.0 + 0.5).cast("long").as("cos_x1000000"))
  }

  /** Sparse top-k similar-documents search: TF-IDF cosine over word-n-gram
    * shingles via an inverted index — the TEXT-side sibling of the dense
    * embedding ANN above, and the weighted-cosine complement of
    * [[Dedup.ngramJaccardPairs]]'s set-overlap Jaccard. For each document,
    * the k most similar others by cosine of its tf·idf shingle vector.
    *
    * Exactness (cross-engine, no libm `log`): the idf factor is the capped
    * fixed-point integer `min(floor(100·nDocs/df), idfCapX100)` (rarer
    * shingle ⇒ larger factor, the tf-idf ordering semantics); weights and
    * both norm² sums are exact BIGINTs; the final
    * `floor(1e6·dot / (sqrt(n1)·sqrt(n2)))` is IEEE-754 arithmetic on
    * exactly-converted integers — every step correctly rounded, so DuckDB
    * reproduces it bit-for-bit.
    *
    * Plan shape (the all-pairs-similarity canonical form): shingle explode →
    * tf hash agg → df hash agg with the `maxDf` prune → weight join +
    * broadcast one-row corpus count → inverted-index self-equi-join on the
    * shingle (each pair's dot accumulates map-side) → two broadcast-sized
    * norm joins → per-doc window top-k. The `maxDf` cap is the scale knob:
    * join fan-out is Σ df² over surviving shingles, so capping df bounds the
    * candidate volume exactly like [[Dedup.ngramJaccardPairs]]'s
    * `docFreqCap` — at 100 TB the join keys on a 64-bit shingle hash
    * instead of the string. Weight-magnitude bound: tf·idfCapX100 per
    * shingle must keep Σw² under 2^53 (true for any real document at the
    * default cap; docs are not gigabytes of one repeated shingle). */
  def tfidfNeighbors(docs: DataFrame, k: Int, n: Int = 3,
                     maxDf: Long = 1000, idfCapX100: Long = 10000): DataFrame = {
    val toks = col("toks")
    // non-distinct shingles: tf counts occurrences (shinglesFromToks dedups)
    val grams = when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
    val tf = docs
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(grams).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf) // hot-shingle prune — bounds join fan-out
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // materialized once: the weight table feeds the norms aggregate and
    // both sides of the dot self-join — uncheckpointed, the tokenize →
    // gram explode → tf/df agg chain re-runs per consumer (the self-join
    // sides sameResult-share one exchange, the norms leg does not)
    val weights = tf.join(dfT, Seq("g")).crossJoin(broadcast(nDocs))
      .withColumn("w", col("tf") * least(
        floor(lit(100.0) * col("n_docs") / col("df")).cast("long"),
        lit(idfCapX100)))
      .select(col("doc_id"), col("g"), col("w"))
      .localCheckpoint()
    val norms = weights.groupBy(col("doc_id"))
      .agg(sum(col("w") * col("w")).as("nsq"))
    // symmetric join (both orientations fall out of one pass) — no union of
    // the dot subtree, so the weight table is computed once
    val dots = weights.select(col("doc_id").as("d1"), col("g"), col("w").as("w1"))
      .join(weights.select(col("doc_id").as("d2"), col("g"), col("w").as("w2")),
        Seq("g"))
      .where(col("d1") =!= col("d2"))
      .groupBy(col("d1"), col("d2")).agg(sum(col("w1") * col("w2")).as("dot"))
    val withCos = dots
      .join(norms.select(col("doc_id").as("d1"), col("nsq").as("n1")), Seq("d1"))
      .join(norms.select(col("doc_id").as("d2"), col("nsq").as("n2")), Seq("d2"))
      .withColumn("cos_x1e6",
        floor(lit(1000000.0) * col("dot").cast("double") /
          (sqrt(col("n1").cast("double")) * sqrt(col("n2").cast("double"))))
          .cast("long"))
    val w = Window.partitionBy(col("d1")).orderBy(col("cos_x1e6").desc, col("d2"))
    withCos
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("d1").as("doc_id"), col("d2").as("neighbor_id"),
        col("rank").cast("long").as("rank"), col("cos_x1e6"))
  }

  /** Embedding-free document vectors via the hashing trick (feature
    * hashing): every 3-gram shingle occurrence lands in dimension
    * `hash % dim` with sign `±1` from an independent hash bit, so each doc
    * becomes a fixed-`dim` integer vector whose inner products are unbiased
    * estimates of shingle-vector inner products — the classic way to get
    * dense-ANN-shaped vectors out of raw text with no embedding model.
    * Neighbors = top-k by cosine of those vectors for each query doc.
    *
    * Exactness: the hash is the portable char-polynomial, entries and
    * norms² are exact BIGINT sums, and the one IEEE
    * `floor(1e6·dot/(sqrt·sqrt))` is the [[tfidfNeighbors]] pattern —
    * bit-identical in DuckDB.
    *
    * Plan shape: the vectors stay in sparse long form (doc_id, idx, v) —
    * shingle explode → one hash agg (entries whose signs cancel to 0 drop;
    * they contribute nothing to dots or norms) → broadcast the query side →
    * equi-join on `idx` (≤ dim rows per doc) → pair hash agg → norm joins →
    * per-query window top-k. At 100 TB the query side is the small side by
    * construction, and the dense-array assembly (one ordered collect_list)
    * only happens for vectors persisted to feed the LSH/IVF tiers. */
  /** The sparse (doc_id, idx, v) long form behind [[hashedNeighbors]] and
    * [[hashedDocVectors]]: each 3-gram shingle occurrence lands in
    * dimension `hash % dim` with sign ±1 from the next hash bit
    * (independent bits, pure modulo — portable to any SQL engine);
    * sign-cancelled entries drop. */
  def hashedEntries(docs: DataFrame, dim: Int, n: Int): DataFrame = {
    val toks = col("toks")
    val grams = when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
    val h = graft.functions.TextFunctions.charPolyHash(col("g"))
    docs
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(grams).as("g"))
      .select(col("doc_id"), pmod(h, lit(dim.toLong)).as("idx"),
        when(pmod(h, lit(2L * dim)) >= dim, lit(-1L)).otherwise(lit(1L)).as("s"))
      .groupBy(col("doc_id"), col("idx")).agg(sum(col("s")).as("v"))
      .where(col("v") =!= 0L)
  }

  /** Dense assembly of the feature-hashed vectors — the bridge into the
    * dense ANN tiers: one ordered collect_list per doc turns the sparse
    * long form into a `dim`-wide `array<double>` `embedding` column with
    * the embeddings-table shape, so [[bruteForceTopK]] / [[lshTopK]] /
    * [[ivfTopK]] run unchanged over text that never saw an embedding
    * model (the HashedVectorsSpec pins brute-force-over-assembled ==
    * [[hashedNeighbors]]). Docs whose entries all cancel (or with no
    * shingles) are absent, matching the sparse form. */
  def hashedDocVectors(docs: DataFrame, dim: Int = 64, n: Int = 3): DataFrame = {
    val dense = transform(sequence(lit(0), lit(dim - 1)),
      i => coalesce(element_at(col("m"), i.cast("long")), lit(0L)).cast("double"))
    hashedEntries(docs, dim, n)
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("idx"), col("v")))).as("m"))
      .select(col("doc_id").as("vec_id"), dense.as("embedding"))
  }

  def hashedNeighbors(docs: DataFrame, nQueries: Int, k: Int,
                      dim: Int = 64, n: Int = 3): DataFrame = {
    val entries = hashedEntries(docs, dim, n)
    val norms = entries.groupBy(col("doc_id")).agg(sum(col("v") * col("v")).as("nsq"))
    val q = entries.where(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("idx"), col("v").as("qv"))
    val dots = broadcast(q).join(entries, Seq("idx"))
      .where(col("query_id") =!= col("doc_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("qv") * col("v")).as("dot"))
    val withCos = dots
      .join(norms.select(col("doc_id").as("query_id"), col("nsq").as("n1")), Seq("query_id"))
      .join(norms.select(col("doc_id"), col("nsq").as("n2")), Seq("doc_id"))
      .withColumn("cos_x1e6",
        floor(lit(1000000.0) * col("dot").cast("double") /
          (sqrt(col("n1").cast("double")) * sqrt(col("n2").cast("double"))))
          .cast("long"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_x1e6").desc, col("doc_id"))
    withCos
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("doc_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), col("cos_x1e6"))
  }

  /** BM25 top-k retrieval — THE lexical ranking function (Robertson et al.;
    * what Lucene/Elasticsearch score with), here as a distributed inverted-
    * index query in pure FIXED-POINT integer arithmetic so rankings are
    * bit-identical cross-engine: per matched term,
    * `idf · tf·(k1+1) / (tf + k1·(1−b + b·dl/avdl))`, with the same capped
    * integer idf as [[tfidfNeighbors]] (`min(⌊100·N/df⌋, cap)` — the
    * documented deviation from the ln form; ranking-equivalent
    * monotonicity) and every division an explicit `DIV` at a fixed scale.
    * Query docs' DISTINCT terms form the query bag (classic query-side
    * tf = 1); the query doc itself is excluded from its results.
    *
    * Plan shape: one tokenize+tf agg over the corpus, df with the `maxDf`
    * hot-term cap (bounds join fan-out — the `docFreqCap` lever), the
    * query-term table is tiny and drives an inverted-index equi-join on the
    * term, one (query, doc) sum agg, one per-query window top-k. The
    * length/total stats ride along as a broadcast one-row aggregate (the
    * `ta_keywords` pattern). */
  def bm25TopK(docs: DataFrame, queryIds: Seq[Long], k: Int,
               maxDf: Long = 1000, idfCapX100: Long = 10000,
               k1X10: Long = 12, bX100: Long = 75): DataFrame = {
    require(queryIds.nonEmpty, "need query docs")
    val spark = docs.sparkSession
    import spark.implicits._
    bm25TopKFor(docs, queryIds.toDF("qid"), k, maxDf, idfCapX100, k1X10, bX100)
  }

  /** [[bm25TopK]] with a DATA-DRIVEN query set: `queryIds` is a one-column
    * (`qid`) DataFrame — the form batch mining jobs need (e.g. every dedup
    * anchor as a query). Same plan; the query table semi-joins the tf
    * table instead of an `isin` literal. `maxQueryTerms` prunes each query
    * bag to its rarest (lowest-df, then alphabetical) terms — standard
    * query-term pruning: the rare terms carry the idf mass, and the
    * postings fan-out drops from Σ df(all terms) to Σ df(m rare ones). */
  def bm25TopKFor(docs: DataFrame, queryIds: DataFrame, k: Int,
                  maxDf: Long = 1000, idfCapX100: Long = 10000,
                  k1X10: Long = 12, bX100: Long = 75,
                  maxQueryTerms: Int = Int.MaxValue): DataFrame = {
    require(k >= 1 && maxQueryTerms >= 1, "need positive k and term budget")
    val tf = graft.functions.TextFunctions
      .explodeTokens(docs, "t", "doc_id")
      .where(col("t") =!= "")
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_len"))
    val dfT = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
    val allQTerms = tf
      .join(queryIds.select(col("qid").as("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("query_id"), col("t")).distinct()
    val qTerms =
      if (maxQueryTerms == Int.MaxValue) allQTerms
      else {
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("df"), col("t"))
        allQTerms.join(dfT, Seq("t"))
          .withColumn("qrn", row_number().over(w))
          .where(col("qrn") <= maxQueryTerms)
          .select(col("query_id"), col("t"))
      }
    val scored = qTerms
      .join(tf.join(dfT, Seq("t")), Seq("t"))
      .where(col("doc_id") =!= col("query_id"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_x100", least(
        floor(lit(100.0) * col("n_docs") / col("df")).cast("long"),
        lit(idfCapX100)))
      .withColumn("avdl_x1000", expr("(1000 * tot_len) DIV n_docs"))
      .withColumn("norm_x1000",
        lit(1000L - 10L * bX100) +
          expr(s"(${10L * bX100} * dl * 1000) DIV avdl_x1000"))
      .withColumn("tfc_x1000", expr(
        s"(tf * ${(k1X10 + 10L) * 100L} * 1000) DIV " +
          s"(tf * 1000 + (${k1X10 * 100L} * norm_x1000) DIV 1000)"))
      .withColumn("contrib", col("idf_x100") * col("tfc_x1000"))
    val ranked = scored
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("score_x1e5"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_x1e5").desc, col("doc_id"))
    ranked
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("doc_id"),
        col("rank").cast("long").as("rank"), col("score_x1e5"))
  }

  /** Snippet extraction — the display half of retrieval: for each doc, the
    * `windowTokens`-token window with the most query-term hits (earliest
    * window on ties), its position, and its hit count. Pure array
    * expressions over the materialized token column: per doc O(len·W) adds,
    * no shuffle, no UDF — the per-hit inner loop stays in codegen.
    * Cross-engine: Spark `slice`/`array_position` and DuckDB bracket
    * slicing / `list_position` agree on 1-based, clamped, first-match
    * semantics, so the picked window is bit-identical. */
  def snippets(docs: DataFrame, queryTerms: Seq[String],
               windowTokens: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty && windowTokens >= 1,
      "need query terms and a positive window")
    val w = windowTokens
    val hitsCol = transform(col("toks"),
      t => when(t.isin(queryTerms: _*), 1).otherwise(0))
    val winsCol = transform(
      sequence(lit(0), greatest(size(col("toks")) - w, lit(0))),
      i => aggregate(slice(col("hits"), i + 1, lit(w)), lit(0), (a, x) => a + x))
    docs
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .withColumn("hits", hitsCol)
      .withColumn("wins", winsCol)
      .select(col("doc_id"),
        array_position(col("wins"), array_max(col("wins"))).as("start_pos"),
        array_max(col("wins")).cast("long").as("window_hits"),
        col("toks"))
      .select(col("doc_id"), col("start_pos"), col("window_hits"),
        concat_ws(" ", slice(col("toks"), col("start_pos").cast("int"), lit(w)))
          .as("snippet"))
  }

  /** Build the BM25 index as a PERSISTED, SEGMENTED ARTIFACT — the
    * serving-side pattern (the [[graft.operators.TextAnalysis.qualityThresholds]] /
    * minhash-index family): one corpus pass writes `postings/seg=base`
    * (doc, term, tf — rows of over-cap terms dropped, bounding storage),
    * `doclen/seg=base`, the one-row `stats/seg=base`, the UNCAPPED
    * `termdf/seg=base` (true per-term counts — cap eviction is decided
    * from the AGGREGATED termdf at query time, which is what keeps
    * O(batch) appends df-correct), and the one-row `meta/` carrying the
    * cap itself. Queries then run against the artifact without touching
    * the corpus. At 100 TB the index builds once per snapshot and serves
    * every retrieval after; [[updateBm25Index]]/[[removeFromBm25Index]]
    * keep it current at O(batch)/O(deleted) write cost and
    * [[compactBm25Index]] folds the segment log on cadence (the
    * segment-layout note above [[buildAnnIndex]]). */
  def buildBm25Index(docs: DataFrame, path: String, maxDf: Long = 1000,
                     buckets: Int = 0): Unit = {
    // 0 = auto: scale the doc_id bucket count to the corpus (recorded in
    // meta/ — the takedown probe must hash at the build's count)
    val b = if (buckets > 0) buckets else autoBuckets(docs)
    // the tf table feeds FOUR consumers (postings, doclen, stats, termdf)
    // — materialized once so the corpus tokenize+explode+agg pass runs
    // once, not per write (the stageBm25Merge newTf rule applied to the
    // build); dl likewise feeds its own segment AND the stats row
    val tf = graft.functions.TextFunctions
      .explodeTokens(docs, "t", "doc_id")
      .where(col("t") =!= "")
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      .localCheckpoint()
    val dfAll = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    // five independent writes over the materialized tf/dl — overlap them
    // (the parallelWrites discipline)
    val spark = docs.sparkSession
    parallelWrites(spark)(
      () => writeBucketedSeg(
        tf.join(dfAll.where(col("df") <= maxDf).select(col("t")),
          Seq("t"), "left_semi"),
        s"$path/postings/seg=base", "doc_id", b),
      () => dl.write.mode("overwrite").parquet(s"$path/doclen/seg=base"),
      () => dl.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("dl")), lit(0L)).as("tot_len"))
        .write.mode("overwrite").parquet(s"$path/stats/seg=base"),
      () => dfAll.write.mode("overwrite").parquet(s"$path/termdf/seg=base"),
      () => spark.range(1)
        .select(lit(maxDf).as("max_df"), lit(b).as("n_buckets"))
        .write.mode("overwrite").parquet(s"$path/meta"))
  }

  /** Incrementally ABSORB a new document batch into a [[buildBm25Index]]
    * artifact — the index-maintenance form every other artifact family
    * here has (minhash index, decontamination universe, template strip
    * set, NB model): the expensive text scan (tokenize + tf) runs over
    * the NEW batch only, and the WRITE is O(batch) — the batch's rows
    * land as fresh `seg=sNNNNN` directories under `postings/`, `termdf/`,
    * `doclen/`, `stats/`; nothing existing is read or rewritten (the
    * round-11 finding that per-batch maintenance rewrote the whole index
    * is gone). Global statistics are what make BM25 updates non-trivial
    * (df and avgdl move for every term/doc when a batch lands) — they
    * stay exact because every statistic is MERGEABLE and aggregated at
    * query time: df = Σ termdf segments (the cap then evicts from the
    * true merged count, exactly as a full rebuild would — a term whose
    * total crossed the cap never scores, and batch posting rows are
    * stored uncapped so nothing is lost if a later rebuild re-admits it);
    * n_docs/tot_len = Σ one-row stats segments. The `sim_bm25_incr`
    * oracle pins `update(build(base), batch) == build(base ∪ batch)` at
    * the query surface. Contract: APPEND-only — re-delivering a doc would
    * double its rows ([[updateBm25IndexOnce]] is the dedupe layer
    * packaged). Durability: the segments stage under `_stage/` and swap
    * in by [[graft.sources.AtomicSwap]]'s marker/rename protocol — a
    * failure anywhere (including executor loss mid-write) leaves either
    * the old index or the new one, never a torn mix. */
  def updateBm25Index(spark: org.apache.spark.sql.SparkSession, path: String,
                      newDocs: DataFrame): Unit =
    graft.sources.AtomicSwap.withLease(spark, path) {
      graft.sources.AtomicSwap.recover(spark, path)
      val comps = stageBm25Merge(spark, path, newDocs)
      graft.sources.AtomicSwap.commit(spark, path, comps)
    }

  /** Stage (not commit) the batch's BM25 segments — shared by
    * [[updateBm25Index]] and [[updateBm25IndexOnce]]. Returns the staged
    * component list.
    *
    * TOMBSTONE ORDERING: the batch is anti-joined against the tombstone
    * tier before anything stages. Without this, a doc_id re-ingested
    * after a takedown would land in a new s-segment but stay permanently
    * masked by the d-segment anti-join, while its stats/termdf rows
    * still counted it — n_docs/df inflated versus a rebuild, the doc
    * never scoring. The takedown therefore WINS until a compaction
    * physically clears the tombstone tier; re-admitting the id after
    * that is a plain append (the LSM delete-then-reinsert rule: a
    * doc-keyed tombstone cannot distinguish the old rows from new ones,
    * so resurrecting in place would un-mask the stale postings too). */
  private def stageBm25Merge(spark: org.apache.spark.sql.SparkSession,
                             path: String, newDocsRaw: DataFrame): Seq[String] = {
    val newDocs = minusDeleted(newDocsRaw,
      deletedIds(spark, path, "doc_id"), "doc_id")
    val seg = nextSegName(spark, path, "s", Bm25Components)
    // the new batch's tf table feeds three consumers — materialize once
    val newTf = graft.functions.TextFunctions
      .explodeTokens(newDocs, "t", "doc_id")
      .where(col("t") =!= "")
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dl = newTf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      .localCheckpoint() // feeds its own segment AND the stats row
    val stage = graft.sources.AtomicSwap.stageDir(path, _: String)
    // four independent staged writes over the materialized newTf/dl —
    // overlap them (the parallelWrites discipline)
    parallelWrites(spark)(
      () => writeDeltaSeg(spark, path, "postings", newTf,
        stage(s"postings/seg=$seg")),
      () => newTf.groupBy(col("t")).agg(count(lit(1)).as("df"))
        .write.mode("overwrite").parquet(stage(s"termdf/seg=$seg")),
      () => dl.write.mode("overwrite").parquet(stage(s"doclen/seg=$seg")),
      () => dl.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("dl")), lit(0L)).as("tot_len"))
        .write.mode("overwrite").parquet(stage(s"stats/seg=$seg")))
    Seq(s"postings/seg=$seg", s"termdf/seg=$seg", s"doclen/seg=$seg",
      s"stats/seg=$seg")
  }

  /** EXACTLY-ONCE wrapper over [[updateBm25Index]] — the batch_id dedupe
    * layer the append-only contract defers to, packaged for a streaming
    * `foreachBatch` maintenance loop: Structured Streaming re-delivers a
    * micro-batch (same batch_id) after a failure, and a bare re-update
    * would double every posting. The applied-batch LEDGER is itself an
    * artifact component (`applied/`, one row per absorbed batch_id) that
    * rides the SAME atomic swap as the four index tables, so "the batch's
    * postings are in" and "the batch is recorded" commit together — a
    * crash leaves either neither (replay absorbs it) or both (replay
    * no-ops). Returns true when the batch was absorbed, false when the
    * ledger already had it. */
  def updateBm25IndexOnce(spark: org.apache.spark.sql.SparkSession,
                          path: String, newDocs: DataFrame,
                          batchId: Long): Boolean =
    graft.sources.AtomicSwap.withLease(spark, path) {
      import spark.implicits._
      graft.sources.AtomicSwap.recover(spark, path)
      val fs = artifactFs(spark, path)
      val applied =
        if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/applied")))
          spark.read.parquet(s"$path/applied")
        else Seq.empty[Long].toDF("batch_id")
      if (applied.where(col("batch_id") === batchId).isEmpty) {
        val comps = stageBm25Merge(spark, path, newDocs)
        applied.unionByName(Seq(batchId).toDF("batch_id"))
          .write.mode("overwrite")
          .parquet(graft.sources.AtomicSwap.stageDir(path, "applied"))
        graft.sources.AtomicSwap.commit(spark, path, comps :+ "applied")
        true
      } else false
    }

  /** DELETE documents from a [[buildBm25Index]] artifact — the takedown /
    * right-to-be-forgotten leg of the index lifecycle (every 100 TB corpus
    * eventually must remove specific documents without a rebuild).
    * TOMBSTONE form: the deleted ids land as a `deleted/seg=dNNNNN`
    * segment (query reads mask postings/doclen by one anti-join — those
    * components are never rewritten), the deleted docs' own visible
    * posting rows supply exact per-term decrements appended as a NEGATIVE
    * `termdf/` segment, and a negative one-row `stats/` segment retires
    * their doc/length counts. WRITE COST is O(deleted); the postings READ
    * that computes the decrements partition-prunes on the doc_id-bucketed
    * postings layout (`pbucket`), so a small takedown reads only the
    * buckets holding deleted ids — O(touched buckets), not O(index).
    * Idempotent by construction: ids with no live doclen row are
    * filtered out up front and a fully-redundant request set is a no-op.
    *
    * Exactness contract: scoring is EXACT for every term the index
    * serves — masked rows never score, aggregated df carries the
    * decrements, stats re-aggregate over survivors. The one documented
    * asymmetry: a term whose postings were CAP-EVICTED at build keeps its
    * `termdf/` count as an UPPER BOUND (the evicted docs' term bags are
    * not in the index, so their decrements are unknowable without a
    * corpus re-scan). That bound errs only toward keeping the term
    * evicted — it can never wrongly re-admit with an undercounted df —
    * and cap eviction stays monotone under any delete/append sequence;
    * re-admitting a term whose TRUE df fell back under the cap is the
    * rebuild cadence's job, exactly like codebook re-training ANN-side. */
  def removeFromBm25Index(spark: org.apache.spark.sql.SparkSession,
                          path: String, removeIds: DataFrame): Unit =
    graft.sources.AtomicSwap.withLease(spark, path) {
      graft.sources.AtomicSwap.recover(spark, path)
      val del = deletedIds(spark, path, "doc_id")
      val gone = broadcast(removeIds.select(col("doc_id")).distinct())
      // the ids actually live, with their lengths — re-deliveries vanish
      val goneDl = minusDeleted(readSegs(spark, path, "doclen"), del, "doc_id")
        .join(gone, Seq("doc_id"), "left_semi")
        .localCheckpoint() // feeds tombstone, stats, and the no-op check
      if (!goneDl.isEmpty) {
        val seg = nextSegName(spark, path, "d", Bm25Components)
        val stage = graft.sources.AtomicSwap.stageDir(path, _: String)
        // three independent staged writes over the checkpointed goneDl —
        // overlap them (the parallelWrites discipline). The termdf leg's
        // deleted docs' visible rows are the exact per-term decrements
        // (kept terms only — evicted terms have no rows here, the
        // upper-bound rule). That read PARTITION-PRUNES on the postings
        // layout's pbucket: only the buckets actually holding a deleted
        // id's rows are scanned, so a small takedown's read is
        // O(touched buckets), not O(index) — the driver-side bucket list
        // is ≤ PostingsBuckets values off the checkpointed goneDl, never
        // a data collect.
        parallelWrites(spark)(
          () => goneDl.select(col("doc_id"))
            .write.mode("overwrite").parquet(stage(s"deleted/seg=$seg")),
          () => minusDeleted(
            readPrunedByIds(spark, path, "postings", "doc_id", goneDl,
              readBuckets(spark, path)),
            del, "doc_id")
            .join(broadcast(goneDl.select(col("doc_id"))), Seq("doc_id"),
              "left_semi")
            .groupBy(col("t")).agg((-count(lit(1))).as("df"))
            .write.mode("overwrite").parquet(stage(s"termdf/seg=$seg")),
          () => goneDl.agg((-count(lit(1))).as("n_docs"),
              (-coalesce(sum(col("dl")), lit(0L))).as("tot_len"))
            .write.mode("overwrite").parquet(stage(s"stats/seg=$seg")))
        graft.sources.AtomicSwap.commit(spark, path,
          Seq(s"deleted/seg=$seg", s"termdf/seg=$seg", s"stats/seg=$seg"))
      }
    }

  /** Fold a segmented BM25 artifact back to a single base segment — the
    * LSM compaction cadence ([[compactAnnIndex]]'s lexical twin, and the
    * "rebuild cadence" the delete contract defers to): tombstone-masked
    * rows drop physically, the tombstone tier empties, termdf/stats
    * segments collapse to their aggregates (zero-df terms gone), and
    * posting rows of over-cap terms are dropped to the build contract's
    * storage bound. Query results are identical before and after (the
    * spec pins it). The ONE deliberately index-sized write. */
  def compactBm25Index(spark: org.apache.spark.sql.SparkSession,
                       path: String, buckets: Int = 0): Unit =
    graft.sources.AtomicSwap.withLease(spark, path) {
      graft.sources.AtomicSwap.recover(spark, path)
      val maxDf = readMaxDf(spark, path)
      // 0 = keep the recorded count; >0 re-buckets (the resize path) —
      // and the MIGRATION point for pre-bucket artifacts: the full fold
      // rewrites the whole postings component bucketed in one swap
      val b = if (buckets > 0) buckets else readBuckets(spark, path)
      val del = deletedIds(spark, path, "doc_id")
      val stage = graft.sources.AtomicSwap.stageDir(path, _: String)
      val dfAgg = readSegs(spark, path, "termdf")
        .groupBy(col("t")).agg(sum(col("df")).as("df"))
        .where(col("df") > 0)
        .localCheckpoint() // feeds its own segment AND the postings cap
      val dl = minusDeleted(readSegs(spark, path, "doclen"), del, "doc_id")
        .localCheckpoint() // feeds its own segment AND the stats row
      // five independent staged writes over live components and the
      // materialized dfAgg/dl — overlap them (the parallelWrites
      // discipline). Recorded count commits WITH the layout it describes
      // (see compactAnnIndex)
      parallelWrites(spark)(
        () => writeBucketedSeg(
          minusDeleted(readPostings(spark, path), del, "doc_id")
            .join(dfAgg.where(col("df") <= maxDf).select(col("t")),
              Seq("t"), "left_semi")
            .select(col("doc_id"), col("t"), col("tf")),
          s"${stage("postings")}/seg=base", "doc_id", b),
        () => dfAgg.write.mode("overwrite")
          .parquet(s"${stage("termdf")}/seg=base"),
        () => dl.write.mode("overwrite").parquet(s"${stage("doclen")}/seg=base"),
        () => dl.agg(count(lit(1)).as("n_docs"),
            coalesce(sum(col("dl")), lit(0L)).as("tot_len"))
          .write.mode("overwrite").parquet(s"${stage("stats")}/seg=base"),
        () => spark.range(1)
          .select(lit(maxDf).as("max_df"), lit(b).as("n_buckets"))
          .write.mode("overwrite").parquet(stage("meta")))
      artifactFs(spark, path)
        .mkdirs(new org.apache.hadoop.fs.Path(stage("deleted"))) // emptied
      graft.sources.AtomicSwap.commit(spark, path,
        Seq("postings", "termdf", "doclen", "stats", "deleted", "meta"))
    }

  /** Live segment-directory count of one artifact — the LSM merge-policy
    * signal: every segment is a directory readers must list and a plan
    * source to union, so unbounded growth degrades read fan-in even
    * though each append was O(batch). Counts only segments HOLDING data —
    * an emptied-by-tier-fold directory awaiting its post-commit cleanup
    * must not re-trigger the policy. */
  private def segmentCount(spark: org.apache.spark.sql.SparkSession,
                           path: String, components: Seq[String]): Int = {
    val fs = artifactFs(spark, path)
    components.map { c =>
      val d = new org.apache.hadoop.fs.Path(s"$path/$c")
      if (!fs.exists(d)) 0
      else fs.listStatus(d).count(st =>
        st.isDirectory && st.getPath.getName.startsWith("seg=") &&
          hasData(fs, st.getPath))
    }.foldLeft(0)(math.max)
  }

  /** Distinct live segment names across the artifact's components with
    * their total bytes (summed across components) — the size signal the
    * tiered merge policy sorts on. `base` is excluded: it is the full
    * fold's product (the LSM bottom level); tiers fold the delta log
    * above it. */
  private def segmentSizes(spark: org.apache.spark.sql.SparkSession,
                           path: String,
                           components: Seq[String]): Seq[(String, Long)] = {
    val fs = artifactFs(spark, path)
    val names = components.flatMap { c =>
      val d = new org.apache.hadoop.fs.Path(s"$path/$c")
      if (!fs.exists(d)) Nil
      else fs.listStatus(d).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("seg=")
          && hasData(fs, st.getPath))
        .map(_.getPath.getName.stripPrefix("seg="))
    }.distinct.filter(_ != "base")
    names.map { n =>
      val bytes = components.map { c =>
        val d = new org.apache.hadoop.fs.Path(s"$path/$c/seg=$n")
        if (fs.exists(d)) fs.getContentSummary(d).getLength else 0L
      }.sum
      (n, bytes)
    }
  }

  /** Fold a CHOSEN set of segments of one artifact into a single new
    * segment — the TIERED (leveled) compaction unit: each fold costs
    * O(tier bytes), never O(index), so the merge policy can bound read
    * fan-in on a per-batch cadence without re-paying the whole index per
    * fold (the full [[compactBm25Index]]/[[compactAnnIndex]] stays the
    * rarer bottom-level cadence that drops tombstoned rows physically).
    * Query identity is definitional: every query-time read is either a
    * plain segment UNION (postings/doclen/vectors/cells/codes/deleted) or
    * an associative SUM over segments (termdf/stats/coarse_sums), and the
    * fold replaces k operands of those unions/sums with their
    * concatenation/partial sum. Tombstone masks and the query-time
    * df/cnt>0 filters apply AFTER the aggregation, so partial sums — even
    * transiently negative or zero ones — are preserved, never filtered
    * here. Crash-safe: the merged segment plus an EMPTIED stage dir per
    * folded segment commit in one [[graft.sources.AtomicSwap]] swap; the
    * (harmless, empty) old directories are removed post-commit.
    * `merges` maps a component to the merge of its folded rows; absent
    * keys concatenate unchanged. */
  private def foldSegments(spark: org.apache.spark.sql.SparkSession,
                           path: String, components: Seq[String],
                           segNames: Seq[String],
                           merges: Map[String, DataFrame => DataFrame],
                           partitionCols: Map[String, String]): Unit = {
    require(segNames.size >= 2, "a tier fold needs at least two segments")
    val fs = artifactFs(spark, path)
    val newSeg = nextSegName(spark, path, "s", components)
    val stage = graft.sources.AtomicSwap.stageDir(path, _: String)
    // adjudicate each component's fold input on the driver first, then
    // overlap the per-component merged-segment writes — each fold reads
    // its own live segments and writes its own staged dir, so the
    // component jobs are independent (the parallelWrites discipline)
    val plan = components.map { c =>
      val present = segNames.filter(n =>
        fs.exists(new org.apache.hadoop.fs.Path(s"$path/$c/seg=$n")))
      val withData = present.filter(n =>
        hasData(fs, new org.apache.hadoop.fs.Path(s"$path/$c/seg=$n")))
      (c, present, withData)
    }
    parallelWrites(spark)(plan.collect { case (c, _, withData)
        if withData.nonEmpty => () => {
      val merged = merges.getOrElse(c, identity[DataFrame] _)(
        withData.map(n => spark.read.parquet(s"$path/$c/seg=$n")
            .drop("pbucket"))
          .reduce(_ unionByName _))
      partitionCols.get(c) match {
        case Some(_) => // tier outputs are delta-sized — sentinel bucket
          // (or flat, matching a legacy component's depth)
          writeDeltaSeg(spark, path, c, merged, stage(s"$c/seg=$newSeg"))
        case None => merged.write.mode("overwrite")
          .parquet(stage(s"$c/seg=$newSeg"))
      }
    }}: _*)
    val staged = Seq.newBuilder[String]
    plan.foreach { case (c, present, withData) =>
      if (withData.nonEmpty) staged += s"$c/seg=$newSeg"
      present.foreach { n =>
        fs.mkdirs(new org.apache.hadoop.fs.Path(stage(s"$c/seg=$n")))
        staged += s"$c/seg=$n"
      }
    }
    val comps = staged.result()
    if (comps.nonEmpty) {
      graft.sources.AtomicSwap.commit(spark, path, comps)
      // post-commit: the folded directories are now EMPTY (swapped with
      // empty stages) — remove them so listings stay tier-sized. A crash
      // here leaves empty dirs, which contribute no rows and no segment
      // count (hasData-gated) — repaired by the next fold's sweep.
      components.foreach { c =>
        segNames.foreach { n =>
          val d = new org.apache.hadoop.fs.Path(s"$path/$c/seg=$n")
          if (fs.exists(d) && !hasData(fs, d)) fs.delete(d, true)
        }
      }
    }
  }

  /** Tiered fold of the `k` SMALLEST delta segments of a BM25 artifact
    * into one — O(tier) read+write. Postings/doclen/deleted concatenate;
    * termdf/stats partial-SUM (zero-net termdf rows drop — absent equals
    * zero under the query-time aggregation; negative partials stay).
    * Returns true when a fold ran (needs ≥ 2 non-base segments). */
  def compactBm25IndexTier(spark: org.apache.spark.sql.SparkSession,
                           path: String, k: Int = 4): Boolean =
    graft.sources.AtomicSwap.withLease(spark, path) {
      graft.sources.AtomicSwap.recover(spark, path)
      val tiers = segmentSizes(spark, path, Bm25Components)
        .sortBy(_._2).take(math.max(k, 2)).map(_._1)
      if (tiers.size < 2) false
      else {
        foldSegments(spark, path, Bm25Components, tiers,
          merges = Map(
            "termdf" -> ((df: DataFrame) => df.groupBy(col("t"))
              .agg(sum(col("df")).as("df")).where(col("df") =!= 0)),
            "stats" -> ((df: DataFrame) => df.agg(
              coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"),
              coalesce(sum(col("tot_len")), lit(0L)).as("tot_len"))),
            "deleted" -> ((df: DataFrame) => df.distinct())),
          partitionCols = Map("postings" -> "pbucket"))
        true
      }
    }

  /** [[compactBm25IndexTier]]'s ANN twin: vectors/cells/codes/deleted
    * concatenate; coarse_sums partial-SUMs per (cell, d) — all-zero rows
    * drop, nonzero partials (including negatives) stay for the query-time
    * aggregate. The frozen quantizers and the exactly-maintained
    * coarse_centroids are untouched (a fold moves no aggregate). */
  def compactAnnIndexTier(spark: org.apache.spark.sql.SparkSession,
                          path: String, k: Int = 4): Boolean =
    graft.sources.AtomicSwap.withLease(spark, path) {
      graft.sources.AtomicSwap.recover(spark, path)
      val tiers = segmentSizes(spark, path, AnnComponents)
        .sortBy(_._2).take(math.max(k, 2)).map(_._1)
      if (tiers.size < 2) false
      else {
        foldSegments(spark, path, AnnComponents, tiers,
          merges = Map(
            "coarse_sums" -> ((df: DataFrame) => df
              .groupBy(col("cell"), col("d"))
              .agg(sum(col("sd")).as("sd"), sum(col("cnt")).as("cnt"))
              .where(col("sd") =!= 0 || col("cnt") =!= 0)),
            "deleted" -> ((df: DataFrame) => df.distinct())),
          partitionCols =
            Map("vectors" -> "pbucket", "cells" -> "pbucket"))
        true
      }
    }

  /** The COMPACTION POLICY for a [[buildBm25Index]] artifact — the
    * cadence knob the maintenance scaladocs defer to, made driveable:
    * when any component's segment count exceeds `maxSegments`, fold the
    * smallest (count − maxSegments + 1) delta segments into one
    * ([[compactBm25IndexTier]]) — the count lands back AT maxSegments and
    * each fold costs O(tier), not O(index). Only when the delta log
    * cannot be tiered (a single oversized non-base segment — possible
    * only at maxSegments = 1) does the policy fall back to the full
    * bottom-level fold. Returns true when a fold ran. Wired into the
    * streaming maintenance loops via their `autoCompactSegments`
    * parameter, this bounds read fan-in at ≤ maxSegments directories per
    * component with amortized per-batch write cost O(batch · log(index /
    * batch) / maxSegments) — the standard tiered-LSM trade, replacing
    * round 12's full fold per trigger (which re-paid the whole index
    * every cadence). */
  def maybeCompactBm25Index(spark: org.apache.spark.sql.SparkSession,
                            path: String, maxSegments: Int = 16): Boolean = {
    require(maxSegments >= 1, "maxSegments must be positive")
    val n = segmentCount(spark, path, Bm25Components)
    if (n <= maxSegments) false
    else if (compactBm25IndexTier(spark, path, n - maxSegments + 1)) true
    else { compactBm25Index(spark, path); true }
  }

  /** [[maybeCompactBm25Index]]'s ANN twin. */
  def maybeCompactAnnIndex(spark: org.apache.spark.sql.SparkSession,
                           path: String, maxSegments: Int = 16): Boolean = {
    require(maxSegments >= 1, "maxSegments must be positive")
    val n = segmentCount(spark, path, AnnComponents)
    if (n <= maxSegments) false
    else if (compactAnnIndexTier(spark, path, n - maxSegments + 1)) true
    else { compactAnnIndex(spark, path); true }
  }

  // ---- Shard-parallel index serving ---------------------------------------
  // At 100 TB one directory tree per index is the wrong unit: builds,
  // compactions, and every maintenance write serialize over a single
  // artifact (one lease, one segment log, one listing). The SHARDED form
  // splits ROWS by id hash into N sub-indexes — each a complete,
  // independently-queryable, independently-maintainable buildBm25Index /
  // buildAnnIndex artifact under `<path>/shard=NNN` with its own lease and
  // LSM segment log — so per-shard maintenance cost is independent of
  // TOTAL index size and shards update/compact/take down in parallel.
  // Queries fan out over the shards and MERGE EXACTLY:
  //  - BM25: df / n_docs / tot_len are associative integer sums across
  //    shards (the same mergeability that makes the segment log exact),
  //    and per-shard df-cap eviction only ever drops rows of terms whose
  //    GLOBAL df also exceeds the cap (shard df <= global df), which the
  //    query-time aggregated-cap filter drops anyway.
  //  - ANN: the quantizers are trained ONCE over the full build corpus and
  //    FROZEN into every shard (FAISS's shard-the-inverted-lists
  //    discipline: one codebook, N inverted-list slices), and the global
  //    probe-order centroids reconstruct bit-exactly from the shards'
  //    mergeable integer coarse sums.
  // Shard count must therefore not change a single score —
  // `sim_bm25_sharded` / `ann_ivfpq_sharded` share the UNSHARDED oracle
  // SQL verbatim.

  /** Shard routing — the same canonical-id hash mix as [[pbucketOf]]
    * (write side and maintenance probes must agree across id widths). */
  private def shardOf(df: DataFrame, idCol: String, shards: Int): Column =
    pmod(hash(canonId(df, idCol)).cast("long"), lit(shards.toLong))
      .cast("int")

  private def shardDir(path: String, i: Int): String = f"$path/shard=$i%03d"

  /** Concurrency width for in-process shard jobs. 4 measured best at
    * both fixed-cost-dominated (sf0.1: 13.1 s → 7.3 s for a 4-shard BM25
    * build) and compute-bound (sf10-syn: 48.7 s → 33.5 s) scales — each
    * shard's job rarely saturates the scheduler alone, and Spark's task
    * scheduler time-slices the rest. GRAFT_SHARD_POOL overrides. */
  private def defaultShardPoolWidth(
      spark: org.apache.spark.sql.SparkSession): Int = 4

  /** Run one unit of work PER SHARD with the shards genuinely concurrent
    * inside this application (a small Future pool; Spark's scheduler
    * interleaves their jobs) — each shard is an independent artifact
    * under its own lease, so the sequential driver loop the first sharded
    * cut used serialized wall time for no safety gain. All shards run to
    * completion even when one fails (each is individually crash-safe via
    * the swap protocol); the first failure then rethrows. */
  private def forEachShard(spark: org.apache.spark.sql.SparkSession,
                           shardIds: Seq[Int])(work: Int => Unit): Unit = {
    // GRAFT_SHARD_SEQUENTIAL=1: measurement switch for the parallel-vs-
    // sequential A/B (README scale table) — not a supported mode
    if (shardIds.sizeIs <= 1 ||
        sys.env.get("GRAFT_SHARD_SEQUENTIAL").contains("1")) {
      shardIds.foreach(work); return
    }
    val width = sys.env.get("GRAFT_SHARD_POOL").map(_.toInt)
      .getOrElse(defaultShardPoolWidth(spark))
    if (width <= 1) { shardIds.foreach(work); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(shardIds.size, width),
      (r: Runnable) => {
        val t = new Thread(r, "graft-shard-worker"); t.setDaemon(true); t
      })
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val done = shardIds.map { i =>
        scala.concurrent.Future {
          // worker threads need the session active for any code path that
          // resolves it implicitly (e.g. SparkSession.active)
          org.apache.spark.sql.SparkSession.setActiveSession(spark)
          work(i)
        }
      }.map(f => scala.util.Try(scala.concurrent.Await
        .result(f, scala.concurrent.duration.Duration.Inf)))
      done.collectFirst { case scala.util.Failure(e) => throw e }
    } finally pool.shutdown()
  }

  /** Run INDEPENDENT staged-write jobs of one maintenance cycle
    * concurrently — the [[forEachShard]] discipline applied one level
    * down: a build/merge/takedown/compact cycle stages several component
    * segments whose inputs are already materialized (localCheckpoint) or
    * read-only live components, and each tiny write is a full Spark job
    * whose scheduling + file-commit latency serialized for no safety gain
    * (every thunk targets its own staged directory; nothing live mutates
    * until the single commit AFTER all thunks return). All thunks run to
    * completion even when one fails — the stage tree is discarded
    * uncommitted either way — then the first failure rethrows.
    * GRAFT_WRITE_POOL overrides the width (4, the forEachShard-measured
    * sweet spot); GRAFT_WRITE_SEQUENTIAL=1 is the A/B switch. */
  private[graft] def parallelWrites(
      spark: org.apache.spark.sql.SparkSession)(thunks: (() => Unit)*): Unit = {
    if (thunks.sizeIs <= 1 ||
        sys.env.get("GRAFT_WRITE_SEQUENTIAL").contains("1")) {
      thunks.foreach(_.apply()); return
    }
    val width = sys.env.get("GRAFT_WRITE_POOL").map(_.toInt).getOrElse(4)
    if (width <= 1) { thunks.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(thunks.size, width),
      (r: Runnable) => {
        val t = new Thread(r, "graft-stage-writer"); t.setDaemon(true); t
      })
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val done = thunks.map { th =>
        scala.concurrent.Future {
          org.apache.spark.sql.SparkSession.setActiveSession(spark)
          th()
        }
      }.map(f => scala.util.Try(scala.concurrent.Await
        .result(f, scala.concurrent.duration.Duration.Inf)))
      done.collectFirst { case scala.util.Failure(e) => throw e }
    } finally pool.shutdown()
  }

  /** The recorded shard count — routing must hash at the build's count. */
  private def readShards(spark: org.apache.spark.sql.SparkSession,
                         path: String): Int =
    spark.read.parquet(s"$path/shards_meta")
      .select(col("n_shards")).head().getInt(0)

  private def shardDirs(spark: org.apache.spark.sql.SparkSession,
                        path: String): Seq[String] =
    (0 until readShards(spark, path)).map(shardDir(path, _))

  /** Build a BM25 index as N hash-sharded sub-artifacts. Each shard is a
    * full [[buildBm25Index]] artifact over its doc slice; the corpus pass
    * is shared (one checkpoint feeds every shard's filtered build). */
  def buildBm25IndexSharded(docs: DataFrame, path: String, shards: Int,
                            maxDf: Long = 1000, buckets: Int = 0): Unit = {
    require(shards >= 1, "shards must be positive")
    val d = docs.localCheckpoint()
    forEachShard(d.sparkSession, 0 until shards) { i =>
      buildBm25Index(d.where(shardOf(d, "doc_id", shards) === i),
        shardDir(path, i), maxDf, buckets)
    }
    d.sparkSession.range(1).select(lit(shards).as("n_shards"))
      .write.mode("overwrite").parquet(s"$path/shards_meta")
  }

  /** Query a sharded BM25 index: per-shard live views union, the global
    * statistics aggregate across shards (associative integer sums), and
    * the score equals [[bm25QueryIndex]] over one index of the same
    * corpus — shard count is layout, not semantics. */
  def bm25QueryIndexSharded(spark: org.apache.spark.sql.SparkSession,
                            path: String, queryIds: Seq[Long], k: Int,
                            idfCapX100: Long = 10000,
                            k1X10: Long = 12, bX100: Long = 75): DataFrame = {
    require(queryIds.nonEmpty && k >= 1, "need query docs and positive k")
    val dirs = shardDirs(spark, path)
    dirs.foreach(dir =>
      graft.sources.AtomicSwap.recover(spark, dir, cleanStale = false))
    val maxDf = readMaxDf(spark, dirs.head)
    def live(c: String): DataFrame = dirs.map { dir =>
      minusDeleted(readSegs(spark, dir, c),
        deletedIds(spark, dir, "doc_id"), "doc_id")
    }.reduce(_ unionByName _)
    val stats = dirs.map(dir => readSegs(spark, dir, "stats"))
      .reduce(_ unionByName _)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("tot_len")).as("tot_len"))
      .where(col("n_docs") > 0)
    val dfT = dirs.map(dir => readSegs(spark, dir, "termdf"))
      .reduce(_ unionByName _)
      .groupBy(col("t")).agg(sum(col("df")).as("df"))
      .where(col("df") > 0 && col("df") <= maxDf)
    bm25ScoreServed(live("postings"), live("doclen"), stats, dfT,
      queryIds, k, idfCapX100, k1X10, bX100)
  }

  /** Absorb a batch into a sharded BM25 index: the batch routes by doc
    * hash and only the receiving shards do any work — per-shard append
    * cost tracks the SLICE, never the total index. */
  def updateBm25IndexSharded(spark: org.apache.spark.sql.SparkSession,
                             path: String, newDocs: DataFrame): Unit = {
    val shards = readShards(spark, path)
    val d = newDocs.localCheckpoint()
    forEachShard(spark, 0 until shards) { i =>
      val slice = d.where(shardOf(d, "doc_id", shards) === i)
      if (!slice.isEmpty) updateBm25Index(spark, shardDir(path, i), slice)
    }
  }

  /** Takedown against a sharded BM25 index: requests route by doc hash,
    * so only the shards actually holding a removed id pay their (bucket-
    * pruned) decrement read — per-request cost independent of total index
    * size. */
  def removeFromBm25IndexSharded(spark: org.apache.spark.sql.SparkSession,
                                 path: String, removeIds: DataFrame): Unit = {
    val shards = readShards(spark, path)
    val ids = removeIds.select(col("doc_id")).distinct().localCheckpoint()
    val touched = ids.select(shardOf(ids, "doc_id", shards).as("sh"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    forEachShard(spark, touched) { i =>
      removeFromBm25Index(spark, shardDir(path, i),
        ids.where(shardOf(ids, "doc_id", shards) === i))
    }
  }

  /** Build an IVF+PQ index as N hash-sharded sub-artifacts with ONE
    * shared training pass: the coarse tier is fixed hyperplanes, the PQ
    * codebook trains over the FULL corpus and freezes into every shard,
    * and each shard holds its vec-slice of vectors/cells/codes plus its
    * own mergeable coarse sums. Every shard is a complete
    * [[buildAnnIndex]]-shaped artifact (queryable and maintainable alone);
    * the fan-out query reconstructs the global probe order exactly. */
  def buildAnnIndexSharded(emb: DataFrame, path: String, shards: Int,
                           planes: Int = 4, m: Int = 8, bits: Int = 4,
                           dim: Int = 64, refine: Int = 1,
                           buckets: Int = 0): Unit = {
    require(shards >= 1, "shards must be positive")
    require(dim % m == 0, s"dim ($dim) must split evenly into m ($m) subspaces")
    val b = if (buckets > 0) buckets else autoBuckets(emb)
    val spark = emb.sparkSession
    val e = withUnitVector(emb).select(col("vec_id"), col("vn"))
    val assigned = coarseAssign(e, planes, dim)
    val (_, codesAll, centroids) = pqTrain(e, m, bits, dim / m, refine)
    val codes = codesAll.localCheckpoint() // feeds every shard's filter
    val cents = centroids.localCheckpoint()
    val asg = assigned.localCheckpoint() // one assign pass feeds every shard
    forEachShard(spark, 0 until shards) { i =>
      val dir = shardDir(path, i)
      val mine = asg.where(shardOf(asg, "vec_id", shards) === i)
      writeBucketedSeg(mine.select(col("vec_id"), col("vn")),
        s"$dir/vectors/seg=base", "vec_id", b)
      writeBucketedSeg(mine.select(col("vec_id"), col("cell")),
        s"$dir/cells/seg=base", "vec_id", b)
      val sums = coarseSums(mine).localCheckpoint()
      sums.write.mode("overwrite").parquet(s"$dir/coarse_sums/seg=base")
      centroidsFromSums(sums)
        .write.mode("overwrite").parquet(s"$dir/coarse_centroids")
      codes.where(shardOf(codes, "vec_id", shards) === i)
        .write.mode("overwrite").parquet(s"$dir/codes/seg=base")
      cents.write.mode("overwrite").parquet(s"$dir/pq_centroids")
      spark.range(1).select(lit(b).as("n_buckets"))
        .write.mode("overwrite").parquet(s"$dir/meta")
    }
    spark.range(1).select(lit(shards).as("n_shards"))
      .write.mode("overwrite").parquet(s"$path/shards_meta")
  }

  /** Query a sharded ANN index: per-shard live components union, the
    * global probe-order centroids reconstruct from the shards' mergeable
    * integer coarse sums (bit-exact — the same associativity the segment
    * log relies on), and the shared frozen codebook serves the ADC — the
    * answer equals [[annQueryIndex]] over one index of the same corpus. */
  def annQueryIndexSharded(spark: org.apache.spark.sql.SparkSession,
                           path: String, nQueries: Int, k: Int,
                           nProbe: Int = 4, m: Int = 8, dim: Int = 64,
                           shortlist: Int = 50): DataFrame = {
    val dirs = shardDirs(spark, path)
    dirs.foreach(dir =>
      graft.sources.AtomicSwap.recover(spark, dir, cleanStale = false))
    def live(c: String): DataFrame = dirs.map { dir =>
      minusDeleted(readSegs(spark, dir, c),
        deletedIds(spark, dir, "vec_id"), "vec_id")
    }.reduce(_ unionByName _)
    val cents = centroidsFromSums(aggSums(
      dirs.map(dir => readSegs(spark, dir, "coarse_sums"))
        .reduce(_ unionByName _)))
    ivfPqProbe(live("vectors"), live("cells"), cents, live("codes"),
      spark.read.parquet(s"${dirs.head}/pq_centroids"),
      nQueries, k, nProbe, m, dim, shortlist)
  }

  /** Absorb a vector batch into a sharded ANN index — routes by vec hash;
    * each receiving shard runs its own frozen-quantizer O(slice) append
    * under its own lease. */
  def updateAnnIndexSharded(spark: org.apache.spark.sql.SparkSession,
                            path: String, newEmb: DataFrame,
                            planes: Int = 4, m: Int = 8,
                            dim: Int = 64): Unit = {
    val shards = readShards(spark, path)
    val d = newEmb.localCheckpoint()
    forEachShard(spark, 0 until shards) { i =>
      val slice = d.where(shardOf(d, "vec_id", shards) === i)
      if (!slice.isEmpty)
        updateAnnIndex(spark, shardDir(path, i), slice, planes, m, dim)
    }
  }

  /** Exactly-once sharded BM25 absorb — the streaming maintenance form:
    * routes the batch by doc hash and runs each owning shard's LEDGERED
    * [[updateBm25IndexOnce]] under that shard's own lease, so a replayed
    * micro-batch no-ops per shard (each shard's `applied/` ledger commits
    * atomically with its own segments; shards that received nothing
    * skip — the replay skips them identically). */
  def updateBm25IndexShardedOnce(spark: org.apache.spark.sql.SparkSession,
                                 path: String, newDocs: DataFrame,
                                 batchId: Long): Unit = {
    val shards = readShards(spark, path)
    val d = newDocs.localCheckpoint()
    forEachShard(spark, 0 until shards) { i =>
      val slice = d.where(shardOf(d, "doc_id", shards) === i)
      if (!slice.isEmpty)
        updateBm25IndexOnce(spark, shardDir(path, i), slice, batchId)
    }
  }

  /** [[updateBm25IndexShardedOnce]]'s ANN twin — per-shard ledgered
    * frozen-quantizer absorbs. */
  def updateAnnIndexShardedOnce(spark: org.apache.spark.sql.SparkSession,
                                path: String, newEmb: DataFrame,
                                batchId: Long, planes: Int = 4,
                                m: Int = 8, dim: Int = 64): Unit = {
    val shards = readShards(spark, path)
    val d = newEmb.localCheckpoint()
    forEachShard(spark, 0 until shards) { i =>
      val slice = d.where(shardOf(d, "vec_id", shards) === i)
      if (!slice.isEmpty)
        updateAnnIndexOnce(spark, shardDir(path, i), slice, batchId,
          planes, m, dim)
    }
  }

  /** Takedown against a sharded ANN index — only the shards holding a
    * removed id pay their bucket-pruned negative-sums read. */
  def removeFromAnnIndexSharded(spark: org.apache.spark.sql.SparkSession,
                                path: String, removeIds: DataFrame): Unit = {
    val shards = readShards(spark, path)
    val ids = removeIds.select(col("vec_id")).distinct().localCheckpoint()
    val touched = ids.select(shardOf(ids, "vec_id", shards).as("sh"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    forEachShard(spark, touched) { i =>
      removeFromAnnIndex(spark, shardDir(path, i),
        ids.where(shardOf(ids, "vec_id", shards) === i))
    }
  }

  /** Query a [[buildBm25Index]] artifact: identical scoring to
    * [[bm25TopKFor]], but every input is an index read — the corpus is
    * never scanned. Query bags come from the query docs' own postings. */
  def bm25QueryIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                     queryIds: Seq[Long], k: Int,
                     idfCapX100: Long = 10000,
                     k1X10: Long = 12, bX100: Long = 75): DataFrame = {
    require(queryIds.nonEmpty && k >= 1, "need query docs and positive k")
    // finish any in-flight atomic swap left by a crashed updater (never
    // touches a concurrent updater's staging)
    graft.sources.AtomicSwap.recover(spark, path, cleanStale = false)
    val maxDf = readMaxDf(spark, path)
    // segment union + tombstone mask; df/n_docs/tot_len aggregate from
    // the mergeable segments (exact integers — a query over base ∪
    // batches ∪ deletes scores identically to one over a fresh rebuild)
    val del = deletedIds(spark, path, "doc_id")
    val postings =
      minusDeleted(readPostings(spark, path), del, "doc_id")
    val dl = minusDeleted(readSegs(spark, path, "doclen"), del, "doc_id")
    // n_docs > 0 guards the avdl DIV against a fully-taken-down index:
    // zero live docs → zero stats rows → zero scored rows, never a
    // null-scored result
    val stats = readSegs(spark, path, "stats")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("tot_len")).as("tot_len"))
      .where(col("n_docs") > 0)
    // the aggregated-df cap bounds the postings join fan-out BEFORE the
    // inverted-index join, exactly as the stamped-df form did
    val dfT = readSegs(spark, path, "termdf")
      .groupBy(col("t")).agg(sum(col("df")).as("df"))
      .where(col("df") > 0 && col("df") <= maxDf)
    bm25ScoreServed(postings, dl, stats, dfT, queryIds, k,
      idfCapX100, k1X10, bX100)
  }

  /** The BM25 scoring core over SERVED views — shared verbatim by the
    * single-artifact query and the shard fan-out ([[bm25QueryIndexSharded]]):
    * `postings`/`dl` are live (tombstone-masked) rows, `stats` the
    * aggregated one-row (n_docs, tot_len), `dfT` the aggregated,
    * cap-filtered per-term df. Fixed-point arithmetic throughout. */
  private def bm25ScoreServed(postings: DataFrame, dl: DataFrame,
                              stats: DataFrame, dfT: DataFrame,
                              queryIds: Seq[Long], k: Int,
                              idfCapX100: Long, k1X10: Long,
                              bX100: Long): DataFrame = {
    val qTerms = postings.where(col("doc_id").isin(queryIds: _*))
      .select(col("doc_id").as("query_id"), col("t")).distinct()
    val scored = qTerms
      .join(dfT, Seq("t"))
      .join(postings, Seq("t"))
      .where(col("doc_id") =!= col("query_id"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_x100", least(
        floor(lit(100.0) * col("n_docs") / col("df")).cast("long"),
        lit(idfCapX100)))
      .withColumn("avdl_x1000", expr("(1000 * tot_len) DIV n_docs"))
      .withColumn("norm_x1000",
        lit(1000L - 10L * bX100) +
          expr(s"(${10L * bX100} * dl * 1000) DIV avdl_x1000"))
      .withColumn("tfc_x1000", expr(
        s"(tf * ${(k1X10 + 10L) * 100L} * 1000) DIV " +
          s"(tf * 1000 + (${k1X10 * 100L} * norm_x1000) DIV 1000)"))
      .withColumn("contrib", col("idf_x100") * col("tfc_x1000"))
    val ranked = scored
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("score_x1e5"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_x1e5").desc, col("doc_id"))
    ranked
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("doc_id"),
        col("rank").cast("long").as("rank"), col("score_x1e5"))
  }

  /** Per-dimension embedding-space statistics — the drift monitor for an
    * embedding pipeline: when the encoder, preprocessing, or upstream
    * corpus shifts, dimension means move first (a global cosine metric
    * hides which dimensions drifted). Values go through the standard
    * fixed-point gate (per-element `floor(x·1e6 + 0.5)` then integer
    * aggregation) so every statistic is order-independent and
    * cross-engine exact; the mean divides as a double (exact for these
    * magnitudes) and floors.
    *
    * Plan shape: one posexplode + one map-combinable hash agg on the
    * dimension index — dims × (n, sum, min, max), corpus-sized scan, tiny
    * result. */
  def embeddingStats(emb: DataFrame): DataFrame =
    emb
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .withColumn("xf", floor(col("x").cast("double") * 1000000.0 + 0.5).cast("long"))
      .groupBy(col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"), sum(col("xf")).as("sum_x1e6"),
        min(col("xf")).as("min_x1e6"), max(col("xf")).as("max_x1e6"))
      .withColumn("mean_x1e6",
        floor(col("sum_x1e6").cast("double") / col("n")).cast("long"))

  /** Per-label embedding diversity in ONE aggregation pass — the
    * SemDeDup-adjacent compactness instrument: mean pairwise cosine over a
    * label's unit vectors via the centroid identity
    * `Σ_{a≠b} vn_a·vn_b = ‖Σvn‖² − Σ‖vn‖²`, so the answer costs O(d)
    * state per label instead of the O(n²) pair join it summarizes. A label
    * near 1.0 is collapsed (near-dup mass — prune it); near 0 is spread.
    * The readout a diversity-sampling or SemDeDup run consults BEFORE
    * paying for clustering.
    *
    * Determinism: components are per-row fixed-point ints (`floor(vn·1e6)`)
    * so the per-dimension sums are exact integer aggregation
    * (order-independent); the only float reduction is the final
    * 64-element fold over dimensions in FIXED index order (sorted
    * collect_list), bit-identical cross-engine. Per-row self-dots are
    * exact int64 throughout. Labels with < 2 vectors report -1. */
  def labelDiversity(emb: DataFrame): DataFrame = {
    val q = graft.operators.Dedup.withUnitVector(emb)
      .select(col("vec_id"),
        transform(col("vn"), x => floor(x * 1000000.0).cast("long")).as("q"))
      .join(emb.select(col("vec_id"), col("label").cast("long").as("label")),
        Seq("vec_id"))
    // per-row self-dot (exact int64) + per-(label, dim) integer sums
    val rows = q.select(col("label"), col("q"),
      aggregate(col("q"), lit(0L), (acc, x) => acc + x * x).as("sd"))
    val perLabel = rows.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("sd")).as("sum_self"))
    val dimSums = rows
      .select(col("label"), posexplode(col("q")).as(Seq("i", "x")))
      .groupBy(col("label"), col("i")).agg(sum(col("x")).as("s"))
      .groupBy(col("label"))
      .agg(aggregate(
        sort_array(collect_list(struct(col("i"), col("s")))),
        lit(0.0),
        (acc, e) => acc + e.getField("s").cast("double") *
          e.getField("s").cast("double")).as("cent_sq"))
    perLabel.join(dimSums, Seq("label"))
      .select(col("label"), col("n_vecs"),
        when(col("n_vecs") < 2L, lit(-1L))
          .otherwise(floor(
            (col("cent_sq") - col("sum_self").cast("double")) /
              (col("n_vecs") * (col("n_vecs") - 1L)).cast("double") / 1000000.0)
            .cast("long"))
          .as("avg_pair_cos_x1e6"))
  }

  /** Reciprocal-rank fusion (Cormack et al.) — hybrid retrieval's standard
    * combiner: each system's ranked list `(query_id, doc_id, rank)`
    * contributes `1/(K + rank)` and the fused order is by the sum. Rank-
    * based, so systems with incomparable score scales (BM25 vs cosine)
    * fuse without calibration. Fixed point: `100000 DIV (K + rank)` —
    * integer, cross-engine exact. Also reports how many systems surfaced
    * each doc (`n_systems` — the agreement signal).
    *
    * Plan shape: union of the (already small) top-k lists, one hash agg,
    * one per-query window — the fusion itself is free next to the
    * underlying retrievals. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, rrfK: Long = 60L): DataFrame = {
    require(rankings.nonEmpty && k >= 1, "need rankings and positive k")
    val contribs = rankings.map(_.select(col("query_id"), col("doc_id"),
      expr(s"100000 DIV ($rrfK + rank)").as("c")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("rrf_x1e5"), count(lit(1)).as("n_systems"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_x1e5").desc, col("doc_id"))
    fused
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("doc_id"),
        col("rank").cast("long").as("rank"), col("rrf_x1e5"), col("n_systems"))
  }

  /** Top PRINCIPAL COMPONENT of the embedding cloud by power iteration —
    * the anisotropy diagnostic an embedding-quality review reads (a high
    * explained-variance ratio means one rogue direction dominates — the
    * "common-direction" pathology that wrecks cosine retrieval; the
    * whitening decision starts here).
    *
    * EXACT-INTEGER pipeline, bit-identical cross-engine: components
    * quantize ×10⁴ to BIGINT; the centered scatter matrix
    * `C = n·Σxxᵀ − (Σx)(Σx)ᵀ` is exact 64×64 BIGINT (≤3·10¹⁴ at
    * sf0.1 — BIGINT-safe to n≈4·10⁴ at this quantization; beyond that,
    * rescale the quantization or sum per-partition partials in double);
    * then `iters` fixed power steps v ← round(Cv·100/max|Cv|) — the only
    * non-integer op is the final scale division, done in IEEE double on
    * exact integer operands (deterministic both engines). The operator is
    * DEFINED as `iters` steps (near-isotropic clouds converge slowly; the
    * step count is part of the contract, like the LPA/k-core round caps).
    *
    * Plan shape: the scatter matrix is ONE self-join on vec_id (64²
    * products per vector, map-side combinable — the standard outer-product
    * aggregation; at 100 TB accumulate the 64×64 partial per partition);
    * every later stage is 64- or 4096-row arithmetic riding broadcast.
    * Output: (d, loading_x10000, evr_ppm) — the unit-free direction and
    * the explained-variance ratio λ/trace(C) in ppm. */
  def principalComponent(emb: DataFrame, iters: Int = 8): DataFrame = {
    require(iters >= 1, "iters must be positive")
    val comp = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("vec_id"), col("d").cast("long").as("d"),
        floor(col("x").cast("double") * 10000.0 + 0.5).cast("long").as("xi"))
      .localCheckpoint() // consumed by n, sx, and the self-join twice
    val n = comp.agg(countDistinct(col("vec_id")).as("n"))
    val sx = comp.groupBy(col("d")).agg(sum(col("xi")).as("sx"))
    val sxx = comp.alias("a").join(comp.alias("b"), "vec_id")
      .groupBy(col("a.d").as("d1"), col("b.d").as("d2"))
      .agg(sum(col("a.xi") * col("b.xi")).as("sxx"))
    val cm = sxx
      .join(broadcast(sx.select(col("d").as("d1"), col("sx").as("sx1"))), "d1")
      .join(broadcast(sx.select(col("d").as("d2"), col("sx").as("sx2"))), "d2")
      .crossJoin(broadcast(n))
      .select(col("d1"), col("d2"),
        (col("n") * col("sxx") - col("sx1") * col("sx2")).as("c"))
      .localCheckpoint() // reused every power step + trace
    var v = sx.select(col("d"), lit(100L).as("v")).localCheckpoint()
    var vIn: DataFrame = null // the v that produced the final w
    var wLast: DataFrame = null
    var mxLast: DataFrame = null
    for (_ <- 1 to iters) {
      vIn = v
      val w = cm.join(broadcast(v.select(col("d").as("d2"), col("v"))), "d2")
        .groupBy(col("d1").as("d")).agg(sum(col("c") * col("v")).as("w"))
        .localCheckpoint()
      val mx = w.agg(max(abs(col("w"))).as("mx"))
      v = w.crossJoin(broadcast(mx))
        .select(col("d"),
          floor(col("w").cast("double") * 100.0 / col("mx").cast("double")
            + 0.5).cast("long").as("v"))
        .localCheckpoint()
      wLast = w; mxLast = mx
    }
    // loadings from the final un-normalized w; EVR as the Rayleigh
    // quotient vᵀ(Cv) / (vᵀv · trace), assembled from overflow-safe
    // parts: vᵀw at the ×10⁴ loading scale (≤64·100·10⁴ — BIGINT-tiny),
    // the exact-integer factors recombined in one double expression
    val lo = wLast.crossJoin(broadcast(mxLast))
      .select(col("d"),
        floor(col("w").cast("double") * 10000.0 / col("mx").cast("double")
          + 0.5).cast("long").as("loading_x10000"))
      .localCheckpoint() // consumed by the output and the Rayleigh join
    val trace = cm.where(col("d1") === col("d2")).agg(sum(col("c")).as("trace"))
    val vt = vIn.join(lo, "d")
      .agg(sum(col("v") * col("loading_x10000")).as("vtw"),
        sum(col("v") * col("v")).as("vtv"))
    val evr = vt.crossJoin(broadcast(mxLast)).crossJoin(broadcast(trace))
      .select(floor(lit(1000000.0)
          * (col("vtw").cast("double") * col("mx").cast("double"))
          / (lit(10000.0) * col("vtv").cast("double")
            * col("trace").cast("double")) + 0.5)
        .cast("long").as("evr_ppm"))
    lo.crossJoin(broadcast(evr))
      .select(col("d"), col("loading_x10000"), col("evr_ppm"))
  }

  /** WHITENING report — [[principalComponent]] made actionable: project
    * the top component OUT of every embedding (`x' = x − (x·v̂)v̂`) and
    * measure the per-dimension variance before vs after. The "retained
    * ppm" column is the proof the rogue direction is gone (≈10⁶ on
    * untouched dimensions, ≈0 along the component) — the check a
    * whitening deploy reads before re-indexing a retrieval corpus.
    *
    * Arithmetic stays exact: quantized components (×10⁴ BIGINT), the
    * projection `p = Σ x·l` and the common-denominator numerator
    * `x·|l|² − p·l` are exact BIGINT (≤8·10¹³); the single division
    * re-quantizes through one IEEE-double op on exact integers
    * (deterministic cross-engine), and both variances are exact
    * `n·Σq² − (Σq)²` BIGINT. Plan: the projection is one equi-join +
    * map-combinable agg on vec_id; everything else rides broadcast. */
  def whitenReport(emb: DataFrame, iters: Int = 8): DataFrame = {
    val lo = principalComponent(emb, iters)
      .select(col("d"), col("loading_x10000").as("l"))
      .localCheckpoint() // consumed by l2, the projection, and the rebuild
    val l2 = lo.agg(sum(col("l") * col("l")).as("l2"))
    val comp = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("vec_id"), col("d").cast("long").as("d"),
        floor(col("x").cast("double") * 10000.0 + 0.5).cast("long").as("xi"))
      .localCheckpoint()
    val n = comp.agg(countDistinct(col("vec_id")).as("n"))
    val proj = comp.join(broadcast(lo), "d")
      .groupBy(col("vec_id")).agg(sum(col("xi") * col("l")).as("p"))
    val wq = comp.join(proj, "vec_id").join(broadcast(lo), "d")
      .crossJoin(broadcast(l2))
      .select(col("d"), col("xi"),
        floor((col("xi") * col("l2") - col("p") * col("l")).cast("double")
          / col("l2").cast("double") + 0.5).cast("long").as("xq"))
    wq.groupBy(col("d"))
      .agg(sum(col("xi") * col("xi")).as("sxx_o"), sum(col("xi")).as("sx_o"),
        sum(col("xq") * col("xq")).as("sxx_w"), sum(col("xq")).as("sx_w"))
      .crossJoin(broadcast(n))
      .select(col("d"),
        (col("n") * col("sxx_o") - col("sx_o") * col("sx_o")).as("var_o"),
        (col("n") * col("sxx_w") - col("sx_w") * col("sx_w")).as("var_w"))
      .select(col("d"), col("var_o"), col("var_w"),
        floor(lit(1000000.0) * col("var_w").cast("double")
          / greatest(col("var_o"), lit(1L)).cast("double") + 0.5)
          .cast("long").as("retained_ppm"))
  }

  /** SOURCE-centroid cosine matrix — the distribution-level dedup
    * instrument: which sources are near-duplicates of each other AS
    * DISTRIBUTIONS (a mirror crawl lights up a ≈10⁶ cell before any
    * doc-level dedup runs)? Cosine between per-source MEAN embeddings —
    * and since cos(Σx/n, Σy/m) = cos(Σx, Σy), the division by n never
    * happens: per-source SUM vectors stay exact BIGINT (components
    * quantized ×10⁴), the dot and squared norms are exact, and only the
    * final a10-style IEEE-sqrt division touches doubles.
    *
    * Plan: one explode + (source, d) hash agg — the only corpus-sized
    * stage; the pairwise join is |sources|²·dim rows, a report-sized
    * product. Output: (source_a, source_b, n_a, n_b, cos_x1000000). */
  def sourceSimilarityMatrix(docs: DataFrame, emb: DataFrame): DataFrame = {
    val comp = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("vec_id"), col("d").cast("long").as("d"),
        floor(col("x").cast("double") * 10000.0 + 0.5).cast("long").as("xi"))
      .join(docs.select(col("doc_id").as("vec_id"), col("source")), "vec_id")
    val sums = comp.groupBy(col("source"), col("d")).agg(sum(col("xi")).as("s"))
      .localCheckpoint() // both pairwise legs + the norm agg read it
    val stats = sums.groupBy(col("source"))
      .agg(sum(col("s") * col("s")).as("ss"))
      .join(docs.groupBy(col("source")).agg(count(lit(1)).as("n")), "source")
    val dots = sums.select(col("source").as("source_a"), col("d"),
        col("s").as("sa"))
      .join(sums.select(col("source").as("source_b"), col("d"),
        col("s").as("sb")), "d")
      .where(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(sum(col("sa") * col("sb")).as("dot"))
    dots
      .join(broadcast(stats.select(col("source").as("source_a"),
        col("ss").as("ssa"), col("n").as("n_a"))), "source_a")
      .join(broadcast(stats.select(col("source").as("source_b"),
        col("ss").as("ssb"), col("n").as("n_b"))), "source_b")
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        floor(lit(1000000.0) * col("dot") /
          (sqrt(col("ssa").cast("double")) * sqrt(col("ssb").cast("double")))
          + 0.5).cast("long").as("cos_x1000000"))
  }

  /** Cross-lingual BITEXT MINING — the parallel-corpus builder behind
    * translation training sets: align documents across two languages by
    * embedding similarity under the MARGIN criterion (cosine relative to
    * the mean of BOTH sides' k-NN cosines — the max-margin retrieval rule
    * of the LASER/CCMatrix line: a raw cosine threshold over-fires in
    * dense regions and under-fires in sparse ones; dividing by the local
    * neighborhood level normalizes both).
    *
    * This is the margin CORE over an already-scored candidate table
    * `scored(src_id, tgt_id, cos_x1000000)` — every stage is bounded:
    * two per-side top-k windows (candidate lists, never the corpus), the
    * margin as ONE exact integer division
    * `2·cos·ks·kt·10⁶ div (snn·kt + tnn·ks)` (all terms ≤ 4·10⁶·k — no
    * overflow, no float divergence), and a per-src best-match window.
    * Candidate generation is pluggable: exact cross-language scoring at
    * eval scale ([[bitextMine]]), [[lshTopK]]/[[ivfTopK]] per-language
    * indexes at 100 TB — the margin core is unchanged either way. */
  def bitextMarginFrom(scored: DataFrame, k: Int,
                       minMarginX1000000: Long): DataFrame = {
    require(k >= 1, "k must be positive")
    val sc = scored.localCheckpoint() // consumed 3×: both NN sums + margin
    val wS = Window.partitionBy(col("src_id"))
      .orderBy(col("cos_x1000000").desc, col("tgt_id"))
    val srcNN = sc.withColumn("r", row_number().over(wS))
      .where(col("r") <= k)
      .groupBy(col("src_id"))
      .agg(sum(col("cos_x1000000")).as("snn"), count(lit(1)).as("ks"))
    val wT = Window.partitionBy(col("tgt_id"))
      .orderBy(col("cos_x1000000").desc, col("src_id"))
    val tgtNN = sc.withColumn("r", row_number().over(wT))
      .where(col("r") <= k)
      .groupBy(col("tgt_id"))
      .agg(sum(col("cos_x1000000")).as("tnn"), count(lit(1)).as("kt"))
    val wBest = Window.partitionBy(col("src_id"))
      .orderBy(col("margin_x1000000").desc, col("tgt_id"))
    sc.join(broadcast(srcNN), Seq("src_id"))
      .join(broadcast(tgtNN), Seq("tgt_id"))
      // negative-cosine pairs are never mining candidates, and keeping
      // both division operands non-negative keeps Spark's truncating DIV
      // identical to floor division cross-engine
      .where(col("cos_x1000000") >= 0L && expr("snn * kt + tnn * ks > 0"))
      .withColumn("margin_x1000000",
        expr("(2 * cos_x1000000 * ks * kt * 1000000) DIV (snn * kt + tnn * ks)"))
      .withColumn("best", row_number().over(wBest))
      .where(col("best") === 1 &&
        col("margin_x1000000") >= minMarginX1000000)
      .select(col("src_id"), col("tgt_id"), col("cos_x1000000"),
        col("margin_x1000000"))
  }

  /** [[bitextMarginFrom]] with exact per-language-pair candidate scoring:
    * the `srcLang` partition against the broadcast `tgtLang` partition
    * (languages are the natural blocking key — candidates never cross a
    * pair of languages). Exact at eval scale; at 100 TB the broadcast side
    * becomes a per-language ANN index ([[lshTopK]]/[[ivfTopK]]) feeding
    * the same margin core. Embeddings align to docs by `vec_id == doc_id`. */
  def bitextMine(docs: DataFrame, emb: DataFrame, srcLang: String,
                 tgtLang: String, k: Int = 4,
                 minMarginX1000000: Long = 1000000L): DataFrame = {
    val e = withUnitVector(emb)
      .join(docs.select(col("doc_id").as("vec_id"), col("lang")),
        Seq("vec_id"))
    val src = e.where(col("lang") === srcLang)
      .select(col("vec_id").as("src_id"), col("vn").as("sv"))
    val tgt = e.where(col("lang") === tgtLang)
      .select(col("vec_id").as("tgt_id"), col("vn").as("tv"))
    val scored = src.crossJoin(broadcast(tgt))
      .select(col("src_id"), col("tgt_id"),
        floor(dotCol(col("sv"), col("tv")) * 1000000.0 + 0.5).cast("long")
          .as("cos_x1000000"))
    bitextMarginFrom(scored, k, minMarginX1000000)
  }

  /** [[bitextMarginFrom]] with ANN candidate generation — the 100 TB form
    * [[bitextMine]]'s scaladoc promises: the TARGET language is indexed by
    * the deterministic coarse quantizer ([[ivfTopKDet]] machinery —
    * fixed-hyperplane cells + integer-exact centroids), every SOURCE doc
    * probes its `nProbe` nearest cells, and only cell members are scored.
    * Candidates per source doc are Σ probed-cell sizes ≈ n_tgt·nProbe/2^planes
    * — never the full n_src × n_tgt product; the margin core is unchanged
    * (its k-NN sums run over the ANN candidate lists, exactly the
    * CCMatrix/LASER production recipe). The whole path is deterministic,
    * so the oracle replays it bit-for-bit. */
  def bitextMineAnn(docs: DataFrame, emb: DataFrame, srcLang: String,
                    tgtLang: String, k: Int = 4,
                    minMarginX1000000: Long = 1000000L,
                    planes: Int = 4, nProbe: Int = 4,
                    dim: Int = 64): DataFrame = {
    val e = withUnitVector(emb)
      .join(docs.select(col("doc_id").as("vec_id"), col("lang")),
        Seq("vec_id"))
    val src = e.where(col("lang") === srcLang)
      .select(col("vec_id").as("src_id"), col("vn").as("sv"))
    val tgt = e.where(col("lang") === tgtLang)
      .select(col("vec_id").as("tgt_id"), col("vn").as("tv"))
    val assigned = tgt.withColumn("cell",
        element_at(graft.plans.ArrayExpressions.planeBuckets(
          col("tv"), planes, 1, dim), 1))
      .localCheckpoint() // feeds the centroid agg AND the candidate join
    val cents = coarseCentroids(
      assigned.select(col("cell"), col("tv").as("vn")))
    val wCell = Window.partitionBy(col("src_id"))
      .orderBy(col("cdist"), col("cell"))
    val probes = src.join(broadcast(cents))
      .withColumn("cdist",
        dotCol(col("centroid"), col("centroid")) -
          lit(2.0) * dotCol(col("sv"), col("centroid")))
      .withColumn("crank", row_number().over(wCell))
      .where(col("crank") <= nProbe)
      .select(col("src_id"), col("sv"), col("cell"))
    val scored = probes.join(assigned, Seq("cell"))
      .select(col("src_id"), col("tgt_id"),
        floor(dotCol(col("sv"), col("tv")) * 1000000.0 + 0.5).cast("long")
          .as("cos_x1000000"))
    bitextMarginFrom(scored, k, minMarginX1000000)
  }
}
