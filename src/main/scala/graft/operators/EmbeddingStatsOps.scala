package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryModule, T}

/** Embedding-matrix statistics for training-data pipelines: the
  * covariance structure of an embedding column and a distributed PCA
  * projection (top principal component via power iteration) — the
  * standard preprocessing for embedding whitening / dimensionality
  * reduction / drift monitoring over a corpus of model embeddings.
  *
  * Scale shape: ONE pass over the corpus builds all pairwise moment
  * sums (a per-row nested `transform` expands the d'×d' upper triangle
  * — no self-join, no shuffle wider than d'² partial aggregates per
  * mapper); the d'×d' matrix itself is driver-sized by construction
  * (d' = 8 → 36 upper-triangle entries), so the power iteration is
  * driver-side double math on a bounded collect, and the projection is
  * a codegen'd fold against literal arrays — the corpus is touched
  * exactly twice end to end (moments, then projection).
  *
  * Oracle policy (same as the IVF/centroid family,
  * [[SimilarityOps]]): every float accumulation in the DECLARED build
  * is an ordered left-to-right fold keyed by `vec_id`/dim, mirrored
  * verbatim by DuckDB `list_reduce` over `list(... ORDER BY ...)`, so
  * covariance, the unrolled power iteration, and the projection are
  * bit-reproducible across engines. Bench measures the production
  * variant (plain `sum()` partial aggregation — same plan shape, no
  * ordered collect).
  */
object EmbeddingStatsOps extends QueryModule {

  /** Leading dims covered by the covariance/PCA surface. The full
    * 64-dim matrix is the same single-pass plan (64² partials instead
    * of 8²); 8 keeps the unrolled DuckDB oracle readable. */
  private val D = 8
  private val PowerIters = 8

  private def vecs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T(s, dir, "embeddings")
      .select($"vec_id", slice($"embedding".cast("array<double>"), 1, D).as("v"))
  }

  /** Per-row upper-triangle moment rows (vec_id, i, j, xy, xi, xj),
    * 1-based dims — nested array transform, no self-join. */
  private def momentRows(e: DataFrame): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    e.select($"vec_id", explode(flatten(transform($"v", (xi, pi) =>
        transform($"v", (xj, pj) => struct(
          (pi + 1).as("i"), (pj + 1).as("j"),
          (xi * xj).as("xy"), xi.as("xi"), xj.as("xj")))))).as("p"))
      .select($"vec_id", $"p.*")
      .filter($"i" <= $"j")
  }

  private def foldSum(arr: Column, field: String): Column =
    aggregate(arr, lit(0.0), (acc, e) => acc + e(field))

  /** cov(i,j) = Sxy/n - (Sxi/n)·(Sxj/n), each S an ordered fold when
    * `exact` (oracle-portable) or a plain `sum` otherwise (production). */
  private[graft] def covariance(s: SparkSession, dir: String, exact: Boolean): DataFrame = {
    import s.implicits._
    val m = momentRows(vecs(s, dir))
    val agg =
      if (exact)
        m.groupBy($"i", $"j")
          .agg(array_sort(collect_list(struct($"vec_id", $"xy", $"xi", $"xj"))).as("ps"),
            count(lit(1)).as("n"))
          .select($"i", $"j",
            (foldSum($"ps", "xy") / $"n"
              - (foldSum($"ps", "xi") / $"n") * (foldSum($"ps", "xj") / $"n")).as("cov"))
      else
        m.groupBy($"i", $"j")
          .agg(sum($"xy").as("sxy"), sum($"xi").as("sxi"),
            sum($"xj").as("sxj"), count(lit(1)).as("n"))
          .select($"i", $"j",
            ($"sxy" / $"n" - ($"sxi" / $"n") * ($"sxj" / $"n")).as("cov"))
    agg.orderBy($"i", $"j")
  }

  /** Per-dim means (1-based), ordered-fold or production sum. */
  private def means(s: SparkSession, dir: String, exact: Boolean): DataFrame = {
    import s.implicits._
    val ex = vecs(s, dir)
      .select($"vec_id", posexplode($"v").as(Seq("p", "x")))
      .select($"vec_id", ($"p" + 1).as("d"), $"x")
    if (exact)
      ex.groupBy($"d")
        .agg(array_sort(collect_list(struct($"vec_id", $"x"))).as("xs"),
          count(lit(1)).as("n"))
        .select($"d", (aggregate($"xs", lit(0.0), (a, e) => a + e("x")) / $"n").as("mu"))
    else
      ex.groupBy($"d").agg((sum($"x") / count(lit(1))).as("mu"))
  }

  /** Driver-side power iteration — mirrors the unrolled oracle folds
    * exactly: w_i folds C(i,1)·v(1) left-to-right over j ascending
    * (no-init fold, first term is the accumulator seed), the norm folds
    * w(1)² upward, every division happens where the oracle divides. */
  private[graft] def powerIterate(c: Array[Array[Double]], iters: Int): Array[Double] = {
    val d = c.length
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(d) { i =>
        (1 until d).foldLeft(c(i)(0) * v(0))((acc, j) => acc + c(i)(j) * v(j))
      }
      val norm = math.sqrt((1 until d).foldLeft(w(0) * w(0))((acc, i) => acc + w(i) * w(i)))
      v = w.map(_ / norm)
    }
    v
  }

  /** Collects the D×D covariance (≤ D² driver rows by construction —
    * bounded) and the D means, power-iterates on the driver, then
    * projects every centered embedding onto the component as one
    * codegen'd fold against literal arrays. */
  private[graft] def pcaProjection(s: SparkSession, dir: String, exact: Boolean): DataFrame = {
    import s.implicits._
    val c = Array.ofDim[Double](D, D)
    // bounded collect: exactly D*(D+1)/2 rows (the upper triangle)
    covariance(s, dir, exact).collect().foreach { r =>
      val (i, j, cv) = (r.getInt(0) - 1, r.getInt(1) - 1, r.getDouble(2))
      c(i)(j) = cv; c(j)(i) = cv
    }
    // bounded collect: exactly D rows
    val mu = new Array[Double](D)
    means(s, dir, exact).collect().foreach(r => mu(r.getInt(0) - 1) = r.getDouble(1))
    val pc = powerIterate(c, PowerIters)
    val muLit = array(mu.map(lit).toIndexedSeq: _*)
    val pcLit = array(pc.map(lit).toIndexedSeq: _*)
    vecs(s, dir)
      .select($"vec_id",
        aggregate(
          zip_with(zip_with($"v", muLit, (x, m) => x - m), pcLit, (cx, p) => cx * p),
          lit(0.0), (acc, x) => acc + x).as("pc1"))
      .orderBy($"vec_id")
  }

  // ---------------------------------------------------------------- oracle

  private def fold(listExpr: String) =
    s"list_reduce($listExpr, (p, q) -> p + q)"

  /** Shared CTE prefix: moment rows + ordered-fold covariance + means.
    * Every CTE that later stages reference more than once is MATERIALIZED
    * — without it DuckDB may inline the chain, and the unrolled power
    * iteration would re-evaluate the corpus-wide covariance 2^iters
    * times. */
  private def covCtes: String = s"""
    e AS MATERIALIZED (
      SELECT vec_id, list_slice(CAST(embedding AS DOUBLE[]), 1, $D) AS v
      FROM embeddings),
    ex AS (SELECT vec_id, generate_subscripts(v, 1) AS d, unnest(v) AS x
           FROM e),
    pr AS (SELECT a.vec_id, a.d AS i, b.d AS j, a.x * b.x AS xy,
                  a.x AS xi, b.x AS xj
           FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.d <= b.d),
    covmat AS MATERIALIZED (
      SELECT i, j,
        ${fold("list(xy ORDER BY vec_id)")} / COUNT(*)
          - (${fold("list(xi ORDER BY vec_id)")} / COUNT(*))
            * (${fold("list(xj ORDER BY vec_id)")} / COUNT(*)) AS cov
      FROM pr GROUP BY i, j),
    means AS MATERIALIZED (
      SELECT d, ${fold("list(x ORDER BY vec_id)")} / COUNT(*) AS mu
      FROM ex GROUP BY d)"""

  private val covOracle = s"""
    WITH $covCtes
    SELECT i, j, cov FROM covmat ORDER BY i, j"""

  /** Unrolls the power iteration: vK from wK = Cfull · v(K-1) (fold over
    * j ascending, no-init — first term seeds the accumulator, exactly
    * [[powerIterate]]'s shape), normalized by the upward-folded norm. */
  private def pcaOracle: String = {
    val iterCtes = (1 to PowerIters).map { t =>
      s"""
      w$t AS MATERIALIZED (
        SELECT c.i AS i, ${fold(s"list(c.cov * v.x ORDER BY c.j)")} AS wx
        FROM cfull c JOIN v${t - 1} v ON v.i = c.j GROUP BY c.i),
      n$t AS (SELECT sqrt(${fold("list(wx * wx ORDER BY i)")}) AS nn FROM w$t),
      v$t AS MATERIALIZED (
        SELECT i, wx / (SELECT nn FROM n$t) AS x FROM w$t)"""
    }.mkString(",")
    s"""
    WITH $covCtes,
    cfull AS MATERIALIZED (
      SELECT i, j, cov FROM covmat
      UNION ALL
      SELECT j AS i, i AS j, cov FROM covmat WHERE i <> j),
    v0 AS (SELECT d AS i, 1 / sqrt($D) AS x FROM means),
    $iterCtes,
    muv AS (SELECT list(mu ORDER BY d) AS mus FROM means),
    pcv AS (SELECT list(x ORDER BY i) AS pcs FROM v$PowerIters)
    SELECT e.vec_id,
      list_reduce(
        list_transform(list_zip(e.v, muv.mus, pcv.pcs),
                       z -> (z[1] - z[2]) * z[3]),
        (p, q) -> p + q) AS pc1
    FROM e, muv, pcv
    ORDER BY e.vec_id"""
  }

  // ---------------------------------------------------------------- defs

  /** Covariance matrix (upper triangle, 1-based dims) of the leading
    * embedding dims over the whole corpus — one corpus pass, no
    * self-join; the declared build's folds replay bit-for-bit in
    * DuckDB, Bench times the production `sum()` variant. */
  private val covDef = QueryDef(
    "sim_embedding_covariance",
    Some(covOracle),
    (s, dir) => covariance(s, dir, exact = true),
    benchBuild = Some((s, dir) => covariance(s, dir, exact = false)))

  /** Top-principal-component projection of every (centered) embedding —
    * distributed moment pass, driver-side power iteration on the
    * D×D matrix, codegen'd projection fold. The oracle replays the
    * ENTIRE pipeline including all $PowerIters unrolled iterations. */
  private val pcaDef = QueryDef(
    "sim_pca_projection",
    Some(pcaOracle),
    (s, dir) => pcaProjection(s, dir, exact = true),
    benchBuild = Some((s, dir) => pcaProjection(s, dir, exact = false)))

  override def defs: Seq[QueryDef] = Seq(covDef, pcaDef)
}
