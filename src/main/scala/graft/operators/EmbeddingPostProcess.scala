package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** All-but-the-Top embedding post-processing (Mu & Viswanath 2018): real
  * embedding matrices carry a large common mean vector and a handful of
  * dominant directions that encode frequency, not meaning; removing the
  * mean and the top principal component measurably improves cosine
  * retrieval. This operator fits that correction IN-ENGINE and emits each
  * vector's top-PC projection coefficient — the quantity subtracted at
  * serving time (p·u), and the diagnostic ranked when auditing a drifted
  * embedding space.
  *
  * Determinism (the e18/v18 fixed-point discipline lifted to a matrix
  * fit): vectors lift to exact integers x = floor(v·1000); the corpus
  * passes reduce to EXACT integer sums — the mean numerators S_j and the
  * RAW Gram G_jk = Σ x_j·x_k (map-side combined; centering is applied
  * AFTER aggregation as C = G − n·μ·μᵀ, so no per-row rational arithmetic
  * and no order-dependent float sum ever crosses an exchange). The d×d
  * eigen-fit runs DRIVER-SIDE (request-sized, rule 17 — d=64 here, ≤2k
  * real): 30 power iterations from u₀ = 1/√d with every float fold in
  * ascending index order, sign fixed at the largest-|u_j| component
  * (lowest index on ties) — all replayed verbatim by the oracle's
  * recursive CTE. Long-overflow headroom: |x|≤~3e3 ⇒ G sums stay below
  * 2⁶³ up to ~10¹² rows; beyond that widen to DECIMAL(38) partials.
  *
  * 100 TB shape: two linear passes (S and G), each a map-side-combined
  * groupBy onto d / d² cells; the projection pass is a stateless map with
  * μ and u as plan literals. Nothing corpus-sized is collected. */
object EmbeddingPostProcess {

  /** Fit mean + top PC on `vecCol` (fixed-point 1e3), return per-vector
    * projection coefficients floor(p·1000) (so 1e6-scale overall).
    * Returns (idCol, proj_fp). */
  def abtTopProjection(df: DataFrame, idCol: String, vecCol: String,
                       dim: Int, iters: Int = 30): DataFrame = {
    require(dim > 0 && iters >= 1, "dim > 0, iters >= 1")
    val xArr = transform(col(vecCol),
      v => floor(v.cast("double") * lit(1000.0)).cast("long"))
    val base = graft.Tables.scaled(
      df.select(col(idCol).cast("long").as("id"), xArr.as("x")))
    // pass 1+2: exact integer S_j and raw Gram G_jk (flattened outer
    // product per row -> map-side-combined index sums)
    val sRows = base.select(posexplode(col("x")).as(Seq("j", "xv")))
      .groupBy("j").agg(sum("xv").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = df.count()
    val gArr = flatten(transform(col("x"),
      xj => transform(col("x"), xk => xj * xk)))
    val gRows = base.select(posexplode(gArr).as(Seq("jk", "p")))
      .groupBy("jk").agg(sum("p").as("g"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // driver-side fit: centered Gram C = G - n*mu*mu^T, power iteration
    val mu = Array.tabulate(dim)(j => sRows(j).toDouble / n)
    val c = Array.tabulate(dim, dim)((j, k) =>
      gRows(j * dim + k).toDouble - n.toDouble * mu(j) * mu(k))
    var u = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim)(j =>
        (0 until dim).foldLeft(0.0)((acc, k) => acc + c(j)(k) * u(k)))
      val nrm = math.sqrt(w.foldLeft(0.0)((acc, x) => acc + x * x))
      u = w.map(_ / nrm)
    }
    val amax = u.map(math.abs).max
    val mi = u.indexWhere(x => math.abs(x) == amax)
    if (u(mi) < 0) u = u.map(x => -x)
    // projection pass: stateless map with mu/u as plan literals
    val muLit = array(mu.map(lit(_)): _*)
    val uLit = array(u.map(lit(_)): _*)
    base.select(col("id"),
        floor(aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0),
          (acc, j) => acc +
            (element_at(col("x"), j + 1).cast("double") -
              element_at(muLit, j + 1)) * element_at(uLit, j + 1))
          * lit(1000.0)).cast("long").as("proj_fp"))
  }
}
