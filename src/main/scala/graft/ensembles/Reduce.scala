package graft.ensembles

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ensemble reduction (`xclim/ensembles/_reduce.py`): choose representative
  * members from an (n_members x n_criteria) matrix. The criteria matrix is
  * tiny by construction (members x summary stats), so selection runs on the
  * driver over collected data — the same shape as the reference's
  * sklearn/driver-side implementation. Building the matrix is the
  * distributed part (`make_criteria`, _reduce.py:26 = a pivot/agg).
  */
object Reduce {

  /** Collect the criteria matrix: one row per member, ordered columns. */
  def collectCriteria(df: DataFrame, memberCol: String,
                      criteriaCols: Seq[String]): Seq[(Int, Array[Double])] =
    df.select((memberCol +: criteriaCols).map(col): _*).collect()
      .map(r => (r.getInt(0), criteriaCols.indices.map(i => r.getDouble(i + 1)).toArray))
      .sortBy(_._1).toSeq

  private def dist2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** KKZ greedy max-min selection (Katsavounidis–Kuo–Zhang 1994;
    * _reduce.py:104): start from the member closest to the centroid, then
    * repeatedly add the member farthest from its nearest selected member. */
  def kkz(criteria: Seq[(Int, Array[Double])], k: Int): Seq[Int] = {
    require(criteria.nonEmpty && k >= 1)
    val dim = criteria.head._2.length
    val centroid = Array.tabulate(dim)(j => criteria.map(_._2(j)).sum / criteria.size)
    var selected = Vector(criteria.minBy(c => dist2(c._2, centroid))._1)
    val byId = criteria.toMap
    while (selected.size < math.min(k, criteria.size)) {
      val next = criteria.filterNot(c => selected.contains(c._1))
        .maxBy { c => selected.map(s => dist2(c._2, byId(s))).min }
      selected = selected :+ next._1
    }
    selected
  }

  /** Lloyd k-means (fixed seeds = KKZ picks, so fully deterministic;
    * _reduce.py:177's sklearn twin) returning the member nearest each final
    * centroid. */
  def kmeansSelect(criteria: Seq[(Int, Array[Double])], k: Int,
                   maxIter: Int = 50): Seq[Int] = {
    val init = kkz(criteria, k)
    val byId = criteria.toMap
    var centroids = init.map(byId(_).clone).toArray
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      val assign = criteria.map { case (id, v) =>
        (centroids.indices.minBy(ci => dist2(v, centroids(ci))), v)
      }
      moved = false
      centroids = centroids.indices.map { ci =>
        val members = assign.filter(_._1 == ci).map(_._2)
        if (members.isEmpty) centroids(ci)
        else {
          val m = Array.tabulate(centroids(ci).length)(j => members.map(_(j)).sum / members.size)
          if (dist2(m, centroids(ci)) > 1e-24) moved = true
          m
        }
      }.toArray
      iter += 1
    }
    centroids.map(c => criteria.minBy(m => dist2(m._2, c))._1).toSeq.distinct
  }
}
