package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and splitting for corpus curation.
  *
  * Everything here is content-addressed via md5 of a row id — never
  * `rand()` (not reproducible across runs) and never engine-native
  * `hash()` (differs between engines and Spark versions). A split or
  * sample computed this way is identical on any engine, any cluster
  * size, any run — which is what makes train/val/test membership
  * auditable years after the training run, and lets an oracle check it.
  *
  * Scale notes: [[deterministicSplit]] is a pure per-row projection
  * (no shuffle, no state — survives any data size trivially);
  * [[stratifiedTake]] shuffles on the stratum key only and its window
  * never materializes more than one stratum partition per task.
  */
object Sampling {

  /** Uniform split key of an id column: lowercase md5 hex. Uniformity
    * comes from md5; portability from fixed-width lowercase hex, which
    * compares lexicographically = numerically in every engine. */
  def splitKey(id: Column): Column = md5(id.cast("string"))

  /** Assign every row a named split by hex thresholds on [[splitKey]].
    * `splits` are (name, upperBoundHex) pairs checked in ascending
    * bound order; rows at or above every bound land in `default`.
    * A bound is a hex-string prefix: "c" keeps hashes starting 0-b,
    * i.e. 12/16 = 75% in expectation; "e" the next 12.5%; etc.
    * Adds a `split` column; no shuffle, fully deterministic. */
  def deterministicSplit(df: DataFrame, idCol: String,
                         splits: Seq[(String, String)], default: String): DataFrame = {
    require(splits.nonEmpty, "need at least one (name, bound) split")
    // Bounds must be lowercase hex (uppercase sorts before 'a' in ASCII
    // and would silently skew proportions) and STRICTLY ascending
    // (a duplicate bound silently assigns its split zero rows) — in the
    // module whose whole point is auditable membership, misassignment
    // must be loud.
    splits.foreach { case (name, bound) =>
      require(bound.nonEmpty && bound.forall(c => ('0' <= c && c <= '9') || ('a' <= c && c <= 'f')),
        s"split '$name' bound '$bound' is not lowercase hex")
    }
    val bounds = splits.map(_._2)
    require(bounds.zip(bounds.tail).forall { case (a, b) => a < b },
      s"split bounds must be strictly ascending, got $bounds")
    val k = splitKey(col(idCol))
    val first = when(k < lit(splits.head._2), lit(splits.head._1))
    val chained = splits.tail.foldLeft(first) {
      case (acc, (name, bound)) => acc.when(k < lit(bound), lit(name))
    }
    df.withColumn("split", chained.otherwise(lit(default)))
  }

  /** Per-stratum Bernoulli downsampling at content-addressed rates:
    * keep a row when the first 8 hex digits of [[splitKey]] compare at
    * or below the stratum's bound. An 8-hex bound b keeps
    * (int(b)+1)/2^32 of the stratum in expectation ("bfffffff" = 75%,
    * "7fffffff" = 50%, "19999999" ~= 10%); strata not named in `rates`
    * use `defaultBound`. This is how a mixing plan (q68's output shape)
    * is APPLIED to a corpus: membership is a pure projection + filter —
    * no shuffle, no state, reproducible on any engine at any scale —
    * so the same doc is kept or dropped identically on every run of
    * every engine, which is what makes the sampled corpus auditable.
    */
  def rateSample(df: DataFrame, idCol: String, strataCol: String,
                 rates: Seq[(String, String)], defaultBound: String): DataFrame = {
    (rates.map(_._2) :+ defaultBound).foreach { b =>
      require(b.length == 8 && b.forall(c => ('0' <= c && c <= '9') || ('a' <= c && c <= 'f')),
        s"rate bound '$b' is not 8-digit lowercase hex")
    }
    require(rates.map(_._1).distinct.size == rates.size,
      s"duplicate stratum in rates: ${rates.map(_._1)}")
    val k = substring(splitKey(col(idCol)), 1, 8)
    val bound = rates.foldLeft(when(lit(false), lit(""))) {
      case (acc, (name, b)) => acc.when(col(strataCol) === name, lit(b))
    }.otherwise(lit(defaultBound))
    df.filter(k <= bound)
  }

  /** Deterministic pseudo-random sample of up to `k` rows per stratum:
    * rows ranked by ([[splitKey]], id) within each stratum, rank <= k
    * kept (as `rn`). The md5 ordering is uniform, so this is a fair
    * sample, yet stable across engines/runs; the id tiebreak makes the
    * ordering total even on hash collisions. One shuffle on the
    * stratum column. */
  def stratifiedTake(df: DataFrame, strataCol: String, k: Int,
                     idCol: String): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(splitKey(col(idCol)), col(idCol))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }
}
