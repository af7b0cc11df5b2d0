package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines.
  *
  * Both operators sample by an md5 hash of the stable document id — never
  * by `rand()` — so a document's fate is a pure function of its id: samples
  * are reproducible across runs, stable under corpus growth/appends, and
  * the DuckDB oracle replays them bit-for-bit (the same properties
  * production pipelines rely on for resumable/debuggable data curation).
  *
  * Scale shapes:
  *  - [[weightedMix]] is a pure narrow filter — no shuffle at all; at
  *    100 TB it runs entirely map-side with the predicate pushed onto the
  *    scan's output.
  *  - [[stratifiedSample]] needs exact per-stratum counts, which is
  *    inherently one window per stratum — a single keyed shuffle whose
  *    partition size is the stratum size. Strata (languages, sources) are
  *    low-cardinality and roughly balanced in curation workloads; for
  *    whale strata the rank-free [[weightedMix]] form is the escape hatch
  *    (rate-based, no ordering needed).
  */
object Sampling {

  /** The gate's domain-weight mix — a single shared constant rendered into
    * both the Spark call and the DuckDB oracle so the two sides cannot
    * drift (the OracleSqlText convention for every tuned parameter). */
  val GateWeights: Map[String, Int] = Map("src0" -> 90, "src1" -> 75, "src2" -> 10)

  /** First-8-hex-of-md5 of the id rendered as text — a uniform value in
    * [0, 2³²), the engine's standard portable hash (same construction as
    * [[TrainPrep.assignSplits]] and [[Sketches]], shared with the oracle). */
  private def hash32(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 8), 16, 10).cast("long")

  /** Exact-count stratified sample: within each stratum, rank documents by
    * (hash, id) and keep the first ceil(n_stratum · pct / 100) — every
    * stratum is represented at exactly the target rate (rounding up), which
    * rate-based sampling only achieves in expectation. The hash order makes
    * the per-stratum choice uniform; the id tie-break makes it total.
    *
    * Output: (doc_id, stratum, sample_rank) of kept docs.
    */
  def stratifiedSample(docs: DataFrame, stratumCol: String, pct: Int = 20,
      idCol: String = "doc_id"): DataFrame = {
    docs.select(col(idCol), col(stratumCol).as("stratum"), hash32(col(idCol)).as("hv"))
      .withColumn("sample_rank", row_number().over(
          Window.partitionBy("stratum").orderBy(col("hv"), col(idCol)))
        .cast("long"))
      .withColumn("n_stratum", count(lit(1)).over(Window.partitionBy("stratum")))
      // rank ≤ ceil(n·pct/100) ⟺ (rank−1)·100 < n·pct — pure integer
      // comparison, no division to disagree on across engines
      .filter((col("sample_rank") - 1) * 100 < col("n_stratum") * pct)
      .select(col(idCol), col("stratum"), col("sample_rank"))
      .orderBy("stratum", "sample_rank")
  }

  /** Rate-based weighted domain mix: each source keeps `weights(source)`
    * percent of its documents (default `defaultPct`), decided per document
    * by hash bucket — the standard up/down-weighting step when rebalancing
    * a training mix across domains of very different sizes. Zero shuffles:
    * the whole operator is one narrow projection + filter.
    *
    * Output: (doc_id, source, bucket) of kept docs.
    */
  def weightedMix(docs: DataFrame, weights: Map[String, Int],
      defaultPct: Int = 50, idCol: String = "doc_id",
      sourceCol: String = "source"): DataFrame = {
    val pct = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (src, p)) => when(col(sourceCol) === src, p).otherwise(acc)
    }
    docs.select(col(idCol), col(sourceCol),
        (hash32(col(idCol)) % 100).as("bucket"))
      .filter(col("bucket") < pct)
      .orderBy(idCol)
  }
}
