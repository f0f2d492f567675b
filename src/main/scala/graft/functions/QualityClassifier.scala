package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the FineWeb / DCLM / RedPajama-2
  * stage beyond rule thresholds: a logistic classifier over cheap text
  * signals scores every document, and the gate keeps docs above a
  * probability threshold. Two halves:
  *
  *  - INFERENCE ([[score]]/[[gate]]) is pure column math over a FIXED
  *    weight vector: the four signals are exact integer-ratio doubles,
  *    the logit accumulates in one documented association order, and
  *    the single transcendental (`exp`) is crushed onto a 10⁻⁶ grid —
  *    so scoring is engine-portable and the gate decision is
  *    oracle-checkable (q_quality_classifier), the property that lets
  *    a 100 TB pipeline re-derive exactly which docs a given model
  *    version kept.
  *  - TRAINING ([[train]]) fits the weights with Spark ML's
  *    LogisticRegression over the same signal vector (weak labels —
  *    e.g. "looks like the reference corpus" — are the published
  *    recipe). Distributed LBFGS is not bit-deterministic across
  *    partitionings, so training is spec-gated on separation quality,
  *    and production pins the EXPORTED weights (a `QualityModel` is
  *    just five doubles) into the oracle-checkable inference path.
  */
object QualityClassifier {

  /** Fixed weight vector: one weight per [[featureNames]] entry plus
    * the bias. */
  final case class QualityModel(weights: Seq[Double], bias: Double) {
    require(weights.length == featureNames.length,
      s"expected ${featureNames.length} weights")
  }

  val featureNames: Seq[String] =
    Seq("stopword_ratio", "avg_word_len", "punct_ratio", "len_norm")

  /** The signal vector, in [[featureNames]] order. All four are exact
    * integer-ratio doubles both engines reproduce bit-for-bit; null
    * text yields null for EVERY signal (and a null score — gates drop
    * it). The explicit isNotNull wrap matters: punctRatio's own
    * null-length branch returns 0.0 and `least` SKIPS nulls (len_norm
    * would read 1.0) — without it the null-drop invariant would rest
    * on which signals a caller happens to use. */
  def features(text: Column): Seq[Column] = Seq(
    TextAnalysis.stopwordRatio(text),
    TextAnalysis.avgWordLen(text),
    when(text.isNotNull, TextAnalysis.punctRatio(text)),
    when(text.isNotNull,
      least(length(text).cast("double") / 500.0, lit(1.0))))

  /** 6 dp, one notch finer than the 4-dp quality score because
    * sigmoid outputs cluster near the threshold — the same 10⁻⁶ grid
    * the micro-nat LM scores use, and the same boundary-flip argument:
    * the one transcendental (`exp`) is within 1 ulp on both engines,
    * and a flip needs the value within ~1 ulp of a grid boundary
    * (~10⁻¹¹ per doc). */
  private def round6(x: Column): Column =
    TextAnalysis.halfUpFloor(x, 6)

  /** P(quality) under `m`: sigmoid of the logit accumulated STRICTLY
    * left-to-right (`bias + w₀·x₀ + w₁·x₁ + …` — the order the oracle
    * mirrors; IEEE addition is not associative, so the order is part
    * of the contract), rounded to 6 dp. */
  def score(text: Column, m: QualityModel): Column = {
    val z = features(text).zip(m.weights)
      .foldLeft(lit(m.bias)) { case (acc, (x, w)) => acc + x * lit(w) }
    round6(lit(1.0) / (lit(1.0) + exp(-z)))
  }

  /** Keep docs with [[score]] ≥ threshold (null scores drop). */
  def gate(docs: DataFrame, textCol: String, m: QualityModel,
      threshold: Double): DataFrame =
    docs.filter(score(col(textCol), m) >= threshold)

  /** Fit the weights on weak labels (`labelCol` ∈ {0.0, 1.0}) with
    * Spark ML logistic regression over the [[features]] vector.
    * Returns the five doubles — pin them as literals for the
    * oracle-checkable inference path. Rows with null signals are
    * excluded (Spark ML would reject NaN features). */
  def train(docs: DataFrame, textCol: String, labelCol: String,
      maxIter: Int = 50, regParam: Double = 0.0): QualityModel = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    val cols = featureNames.zip(features(col(textCol)))
    val prepared = cols.foldLeft(docs) { case (d, (n, c)) =>
      d.withColumn(s"__f_$n", c)
    }.filter(cols.map { case (n, _) => col(s"__f_$n").isNotNull }
      .reduce(_ && _))
    // fail loud on bad labels: a null label would throw an opaque
    // SparkException inside fit(), and a 2.0 would silently switch LR
    // to multinomial and return wrong-shaped coefficients
    val badLabels = prepared
      .filter(col(labelCol).isNull || !col(labelCol).isin(0.0, 1.0))
      .count()
    require(badLabels == 0,
      s"$badLabels rows with labels outside {0.0, 1.0}")
    val assembled = new VectorAssembler()
      .setInputCols(featureNames.map(n => s"__f_$n").toArray)
      .setOutputCol("__fv")
      .transform(prepared)
    val fit = new LogisticRegression()
      .setFeaturesCol("__fv").setLabelCol(labelCol)
      .setMaxIter(maxIter).setRegParam(regParam)
      .fit(assembled)
    QualityModel(fit.coefficients.toArray.toSeq, fit.intercept)
  }
}
