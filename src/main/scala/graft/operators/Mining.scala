package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Frequent-pattern mining over basket data. A training-data pipeline
  * uses co-occurrence rules the same way a retailer does market baskets:
  * which event types / sources / tags co-occur in the same user history
  * predicts redundancy and drives stratified mixing decisions.
  */
object Mining {

  /** Pairwise association rules (Agrawal & Srikant 1994, restricted to
    * 2-itemsets — the only rule order whose candidate space stays
    * join-shaped): for every ordered pair (antecedent → consequent) of
    * items co-occurring in at least `minSupportCount` baskets, emit the
    * exact integer support counts and the derived metrics
    *
    *   support    = n_ab / n_baskets
    *   confidence = n_ab / n_ant
    *   lift       = (n_ab · n_baskets) / (n_ant · n_con)
    *
    * each computed in double and rounded to 6 dp (the engine-portable
    * convention — the integer counts are the exact gate, the doubles a
    * deterministic function of them). Basket membership is set-valued:
    * duplicate (basket, item) rows collapse before counting.
    *
    * Baskets holding more than `maxBasketItems` DISTINCT items are
    * dropped whole before pairing (the standard spam guard — one
    * degenerate basket contributes O(B²) candidate pairs; dropping is
    * deterministic and mirrored by any declarative oracle via a
    * HAVING-count prefilter). n_baskets counts the SURVIVING baskets so
    * support/lift stay consistent with the pair counts.
    *
    * Scale shape: one distinct to (basket, item) grain; one
    * map-side-combinable basket-size count with the cap filter pushed
    * into the pairing join's build side; the self-join is keyed on
    * basket (equi-shuffle, pair fan-out bounded by cap²·n_baskets);
    * pair counting is a combinable groupBy at (item, item) grain — item
    * cardinality, not corpus cardinality. The per-item support frame is
    * item-sized and broadcasts into the final enrich joins. The only
    * driver action is the n_baskets scalar (S7 precedent). */
  def associationRules(baskets: DataFrame, basketCol: String, itemCol: String,
      minSupportCount: Long = 2, maxBasketItems: Int = 1000): DataFrame = {
    require(minSupportCount >= 1, s"minSupportCount must be >= 1, got $minSupportCount")
    require(maxBasketItems >= 2, s"maxBasketItems must be >= 2, got $maxBasketItems")
    val bi0 = baskets
      .select(col(basketCol).cast("string").as("basket"), col(itemCol).cast("string").as("item"))
      .filter(col("basket").isNotNull && col("item").isNotNull)
      .distinct()
    val kept = bi0.groupBy("basket").agg(count(lit(1)).as("__sz"))
      .filter(col("__sz") <= maxBasketItems)
      .select("basket")
    val bi = bi0.join(kept, Seq("basket"), "left_semi").persist()
    // pairs persists too: BOTH branches of the directed union consume it,
    // and unpersisted union branches re-evaluate the whole basket
    // self-join per branch. The result materializes eagerly BEFORE the
    // caches drop — the old `finally bi.unpersist()` fired while the
    // returned frame was still lazy, so the final evaluation saw no cache
    // at all and recomputed the capped (basket, item) frame once per
    // reference (4x: two pair sides, two item-count joins).
    val pairs = bi.toDF("basket", "item_a")
      .join(bi.toDF("basket", "item_b"), Seq("basket"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupportCount)
      .persist()
    try {
      val n = bi.select("basket").distinct().count()
      val itemCnt = bi.groupBy("item").agg(count(lit(1)).as("n_item"))
      val directed = pairs.select(col("item_a").as("antecedent"), col("item_b").as("consequent"), col("n_ab"))
        .unionByName(pairs.select(col("item_b").as("antecedent"), col("item_a").as("consequent"), col("n_ab")))
      val out = directed
        .join(itemCnt.select(col("item").as("antecedent"), col("n_item").as("n_ant")), Seq("antecedent"))
        .join(itemCnt.select(col("item").as("consequent"), col("n_item").as("n_con")), Seq("consequent"))
        .select(col("antecedent"), col("consequent"), col("n_ab"), col("n_ant"), col("n_con"),
          round(col("n_ab").cast("double") / lit(n.toDouble), 6).as("support"),
          round(col("n_ab").cast("double") / col("n_ant").cast("double"), 6).as("confidence"),
          round((col("n_ab").cast("double") * lit(n.toDouble)) /
            (col("n_ant").cast("double") * col("n_con").cast("double")), 6).as("lift"))
        .persist()
      out.count(): Unit
      out
    } finally { pairs.unpersist(); bi.unpersist(): Unit }
  }
}
