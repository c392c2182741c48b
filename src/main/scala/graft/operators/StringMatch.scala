package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Approximate string matching (typo pairs / entity resolution) with an
  * EQUI-JOIN candidate stage — never an all-pairs comparison.
  *
  * The pigeonhole segmentation of PassJoin (Li et al., ICDE'11): split
  * every string into d+1 contiguous segments; if ed(a, b) <= d with a the
  * shorter side, then at least one of a's segments occurs VERBATIM in b,
  * displaced by at most d positions (d edits shift positions by <= d, and
  * d+1 segments cannot all absorb an edit). So:
  *
  *   - index side: each string keyed by (its length, segment idx, segment)
  *   - probe side: each string's substrings at every partner layout
  *     L2 ∈ [len−d, len+d], segment position ± d
  *   - candidates: equi-join on the (layout, idx, substring) key —
  *     shuffle sized by the segment lists, with the same skew profile as
  *     the shingle joins (a hot segment widens its bucket, completeness
  *     forbids dropping it);
  *   - verify: exact `levenshtein` on the candidate pairs only.
  *
  * No false negatives by the lemma above; no false positives by the
  * verify. Cost scales with segment-bucket products, not |S|².
  */
object StringMatch {

  private def segStart(L: Column, i: Column, m: Int): Column =
    i * (L / m).cast("int") + F.least(i, L % m)

  private def segLen(L: Column, i: Column, m: Int): Column =
    (L / m).cast("int") + F.when(i < L % m, 1).otherwise(0)

  /** Distinct string pairs within edit distance [1, maxDist] from a
    * one-column frame `strs(w)`: (a_w, b_w, dist) with a_w < b_w.
    * Equal strings are exact-dup territory ([[Dedup]]), not emitted here.
    */
  def editDistancePairs(strs: DataFrame, maxDist: Int = 1): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    val m = maxDist + 1
    val s = strs.select(F.col("w")).distinct()

    val iCol = F.col("seg.i")
    val idx = s
      .select(F.col("w"), F.explode(F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        i => F.struct(i.as("i")))).as("seg"))
      .select(
        F.length(F.col("w")).as("key_l"),
        iCol.as("key_i"),
        F.col("w").substr(
          segStart(F.length(F.col("w")), iCol, m) + 1,
          segLen(F.length(F.col("w")), iCol, m)).as("key_seg"),
        F.col("w").as("a_w"))

    // probe: one nested transform builds every (partner layout, segment
    // idx, shift) substring; invalid starts are filtered BEFORE the
    // explode so the join never sees clamped substrings
    val probe = s
      .select(F.col("w"), F.explode(F.flatten(F.flatten(F.transform(
        F.sequence(
          F.greatest(F.length(F.col("w")) - maxDist, F.lit(0)),
          F.length(F.col("w")) + maxDist),
        l2 => F.transform(
          F.sequence(F.lit(0), F.lit(m - 1)),
          i => F.filter(
            F.transform(
              F.sequence(F.lit(-maxDist), F.lit(maxDist)),
              delta => F.struct(
                l2.as("l"), i.as("i"),
                (segStart(l2, i, m) + delta).as("st"),
                segLen(l2, i, m).as("ln"))),
            c => c.getField("st") >= 0 &&
              c.getField("st") + c.getField("ln") <= F.length(F.col("w")))))))).as("p"))
      .select(
        F.col("p.l").as("key_l"), F.col("p.i").as("key_i"),
        F.col("w").substr(F.col("p.st") + 1, F.col("p.ln")).as("key_seg"),
        F.col("w").as("b_w"))

    idx.join(probe, Seq("key_l", "key_i", "key_seg"))
      .select(
        F.least(F.col("a_w"), F.col("b_w")).as("a_w"),
        F.greatest(F.col("a_w"), F.col("b_w")).as("b_w"))
      .filter(F.col("a_w") < F.col("b_w"))
      .distinct()
      .withColumn("dist", F.levenshtein(F.col("a_w"), F.col("b_w")))
      .filter(F.col("dist") <= maxDist)
  }

  /** Fuzzy self-join at the ROW level: id pairs whose `strCol` values are
    * within edit distance [1, maxDist]. The string-level kernel runs on
    * DISTINCT values; ids fan back in with two equi-joins — on data where
    * values repeat, the quadratic work happens once per value pair, not
    * once per row pair.
    */
  def fuzzyJoinPairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1): DataFrame = {
    val pairs = editDistancePairs(df.select(F.col(strCol).as("w")), maxDist)
    df.select(F.col(idCol).as("a_id"), F.col(strCol).as("a_w"))
      .join(pairs, "a_w")
      .join(df.select(F.col(idCol).as("b_id"), F.col(strCol).as("b_w")), "b_w")
      .select(
        F.col("a_id"), F.col("b_id"),
        F.col("a_w").as("a_str"), F.col("b_w").as("b_str"), F.col("dist"))
  }
}
