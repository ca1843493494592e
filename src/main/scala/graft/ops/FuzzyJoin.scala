package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Edit-distance similarity self-join with GUARANTEED recall — the
 * partition-based candidate scheme of the PassJoin family (Li et al.,
 * "PASS-JOIN: a partition-based method for similarity joins", PVLDB 2011;
 * public literature): every string is split into `k+1` contiguous
 * segments, and the pigeonhole principle gives the recall proof — `k`
 * edits can touch at most `k` segments, so two strings within edit
 * distance `k` share at least one segment VERBATIM, shifted by at most
 * `k` positions (net insertions/deletions before the untouched segment
 * cannot exceed the edit budget). Candidates are therefore an equi-join
 * on (segment content, segment index, partner length) buckets, and only
 * bucket-colliding pairs pay an exact, threshold-bounded Levenshtein
 * verify — never the O(n²) pair space.
 *
 * Scale shape:
 *  - the segment/probe exchange carries (short substring, two ints, id) —
 *    segment length is ~len/(k+1) characters, and full strings never ride
 *    the candidate shuffle;
 *  - probe fan-out is a CONSTANT per row: (2k+1) candidate lengths ×
 *    (k+1) segment indexes × (≤2k+1) aligned start offsets — linear in
 *    corpus size, never quadratic;
 *  - candidate pairs are distinct-ed BEFORE the verify, and the verify
 *    fetches strings by id (two id-keyed joins), so the expensive
 *    Levenshtein runs once per unique candidate pair with an early-exit
 *    threshold;
 *  - length buckets bound skew: identical strings of one length land in
 *    one bucket, the same guard profile as the LSH banding paths.
 */
object FuzzyJoin {

  /** Segment start (0-based) of segment `i` for a string of length `l`
    * split into `kp1` near-even segments: the first `l % kp1` segments get
    * the extra character. */
  private def segStart(l: Column, i: Column, kp1: Int): Column =
    i * (l / kp1).cast("int") + least(i, l % kp1)

  private def segLen(l: Column, i: Column, kp1: Int): Column =
    (l / kp1).cast("int") + when(i < l % kp1, 1).otherwise(0)

  /**
   * All pairs `(id_a, id_b, dist)` with `id_a < id_b` and
   * `levenshtein(str_a, str_b) <= maxDist`, complete by the pigeonhole
   * argument above. Strings shorter than `maxDist + 1` produce
   * zero-length segments whose empty content buckets them with other
   * short strings of compatible length — correct, and bounded by the
   * short-string population per length.
   */
  def editDistanceJoin(df: DataFrame, strCol: String, idCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val k = maxDist
    val kp1 = k + 1
    val base = df.select(col(idCol).as("__id"), col(strCol).as("__s"))
      .filter(col("__s").isNotNull)
      .withColumn("__tl", length(col("__s")).cast("int"))

    // index side: the k+1 segments of every string, keyed by
    // (content, segment index, own length)
    val idx = base
      .withColumn("__i", explode(sequence(lit(0), lit(k))))
      .select(col("__id").as("idx_id"),
        expr(s"substring(__s, ${startExprSql("__tl", "__i", kp1)} + 1, " +
          s"${lenExprSql("__tl", "__i", kp1)})").as("__c"),
        col("__i"), col("__tl").as("__l"))

    // probe side: for every candidate partner length l within ±k and every
    // segment index, the substrings of THIS string at the partner
    // segment's position shifted by at most ±k — the complete candidate
    // window for an untouched segment
    val probe = base
      .withColumn("__l",
        explode(sequence(greatest(col("__tl") - k, lit(0)), col("__tl") + k)))
      .withColumn("__i", explode(sequence(lit(0), lit(k))))
      .withColumn("__p0", segStart(col("__l"), col("__i"), kp1))
      .withColumn("__sl", segLen(col("__l"), col("__i"), kp1))
      .withColumn("__d", explode(sequence(lit(-k), lit(k))))
      .withColumn("__p", col("__p0") + col("__d"))
      .filter(col("__p") >= 0 && col("__p") + col("__sl") <= col("__tl"))
      .select(col("__id").as("probe_id"),
        expr("substring(__s, __p + 1, __sl)").as("__c"),
        col("__i"), col("__l"))

    val candidates = probe.join(idx, Seq("__c", "__i", "__l"))
      .filter(col("probe_id") =!= col("idx_id"))
      .select(least(col("probe_id"), col("idx_id")).as("id_a"),
        greatest(col("probe_id"), col("idx_id")).as("id_b"))
      .distinct()

    // verify: fetch the two strings by id and run the threshold-bounded
    // Levenshtein (early exit past k) once per unique candidate pair
    val sa = base.select(col("__id").as("id_a"), col("__s").as("__sa"))
    val sb = base.select(col("__id").as("id_b"), col("__s").as("__sb"))
    candidates.join(sa, Seq("id_a")).join(sb, Seq("id_b"))
      .withColumn("dist", levenshtein(col("__sa"), col("__sb"), k))
      .filter(col("dist") =!= -1)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
  }

  // SQL fragments mirroring segStart/segLen for use inside expr-substring
  // (functions.substring needs literal pos/len; SQL substring does not)
  private def startExprSql(l: String, i: String, kp1: Int): String =
    s"($i * CAST($l / $kp1 AS INT) + least($i, $l % $kp1))"
  private def lenExprSql(l: String, i: String, kp1: Int): String =
    s"(CAST($l / $kp1 AS INT) + (CASE WHEN $i < $l % $kp1 THEN 1 ELSE 0 END))"
}
