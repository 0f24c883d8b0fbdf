package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's runtime
  * skew splitting isn't available (e.g. a non-shuffle source feeding a
  * shuffle join directly, or a key so hot one task still OOMs).
  *
  * The hot side gets a uniform random-free salt derived from a row
  * fingerprint (deterministic — no rand(), so retries/speculation see the
  * same salt); the other side is replicated across all salt values. The
  * join key becomes (key, salt), spreading one hot key over `salts`
  * tasks.
  */
object SkewJoin {

  /** Deterministic salt in [0, salts) from a fingerprint column (use a
    * unique id or hash of the row). */
  def saltCol(fingerprint: Column, salts: Int): Column =
    pmod(crc32(fingerprint.cast("string")), lit(salts.toLong)).cast("int")

  /** Equi-join `big` (skewed) with `small` on `key`, spreading each hot key
    * over `salts` partitions. `bigFingerprint` must be unique-ish per big
    * row (e.g. its primary key) so rows distribute evenly.
    *
    * `joinType` is restricted to inner/left (left = preserve `big`): the
    * small side is replicated once per salt value, so any join type that
    * emits unmatched SMALL-side rows (right/full) would duplicate each of
    * them `salts` times. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 bigFingerprint: Column, salts: Int = 8,
                 joinType: String = "inner"): DataFrame = {
    val allowed = Set("inner", "left", "leftouter", "left_outer")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left joins only, got '$joinType' " +
        "(the replicated small side would emit unmatched rows once per salt)")
    val saltedBig = big.withColumn("_salt", saltCol(bigFingerprint, salts))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
