package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions

/** Deduplication family over `documents` (SURVEY.md §2 d1-d8): exact,
  * n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine, cluster
  * consolidation (d6/d7) and incremental batch-vs-corpus dedup (d8).
  *
  * Scale design (the whole point of these operators at 100 TB):
  *  - exact dedup: one hash-shuffle on the content hash, no pairwise work;
  *  - n-gram: the shingle equi-join IS the blocking — pair generation is
  *    bounded per shingle posting list, never a global cross join, and AQE
  *    splits skewed shingles;
  *  - MinHash+LSH: linear scan to signatures (one shuffle), candidate pairs
  *    only within equal LSH band buckets, exact confirm only on candidates;
  *  - SimHash: closed-form bit sums (64 aggregates, no row explosion),
  *    candidate pairs via C(6,3)=20 three-block combination keys over six
  *    10-11 bit blocks (pigeonhole: hamming<=3 leaves >=3 blocks equal, so
  *    recall is exact; ~2^32 bucket space keeps fan-out near-linear),
  *    hamming check only on candidates;
  *  - embedding: hyperplane sign-pattern bands (16x4, deterministic shared
  *    plane family) as the blocking key, exact-cosine confirm on candidates
  *    only; the all-pairs form survives solely as the spec's recall
  *    baseline.
  */
object Dedup {

  val JaccardTau = 0.8
  val CosineTau = 0.4
  val MinhashSeeds = 8
  val BandsOf = 2 // seeds per band -> 4 bands
  /** Minhash value = a 6-hex-char (24-bit) chunk of a base md5; 5 chunks
    * per digest, so 8 minhashes cost 2 digests per shingle row instead of
    * 8. String min over fixed-width lowercase hex == numeric min, and both
    * engines compare VARCHAR bytewise, so the chunks are oracle-safe. 24
    * bits keeps per-seed collision noise at ~n_shingles/2^24 — negligible
    * — where 16-bit chunks would visibly inflate band collisions. */
  /** d23's (bands × rows-per-band) grid over the [[MinhashSeeds]]
    * signature — from the all-candidates end (8×1) through the deployed
    * d3 config (4×2) to the strictest (1×8). Declared with the top-level
    * constants: the strict `oracle` map forces the lazy d23 SQL at
    * object init, which must find this already initialized. */
  val D23Configs: Seq[(Int, Int)] = Seq((8, 1), (4, 2), (2, 4), (1, 8))

  val MinhashChunkHex = 6
  val MinhashChunksPerDigest = 5

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  // ---------------------------------------------------------------- d1

  /** `d1_dedup_exact`: exact dedup on normalized text. Emits one row per
    * document with its content-hash group size and the keeper (min doc_id)
    * so the result is total (works when there are zero duplicates). */
  def d1DedupExact(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("norm_hash"))
    docs(spark, dir)
      .select(col("doc_id"), md5(normText(col("text"))).as("norm_hash"))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("keep_doc_id", min(col("doc_id")).over(w))
      .withColumn("is_keeper", when(col("doc_id") === col("keep_doc_id"), 1L).otherwise(0L))
  }

  // ---------------------------------------------------------------- d2

  /** doc_id → exploded distinct 3-shingles as 60-bit md5 longs (fused
    * [[graft.functions.HashedShingles3Expr]] — tokenize, shingle, dedupe
    * and hash in one pass, no intermediate string array). Tokens are
    * materialized into a column first so the split runs once per doc. */
  private def shingleRows(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(hashedShingles3FromToks(col("toks"))).as("h"))

  /** JaccardTau as an exact rational (4/5) so prefix lengths are computed
    * in integer arithmetic — floating 0.8*n rounds the wrong way for some
    * n and a one-short prefix silently loses recall. */
  /** d17 containment threshold as an exact rational (9/10). Defined here
    * beside [[TauNum]]/[[TauDen]] — NOT next to d17 — because
    * `staticOracle` (a strict val above d17's source position) forces
    * `d17OracleSql` during object init: constants it interpolates must
    * already be initialized or they read as 0. */
  val TauCNum = 9
  val TauCDen = 10

  val TauNum = 4
  val TauDen = 5

  /** doc_id → its distinct shingles — as 60-bit md5 HASHES — in a single
    * global canonical order (ascending document frequency, then hash),
    * plus the count. The df ordering makes prefixes maximally selective.
    *
    * Two deliberate choices, both mirrored exactly in the oracle CTE:
    *
    *  - Shingles are hashed to longs AT the scan (fused
    *    HashedShingles3Expr): everything downstream — the df window, the per-doc
    *    array sort, the checkpoint, the prefix equi-join, and above all
    *    the confirm-phase `array_intersect` over ~10^5 candidate pairs —
    *    operates on 8-byte longs instead of ~25-char strings. PPJoin only
    *    needs SOME global canonical order, and (df, hash) is one. A
    *    within-doc 60-bit collision (~n²/2^61) would merely leave a
    *    duplicate in the list; the intersect is distinct-semantics and
    *    the oracle counts DISTINCT matched hashes, so even then the two
    *    engines agree bit-for-bit.
    *  - Document frequency is a PARTIAL-AGGREGATED groupBy joined back to
    *    the (checkpointed, so computed-once) shingle rows — deliberately
    *    NOT a count-over-window on the hash: a window buffers each hash's
    *    whole partition, so one boilerplate trigram present in most
    *    documents becomes a single straggler task buffering ~n_docs rows
    *    — exactly the hot-key skew the prefix-join guard below exists to
    *    prevent. The groupBy ships one row per mapper per hot hash, and
    *    the join back is SIZE-ADAPTIVE: dfreq is materialized (it feeds
    *    exactly one join, and a checkpointed input carries no stats so
    *    nothing would ever auto-broadcast) and broadcast while it fits —
    *    then the big shingle-row side is never shuffled on h at all, its
    *    only shuffle is the per-doc groupBy. Beyond the limit (billions
    *    of distinct shingles) the join stays shuffle-based with AQE skew
    *    splitting. */
  private def shingleArrays(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingleRows(spark, dir).localCheckpoint(true)
    val dfreq = sh.groupBy(col("h")).agg(count(lit(1)).as("df")).localCheckpoint(true)
    val dfreqSide = if (dfreq.count() <= DfreqBroadcastLimit) broadcast(dfreq) else dfreq
    sh.join(dfreqSide, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(
        transform(array_sort(collect_list(struct(col("df"), col("h")))),
          x => x.getField("h")).as("shingles"),
        count(lit(1)).as("n"))
  }

  /** Distinct-shingle count under which the df table broadcasts: 2M
    * (long, long) rows is a few tens of MB, inside the session's 64 MB
    * broadcast budget. */
  val DfreqBroadcastLimit = 2000000L

  /** Exact prefix-filtered Jaccard (PPJoin-style): a pair with
    * jac >= tau shares >= ceil(tau*n) shingles, so each side must expose
    * one of its first n - ceil(tau*n) + 1 canonical shingles — join only
    * on those prefixes, then confirm with a real intersection. At 100 TB
    * this turns the quadratic shingle join into a join on rare-shingle
    * posting lists. */
  /** Default posting-list block size for the prefix-join skew guard: caps
    * any single task at ~blockSize^2 generated pairs. */
  val PrefixBlockSize = 1024

  private def jaccardPairs(arrays0: DataFrame, cand: Option[DataFrame],
                           blockSize: Int = PrefixBlockSize,
                           alreadyCheckpointed: Boolean = false): DataFrame = {
    // the per-doc array table feeds the prefix explode AND both sides of
    // the confirm join — materialize it once (one row per doc, tiny
    // relative to the corpus). Eager localCheckpoint instead of persist():
    // blocks are reference-counted away with the plan instead of pinning
    // the session cache across a 40-query Verify/Bench run (on a real
    // cluster: reliable checkpoint). Callers that already materialized the
    // table (d3 shares it with its signature pass) skip the second copy.
    val arrays = if (alreadyCheckpointed) arrays0 else arrays0.localCheckpoint(true)
    val candidates = cand.getOrElse(prefixCandidates(arrays, blockSize)())
    val jac = candidates
      .join(arrays.select(col("doc_id").as("d1"), col("shingles").as("sa"), col("n").as("n1")), Seq("d1"))
      .join(arrays.select(col("doc_id").as("d2"), col("shingles").as("sb"), col("n").as("n2")), Seq("d2"))
      // fused |a ∩ b| count (no intersection-array materialization per
      // candidate pair); bit-parity with size(array_intersect) in PlanSpec
      .withColumn("c", intersectCount(col("sa"), col("sb")))
    jac
      .filter(col("c") * lit(1.0) / (col("n1") + col("n2") - col("c")) >= JaccardTau)
      .select(
        col("d1").as("doc_id_1"),
        col("d2").as("doc_id_2"),
        col("c").as("n_common"),
        floor(col("c") * lit(1000000.0) / (col("n1") + col("n2") - col("c")))
          .cast("long").as("jaccard_e6"))
  }

  /** Candidate pairs from the canonical-prefix join, as a function of
    * per-side row filters so variants can bound WHICH pairs are even
    * enumerated (d8 excludes corpus×corpus at the join, not after it).
    *
    * HOT-SHINGLE SKEW GUARD — exact triangle split. A shingle whose
    * prefix posting list has m rows generates m^2 pairs in ONE task of a
    * plain self-join. Split each posting list into blocks of `blockSize`
    * (ordered by doc_id) and enumerate block pairs (i <= j) as extra
    * equi-join key components: every task now generates at most
    * blockSize^2 pairs, and because block order follows doc_id order,
    * cross-block pairs (i < j) always have d1 < d2 — no pair is lost or
    * duplicated. Replication cost is ceil(m/blockSize) per row, paid
    * only by hot shingles. (AQE's skew split can't do this: it cannot
    * subdivide a single join key.)
    *
    * `sideCases`: (leftKeep, rightKeep) row-predicate pairs over the
    * blocked prefix table (columns: doc_id, ps, blk, nblk). Each case
    * emits { (d1, d2) | d1 < d2, leftKeep(d1), rightKeep(d2) } of the
    * unfiltered candidate set; the result is the distinct union across
    * cases, all sharing ONE materialized blocked table. Block geometry is
    * computed BEFORE filtering, so filters cannot merge two docs into the
    * same task's pair budget. */
  private def prefixCandidates(arrays: DataFrame, blockSize: Int)(
      sideCases: Seq[(org.apache.spark.sql.Column, org.apache.spark.sql.Column)] =
        Seq((lit(true), lit(true)))): DataFrame = {
    // prefix length in exact integer arithmetic: n - ceil(tau*n) + 1,
    // with ceil(4n/5) = (4n+4) div 5 (Column./ is double division)
    val prefixLen = expr(s"cast(n - (($TauNum * n + ${TauDen - 1}) div $TauDen) + 1 as int)")
    val prefixed = arrays.select(col("doc_id"),
      explode(slice(col("shingles"), lit(1), prefixLen)).as("ps"))
    val w = Window.partitionBy(col("ps"))
    // materialized: both join sides below derive from this — without the
    // checkpoint the prefix explode + rank/count window execute once PER
    // SIDE (exchange reuse only shares the shuffle, not the sort+window)
    val blocked = prefixed
      .withColumn("rn", row_number().over(w.orderBy(col("doc_id"))))
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("blk", ((col("rn") - 1) / lit(blockSize)).cast("int"))
      .withColumn("nblk",
        ((col("cnt") + lit(blockSize - 1)) / lit(blockSize)).cast("int"))
      .localCheckpoint(true)
    sideCases.map { case (leftKeep, rightKeep) =>
      val left = blocked.filter(leftKeep)
        .select(col("doc_id").as("d1"), col("ps"),
          col("blk").as("bi"), explode(sequence(col("blk"), col("nblk") - 1)).as("bj"))
      val right = blocked.filter(rightKeep)
        .select(col("doc_id").as("d2"), col("ps"),
          explode(sequence(lit(0), col("blk"))).as("bi"), col("blk").as("bj"))
      left.join(right, Seq("ps", "bi", "bj"))
        .filter(col("d1") < col("d2"))
        .select(col("d1"), col("d2"))
    }.reduce(_ unionByName _).distinct()
  }

  /** `d2_dedup_ngram`: word-3-shingle Jaccard near-dup pairs (exact, via
    * prefix filtering). `prefixBlockSize` tunes the hot-shingle skew guard
    * (exposed for the planted-skew spec; results are identical for any
    * value). */
  def d2DedupNgram(spark: SparkSession, dir: String,
                   prefixBlockSize: Int = PrefixBlockSize): DataFrame =
    jaccardPairs(shingleArrays(spark, dir), None, prefixBlockSize)
      .orderBy(col("doc_id_1"), col("doc_id_2"))

  // ---------------------------------------------------------------- d3

  /** `d3_dedup_minhash`: MinHash signatures + LSH banding for candidate
    * generation, exact-Jaccard confirmation on candidates only. */
  def d3DedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    // ONE checkpointed per-doc array table feeds both the signature pass
    // (explode of the already-distinct shingles — not a second
    // tokenize+shingle scan of the corpus) and jaccardPairs' confirm joins
    val arrays = shingleArrays(spark, dir).localCheckpoint(true)
    jaccardPairs(arrays, Some(minhashCandidates(arrays)), alreadyCheckpointed = true)
      .orderBy(col("doc_id_1"), col("doc_id_2"))
  }

  /** The MinHash+LSH candidate generator shared by d3 (Jaccard confirm)
    * and d10 (edit-distance confirm): k chunk-min signatures in one pass
    * over the exploded shingle arrays, band signatures, band-bucket
    * equi-join, distinct (d1 < d2) pairs. */
  private def minhashCandidates(arrays: DataFrame): DataFrame =
    bandedPairs(minhashTable(arrays))

  /** The LSH band/bucket equi-join over a minhash signature frame —
    * split out of [[minhashCandidates]] so d27 can feed it the row-form
    * signature table without re-deriving the per-doc arrays. */
  private def bandedPairs(mh: DataFrame): DataFrame = {
    // band b's signature = md5 of its minhashes in seed order
    val bandCols = (0 until MinhashSeeds / BandsOf).map { b =>
      val parts = (0 until BandsOf).map(r => col(s"h${b * BandsOf + r}"))
      struct(lit(b).as("band"), md5(concat_ws("|", parts: _*)).as("bsig")).as(s"b$b")
    }
    val sig = mh.select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bsig").as("bsig"))
    sig.select(col("doc_id").as("d1"), col("band"), col("bsig"))
      .join(sig.select(col("doc_id").as("d2"), col("band"), col("bsig")), Seq("band", "bsig"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2")).distinct()
  }

  /** The per-doc minhash signature frame (doc_id, h0..h{k-1}) shared by
    * [[minhashCandidates]] (d3/d10's fixed banding) and d23's banding
    * sweep: all k minhashes in ONE pass — base digests materialized per
    * shingle row, k chunk-min() aggregates per doc, no seed explosion,
    * partial (map-side) mins, a single shuffle on doc_id. minhash_i =
    * min over shingles of chunk i%5 of md5((i/5) ':' shingle-hash) — the
    * 60-bit shingle hash rendered as decimal digits, identically in both
    * engines. */
  private def minhashTable(arrays: DataFrame): DataFrame =
    minhashTableRows(arrays.select(col("doc_id"), explode(col("shingles")).as("h")))

  /** Row-form twin of [[minhashTable]]: signatures straight from
    * (doc_id, h) shingle rows. min() over duplicates equals min() over
    * the distinct set, so the signatures are identical whichever form
    * feeds it. */
  private def minhashTableRows(sh: DataFrame): DataFrame = {
    val nDigests = (MinhashSeeds + MinhashChunksPerDigest - 1) / MinhashChunksPerDigest
    val withM = (0 until nDigests).foldLeft(sh)((df, k) =>
      df.withColumn(s"m$k", md5(concat(lit(k.toString), lit(":"), col("h").cast("string")))))
    val mins = (0 until MinhashSeeds).map(i =>
      min(substring(col(s"m${i / MinhashChunksPerDigest}"),
        1 + MinhashChunkHex * (i % MinhashChunksPerDigest), MinhashChunkHex)).as(s"h$i"))
    withM.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** d10: a pair is a fuzzy dup when edit distance ≤ max(len)/EditDen. */
  val EditDen = 5

  /** `d10_dedup_fuzzy`: edit-distance near-dup pairs — the fuzzy-match
    * face of the dedup family (OCR noise, typo variants, minor edits that
    * shingle Jaccard under-scores when they touch many shingles). The
    * quadratic step is never global: candidates come from the SAME
    * MinHash+LSH banding d3 uses ([[minhashCandidates]] — bounded per
    * band bucket), and the O(n·m) Levenshtein confirm runs only on those
    * pairs, on NORMALIZED text. The verdict is integer arithmetic
    * (`EditDen·dist ≤ max_len`), and the reported similarity a floor-e6
    * ratio — both engines agree bit-for-bit. The confirm itself is the
    * thresholded O(n·τ) banded DP ([[graft.functions.BandedLevenshteinExpr]],
    * τ = max_len/[[EditDen]]) rather than the built-in's full O(n·m)
    * matrix — per-candidate work linear in document length, the form that
    * holds at 100 TB document sizes; `editDistWithin >= 0` is
    * bit-equivalent to the full-DP `EditDen·levenshtein ≤ max_len`
    * predicate (spec-pinned), and surviving distances are exact. */
  def d10DedupFuzzy(spark: SparkSession, dir: String): DataFrame = {
    val arrays = shingleArrays(spark, dir).localCheckpoint(true)
    val cand = minhashCandidates(arrays)
    val norm = docs(spark, dir).select(col("doc_id"), normText(col("text")).as("nt"))
    cand
      .join(norm.select(col("doc_id").as("d1"), col("nt").as("nt1")), Seq("d1"))
      .join(norm.select(col("doc_id").as("d2"), col("nt").as("nt2")), Seq("d2"))
      .withColumn("edit_dist", editDistWithin(col("nt1"), col("nt2"), EditDen))
      .withColumn("max_len",
        greatest(length(col("nt1")), length(col("nt2"))).cast("long"))
      .filter(col("edit_dist") >= 0)
      .select(col("d1").as("doc_id_1"), col("d2").as("doc_id_2"),
        col("edit_dist"), col("max_len"),
        when(col("max_len") === 0, lit(1000000L)).otherwise(
          floor((col("max_len") - col("edit_dist")) * lit(1000000.0) / col("max_len"))
            .cast("long")).as("edit_sim_e6"))
      .orderBy(col("doc_id_1"), col("doc_id_2"))
  }

  // ---------------------------------------------------------------- d4

  /** Per-document 64-bit SimHash as 4 x 16-bit chunks — one fused
    * per-row expression pass ([[graft.functions.SimHash64Expr]]): SimHash
    * is a pure function of each doc's word multiset, so the signature
    * phase needs NO explode and NO shuffle at all. The declarative
    * 64-sum-aggregate form below survives as the spec's parity baseline. */
  def simhashChunks(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), wsTokens(col("text")).as("_toks"))
      // zero-token docs have no word rows in the explode form (and the
      // oracle), so they carry no signature here either
      .filter(size(col("_toks")) > 0)
      .select(col("doc_id"), simhash64(col("_toks")).as("_c"))
      .select(col("doc_id"),
        element_at(col("_c"), 1).as("c0"), element_at(col("_c"), 2).as("c1"),
        element_at(col("_c"), 3).as("c2"), element_at(col("_c"), 4).as("c3"))

  /** The original explode + 64-sum-aggregates SimHash (chunk bit b set iff
    * 2*sum(bit_b) - n_words > 0) — kept ONLY as the independent
    * recomputation `DedupSimilaritySpec` checks the fused expression
    * against, and as documentation of the oracle's exact algebra. */
  def simhashChunksSlow(spark: SparkSession, dir: String): DataFrame = {
    val words = docs(spark, dir)
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("word"))
    val withVals = (0 until 4).foldLeft(words) { (df, j) =>
      df.withColumn(s"v$j", conv(substring(md5(col("word")), 1 + 4 * j, 4), 16, 10).cast("long"))
    }
    val sums = for { j <- 0 until 4; b <- 0 until 16 }
      yield sum(shiftright(col(s"v$j"), b).bitwiseAND(1)).as(s"s${j}_$b")
    val agg = withVals.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nw"), sums: _*)
    val chunks = (0 until 4).map { j =>
      (0 until 16).map { b =>
        when(lit(2) * col(s"s${j}_$b") - col("nw") > 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _).as(s"c$j")
    }
    agg.select(col("doc_id") +: chunks: _*)
  }

  val HammingTau = 3

  /** Candidate-generation blocking for d4: the 64-bit simhash split into 6
    * blocks (4 x 11 bits + 2 x 10). Hamming <= 3 flips bits in at most 3
    * blocks, so >= 3 of the 6 blocks are equal (pigeonhole) — joining on
    * every C(6,3) = 20 three-block combination key has EXACT recall. Each
    * key spans ~2^32 values (vs 2^16 for a single 16-bit chunk), so
    * candidate fan-out stays near-linear in corpus size instead of the
    * n^2/65536 a 16-bit-chunk equi-join degrades to. */
  private val BlockBits = Seq(11, 11, 11, 11, 10, 10)
  private val BlockOffsets = BlockBits.scanLeft(0)(_ + _).init
  private val BlockCombos = (0 until BlockBits.length).combinations(3).toSeq

  /** `d4_dedup_simhash`: per-doc simhash chunks + count of hamming<=3
    * near-dup partners. Candidates via the 6-block/3-equal LSH scheme
    * above; hamming is verified on the full 64 bits for every candidate. */
  def d4DedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    // signatures feed both the candidate explode and the final join;
    // localCheckpoint (not cache) so the blocks are reference-counted away
    // with the plan instead of pinning the session cache across queries
    // (on a real cluster: reliable checkpoint / table round-trip)
    val sim = simhashChunks(spark, dir).localCheckpoint(true)
    val full = (0 until 4).map(j => shiftleft(col(s"c$j"), 16 * j))
      .reduce(_ bitwiseOR _)
    // mask AFTER the shift: shiftright is arithmetic and c3 can set bit 63
    val blockCols = BlockOffsets.zip(BlockBits).zipWithIndex.map {
      case ((off, bits), i) =>
        shiftright(col("h64"), off).bitwiseAND(lit((1L << bits) - 1)).as(s"blk$i")
    }
    val sigs = sim.withColumn("h64", full)
      .select(Seq(col("doc_id"), col("c0"), col("c1"), col("c2"), col("c3")) ++ blockCols: _*)
    val keyStructs = BlockCombos.zipWithIndex.map { case (combo, ci) =>
      struct(lit(ci).as("combo"), col(s"blk${combo(0)}").as("k1"),
        col(s"blk${combo(1)}").as("k2"), col(s"blk${combo(2)}").as("k3"))
    }
    val keyed = sigs.select(col("doc_id"), col("c0"), col("c1"), col("c2"),
      col("c3"), explode(array(keyStructs: _*)).as("key"))
    val left = keyed.select(col("key"), col("doc_id").as("d1"),
      col("c0").as("a0"), col("c1").as("a1"), col("c2").as("a2"), col("c3").as("a3"))
    val right = keyed.select(col("key"), col("doc_id").as("d2"),
      col("c0").as("b0"), col("c1").as("b1"), col("c2").as("b2"), col("c3").as("b3"))
    val hamming = (0 until 4).map(j =>
      bit_count(col(s"a$j").bitwiseXOR(col(s"b$j")))).reduce(_ + _)
    // hamming-filter BEFORE distinct: a true pair matches up to 20 combo
    // keys, so dedup the (cheap, already-confirmed) pairs, not the wide rows
    val near = left.join(right, Seq("key"))
      .filter(col("d1") < col("d2") && hamming <= HammingTau)
      .select(col("d1"), col("d2")).distinct()
    val perDoc = near.select(col("d1").as("doc_id"))
      .unionAll(near.select(col("d2").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n3"))
    sim.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("c0"), col("c1"), col("c2"), col("c3"),
        coalesce(col("n3"), lit(0L)).as("n_near3"))
  }

  // ---------------------------------------------------------------- d5

  /** d5 banding: 16 bands x 4 hyperplanes from the deterministic shared
    * plane family. A pair is a candidate iff it shares a full sign pattern
    * in ANY band — the band/sig pair is an equi-join (= partition) key, so
    * pair generation is bounded per bucket, never a cross join. Recall vs
    * the all-pairs form is measured in the spec (0.97 at tau=0.4 on the
    * test corpus; at a realistic near-dup threshold like 0.9 the same
    * machinery has both recall ~1 and far smaller buckets). */
  val EmbedBands = 16
  val EmbedPlanesPerBand = 4

  /** `d5_dedup_embed`: embedding-cosine near-dup pairs >= tau, LSH-banded.
    * Candidates from hyperplane sign-pattern bands, exact-cosine confirm on
    * candidates only (the oracle mirrors the banding, like d3's minhash).
    * The all-pairs form lives only in the spec, as the recall baseline. */
  def d5DedupEmbed(spark: SparkSession, dir: String): DataFrame =
    d5Pairs(spark, dir).orderBy(col("vec_id_1"), col("vec_id_2"))

  /** d5's pair pipeline WITHOUT the final presentation sort — the form
    * consumers compose on (d7's connected components does not care about
    * pair order, and a global sort ahead of a checkpoint is pure waste). */
  private def d5Pairs(spark: SparkSession, dir: String): DataFrame = {
    val pl = Similarity.planesFor(EmbedBands * EmbedPlanesPerBand)
    val e = Tables.load(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    // all 64 hyperplane dots in ONE fused expression evaluation (bit 4b+p of
    // _bkt = plane p of band b), then per-band sigs are pure bit arithmetic;
    // _bkt is referenced 16x so CollapseProject keeps its projection — one
    // matrix pass per row, not 16
    val bandMask = (1L << EmbedPlanesPerBand) - 1
    val bandCols = (0 until EmbedBands).map { b =>
      val sig = shiftrightunsigned(col("_bkt"), b * EmbedPlanesPerBand)
        .bitwiseAND(lit(bandMask))
      struct(lit(b).as("band"), sig.as("sig"))
    }
    val sigs = e
      .withColumn("_bkt", VectorFunctions.hyperplaneBucket(col("embedding"), pl))
      .select(col("vec_id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("vec_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val cand = sigs.select(col("vec_id").as("vec_id_1"), col("band"), col("sig"))
      .join(sigs.select(col("vec_id").as("vec_id_2"), col("band"), col("sig")), Seq("band", "sig"))
      .filter(col("vec_id_1") < col("vec_id_2"))
      .select(col("vec_id_1"), col("vec_id_2")).distinct()
    // confirm joins fetch vectors by id — candidates are tiny relative to
    // the corpus, so this is two bounded hash joins, not a re-scan per pair
    val cosE6 = floor(VectorFunctions.cosineFast(col("ea"), col("eb"))
      * lit(1000000.0)).cast("long")
    cand
      .join(e.select(col("vec_id").as("vec_id_1"), col("embedding").as("ea")), Seq("vec_id_1"))
      .join(e.select(col("vec_id").as("vec_id_2"), col("embedding").as("eb")), Seq("vec_id_2"))
      .select(col("vec_id_1"), col("vec_id_2"), cosE6.as("cos_e6"))
      .filter(col("cos_e6") >= (CosineTau * 1e6).toLong)
  }

  /** All-pairs exact form of d5 — the spec's recall baseline ONLY (it is a
    * cartesian at scale; deliberately not in `SparkEntry.queries`). */
  def d5AllPairs(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val a = e.select(col("vec_id").as("vec_id_1"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("vec_id_2"), col("embedding").as("eb"))
    val cosE6 = floor(VectorFunctions.cosineFast(col("ea"), col("eb"))
      * lit(1000000.0)).cast("long")
    a.join(b, col("vec_id_1") < col("vec_id_2"))
      .select(col("vec_id_1"), col("vec_id_2"), cosE6.as("cos_e6"))
      .filter(col("cos_e6") >= (CosineTau * 1e6).toLong)
  }

  // ---------------------------------------------------------------- d6

  /** Hard ceiling on label-propagation rounds: pointer jumping covers
    * diameter 2^r - 1 in r rounds, so 40 rounds handle any component a
    * trillion-edge graph could hold; hitting it means non-convergence and
    * fails loudly rather than emitting partially-merged clusters. */
  val CcMaxRounds = 40

  /** Pair count under which components are solved in a SINGLE task via
    * union-find instead of the distributed fixpoint. Near-dup pair tables
    * are a sliver of the corpus (candidates that survived an exact
    * confirm), so even a 100 TB run usually lands here — 2M (long, long)
    * edges is ~a hundred MB of task state, far under executor memory,
    * and the one-task solve replaces ~log2(diameter) driver-synchronized
    * fixpoint rounds (12 rounds = ~25 Spark jobs on the sf0.1 embedding
    * graph) with ONE job. Beyond the limit — a truly huge dup graph —
    * the distributed pointer-jumping fixpoint below is the scale path.
    * The same size-adaptive strategy selection Spark itself applies to
    * broadcast-vs-shuffle joins; both paths are spec-checked equal. */
  val CcLocalPairLimit = 2000000L

  /** Connected components over undirected PAIRS. Input: (a, b) id pairs;
    * output: (id, cluster) with cluster = min id of the component. The
    * core of d6 (Jaccard pairs) and d7 (embedding pairs).
    *
    * Two physical strategies, picked by pair count (see
    * [[CcLocalPairLimit]]):
    *
    *  - LOCAL (small graphs): one `mapPartitions` task runs union-find
    *    with path compression over the checkpointed pair blocks, then
    *    relabels every component to its min id. Not a driver collect —
    *    the graph never leaves the executors.
    *  - DISTRIBUTED (huge graphs): min-label propagation with POINTER
    *    JUMPING — each round propagates one hop along edges AND jumps
    *    through the current label pointer, so covered chain length grows
    *    ~2x per round. Rounds run TO FIXPOINT: each round's aggregation
    *    carries the PREVIOUS label along (min over the tagged union), so
    *    the changed-label count that decides termination is a plain
    *    filter+count on the round's checkpointed output, not an extra
    *    join job. */
  private def connectedComponents(pairs0: DataFrame, opName: String,
                                  alreadyMaterialized: Boolean = false): DataFrame = {
    // materialize the pair pipeline ONCE: everything below references
    // pairs at least twice (both edge directions and the count), and
    // without this the entire upstream pair generation (d2's prefix join /
    // d5's band join + cosine confirm) would execute once per reference.
    // Callers passing an already-checkpointed table skip the second copy
    // (the jaccardPairs `alreadyCheckpointed` convention).
    val pairs = if (alreadyMaterialized) pairs0 else pairs0.localCheckpoint(true)
    val nPairs = pairs.count() // cheap: checkpointed blocks
    val idsAreLong = pairs.schema("a").dataType == org.apache.spark.sql.types.LongType &&
      pairs.schema("b").dataType == org.apache.spark.sql.types.LongType
    if (nPairs <= CcLocalPairLimit && idsAreLong) ccLocal(pairs)
    else ccDistributed(pairs, nPairs, opName)
  }

  /** Small-graph strategy: union-find in one task. Deterministic — the
    * emitted label is the component MIN regardless of union order.
    * (private[graft]: the equivalence spec drives both strategies.) */
  private[graft] def ccLocal(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.select(col("a").cast("long"), col("b").cast("long")).as[(Long, Long)]
      .repartition(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x0: Long): Long = {
          var x = x0
          while (parent.getOrElse(x, x) != x) { // path-halve as we walk
            val p = parent(x)
            val g = parent.getOrElse(p, p)
            parent(x) = g
            x = g
          }
          x
        }
        it.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val ra = find(a); val rb = find(b)
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        // union always links the larger root under the smaller, so by
        // induction every root already IS its component's min id — the
        // property test pins this against an independent closure
        parent.keysIterator.map(v => (v, find(v)))
      }
      .toDF("v", "l")
  }

  /** Huge-graph strategy: distributed min-label fixpoint (see
    * [[connectedComponents]] doc).
    * (private[graft]: the equivalence spec drives both strategies.) */
  private[graft] def ccDistributed(pairs: DataFrame, nPairs: Long, opName: String): DataFrame = {
    val edges = pairs
      .unionByName(pairs.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(true)
    // seed labels one propagation ahead: l = min(v, min neighbor) — same
    // shuffle count as a plain distinct-init (every vertex appears as `a`
    // in the undirected edge set), one fewer fixpoint round
    var labels = edges.groupBy(col("a")).agg(min(col("b")).as("mn"))
      .select(col("a").as("v"), least(col("a"), col("mn")).as("l"))
      .localCheckpoint(true)
    // no broadcast hinting here on purpose: this path only runs beyond
    // CcLocalPairLimit pairs (or for non-long ids), where the label table
    // is far past any broadcast budget — small graphs take ccLocal
    val idType = pairs.schema("a").dataType
    val t0 = System.nanoTime()
    var round = 0
    var changed = 1L
    while (changed > 0) {
      round += 1
      require(round <= CcMaxRounds, s"$opName did not converge in $CcMaxRounds rounds")
      val propagated = edges
        .join(labels.select(col("v").as("b"), col("l")), Seq("b"))
        .select(col("a").as("v"), col("l"))
      // pointer jump: v -> label(label(v)) doubles the covered distance
      val jumped = labels.select(col("v"), col("l").as("mid"))
        .join(labels.select(col("v").as("mid"), col("l")), Seq("mid"))
        .select(col("v"), col("l"))
      // one aggregation computes BOTH the new label and the old one: only
      // the labels branch carries a non-null `prev`, and each v has exactly
      // one label row, so min(prev) ignoring nulls IS the previous label.
      // materialize each round: iterative plans must truncate lineage or
      // the optimizer re-expands all prior rounds into one exponential tree
      // (on a cluster: reliable checkpoint / table round-trip instead)
      val nullPrev = lit(null).cast(idType)
      val next = labels.withColumn("prev", col("l"))
        .unionByName(propagated.withColumn("prev", nullPrev))
        .unionByName(jumped.withColumn("prev", nullPrev))
        .groupBy(col("v")).agg(min(col("l")).as("l"), min(col("prev")).as("prev"))
        .localCheckpoint(true)
      // min-label is monotone decreasing, so "no label changed" is the
      // exact fixpoint test — a filter over the just-checkpointed blocks
      changed = next.filter(col("l") =!= col("prev")).count()
      labels = next.select(col("v"), col("l"))
      if (CcDebug) System.err.println(
        f"[cc:$opName] round $round: changed=$changed (${(System.nanoTime() - t0) / 1e9}%.2fs cum)")
    }
    labels
  }

  /** GRAFT_CC_DEBUG=1 prints per-round convergence timing to stderr. */
  private val CcDebug = sys.env.contains("GRAFT_CC_DEBUG")

  /** `d6_dedup_clusters`: consolidate near-dup PAIRS (d2) into CLUSTERS
    * (connected components — [[connectedComponents]]), elect the min
    * doc_id as each cluster's keeper.
    *
    * `precomputedPairs`: a pipeline that has ALREADY materialized the d2
    * pair table (e.g. it reports pairs AND consolidates clusters in one
    * run) passes it here — d2's shingle scan, prefix join and confirm run
    * once per run, not once per consumer. Pass the [[d2DedupNgram]] output
    * shape, MATERIALIZED (localCheckpoint) — it is consumed several times
    * and is not re-checkpointed here. Standalone calls recompute. */
  def d6DedupClusters(spark: SparkSession, dir: String,
                      precomputedPairs: Option[DataFrame] = None): DataFrame = {
    val pairs = precomputedPairs
      .getOrElse(jaccardPairs(shingleArrays(spark, dir), None))
      .select(col("doc_id_1").as("a"), col("doc_id_2").as("b"))
    connectedComponents(pairs, "d6", alreadyMaterialized = precomputedPairs.isDefined)
      .select(col("v").as("doc_id"), col("l").as("cluster_id"))
      .withColumn("is_keeper", when(col("doc_id") === col("cluster_id"), 1L).otherwise(0L))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .orderBy(col("doc_id"))
  }

  /** `d7_embed_clusters`: the embedding-space twin of d6 — consolidate
    * d5's banded cosine near-dup PAIRS into components and elect min
    * vec_id keepers. The composition a corpus pipeline actually runs:
    * candidate bands → exact-cosine confirm → transitive closure, all
    * reusing the already-verified d5 and [[connectedComponents]] pieces.
    * `precomputedPairs` (the [[d5DedupEmbed]] output shape) lets a run
    * that also reports d5 pairs feed them in instead of recomputing —
    * see [[d6DedupClusters]]. */
  def d7EmbedClusters(spark: SparkSession, dir: String,
                      precomputedPairs: Option[DataFrame] = None): DataFrame = {
    val pairs = precomputedPairs
      .getOrElse(d5Pairs(spark, dir)) // unsorted form: CC ignores pair order
      .select(col("vec_id_1").as("a"), col("vec_id_2").as("b"))
    connectedComponents(pairs, "d7", alreadyMaterialized = precomputedPairs.isDefined)
      .select(col("v").as("vec_id"), col("l").as("cluster_id"))
      .withColumn("is_keeper", when(col("vec_id") === col("cluster_id"), 1L).otherwise(0L))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .orderBy(col("vec_id"))
  }

  // ---------------------------------------------------------------- d12

  /** `d12_semantic_dedup`: per-cluster embedding dedup — the SemDeDup
    * shape (the published semantic-dedup pipeline for pretraining
    * corpora: k-means-partition the embedding space, then compare ONLY
    * within each cluster). This is the operator that CONSUMES the
    * partition s6 materializes: the same deterministic k-means model and
    * fused-cosineMatrix assignment (shared via
    * [[Similarity.kmeansWithData]]/[[Similarity.assignCells]] — the
    * shared code path retrains per call, deterministically bit-identical,
    * so each query stays self-contained), a cell-keyed self-equi-join for candidate pairs
    * (pairs can only form inside a cell, so pair work is Σ|cell|² —
    * bounded by the model's cell geometry, never a corpus cross join;
    * the cell count k is the published dial that caps it at scale, and
    * the join is an equi-join AQE skew-splits if a cell runs hot),
    * exact-cosine confirm at the d5 threshold, then the shared d6
    * connected-component core with min-vec_id keeper election.
    *
    * vs d7 (LSH-banded near-dup clusters): the bands can MISS true pairs
    * (d11 measures exactly that); within a cell d12 is exhaustive, so
    * every same-cell d5 pair is found by construction (spec-pinned) plus
    * any the banding dropped. The trade is the SemDeDup one — recall 1
    * inside a cell, zero across cells — and the output keeps the cell
    * column so a consumer sees which partition vouched for each group.
    *
    * Output: one row per corpus vector (the keep/drop manifest): cell,
    * dup_group (CC label; self for singletons), is_keeper, group_size. */
  def d12SemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val (cents, data) = Similarity.kmeansWithData(spark, dir)
    // consumed three times (both pair sides + the output spine): one
    // materialized assignment pass, the cosineMatrix never re-runs
    val asg = Similarity.assignCells(data, cents)
      .select(col("vec_id"), col("cell"), col("embedding"))
      .localCheckpoint(true)
    val cosE6 = floor(VectorFunctions.cosineFast(col("ea"), col("eb"))
      * lit(1000000.0)).cast("long")
    // cell equi-join: both sides shuffle ONCE by cell (vector bytes move
    // once per side); the pair expansion happens inside the join, so no
    // per-pair vector fetch and no candidate table carrying embeddings
    val pairs = asg.select(col("cell"), col("vec_id").as("a"), col("embedding").as("ea"))
      .join(asg.select(col("cell"), col("vec_id").as("b"), col("embedding").as("eb")),
        Seq("cell"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), cosE6.as("cos_e6"))
      .filter(col("cos_e6") >= (CosineTau * 1e6).toLong)
    val cc = connectedComponents(pairs.select(col("a"), col("b")), "d12")
    asg.select(col("vec_id"), col("cell"))
      .join(cc.select(col("v").as("vec_id"), col("l").as("grp")), Seq("vec_id"), "left")
      .withColumn("dup_group", coalesce(col("grp"), col("vec_id")))
      .withColumn("is_keeper",
        when(col("dup_group") === col("vec_id"), 1L).otherwise(0L))
      .withColumn("group_size",
        count(lit(1)).over(Window.partitionBy(col("dup_group"))))
      .select(col("vec_id"), col("cell"), col("dup_group"),
        col("is_keeper"), col("group_size"))
      .orderBy(col("vec_id"))
  }

  /** d12 oracle: the final centroids as injected VALUES literals (same
    * rn=1 argmax assignment as the s6 oracle), within-cell pairs at the
    * d5 threshold, transitive closure via the same recursive reach as
    * d6/d7, left-joined back onto the full assignment. */
  private def d12OracleSql(cents: Seq[(Long, Array[Long])]): String = {
    def cosSql(a: String, b: String) =
      s"""(list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
         | / (sqrt(list_sum(list_transform(list_zip($a, $a), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))))
         |  * sqrt(list_sum(list_transform(list_zip($b, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))))))""".stripMargin
    s"""WITH RECURSIVE cents(cid, cent) AS (VALUES
       |  ${Similarity.centroidRowsSql(cents)}),
       |scored AS (
       | SELECT e.vec_id, c.cid,
       |  row_number() OVER (PARTITION BY e.vec_id
       |    ORDER BY ${cosSql("e.embedding", "c.cent")} DESC, c.cid) AS rn
       | FROM embeddings e CROSS JOIN cents c),
       |asg AS (SELECT vec_id, cid AS cell FROM scored WHERE rn = 1),
       |p AS (
       | SELECT x.vec_id AS a, y.vec_id AS b
       | FROM asg x JOIN asg y ON x.cell = y.cell AND x.vec_id < y.vec_id
       |  JOIN embeddings ea ON ea.vec_id = x.vec_id
       |  JOIN embeddings eb ON eb.vec_id = y.vec_id
       | WHERE floor(${cosSql("ea.embedding", "eb.embedding")} * 1000000.0)
       |   >= ${(CosineTau * 1e6).toLong}),
       |edges AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
       |reach(v, l) AS (
       | SELECT DISTINCT a, a FROM edges
       | UNION
       | SELECT e.a, r.l FROM edges e JOIN reach r ON e.b = r.v),
       |cc AS (SELECT v, min(l) AS grp FROM reach GROUP BY v)
       |SELECT s.vec_id, CAST(s.cell AS BIGINT) AS cell,
       | coalesce(cc.grp, s.vec_id) AS dup_group,
       | CAST(CASE WHEN coalesce(cc.grp, s.vec_id) = s.vec_id THEN 1 ELSE 0 END AS BIGINT) AS is_keeper,
       | count(*) OVER (PARTITION BY coalesce(cc.grp, s.vec_id)) AS group_size
       |FROM asg s LEFT JOIN cc ON cc.v = s.vec_id
       |ORDER BY s.vec_id""".stripMargin
  }

  // ---------------------------------------------------------------- d8

  /** Batch membership for d8: stable 0-99 md5 bucket of doc_id (the same
    * primitive as `t5_hash_split`); bucket >= NewBucketMin (20%) plays the
    * "newly crawled batch", the rest the already-deduped corpus. A real
    * pipeline swaps this for a snapshot/date predicate — the operator only
    * needs SOME deterministic membership test. */
  val NewBucketMin = 80

  private def isNewDoc(c: Column): Column =
    md5Long60(c.cast("string")) % 100 >= NewBucketMin

  /** `d8_dedup_incremental`: dedup a NEW batch against an existing corpus
    * without re-pairing the corpus with itself — the daily-crawl shape at
    * 100 TB: the corpus is already deduped, so today's work must be
    * proportional to today's batch. The bound is structural, not a
    * post-filter: the prefix join enumerates (any × new) ∪ (new × old)
    * via [[prefixCandidates]] side cases, so corpus×corpus candidate
    * pairs are never GENERATED (with a 1000× corpus:batch ratio, a
    * generate-then-filter design would spend ~all its join fan-out on
    * pairs it then throws away). Output: one verdict row per new doc —
    * dup counts vs corpus and batch, best match (max jaccard, tie -> min
    * id), and keep/drop: drop on any corpus dup or a batch dup with a
    * smaller doc_id (keep-first within the batch, so exactly one member
    * of an all-new duplicate group survives). */
  def d8DedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val arrays = shingleArrays(spark, dir).localCheckpoint(true)
    val cand = prefixCandidates(arrays, PrefixBlockSize)(Seq(
      // d2-side new: covers (old, new) and (new, new) pairs
      (lit(true), isNewDoc(col("doc_id"))),
      // d1 new, d2 old: the remaining (new, old) orientation
      (isNewDoc(col("doc_id")), !isNewDoc(col("doc_id")))))
    val pairs = jaccardPairs(arrays, Some(cand), alreadyCheckpointed = true)
      .localCheckpoint(true) // feeds the count aggregate AND the best-match window
    // orient every confirmed pair around its NEW member(s)
    val m = pairs.filter(isNewDoc(col("doc_id_1")))
      .select(col("doc_id_1").as("doc_id"), col("doc_id_2").as("other"), col("jaccard_e6"))
      .unionByName(pairs.filter(isNewDoc(col("doc_id_2")))
        .select(col("doc_id_2").as("doc_id"), col("doc_id_1").as("other"), col("jaccard_e6")))
    val agg = m.groupBy(col("doc_id")).agg(
      sum(when(!isNewDoc(col("other")), 1L).otherwise(0L)).as("n_corpus_dups"),
      sum(when(isNewDoc(col("other")), 1L).otherwise(0L)).as("n_batch_dups"),
      sum(when(isNewDoc(col("other")) && col("other") < col("doc_id"), 1L)
        .otherwise(0L)).as("n_prior_batch_dups"))
    val wBest = Window.partitionBy(col("doc_id"))
      .orderBy(col("jaccard_e6").desc, col("other"))
    val best = m.withColumn("rn", row_number().over(wBest)).filter(col("rn") === 1)
      .select(col("doc_id"), col("other").as("best_match_id"),
        col("jaccard_e6").as("best_jaccard_e6"))
    // Known cosmetic artifact: this query's stages log "Broadcasting
    // large task binary (~4 MiB)" — a broadcast relation built over the
    // checkpointed shingle frame carries an unknown-stats preallocation
    // into the stage plan (same Spark-internal mechanism the q10
    // LocalRelation fix removed; here every candidate frame is
    // batch-sized, not statistics-sized, so the collect-and-replant
    // route would break the no-fact-collect rule for a constant 4 MiB
    // of per-stage traffic that does not grow with data).
    // r15 re-attribution, post broadcast-handle refactor: a solo sweep
    // of every suspect (s19/s15/s14/s12: ZERO warnings each) shows this
    // query is the bench tail's ONLY task-binary source — 5 warnings at
    // 2.1/4.1 MiB per run, exactly the sizes the r14 tail logged. With
    // model literals out of every closure, the artifact is fully
    // explained here and re-accepted on the rationale above.
    // r16 closure, whole-suite this time (graft.TaskBinaryScan: every
    // benchQueries entry at sf0.1 with per-query stderr markers): 5
    // warnings total — 2x 2.1 MiB + 3x 4.1 MiB — ALL between this
    // query's markers, zero anywhere else. The 2.1 MiB ones are this
    // query's smaller candidate-side stages (same unknown-stats
    // broadcast preallocation, half the frame); both sizes are constant
    // in data, accepted.
    docs(spark, dir).select(col("doc_id")).filter(isNewDoc(col("doc_id")))
      .join(agg, Seq("doc_id"), "left")
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_corpus_dups"), lit(0L)).as("n_corpus_dups"),
        coalesce(col("n_batch_dups"), lit(0L)).as("n_batch_dups"),
        col("best_match_id"), col("best_jaccard_e6"),
        when(coalesce(col("n_corpus_dups"), lit(0L)) === 0 &&
          coalesce(col("n_prior_batch_dups"), lit(0L)) === 0, 1L)
          .otherwise(0L).as("is_kept"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------------- oracles

  private val toksSql =
    """CASE WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN []::VARCHAR[]
      | ELSE string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') END""".stripMargin

  /** docsh carries the 60-bit md5 hash of each distinct shingle — the
    * exact value Spark's md5Long60 computes — so every downstream compare
    * (prefix join, intersect count, minhash input) matches the hashed
    * Spark pipeline. */
  private val shinglesCte =
    s"""docsh AS (
       | SELECT doc_id, CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h FROM (
       |  SELECT doc_id, unnest(CASE WHEN len(toks) < 3 THEN []::VARCHAR[]
       |   ELSE list_distinct(list_transform(range(1, len(toks) - 1),
       |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) END) AS s
       |  FROM (SELECT doc_id, $toksSql AS toks FROM documents))),
       |shn AS (SELECT doc_id, count(*) AS n FROM docsh GROUP BY doc_id)""".stripMargin

  // count(DISTINCT a.h) == size(array_intersect(...)) in all cases,
  // including a within-doc hash collision (both are distinct-semantics)
  // ---------------------------------------------------------------- d9

  val ChunkMod = 8L // token starts a fresh chunk after it iff md5 % this == 0
  val MinChunkToks = 4 // shorter chunks carry no dedup signal
  val MaxChunkDf = 50L // chunks in more docs than this are boilerplate
  val MinSharedChunks = 2L

  /** `d9_dedup_chunks`: content-defined-chunking dedup — detects PARTIAL
    * overlap (a paragraph copied into an otherwise-different document),
    * the modality whole-document similarity (d2-d5) dilutes away. Chunk
    * boundaries are content-defined (a token closes its chunk iff its md5
    * hits `ChunkMod` — the gear-CDC idea at token granularity), so an
    * insertion upstream shifts no downstream boundaries and identical
    * passages chunk identically in every document. Shared-chunk counting
    * is a posting-list equi-join on chunk fingerprints, restricted to
    * chunks seen in 2..`MaxChunkDf` docs — singleton chunks can't pair
    * (pruned before the join) and hotter-than-`MaxChunkDf` chunks are
    * boilerplate, so posting-list fan-out is bounded per chunk, never
    * all-pairs. The per-document chunk window partitions by doc_id
    * (bounded by document length); `containment_e6` is exact integer
    * arithmetic (shared·1e6 div min chunk count). */
  def d9DedupChunks(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), posexplode(wsTokens(col("text"))).as(Seq("pos", "tok")))
    val wChunk = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isBoundary = (md5Long60(col("tok")) % ChunkMod === 0).cast("long")
    // chunk text rebuilt in token order via sorted (pos, tok) structs —
    // collect_list order is execution-dependent, the sort is the contract
    val chunkFp = md5(concat_ws(" ",
      transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
        s => s.getField("tok"))))
    val chunks = toks
      .withColumn("chunk_id", coalesce(sum(isBoundary).over(wChunk), lit(0L)))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(count(lit(1)).as("n_toks"), chunkFp.as("fp"))
      .filter(col("n_toks") >= MinChunkToks)
      .localCheckpoint(true) // 4 consumers below; the tokenize+window+agg runs once
    val eligible = chunks.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2 && col("df") <= MaxChunkDf)
      .select(col("fp"))
    val posting = chunks.join(eligible, Seq("fp"))
    val pairs = posting.select(col("fp"), col("doc_id").as("doc_id_1"))
      .join(posting.select(col("fp"), col("doc_id").as("doc_id_2")), Seq("fp"))
      .filter(col("doc_id_1") < col("doc_id_2"))
      .groupBy(col("doc_id_1"), col("doc_id_2"))
      .agg(countDistinct(col("fp")).as("n_shared_chunks"))
      .filter(col("n_shared_chunks") >= MinSharedChunks)
    val totals = chunks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
    pairs
      .join(totals.select(col("doc_id").as("doc_id_1"), col("n_chunks").as("n1")), Seq("doc_id_1"))
      .join(totals.select(col("doc_id").as("doc_id_2"), col("n_chunks").as("n2")), Seq("doc_id_2"))
      .select(col("doc_id_1"), col("doc_id_2"), col("n_shared_chunks"),
        expr("(n_shared_chunks * 1000000) div least(n1, n2)").as("containment_e6"))
      .orderBy(col("doc_id_1"), col("doc_id_2"))
  }

  private lazy val d9OracleSql: String =
    s"""WITH t AS (
       | SELECT doc_id, u.tok, u.pos FROM (
       |  SELECT doc_id, unnest($toksSql) AS tok,
       |         generate_subscripts($toksSql, 1) AS pos
       |  FROM documents) u(doc_id, tok, pos)),
       |b AS (
       | SELECT doc_id, tok, pos,
       |  CAST(COALESCE(sum(CASE WHEN CAST(('0x' || substr(md5(tok),1,15)) AS BIGINT) % $ChunkMod = 0
       |      THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS chunk_id
       | FROM t),
       |c AS (
       | SELECT doc_id, chunk_id, md5(string_agg(tok, ' ' ORDER BY pos)) AS fp,
       |  CAST(count(*) AS BIGINT) AS n_toks
       | FROM b GROUP BY doc_id, chunk_id HAVING count(*) >= $MinChunkToks),
       |el AS (SELECT fp FROM c GROUP BY fp
       |  HAVING count(DISTINCT doc_id) BETWEEN 2 AND $MaxChunkDf),
       |p AS (
       | SELECT a.doc_id AS doc_id_1, b2.doc_id AS doc_id_2,
       |  CAST(count(DISTINCT a.fp) AS BIGINT) AS n_shared_chunks
       | FROM c a JOIN c b2 ON a.fp = b2.fp AND a.doc_id < b2.doc_id
       | WHERE a.fp IN (SELECT fp FROM el)
       | GROUP BY 1, 2 HAVING count(DISTINCT a.fp) >= $MinSharedChunks),
       |n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks FROM c GROUP BY doc_id)
       |SELECT p.doc_id_1, p.doc_id_2, p.n_shared_chunks,
       | (p.n_shared_chunks * 1000000) // least(n1.n_chunks, n2.n_chunks) AS containment_e6
       |FROM p JOIN n n1 ON p.doc_id_1 = n1.doc_id JOIN n n2 ON p.doc_id_2 = n2.doc_id
       |ORDER BY 1, 2""".stripMargin

  /** The MinHash band-candidate CTE mirrored from [[minhashCandidates]]
    * (consumes `docsh` from [[shinglesCte]]; yields `cand(cd1, cd2)`). */
  private val minhashCandCte: String =
    s"""mh AS (
       | SELECT doc_id, r.seed,
       |  min(substr(md5(CAST(r.seed // $MinhashChunksPerDigest AS VARCHAR) || ':' || CAST(h AS VARCHAR)),
       |      1 + $MinhashChunkHex * (r.seed % $MinhashChunksPerDigest), $MinhashChunkHex)) AS mh
       | FROM docsh, range($MinhashSeeds) r(seed) GROUP BY doc_id, r.seed),
       |sig AS (
       | SELECT doc_id, seed // $BandsOf AS band, md5(string_agg(mh, '|' ORDER BY seed)) AS bsig
       | FROM mh GROUP BY doc_id, seed // $BandsOf),
       |cand AS (
       | SELECT DISTINCT a.doc_id AS cd1, b.doc_id AS cd2
       | FROM sig a JOIN sig b ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id)""".stripMargin

  private def jaccardSelectSql(candJoin: String): String =
    s"""SELECT p.d1 AS doc_id_1, p.d2 AS doc_id_2, p.c AS n_common,
       | CAST(floor(p.c * 1000000.0 / (n1.n + n2.n - p.c)) AS BIGINT) AS jaccard_e6
       |FROM (SELECT a.doc_id d1, b.doc_id d2, count(DISTINCT a.h) c
       |      FROM docsh a JOIN docsh b ON a.h = b.h AND a.doc_id < b.doc_id
       |      $candJoin
       |      GROUP BY 1, 2) p
       | JOIN shn n1 ON p.d1 = n1.doc_id JOIN shn n2 ON p.d2 = n2.doc_id
       |WHERE p.c * 1.0 / (n1.n + n2.n - p.c) >= $JaccardTau
       |ORDER BY doc_id_1, doc_id_2""".stripMargin

  /** d13 sweep thresholds (e6): from the operating floor [[JaccardTau]]
    * up to exact-shingle duplicates. Prefix-filter candidate recall is
    * only guaranteed for pairs at or above [[JaccardTau]], so the sweep
    * tunes UPWARD from the floor — the direction threshold tuning
    * actually runs (start permissive, tighten until the dup rate and
    * manual spot-checks agree). */
  val SweepTausE6: Seq[Long] = Seq(800000L, 850000L, 900000L, 950000L, 1000000L)

  /** `d13_threshold_sweep`: the τ-tuning curve for near-dup dedup — dup
    * pair count, affected-doc count and keep-min drop count at each
    * candidate threshold, all from ONE pair computation (d11 monitors the
    * CANDIDATE stage's quality; this sweeps the CONFIRM stage's dial).
    * Production dedup picks τ from exactly this curve: too low and
    * distinct documents merge, too high and boilerplate variants survive;
    * the knee shows up as the pair count's drop-off between thresholds.
    * `n_dropped_keepmin` is the yield of the pairwise keep-min rule (docs
    * appearing as the larger id of any qualifying pair) — an upper bound
    * on what d6's transitive clustering would remove at that τ.
    *
    * Scale: the pair table is d2's bounded-candidate output (pairs ≪
    * corpus, checkpointed once); the sweep is a ≤|taus|× explode of THAT
    * table, two map-side-partial aggregates, and a |taus|-row report —
    * re-running the confirm join per threshold would cost |taus|× the
    * candidate work for identical output. */
  def d13ThresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = jaccardPairs(shingleArrays(spark, dir), None).localCheckpoint(true)
    val hit = pairs.select(col("doc_id_1"), col("doc_id_2"), col("jaccard_e6"),
        explode(array(SweepTausE6.map(lit): _*)).as("tau_e6"))
      .filter(col("jaccard_e6") >= col("tau_e6"))
    val byTau = hit.groupBy(col("tau_e6")).agg(
      count(lit(1)).as("n_pairs"),
      countDistinct(col("doc_id_2")).as("n_dropped_keepmin"))
    val docs = hit
      .select(col("tau_e6"),
        explode(array(col("doc_id_1"), col("doc_id_2"))).as("doc_id"))
      .distinct()
      .groupBy(col("tau_e6")).agg(count(lit(1)).as("n_docs"))
    // every configured τ reports a row even when no pair qualifies — a
    // silent missing row reads as "not measured", not "zero dups"
    SweepTausE6.toDF("tau_e6")
      .join(byTau, Seq("tau_e6"), "left")
      .join(docs, Seq("tau_e6"), "left")
      .select(col("tau_e6"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_dropped_keepmin"), lit(0L)).as("n_dropped_keepmin"))
      .orderBy(col("tau_e6"))
  }

  private lazy val d13Oracle: String = {
    val tauValues = SweepTausE6.map(t => s"($t)").mkString(", ")
    s"""WITH $shinglesCte,
       |p AS (${jaccardSelectSql("")}),
       |taus(tau_e6) AS (VALUES $tauValues),
       |hit AS (
       | SELECT t.tau_e6, p.doc_id_1, p.doc_id_2
       | FROM p JOIN taus t ON p.jaccard_e6 >= t.tau_e6),
       |byt AS (
       | SELECT tau_e6, CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(count(DISTINCT doc_id_2) AS BIGINT) AS n_dropped_keepmin
       | FROM hit GROUP BY 1),
       |d AS (
       | SELECT tau_e6, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM (
       |  SELECT tau_e6, doc_id_1 AS doc_id FROM hit
       |  UNION ALL SELECT tau_e6, doc_id_2 FROM hit)
       | GROUP BY 1)
       |SELECT CAST(t.tau_e6 AS BIGINT) AS tau_e6,
       | COALESCE(b.n_pairs, 0) AS n_pairs,
       | COALESCE(d.n_docs, 0) AS n_docs,
       | COALESCE(b.n_dropped_keepmin, 0) AS n_dropped_keepmin
       |FROM taus t LEFT JOIN byt b USING (tau_e6) LEFT JOIN d USING (tau_e6)
       |ORDER BY tau_e6""".stripMargin
  }

  // ---------------------------------------------------------------- d14

  /** d14 gram width in tokens. 8 matches d9's expected CDC chunk length
    * ([[ChunkMod]]) so the two operators probe the same granularity from
    * opposite directions (content-defined boundaries vs every offset). */
  val GramToks = 8
  /** Minimal reported verbatim run, in tokens — the "memorized passage"
    * threshold. The exact-substring dedup literature uses 50 BPE tokens
    * on web documents; 20 is that dial scaled to this corpus's ~54-token
    * documents. */
  val MinRunToks = 20L
  /** Grams present in more documents than this are boilerplate (license
    * headers, navigation chrome) — d9's [[MaxChunkDf]] rationale at gram
    * granularity: dropping them bounds posting-list fan-out. */
  val MaxGramDf = 50L

  /** `d14_substring_dedup`: EXACT substring-level dedup — every maximal
    * verbatim token run of >= [[MinRunToks]] tokens shared by a document
    * pair, with its start offset in both documents (1-based token index).
    * This is the suffix-array dedup shape ("find every long verbatim
    * overlap, wherever it starts") re-expressed as Spark relational
    * algebra: d9's CDC chunks detect copied passages only when at least
    * [[MinSharedChunks]] whole chunks land inside the overlap — an
    * overlap that straddles chunk boundaries (no interior boundary token)
    * is invisible to d9 no matter how long it is, but shows up here at
    * every gram offset (spec plants exactly that case).
    *
    * Shape: tokenize once → [[GramToks]]-token gram fingerprint at EVERY
    * start position (60-bit md5, constant-width — the raw text never
    * enters the join) → posting-bounded equi-join on gram hash restricted
    * to grams in 2..[[MaxGramDf]] docs (singletons can't pair and are
    * pruned BEFORE the join; hotter grams are boilerplate — fan-out per
    * gram is bounded, never all-pairs) → gaps-and-islands coalescing of
    * consecutive matched positions at a fixed offset difference
    * (`pos_1 - row_number` is constant exactly on a consecutive run) into
    * maximal runs; a run of g consecutive shared grams is g+K-1 verbatim
    * shared tokens.
    *
    * Scale: the only shuffles are the gram-hash groupBy/join (key-grained,
    * posting-bounded) and the run window, whose partition is a (doc pair,
    * offset) match list — bounded by the pair's shared-gram count, never
    * corpus-sized. A suffix array would find runs shorter than
    * [[GramToks]] too; those are below any dedup threshold, so the gram
    * quantization loses nothing at [[MinRunToks]] >= [[GramToks]]. */
  def d14SubstringDedup(spark: SparkSession, dir: String): DataFrame = {
    val grams = docs(spark, dir)
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
      .select(col("doc_id"), posexplode(
        when(size(col("toks")) < GramToks, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), size(col("toks")) - GramToks + 1),
            i => concat_ws(" ", slice(col("toks"), i, lit(GramToks)))))).as(Seq("pos0", "gram")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
        md5Long60(col("gram")).as("h"))
      .localCheckpoint(true) // 3 consumers below; tokenize+gram runs once
    val eligible = grams.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2 && col("df") <= MaxGramDf)
      .select(col("h"))
    val posting = grams.join(eligible, Seq("h"))
    val matches = posting
      .select(col("h"), col("doc_id").as("doc_id_1"), col("pos").as("pos_1"))
      .join(posting.select(col("h"), col("doc_id").as("doc_id_2"), col("pos").as("pos_2")), Seq("h"))
      .filter(col("doc_id_1") < col("doc_id_2"))
      .withColumn("diff", col("pos_1") - col("pos_2"))
    val wRun = Window.partitionBy(col("doc_id_1"), col("doc_id_2"), col("diff"))
      .orderBy(col("pos_1"))
    matches
      .withColumn("island", col("pos_1") - row_number().over(wRun))
      .groupBy(col("doc_id_1"), col("doc_id_2"), col("diff"), col("island"))
      .agg(min(col("pos_1")).as("start_1"), min(col("pos_2")).as("start_2"),
        (count(lit(1)) + GramToks - 1).as("run_toks"))
      .filter(col("run_toks") >= MinRunToks)
      .select(col("doc_id_1"), col("doc_id_2"), col("start_1"), col("start_2"), col("run_toks"))
      .orderBy(col("doc_id_1"), col("doc_id_2"), col("start_1"), col("start_2"))
  }

  private lazy val d14OracleSql: String = {
    val grams = s"list_transform(range(1, greatest(len(toks) - $GramToks + 2, 1)), " +
      s"i -> array_to_string(list_slice(toks, i, i + $GramToks - 1), ' '))"
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |g AS (
       | SELECT doc_id, CAST(generate_subscripts($grams, 1) AS BIGINT) AS pos,
       |  CAST(('0x' || substr(md5(unnest($grams)), 1, 15)) AS BIGINT) AS h
       | FROM t),
       |el AS (SELECT h FROM g GROUP BY h
       |  HAVING count(DISTINCT doc_id) BETWEEN 2 AND $MaxGramDf),
       |m AS (
       | SELECT a.doc_id AS d1, b.doc_id AS d2, a.pos AS p1, b.pos AS p2
       | FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id
       | WHERE a.h IN (SELECT h FROM el)),
       |r AS (
       | SELECT d1, d2, p1, p2, p1 - p2 AS diff,
       |  p1 - row_number() OVER (PARTITION BY d1, d2, p1 - p2 ORDER BY p1) AS island
       | FROM m)
       |SELECT d1 AS doc_id_1, d2 AS doc_id_2, CAST(min(p1) AS BIGINT) AS start_1,
       | CAST(min(p2) AS BIGINT) AS start_2,
       | CAST(count(*) + $GramToks - 1 AS BIGINT) AS run_toks
       |FROM r GROUP BY d1, d2, diff, island
       |HAVING count(*) + $GramToks - 1 >= $MinRunToks
       |ORDER BY 1, 2, 3, 4""".stripMargin
  }

  // ---------------------------------------------------------------- d15

  /** `d15_prototype_prune`: embedding-geometry data pruning — the
    * prototypicality policy of "Beyond neural scaling laws" (Sorscher et
    * al.): within each k-means cell, rank members by cosine to their
    * centroid (rank 1 = most prototypical, the example the cluster can
    * best afford to lose when data is ABUNDANT) and prune the most
    * prototypical tercile. The geometric complement of the family's
    * other two pruning axes: d12 drops near-DUPLICATES, t19 drops by
    * LM-score — d15 drops by typicality. Rank/bucket arithmetic is
    * t19's exact-integer form (`bucket = ((rank-1)·3) div n`, ties on
    * vec_id, tercile sizes differ by ≤1), shipped policy keeps buckets
    * 1-2.
    *
    * Scale: assignment is the one broadcast-model cosineMatrix pass
    * (s6's shape); the per-cell rank runs on the t19/t12 distributed
    * range-partition machinery — never a bare `partitionBy(cell)` window
    * that would buffer an n/k-sized cell in one sort task. */
  def d15PrototypePrune(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (cents, data) = Similarity.kmeansWithData(spark, dir)
    val asg = Similarity.assignCells(data, cents)
      .select(col("vec_id"), col("cell"), col("cell_cos_e6"))
    val ranged = asg
      .repartitionByRange(col("cell"), col("cell_cos_e6").desc, col("vec_id"))
      .sortWithinPartitions(col("cell"), col("cell_cos_e6").desc, col("vec_id"))
      .withColumn("rid", spark_partition_id())
      .localCheckpoint(true) // feeds offsets, per-cell totals AND ranks
    val offs = ranged.groupBy(col("rid"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cbase", coalesce(sum(col("cnt")).over(
        Window.partitionBy(col("cell")).orderBy(col("rid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("rid"), col("cell"), col("cbase"))
    val nPer = ranged.groupBy(col("cell")).agg(count(lit(1)).as("n_cell"))
    val wRun = Window.partitionBy(col("rid"), col("cell"))
      .orderBy(col("cell_cos_e6").desc, col("vec_id"))
    ranged.join(broadcast(offs), Seq("rid", "cell"))
      .withColumn("rank_in_cell", (col("cbase") + row_number().over(wRun)).cast("long"))
      .join(broadcast(nPer), Seq("cell"))
      .withColumn("bucket", expr("((rank_in_cell - 1) * 3) div n_cell"))
      .withColumn("is_kept", when(col("bucket") >= 1, 1L).otherwise(0L))
      .select(col("vec_id"), col("cell"), col("cell_cos_e6").as("cos_e6"),
        col("rank_in_cell"), col("n_cell"), col("bucket"), col("is_kept"))
      .orderBy(col("vec_id"))
  }

  /** d15 oracle: the injected-centroid assignment (d12's CTEs) + a plain
    * per-cell window replaying the same integer rank/bucket arithmetic. */
  private def d15OracleSql(cents: Seq[(Long, Array[Long])]): String = {
    def cosSql(a: String, b: String) =
      s"""(list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
         | / (sqrt(list_sum(list_transform(list_zip($a, $a), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))))
         |  * sqrt(list_sum(list_transform(list_zip($b, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))))))""".stripMargin
    s"""WITH cents(cid, cent) AS (VALUES
       |  ${Similarity.centroidRowsSql(cents)}),
       |scored AS (
       | SELECT e.vec_id, c.cid, ${cosSql("e.embedding", "c.cent")} AS cos,
       |  row_number() OVER (PARTITION BY e.vec_id
       |    ORDER BY ${cosSql("e.embedding", "c.cent")} DESC, c.cid) AS rn
       | FROM embeddings e CROSS JOIN cents c),
       |asg AS (
       | SELECT vec_id, cid AS cell,
       |  CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_e6
       | FROM scored WHERE rn = 1),
       |r AS (
       | SELECT vec_id, cell, cos_e6,
       |  CAST(row_number() OVER (PARTITION BY cell
       |    ORDER BY cos_e6 DESC, vec_id) AS BIGINT) AS rank_in_cell,
       |  CAST(count(*) OVER (PARTITION BY cell) AS BIGINT) AS n_cell
       | FROM asg)
       |SELECT vec_id, CAST(cell AS BIGINT) AS cell, cos_e6, rank_in_cell, n_cell,
       | ((rank_in_cell - 1) * 3) // n_cell AS bucket,
       | CAST(CASE WHEN ((rank_in_cell - 1) * 3) // n_cell >= 1
       |   THEN 1 ELSE 0 END AS BIGINT) AS is_kept
       |FROM r ORDER BY vec_id""".stripMargin
  }

  /** d12's/d15's entries appear only once their results have materialized
    * (the s3 convention: Verify calls `SparkEntry.markMaterialized` →
    * [[Similarity.confirmD12Materialized]] / confirmD15Materialized);
    * otherwise each degrades to the driver's rows-only check rather than
    * shipping an oracle built from a model no result used. */
  def oracle: Map[String, String] =
    staticOracle ++ (Similarity.confirmedD12Model match {
      case Some(cents) => Map("d12_semantic_dedup" -> d12OracleSql(cents))
      case None => Map.empty
    }) ++ (Similarity.confirmedD15Model match {
      case Some(cents) => Map("d15_prototype_prune" -> d15OracleSql(cents))
      case None => Map.empty
    })

  private val staticOracle: Map[String, String] = Map(
    "d27_weighted_jaccard" -> d27OracleSql,
    "d25_dedup_epochs" -> d25OracleSql,
    "d26_embed_decontam" -> d26OracleSql,
    "d24_df_profile" -> d24OracleSql,
    "d23_banding_sweep" -> d23OracleSql,
    "d22_keeper_policy" -> d22OracleSql,
    "d21_crosslang_dups" -> d21OracleSql,
    "d20_bloom_prefilter" -> d20OracleSql,
    "d19_split_leakage" -> d19OracleSql,
    "d18_dup_spans" -> d18OracleSql,
    "d16_source_overlap" -> d16OracleSql,
    "d17_containment_dedup" -> d17OracleSql,
    "d9_dedup_chunks" -> d9OracleSql,
    "d11_dedup_eval" -> d11Oracle,
    "d14_substring_dedup" -> d14OracleSql,
    "d13_threshold_sweep" -> d13Oracle,
    "d1_dedup_exact" ->
      """SELECT doc_id,
        | md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS norm_hash,
        | count(*) OVER w AS group_size,
        | min(doc_id) OVER w AS keep_doc_id,
        | CASE WHEN doc_id = min(doc_id) OVER w THEN 1 ELSE 0 END AS is_keeper
        |FROM documents
        |WINDOW w AS (PARTITION BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))))""".stripMargin,
    "d2_dedup_ngram" ->
      s"WITH $shinglesCte\n${jaccardSelectSql("")}",
    "d3_dedup_minhash" ->
      s"""WITH $shinglesCte,
         |$minhashCandCte
         |${jaccardSelectSql("JOIN cand ON cd1 = a.doc_id AND cd2 = b.doc_id")}""".stripMargin,
    "d10_dedup_fuzzy" ->
      s"""WITH $shinglesCte,
         |$minhashCandCte,
         |n AS (
         | SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS nt
         | FROM documents)
         |SELECT c.cd1 AS doc_id_1, c.cd2 AS doc_id_2,
         | CAST(levenshtein(n1.nt, n2.nt) AS BIGINT) AS edit_dist,
         | CAST(greatest(length(n1.nt), length(n2.nt)) AS BIGINT) AS max_len,
         | CASE WHEN greatest(length(n1.nt), length(n2.nt)) = 0 THEN 1000000
         |  ELSE CAST(floor((greatest(length(n1.nt), length(n2.nt)) - levenshtein(n1.nt, n2.nt))
         |   * 1000000.0 / greatest(length(n1.nt), length(n2.nt))) AS BIGINT) END AS edit_sim_e6
         |FROM cand c JOIN n n1 ON n1.doc_id = c.cd1 JOIN n n2 ON n2.doc_id = c.cd2
         |WHERE levenshtein(n1.nt, n2.nt) * $EditDen <= greatest(length(n1.nt), length(n2.nt))
         |ORDER BY doc_id_1, doc_id_2""".stripMargin,
    "d4_dedup_simhash" -> d4OracleSql,
    "d6_dedup_clusters" ->
      s"""WITH RECURSIVE $shinglesCte,
         |p AS (${jaccardSelectSql("")}),
         |edges AS (
         | SELECT doc_id_1 AS a, doc_id_2 AS b FROM p
         | UNION ALL SELECT doc_id_2, doc_id_1 FROM p),
         |reach(v, l) AS (
         | SELECT DISTINCT a, a FROM edges
         | UNION
         | SELECT e.a, r.l FROM edges e JOIN reach r ON e.b = r.v),
         |cc AS (SELECT v AS doc_id, min(l) AS cluster_id FROM reach GROUP BY v)
         |SELECT doc_id, cluster_id,
         | CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END AS is_keeper,
         | count(*) OVER (PARTITION BY cluster_id) AS cluster_size
         |FROM cc ORDER BY doc_id""".stripMargin,
    "d5_dedup_embed" -> d5OracleSql,
    "d7_embed_clusters" -> d7OracleSql,
    "d8_dedup_incremental" -> d8OracleSql)

  /** d8 oracle: the d2 pair SQL restricted to pairs touching the batch
    * (the same "at least one new" set the side-cased prefix join emits),
    * then the per-new-doc verdict aggregation. Bucket SQL matches
    * t5_hash_split's convention exactly. */
  private lazy val d8OracleSql: String = {
    def isNewSql(x: String) =
      s"CAST(('0x' || substr(md5(CAST($x AS VARCHAR)), 1, 15)) AS BIGINT) % 100 >= $NewBucketMin"
    s"""WITH $shinglesCte,
       |p AS (${jaccardSelectSql(s"WHERE ${isNewSql("a.doc_id")} OR ${isNewSql("b.doc_id")}")}),
       |m AS (
       | SELECT doc_id_1 AS doc_id, doc_id_2 AS other, jaccard_e6 FROM p WHERE ${isNewSql("doc_id_1")}
       | UNION ALL
       | SELECT doc_id_2, doc_id_1, jaccard_e6 FROM p WHERE ${isNewSql("doc_id_2")}),
       |agg AS (
       | SELECT doc_id,
       |  CAST(sum(CASE WHEN NOT (${isNewSql("other")}) THEN 1 ELSE 0 END) AS BIGINT) AS n_corpus_dups,
       |  CAST(sum(CASE WHEN ${isNewSql("other")} THEN 1 ELSE 0 END) AS BIGINT) AS n_batch_dups,
       |  CAST(sum(CASE WHEN (${isNewSql("other")}) AND other < doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_prior
       | FROM m GROUP BY doc_id),
       |best AS (
       | SELECT doc_id, other AS best_match_id, jaccard_e6 AS best_jaccard_e6 FROM (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY jaccard_e6 DESC, other) AS rn
       |  FROM m) WHERE rn = 1),
       |nd AS (SELECT doc_id FROM documents WHERE ${isNewSql("doc_id")})
       |SELECT nd.doc_id AS doc_id,
       | coalesce(agg.n_corpus_dups, 0) AS n_corpus_dups,
       | coalesce(agg.n_batch_dups, 0) AS n_batch_dups,
       | best.best_match_id, best.best_jaccard_e6,
       | CAST(CASE WHEN coalesce(agg.n_corpus_dups, 0) = 0
       |   AND coalesce(agg.n_prior, 0) = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_kept
       |FROM nd LEFT JOIN agg USING (doc_id) LEFT JOIN best USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** d5 oracle: the SAME 16x4 hyperplane banding (planes injected as the
    * identical double literals), then exact-cosine confirm — mirrors the
    * Spark plan the way d3's oracle mirrors its minhash banding. */
  /** The d5 banded-pair SQL split as (CTEs, pair-select-without-ORDER-BY)
    * so d5 uses it directly and d7 embeds it as a CTE. */
  private lazy val d5PairSql: (String, String) = {
    val pl = Similarity.planesFor(EmbedBands * EmbedPlanesPerBand)
    def dotSql(p: Int) =
      s"list_sum(list_transform(list_zip(embedding, ${Similarity.planeSqlFor(pl(p))}), x -> CAST(x[1] AS DOUBLE) * x[2]))"
    val bandSelects = (0 until EmbedBands).map { b =>
      val bits = (0 until EmbedPlanesPerBand).map(i =>
        s"(CASE WHEN ${dotSql(b * EmbedPlanesPerBand + i)} > 0 THEN ${1L << i} ELSE 0 END)")
        .mkString(" + ")
      s"SELECT vec_id, $b AS band, $bits AS sig FROM embeddings"
    }.mkString("\n UNION ALL ")
    def cosSql(a: String, b: String) =
      s"""(list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
         | / (sqrt(list_sum(list_transform(list_zip($a, $a), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))))
         |  * sqrt(list_sum(list_transform(list_zip($b, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))))))""".stripMargin
    val ctes =
      s"""sigs AS (
         |$bandSelects),
         |cand AS (
         | SELECT DISTINCT s1.vec_id AS v1, s2.vec_id AS v2
         | FROM sigs s1 JOIN sigs s2 ON s1.band = s2.band AND s1.sig = s2.sig
         |  AND s1.vec_id < s2.vec_id)""".stripMargin
    val select =
      s"""SELECT c.v1 AS vec_id_1, c.v2 AS vec_id_2,
         | CAST(floor(${cosSql("a.embedding", "b.embedding")} * 1000000.0) AS BIGINT) AS cos_e6
         |FROM cand c JOIN embeddings a ON a.vec_id = c.v1 JOIN embeddings b ON b.vec_id = c.v2
         |WHERE ${cosSql("a.embedding", "b.embedding")} >= $CosineTau""".stripMargin
    (ctes, select)
  }

  private lazy val d5OracleSql: String =
    s"WITH ${d5PairSql._1}\n${d5PairSql._2}\nORDER BY vec_id_1, vec_id_2"

  /** d7 oracle: the d5 pair SQL as a CTE, closed transitively with the
    * same recursive reach the d6 oracle uses. */
  private lazy val d7OracleSql: String =
    s"""WITH RECURSIVE ${d5PairSql._1},
       |p AS (${d5PairSql._2}),
       |edges AS (
       | SELECT vec_id_1 AS a, vec_id_2 AS b FROM p
       | UNION ALL SELECT vec_id_2, vec_id_1 FROM p),
       |reach(v, l) AS (
       | SELECT DISTINCT a, a FROM edges
       | UNION
       | SELECT e.a, r.l FROM edges e JOIN reach r ON e.b = r.v),
       |cc AS (SELECT v AS vec_id, min(l) AS cluster_id FROM reach GROUP BY v)
       |SELECT vec_id, cluster_id,
       | CASE WHEN vec_id = cluster_id THEN 1 ELSE 0 END AS is_keeper,
       | count(*) OVER (PARTITION BY cluster_id) AS cluster_size
       |FROM cc ORDER BY vec_id""".stripMargin

  private lazy val d4OracleSql: String = {
    val sums = (for { j <- 0 until 4; b <- 0 until 16 }
      yield s"sum((v$j >> $b) & 1) AS s${j}_$b").mkString(",\n  ")
    val chunks = (0 until 4).map { j =>
      (0 until 16).map(b =>
        s"(CASE WHEN 2 * s${j}_$b - nw > 0 THEN ${1L << b} ELSE 0 END)")
        .mkString("(", " + ", s") AS c$j")
    }.mkString(",\n  ")
    s"""WITH w AS (
       | SELECT doc_id, unnest(toks) AS word
       | FROM (SELECT doc_id, $toksSql AS toks FROM documents)),
       |h AS (
       | SELECT doc_id,
       |  CAST(('0x' || substr(md5(word), 1, 4)) AS BIGINT) AS v0,
       |  CAST(('0x' || substr(md5(word), 5, 4)) AS BIGINT) AS v1,
       |  CAST(('0x' || substr(md5(word), 9, 4)) AS BIGINT) AS v2,
       |  CAST(('0x' || substr(md5(word), 13, 4)) AS BIGINT) AS v3
       | FROM w),
       |agg AS (
       | SELECT doc_id, count(*) AS nw,
       |  $sums
       | FROM h GROUP BY doc_id),
       |sim AS (
       | SELECT doc_id,
       |  $chunks
       | FROM agg),
       |cand AS (
       | SELECT DISTINCT a.doc_id d1, b.doc_id d2,
       |  bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1))
       |  + bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3)) AS hamming
       | FROM sim a JOIN sim b ON a.doc_id < b.doc_id
       |  AND (a.c0 = b.c0 OR a.c1 = b.c1 OR a.c2 = b.c2 OR a.c3 = b.c3)),
       |near AS (
       | SELECT doc_id, count(*) AS n3 FROM (
       |  SELECT d1 AS doc_id FROM cand WHERE hamming <= $HammingTau
       |  UNION ALL SELECT d2 FROM cand WHERE hamming <= $HammingTau)
       | GROUP BY doc_id)
       |SELECT s.doc_id, c0, c1, c2, c3, coalesce(n3, 0) AS n_near3
       |FROM sim s LEFT JOIN near ON s.doc_id = near.doc_id""".stripMargin
  }

  /** `d11_dedup_eval`: candidate-stage quality monitoring for the
    * near-dup pipeline — s8's recall-SLO idea applied to dedup. The LSH
    * band candidates (d3's stage 1) are scored against the exact-confirm
    * truth (d2's full prefix-join pairs): `recall_e6` = truth pairs the
    * bands caught (missed dupes survive dedup — the quality risk);
    * `precision_e6` = candidates that confirm (wasted confirm work — the
    * cost dial; band count/width trades one against the other). One
    * 1-row report; both inputs are the already-scale-correct d2/d3
    * frames sharing ONE checkpointed shingle-array table, and the eval
    * adds only pair-keyed semi-joins and count aggregates — nothing
    * fact-sized beyond what d2 itself does. Division guards are NULLs,
    * mirrored as NULLIF in the oracle. */
  def d11DedupEval(spark: SparkSession, dir: String): DataFrame = {
    val arrays = shingleArrays(spark, dir).localCheckpoint(true)
    val truth = jaccardPairs(arrays, None, alreadyCheckpointed = true)
      .select(col("doc_id_1"), col("doc_id_2")).localCheckpoint(true)
    val cand = minhashCandidates(arrays).localCheckpoint(true)
    val hits = cand.join(truth,
      cand("d1") === truth("doc_id_1") && cand("d2") === truth("doc_id_2"),
      "left_semi")
    def n(df: DataFrame, as: String) = df.agg(count(lit(1)).as(as))
    def ratio(num: Column, den: Column) =
      when(den === 0, lit(null).cast("long"))
        .otherwise(floor(num * lit(1000000.0) / den).cast("long"))
    n(truth, "n_truth").crossJoin(n(cand, "n_cand")).crossJoin(n(hits, "n_hit"))
      .select(col("n_truth"), col("n_cand"), col("n_hit"),
        ratio(col("n_hit"), col("n_cand")).as("precision_e6"),
        ratio(col("n_hit"), col("n_truth")).as("recall_e6"))
  }

  // lazy: referenced by the `oracle` map declared ABOVE this definition
  private lazy val d11Oracle: String =
    s"""WITH $shinglesCte,
       |$minhashCandCte,
       |truth AS (SELECT doc_id_1, doc_id_2 FROM (${jaccardSelectSql("")})),
       |h AS (
       | SELECT count(*) AS n_hit FROM cand c
       | JOIN truth t ON c.cd1 = t.doc_id_1 AND c.cd2 = t.doc_id_2)
       |SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
       | CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_cand,
       | CAST(n_hit AS BIGINT) AS n_hit,
       | CAST(floor(n_hit * 1000000.0 / NULLIF((SELECT count(*) FROM cand), 0)) AS BIGINT) AS precision_e6,
       | CAST(floor(n_hit * 1000000.0 / NULLIF((SELECT count(*) FROM truth), 0)) AS BIGINT) AS recall_e6
       |FROM h""".stripMargin

  /** `d16_source_overlap`: the source×source near-duplication matrix —
    * which sources copy from which (mirror sites, syndicated feeds,
    * scrape-of-a-scrape), the provenance telemetry that drives corpus
    * mixing decisions the way t9 drives rates. One row per unordered
    * source pair that shares at least one d2-grade near-dup pair
    * (diagonal = within-source duplication): pair count, floor-e6 mean
    * and max Jaccard.
    *
    * Scale: the pair table is d2's prefix-filtered exact-Jaccard output
    * (LSH-bounded, never n²); the source attribution joins that
    * PAIR-GRAINED table against the two-column doc→source projection on
    * the doc key, and the matrix itself is |sources|² at most — nothing
    * here adds fact-sized work to d2's. */
  def d16SourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val pairs = d2DedupNgram(spark, dir)
      .select(col("doc_id_1"), col("doc_id_2"), col("jaccard_e6"))
    val src = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("doc_id_1"), col("source").as("s1")), Seq("doc_id_1"))
      .join(src.select(col("doc_id").as("doc_id_2"), col("source").as("s2")), Seq("doc_id_2"))
      .select(least(col("s1"), col("s2")).as("source_a"),
        greatest(col("s1"), col("s2")).as("source_b"), col("jaccard_e6"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_dup_pairs"),
        sum(col("jaccard_e6")).as("sum_j"), max(col("jaccard_e6")).as("max_jaccard_e6"))
      .select(col("source_a"), col("source_b"), col("n_dup_pairs"),
        expr("sum_j div n_dup_pairs").as("avg_jaccard_e6"), col("max_jaccard_e6"))
      .orderBy(col("source_a"), col("source_b"))
  }

  private lazy val d16OracleSql: String =
    s"""WITH $shinglesCte,
       |p AS (${jaccardSelectSql("")}),
       |e AS (
       | SELECT least(s1.source, s2.source) AS source_a,
       |  greatest(s1.source, s2.source) AS source_b, p.jaccard_e6
       | FROM p JOIN documents s1 ON s1.doc_id = p.doc_id_1
       |  JOIN documents s2 ON s2.doc_id = p.doc_id_2)
       |SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_dup_pairs,
       | CAST(sum(jaccard_e6) // count(*) AS BIGINT) AS avg_jaccard_e6,
       | max(jaccard_e6) AS max_jaccard_e6
       |FROM e GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin

  // ---------------------------------------------------------------- d17

  /** `d17_containment_dedup`: asymmetric containment dedup (Broder's
    * containment, not resemblance) — the quote/subset modality the rest
    * of the family is blind to. A short document pasted verbatim into a
    * much longer one has Jaccard ≈ |A|/|B| (d2/d3 under-score it to
    * nothing as |B| grows), and d9's CDC chunks only see it when chunk
    * boundaries cooperate; containment C(A→B) = |S(A)∩S(B)|/|S(A)| stays
    * ≈ 1 at ANY size ratio. Emits every ORDERED pair (contained,
    * container) with C ≥ [[TauCNum]]/[[TauCDen]], with the Jaccard
    * alongside so the asymmetric catch is visible (high containment, low
    * jaccard = subset pair, not near-twin).
    *
    * Exact, not approximate, via an asymmetric prefix filter: if
    * C(A→B) ≥ τ then A shares ≥ ceil(τ·|A|) shingles with B, so at least
    * one of A's |A| − ceil(τ·|A|) + 1 RAREST shingles (the d2 canonical
    * (df, hash) order makes the prefix maximally selective) appears in
    * B — candidates are A-prefix × FULL posting lists, then an exact
    * intersect confirm on candidates only.
    *
    * Scale: the container side cannot be prefix-pruned (the matched
    * subset may sit anywhere in its shingle order), so its hot-shingle
    * posting lists get a HASH-block skew guard: each full posting row
    * lands in block md5(h:doc) % nblk (nblk = ceil(df / blockSize) from
    * the d2-pattern partial-aggregated df table, broadcast while it
    * fits), and each A-prefix row replicates to all nblk blocks of its
    * shingle — every (a, b) pair meets in exactly one block, any single
    * task generates ~prefix×blockSize pairs, and no row_number window
    * ever buffers a hot posting list (AQE cannot split a single join
    * key; the hash block can). Replication is paid by the SMALL side
    * (prefixes), opposite to d2's triangle split, because here only one
    * side is prefix-bounded. */
  def d17ContainmentDedup(spark: SparkSession, dir: String): DataFrame = {
    val arrays = shingleArrays(spark, dir).localCheckpoint(true)
    val full = arrays.select(col("doc_id"), explode(col("shingles")).as("h"))
    val dfreq = full.groupBy(col("h")).agg(count(lit(1)).as("df")).localCheckpoint(true)
    val dfreqSide = if (dfreq.count() <= DfreqBroadcastLimit) broadcast(dfreq) else dfreq
    val nblk = expr(s"(df + ${PrefixBlockSize - 1}) div $PrefixBlockSize")
    val prefLen = expr(
      s"cast(n - (($TauCNum * n + ${TauCDen - 1}) div $TauCDen) + 1 as int)")
    val apre = arrays
      .select(col("doc_id").as("d1"),
        explode(slice(col("shingles"), lit(1), prefLen)).as("h"))
      .join(dfreqSide, Seq("h"))
      .select(col("d1"), col("h"),
        explode(sequence(lit(0L), nblk - 1)).as("blk"))
    val bfull = full.join(dfreqSide, Seq("h"))
      .select(col("doc_id").as("d2"), col("h"),
        pmod(md5Long60(concat(col("h").cast("string"), lit(":"),
          col("doc_id").cast("string"))), nblk).as("blk"))
    val cand = apre.join(bfull, Seq("h", "blk"))
      .filter(col("d1") =!= col("d2"))
      .select(col("d1"), col("d2")).distinct()
    cand
      .join(arrays.select(col("doc_id").as("d1"), col("shingles").as("sa"),
        col("n").as("n1")), Seq("d1"))
      .join(arrays.select(col("doc_id").as("d2"), col("shingles").as("sb"),
        col("n").as("n2")), Seq("d2"))
      .withColumn("c", intersectCount(col("sa"), col("sb")))
      .filter(col("c") * lit(TauCDen) >= col("n1") * lit(TauCNum))
      .select(col("d1").as("doc_id_1"), col("d2").as("doc_id_2"),
        col("n1").as("n_shingles_1"), col("n2").as("n_shingles_2"),
        col("c").as("n_common"),
        floor(col("c") * lit(1000000.0) / col("n1")).cast("long")
          .as("containment_e6"),
        floor(col("c") * lit(1000000.0) / (col("n1") + col("n2") - col("c")))
          .cast("long").as("jaccard_e6"))
      .orderBy(col("doc_id_1"), col("doc_id_2"))
  }

  /** d17 oracle: brute-force directed containment over the d2 gram CTEs —
    * the hash-blocked prefix construction must reproduce the textbook
    * all-shared-shingle join exactly. */
  private lazy val d17OracleSql: String =
    s"""WITH $shinglesCte
       |SELECT p.d1 AS doc_id_1, p.d2 AS doc_id_2,
       | n1.n AS n_shingles_1, n2.n AS n_shingles_2, p.c AS n_common,
       | CAST(floor(p.c * 1000000.0 / n1.n) AS BIGINT) AS containment_e6,
       | CAST(floor(p.c * 1000000.0 / (n1.n + n2.n - p.c)) AS BIGINT) AS jaccard_e6
       |FROM (SELECT a.doc_id d1, b.doc_id d2, count(DISTINCT a.h) c
       |      FROM docsh a JOIN docsh b ON a.h = b.h AND a.doc_id <> b.doc_id
       |      GROUP BY 1, 2) p
       | JOIN shn n1 ON p.d1 = n1.doc_id JOIN shn n2 ON p.d2 = n2.doc_id
       |WHERE p.c * $TauCDen >= n1.n * $TauCNum
       |ORDER BY doc_id_1, doc_id_2""".stripMargin

  /** `d18_dup_spans`: d14's maximal duplicated runs turned into the
    * per-document DROP MASK — the step "Deduplicating Training Data
    * Makes Language Models Better" actually trains on: each cross-doc
    * verbatim run keeps its first occurrence (the pair's lower doc_id)
    * and marks the later doc's token range for removal; a document's
    * overlapping ranges merge into disjoint spans (two partners quoting
    * the same passage must not double-count its tokens). Per affected
    * document: merged span count, tokens dropped/kept, e6 drop rate —
    * the numbers a corpus build reports as its dedup yield.
    *
    * Scale: rides d14's posting-bounded run table (nothing here re-scans
    * text except the one n_toks projection); the interval merge is a
    * per-doc window whose partition cardinality is runs-per-doc —
    * pair-table-grained, orders of magnitude below fact grain, the q12
    * per-key-bounded shape. Span arithmetic is pure integers. */
  def d18DupSpans(spark: SparkSession, dir: String): DataFrame = {
    val spans = d14SubstringDedup(spark, dir)
      .select(col("doc_id_2").as("doc_id"), col("start_2").as("s"),
        (col("start_2") + col("run_toks") - 1).as("e"))
      .distinct() // same span via two partners is one mask entry
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("s"), col("e"))
    val merged = spans
      .withColumn("pmax",
        max(col("e")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_i",
        (col("pmax").isNull || col("s") > col("pmax")).cast("long"))
      .withColumn("island",
        sum(col("new_i")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("s")).as("ms"), max(col("e")).as("me"))
    val perDoc = merged.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("me") - col("ms") + 1).as("drop_toks"))
    val toks = docs(spark, dir)
      .select(col("doc_id"), size(wsTokens(col("text"))).cast("long").as("n_toks"))
    perDoc.join(toks, Seq("doc_id"))
      .select(col("doc_id"), col("n_toks"), col("n_spans"), col("drop_toks"),
        (col("n_toks") - col("drop_toks")).as("keep_toks"),
        expr("drop_toks * 1000000 div n_toks").as("drop_rate_e6"))
      .orderBy(col("doc_id"))
  }

  private lazy val d18OracleSql: String =
    s"""WITH d14 AS (
       |${d14OracleSql}),
       |spans AS (
       | SELECT DISTINCT doc_id_2 AS doc_id, start_2 AS s,
       |  start_2 + run_toks - 1 AS e
       | FROM d14),
       |marked AS (
       | SELECT doc_id, s, e,
       |  max(e) OVER (PARTITION BY doc_id ORDER BY s, e
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
       | FROM spans),
       |isl AS (
       | SELECT doc_id, s, e,
       |  CAST(sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY doc_id ORDER BY s, e
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
       | FROM marked),
       |merged AS (
       | SELECT doc_id, island, min(s) AS ms, max(e) AS me
       | FROM isl GROUP BY 1, 2),
       |per_doc AS (
       | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       |  CAST(sum(me - ms + 1) AS BIGINT) AS drop_toks
       | FROM merged GROUP BY 1),
       |nt AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_toks
       | FROM documents)
       |SELECT doc_id, n_toks, n_spans, drop_toks,
       | n_toks - drop_toks AS keep_toks,
       | drop_toks * 1000000 // n_toks AS drop_rate_e6
       |FROM per_doc JOIN nt USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** d19: t5's stable split rule (md5-bucket 0-79 train / 80-89 val /
    * 90-99 test), duplicated here verbatim so the leakage audit tags
    * documents EXACTLY as the split materializer does — any drift between
    * the two would audit a split nobody built. */
  private def splitOf(idCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val b = md5Long60(idCol.cast("string")) % 100
    when(b < 80, "train").when(b < 90, "val").otherwise("test")
  }

  /** `d19_split_leakage`: NEAR-dup contamination across t5's train/val/
    * test splits — the eval-integrity audit t6's exact-shingle report
    * cannot give: a lightly-edited train document in the test split shares
    * few exact shingles yet makes the eval score a memorization
    * measurement. A hash split is uniform BY DESIGN, so near-dup clusters
    * straddle splits at base rates (~2·p·(1−p) of all dup pairs) — this
    * operator finds each one: every confirmed near-dup pair (d3's full
    * MinHash→LSH→exact-Jaccard pipeline, same τ) with EXACTLY one end in
    * train is normalized to (train_doc, eval_doc) and rolled to the eval
    * grain — per contaminated eval doc: its split, how many train
    * near-dups reach it, the worst (max-Jaccard, ties → lowest id) train
    * offender — the "drop these from eval (or from train)" list — plus
    * `~TOTAL_val`/`~TOTAL_test`/`~TOTAL` rollups, the contamination rate
    * the split is judged by. The worst-offender pick is two aggregates +
    * an equi-join back on (eval_doc, max_jac) — no window, identical
    * arithmetic in both engines.
    *
    * Scale: the pair table is d3's LSH-bounded candidate set (pairs ≪
    * corpus — banding bounds fan-out per bucket, no all-pairs step);
    * split tagging is a projection on that table; everything after runs
    * on the (tiny) cross-split subset, checkpointed once for its three
    * grain consumers. */
  def d19SplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val arrays = shingleArrays(spark, dir).localCheckpoint(true)
    val pairs = jaccardPairs(arrays, Some(minhashCandidates(arrays)),
      alreadyCheckpointed = true)
    val leaks = pairs
      .withColumn("s1", splitOf(col("doc_id_1")))
      .withColumn("s2", splitOf(col("doc_id_2")))
      .filter((col("s1") === "train") =!= (col("s2") === "train"))
      .select(
        when(col("s1") === "train", col("doc_id_1"))
          .otherwise(col("doc_id_2")).as("train_doc"),
        when(col("s1") === "train", col("doc_id_2"))
          .otherwise(col("doc_id_1")).as("eval_doc"),
        when(col("s1") === "train", col("s2")).otherwise(col("s1"))
          .as("split"),
        col("jaccard_e6"))
      .localCheckpoint(true) // cross-split pairs; 3 grain consumers
    val perDocAgg = leaks.groupBy(col("eval_doc"), col("split"))
      .agg(count(lit(1)).as("n_train_dups"),
        max(col("jaccard_e6")).as("worst_jac_e6"))
    val perDoc = perDocAgg
      .join(leaks.select(col("eval_doc"), col("jaccard_e6").as("worst_jac_e6"),
        col("train_doc")), Seq("eval_doc", "worst_jac_e6"))
      .groupBy(col("eval_doc"), col("split"), col("n_train_dups"),
        col("worst_jac_e6"))
      .agg(min(col("train_doc")).as("worst_train_doc"))
      .select(col("eval_doc").cast("string").as("key"), col("split"),
        lit(1L).as("n_docs"), col("n_train_dups"), col("worst_train_doc"),
        col("worst_jac_e6"))
      .localCheckpoint(true) // eval-doc grain; per-split + total read it
    val perSplit = perDoc.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_train_dups")).as("n_train_dups"),
        max(col("worst_jac_e6")).as("worst_jac_e6"))
      .select(concat(lit("~TOTAL_"), col("split")).as("key"), col("split"),
        col("n_docs"), col("n_train_dups"), lit(-1L).as("worst_train_doc"),
        col("worst_jac_e6"))
    val totRow = perDoc
      .agg(count(lit(1)).as("n_docs"), sum(col("n_train_dups")).as("n_train_dups"),
        max(col("worst_jac_e6")).as("worst_jac_e6"))
      .select(lit("~TOTAL").as("key"), lit("~TOTAL").as("split"),
        col("n_docs"), coalesce(col("n_train_dups"), lit(0L)).as("n_train_dups"),
        lit(-1L).as("worst_train_doc"),
        coalesce(col("worst_jac_e6"), lit(-1L)).as("worst_jac_e6"))
    perDoc.unionByName(perSplit).unionByName(totRow).orderBy(col("key"))
  }

  private lazy val d19OracleSql: String =
    s"""WITH $shinglesCte,
       |$minhashCandCte,
       |p AS (${jaccardSelectSql("JOIN cand ON cd1 = a.doc_id AND cd2 = b.doc_id")}),
       |sp AS (
       | SELECT doc_id_1, doc_id_2, jaccard_e6,
       |  CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id_1 AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
       |   WHEN CAST(('0x' || substr(md5(CAST(doc_id_1 AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'val'
       |   ELSE 'test' END AS s1,
       |  CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id_2 AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
       |   WHEN CAST(('0x' || substr(md5(CAST(doc_id_2 AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'val'
       |   ELSE 'test' END AS s2
       | FROM p),
       |lk AS (
       | SELECT CASE WHEN s1 = 'train' THEN doc_id_1 ELSE doc_id_2 END AS train_doc,
       |  CASE WHEN s1 = 'train' THEN doc_id_2 ELSE doc_id_1 END AS eval_doc,
       |  CASE WHEN s1 = 'train' THEN s2 ELSE s1 END AS split, jaccard_e6
       | FROM sp WHERE (s1 = 'train') <> (s2 = 'train')),
       |g AS (
       | SELECT eval_doc, split, CAST(count(*) AS BIGINT) AS n_train_dups,
       |  max(jaccard_e6) AS worst_jac_e6
       | FROM lk GROUP BY 1, 2),
       |d AS (
       | SELECT g.eval_doc, g.split, g.n_train_dups, g.worst_jac_e6,
       |  min(l.train_doc) AS worst_train_doc
       | FROM g JOIN lk l ON l.eval_doc = g.eval_doc
       |   AND l.jaccard_e6 = g.worst_jac_e6
       | GROUP BY 1, 2, 3, 4)
       |SELECT key, split, n_docs, n_train_dups, worst_train_doc, worst_jac_e6
       |FROM (
       | SELECT CAST(eval_doc AS VARCHAR) AS key, split,
       |  CAST(1 AS BIGINT) AS n_docs, n_train_dups, worst_train_doc,
       |  worst_jac_e6
       | FROM d
       | UNION ALL
       | SELECT '~TOTAL_' || split, split, CAST(count(*) AS BIGINT),
       |  CAST(sum(n_train_dups) AS BIGINT), CAST(-1 AS BIGINT),
       |  max(worst_jac_e6)
       | FROM d GROUP BY split
       | UNION ALL
       | SELECT '~TOTAL', '~TOTAL', CAST(count(*) AS BIGINT),
       |  COALESCE(CAST(sum(n_train_dups) AS BIGINT), 0),
       |  CAST(-1 AS BIGINT), COALESCE(max(worst_jac_e6), -1)
       | FROM d
       |) ORDER BY key""".stripMargin

  // ---------------------------------------------------------------- d20

  /** d20 bloom geometry. DELIBERATELY small: sized so the false-positive
    * path is actually exercised at the verification scales (sf0.01 lands
    * ~100 corpus keys per shard in 512 bits → a measurable fp rate) — a
    * production deploy sizes ~10 bits/key for ~1% fp and grows capacity
    * by ADDING SHARDS, never by rebuilding: the shard count is the dial
    * that scales the filter with the corpus while each probe still
    * touches exactly one shard's 16 words. */
  final val D20Shards = 4L
  final val D20Bits = 512L
  final val D20WordBits = 32L // p23's idiom: the sign bit never carries a mask
  final val D20Hashes = 3

  /** `d20_bloom_prefilter`: the membership PRE-FILTER in front of
    * incremental dedup — before d8's pairwise near-dup machinery runs, a
    * daily batch is screened against a sharded bloom filter of the
    * corpus's exact normalized-text hashes ("have we seen this content
    * before"), the gate every crawl pipeline runs first: at 100 TB the
    * corpus hash set is a join you do not want to pay per batch, while
    * its bloom ships broadcast in KBs and answers most probes without
    * touching the corpus at all. Same batch/corpus split as d8
    * ([[isNewDoc]]). Per new-batch doc: its shard, the bloom verdict
    * (`admitted` — must go to exact confirmation), the exact truth
    * (`truly_dup`, the audit a deploy runs on a sample), and the
    * false-positive flag; a `~TOTAL` row carries the counts and the e6
    * fp rate over the batch. False negatives are impossible by
    * construction and pinned in-result (truly_dup ⇒ admitted; the spec
    * replays the whole filter bit-for-bit).
    *
    * Scale: the corpus is scanned ONCE to build the bloom, which
    * collapses to ≤ shards×(D20Bits/32) = shards×16 words at the FIRST shuffle (bit_or
    * partials — p23's exact signed-64 idiom, identical in DuckDB); the
    * bloom then attaches BROADCAST to the batch's probe rows, so
    * screening is one batch-sized map join — no corpus-sized side ever
    * reaches the probe. The truth audit joins hash-to-hash (equi,
    * shuffle on the 60-bit key), test-scale verification work. */
  def d20BloomPrefilter(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.{md5Long60, normText}
    val hashed = docs(spark, dir)
      .select(col("doc_id"), md5Long60(normText(col("text"))).as("h"))
      .withColumn("shard", pmod(col("h"), lit(D20Shards)))
      .localCheckpoint(true) // one corpus scan; bloom + probes + truth read it
    val corpus = hashed.filter(!isNewDoc(col("doc_id")))
    val batch = hashed.filter(isNewDoc(col("doc_id")))
    def positions(h: Column): Column =
      pmod(md5Long60(concat_ws("|", lit("d20"), col("i"), h)), lit(D20Bits))
    val bloom = corpus
      .select(col("shard"), col("h"),
        explode(expr(s"sequence(0, ${D20Hashes - 1})")).as("i"))
      .withColumn("pos", positions(col("h")))
      .groupBy(col("shard"), expr(s"pos div $D20WordBits").as("word"))
      .agg(expr(s"bit_or(shiftleft(CAST(1 AS BIGINT), " +
        s"CAST(pos % $D20WordBits AS INT)))").as("bits"))
    val probes = batch
      .select(col("doc_id"), col("shard"), col("h"),
        explode(expr(s"sequence(0, ${D20Hashes - 1})")).as("i"))
      .withColumn("pos", positions(col("h")))
      .withColumn("word", expr(s"pos div $D20WordBits"))
      .withColumn("pmask",
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pos % $D20WordBits AS INT))"))
      .join(broadcast(bloom), Seq("shard", "word"), "left")
      .withColumn("hit",
        when(coalesce(col("bits"), lit(0L)).bitwiseAND(col("pmask")) =!= 0L,
          1L).otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(when(sum(col("hit")) === D20Hashes.toLong, 1L).otherwise(0L)
        .as("admitted"))
    val truth = batch.join(corpus.select(col("h")).distinct(), Seq("h"),
        "left_semi")
      .select(col("doc_id"), lit(1L).as("truly_dup"))
    val per = batch.select(col("doc_id"), col("shard"))
      .join(probes, Seq("doc_id"))
      .join(truth, Seq("doc_id"), "left")
      .select(col("doc_id").cast("string").as("key"), col("shard"),
        col("admitted"), coalesce(col("truly_dup"), lit(0L)).as("truly_dup"),
        (col("admitted") - coalesce(col("truly_dup"), lit(0L)))
          .as("false_pos"), lit(null).cast("long").as("fp_rate_e6"))
      .localCheckpoint(true) // batch-sized; total row reads it
    val tot = per.agg(count(lit(1)).as("n"), sum(col("admitted")).as("adm"),
        sum(col("truly_dup")).as("dup"), sum(col("false_pos")).as("fp"))
      .select(lit("~TOTAL").as("key"), lit(null).cast("long").as("shard"),
        col("adm").as("admitted"), col("dup").as("truly_dup"),
        col("fp").as("false_pos"),
        expr("fp * CAST(1000000 AS DECIMAL(38,0)) div n").as("fp_rate_e6"))
    per.unionByName(tot).orderBy(col("key"))
  }

  private lazy val d20OracleSql: String =
    s"""WITH hashed AS (
       | SELECT doc_id,
       |  CAST(('0x' || substr(md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))), 1, 15)) AS BIGINT) AS h,
       |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 >= $NewBucketMin AS is_new
       | FROM documents),
       |sh AS (SELECT doc_id, h, h % $D20Shards AS shard, is_new FROM hashed),
       |pos AS (
       | SELECT doc_id, h, shard, is_new, i,
       |  CAST(('0x' || substr(md5('d20|' || CAST(i AS VARCHAR) || '|' ||
       |    CAST(h AS VARCHAR)), 1, 15)) AS BIGINT) % $D20Bits AS pos
       | FROM (SELECT *, unnest(range($D20Hashes)) AS i FROM sh)),
       |bloom AS (
       | SELECT shard, pos // $D20WordBits AS word,
       |  bit_or(1::BIGINT << CAST(pos % $D20WordBits AS INTEGER)) AS bits
       | FROM pos WHERE NOT is_new GROUP BY 1, 2),
       |probe AS (
       | SELECT p.doc_id,
       |  CASE WHEN sum(CASE WHEN COALESCE(b.bits, 0) &
       |    (1::BIGINT << CAST(p.pos % $D20WordBits AS INTEGER)) <> 0
       |    THEN 1 ELSE 0 END) = $D20Hashes THEN 1 ELSE 0 END AS admitted
       | FROM pos p LEFT JOIN bloom b
       |  ON b.shard = p.shard AND b.word = p.pos // $D20WordBits
       | WHERE p.is_new GROUP BY 1),
       |truth AS (
       | SELECT DISTINCT b.doc_id FROM sh b
       | WHERE b.is_new AND EXISTS (
       |  SELECT 1 FROM sh c WHERE NOT c.is_new AND c.h = b.h)),
       |per AS (
       | SELECT CAST(s.doc_id AS VARCHAR) AS key, s.shard,
       |  CAST(p.admitted AS BIGINT) AS admitted,
       |  CAST(CASE WHEN t.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS truly_dup,
       |  CAST(p.admitted - CASE WHEN t.doc_id IS NULL THEN 0 ELSE 1 END
       |    AS BIGINT) AS false_pos,
       |  CAST(NULL AS BIGINT) AS fp_rate_e6
       | FROM sh s JOIN probe p ON p.doc_id = s.doc_id
       |  LEFT JOIN truth t ON t.doc_id = s.doc_id
       | WHERE s.is_new)
       |SELECT * FROM per
       |UNION ALL
       |SELECT '~TOTAL', CAST(NULL AS BIGINT),
       | CAST(sum(admitted) AS BIGINT), CAST(sum(truly_dup) AS BIGINT),
       | CAST(sum(false_pos) AS BIGINT),
       | CAST(CAST(sum(false_pos) AS HUGEINT) * 1000000 // count(*) AS BIGINT)
       |FROM per
       |ORDER BY key""".stripMargin

  // ---------------------------------------------------------------- d21

  /** `d21_crosslang_dups`: cross-language near-duplicate audit — d2's
    * exact near-dup pairs gated to documents whose LABELED languages
    * differ, each side enriched with t3's predicted language and the
    * pair classified: `cross_lingual` (both predictions confirm their
    * labels — genuinely near-identical content under two language tags:
    * shared boilerplate, templated numbers, translation skeletons),
    * `mislabel_1`/`mislabel_2` (exactly one side's prediction disagrees
    * with its label — the metadata, not the content, is wrong), or
    * `both_mislabeled`. The blind spot this audits is structural:
    * production dedup SHARDS BY LANGUAGE (the only way per-language
    * corpora stay independently rebuildable), so a near-dup pair
    * straddling two lang tags survives every per-shard pass — and a
    * lang mislabel additionally poisons language-balanced sampling
    * (t9/t28 read those tags). This is the d16 composition pattern
    * pointed at the lang axis with t3's verified predictor as the
    * adjudicator.
    *
    * Scale: the pair table is d2's prefix-filtered exact-Jaccard output
    * (LSH/posting-bounded, never n²); t3 is ONE documents scan; the
    * attribution is two doc-key equi-joins of the pair-grained table
    * against t3's three-column projection — nothing here adds
    * fact-sized work to what d2 + t3 already pay, and the verdict is a
    * per-row CASE. */
  def d21CrosslangDups(spark: SparkSession, dir: String): DataFrame = {
    val pairs = d2DedupNgram(spark, dir)
      .select(col("doc_id_1"), col("doc_id_2"), col("jaccard_e6"))
    val t3 = TextAnalysis.t3LangId(spark, dir)
      .select(col("doc_id"), col("labeled_lang"), col("predicted_lang"))
    val a = t3.select(col("doc_id").as("doc_id_1"),
      col("labeled_lang").as("lang_1"), col("predicted_lang").as("pred_1"))
    val b = t3.select(col("doc_id").as("doc_id_2"),
      col("labeled_lang").as("lang_2"), col("predicted_lang").as("pred_2"))
    pairs.join(a, Seq("doc_id_1")).join(b, Seq("doc_id_2"))
      .filter(col("lang_1") =!= col("lang_2"))
      .select(col("doc_id_1"), col("doc_id_2"),
        col("lang_1"), col("lang_2"), col("pred_1"), col("pred_2"),
        col("jaccard_e6"),
        when(col("pred_1") === col("lang_1") && col("pred_2") === col("lang_2"),
          lit("cross_lingual"))
          .when(col("pred_1") =!= col("lang_1") && col("pred_2") === col("lang_2"),
            lit("mislabel_1"))
          .when(col("pred_1") === col("lang_1") && col("pred_2") =!= col("lang_2"),
            lit("mislabel_2"))
          .otherwise(lit("both_mislabeled")).as("verdict"))
      .orderBy(col("doc_id_1"), col("doc_id_2"))
  }

  private lazy val d21OracleSql: String =
    s"""WITH $shinglesCte,
       |p AS (${jaccardSelectSql("")}),
       |t3 AS (
       |${TextAnalysis.t3OracleSql})
       |SELECT p.doc_id_1, p.doc_id_2,
       | a.labeled_lang AS lang_1, b.labeled_lang AS lang_2,
       | a.predicted_lang AS pred_1, b.predicted_lang AS pred_2,
       | p.jaccard_e6,
       | CASE
       |  WHEN a.predicted_lang = a.labeled_lang
       |   AND b.predicted_lang = b.labeled_lang THEN 'cross_lingual'
       |  WHEN a.predicted_lang <> a.labeled_lang
       |   AND b.predicted_lang = b.labeled_lang THEN 'mislabel_1'
       |  WHEN a.predicted_lang = a.labeled_lang
       |   AND b.predicted_lang <> b.labeled_lang THEN 'mislabel_2'
       |  ELSE 'both_mislabeled' END AS verdict
       |FROM p JOIN t3 a ON a.doc_id = p.doc_id_1
       | JOIN t3 b ON b.doc_id = p.doc_id_2
       |WHERE a.labeled_lang <> b.labeled_lang
       |ORDER BY p.doc_id_1, p.doc_id_2""".stripMargin

  // ---------------------------------------------------------------- d22

  /** `d22_keeper_policy`: which representative each near-dup cluster
    * should KEEP — the min-id policy d1/d6 apply (cheap, deterministic,
    * join-free) audited against the quality policy a curated corpus
    * actually wants (keep the highest t2 quality score; tie → min id).
    * Per cluster: size, both keepers, both keepers' scores, the quality
    * left on the table (`delta_e6 = q_best − q_minid`) and a changed
    * flag; `~TOTAL` conserves members/changed/deltas. The audit that
    * decides whether upgrading the keeper election is worth a quality
    * join at the next corpus build — run BEFORE flipping a policy that
    * changes which bytes 10¹¹ training docs contribute.
    *
    * Scale: clusters are d6's pair-bounded components (docs in near-dup
    * pairs only — never the whole corpus); quality attaches by ONE
    * doc-key equi-join of that bounded set against t2's two-column
    * projection; both elections collapse in ONE per-cluster aggregate
    * with map-side partials — the argmax is `max(struct(q, −doc))`, no
    * window, no join-back (the oracle states the textbook
    * max-then-join-back form; hash-matching proves the rewrite). */
  def d22KeeperPolicy(spark: SparkSession, dir: String): DataFrame = {
    val cl = d6DedupClusters(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
    val q = TextAnalysis.t2TextQuality(spark, dir)
      .select(col("doc_id"), col("quality_score_e6").as("q"))
    val per = cl.join(q, Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        max(when(col("doc_id") === col("cluster_id"), col("q")))
          .as("q_minid_e6"),
        max(struct(col("q").as("q"), (-col("doc_id")).as("nd"))).as("best"))
      .select(col("cluster_id"), col("n_members"), col("q_minid_e6"),
        col("best.q").as("q_best_e6"), (-col("best.nd")).as("keeper_quality"))
      .withColumn("changed",
        (col("keeper_quality") =!= col("cluster_id")).cast("long"))
      .withColumn("delta_e6", col("q_best_e6") - col("q_minid_e6"))
      .localCheckpoint(true) // cluster-grained; both grains below read it
    val rows = per.select(col("cluster_id").cast("string").as("key"),
      col("n_members"), col("changed"),
      col("cluster_id").as("keeper_minid"), col("keeper_quality"),
      col("q_minid_e6"), col("q_best_e6"), col("delta_e6"))
    val tot = per.agg(sum(col("n_members")).as("n_members"),
        sum(col("changed")).as("changed"),
        sum(col("q_minid_e6")).as("q_minid_e6"),
        sum(col("q_best_e6")).as("q_best_e6"),
        sum(col("delta_e6")).as("delta_e6"))
      .select(lit("~TOTAL").as("key"), col("n_members"), col("changed"),
        lit(null).cast("long").as("keeper_minid"),
        lit(null).cast("long").as("keeper_quality"),
        col("q_minid_e6"), col("q_best_e6"), col("delta_e6"))
    rows.unionByName(tot).orderBy(col("key"))
  }

  private lazy val d22OracleSql: String =
    s"""WITH RECURSIVE $shinglesCte,
       |p AS (${jaccardSelectSql("")}),
       |edges AS (
       | SELECT doc_id_1 AS a, doc_id_2 AS b FROM p
       | UNION ALL SELECT doc_id_2, doc_id_1 FROM p),
       |reach(v, l) AS (
       | SELECT DISTINCT a, a FROM edges
       | UNION
       | SELECT e.a, r.l FROM edges e JOIN reach r ON e.b = r.v),
       |cc AS (SELECT v AS doc_id, min(l) AS cluster_id FROM reach GROUP BY v),
       |tq AS (
       |${TextAnalysis.t2OracleSql}),
       |j AS (
       | SELECT cc.doc_id, cc.cluster_id, tq.quality_score_e6 AS q
       | FROM cc JOIN tq ON cc.doc_id = tq.doc_id),
       |mx AS (SELECT cluster_id, max(q) AS q_best FROM j GROUP BY 1),
       |bk AS (
       | SELECT j.cluster_id, CAST(min(j.doc_id) AS BIGINT) AS keeper_quality
       | FROM j JOIN mx ON j.cluster_id = mx.cluster_id AND j.q = mx.q_best
       | GROUP BY 1),
       |per AS (
       | SELECT j.cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       |  CAST(max(CASE WHEN j.doc_id = j.cluster_id THEN j.q END) AS BIGINT)
       |    AS q_minid_e6
       | FROM j GROUP BY 1),
       |full_rows AS (
       | SELECT per.cluster_id, per.n_members,
       |  CAST(CASE WHEN bk.keeper_quality <> per.cluster_id THEN 1 ELSE 0 END
       |    AS BIGINT) AS changed,
       |  CAST(per.cluster_id AS BIGINT) AS keeper_minid, bk.keeper_quality,
       |  per.q_minid_e6, CAST(mx.q_best AS BIGINT) AS q_best_e6,
       |  CAST(mx.q_best - per.q_minid_e6 AS BIGINT) AS delta_e6
       | FROM per JOIN mx ON per.cluster_id = mx.cluster_id
       |  JOIN bk ON per.cluster_id = bk.cluster_id)
       |SELECT * FROM (
       | SELECT CAST(cluster_id AS VARCHAR) AS key, n_members, changed,
       |  keeper_minid, keeper_quality, q_minid_e6, q_best_e6, delta_e6
       | FROM full_rows
       | UNION ALL
       | SELECT '~TOTAL', CAST(sum(n_members) AS BIGINT),
       |  CAST(sum(changed) AS BIGINT), CAST(NULL AS BIGINT),
       |  CAST(NULL AS BIGINT), CAST(sum(q_minid_e6) AS BIGINT),
       |  CAST(sum(q_best_e6) AS BIGINT), CAST(sum(delta_e6) AS BIGINT)
       | FROM full_rows
       |) ORDER BY key""".stripMargin

  // ---------------------------------------------------------------- d23

  /** The exact LSH s-curve value at the operating threshold: the
    * probability 1 − (1 − τ^r)^b that a pair at Jaccard exactly
    * τ = [[TauNum]]/[[TauDen]] lands in some band bucket, floored to e6.
    * Pure rational arithmetic over the config literals (denominator
    * [[TauDen]]^(r·b) ≤ 5^8 — BigInt makes the floor exact), so both
    * engines carry the SAME literal. */
  def lshTheoryE6(b: Int, r: Int): Long = {
    val (num, den) = (BigInt(TauNum), BigInt(TauDen))
    val missBand = den.pow(r) - num.pow(r) // (1 − τ^r) · den^r
    val pDen = den.pow(r * b)
    val pNum = pDen - missBand.pow(b) // (1 − (1−τ^r)^b) · den^(rb)
    (BigInt(1000000) * pNum / pDen).toLong
  }

  /** `d23_banding_sweep`: the (b × r) tuning curve for MinHash+LSH —
    * candidate count, recall and precision against d2's exact pairs for
    * every banding of the [[MinhashSeeds]]-hash signature, next to the
    * exact s-curve theory value at τ ([[lshTheoryE6]]) — the dial d3's
    * deploy (4×2) was set by, kept measured so signature changes show
    * their cost (d13 sweeps the CONFIRM threshold; d11 audits ONE
    * config's candidates; this sweeps the CANDIDATE geometry). Measured
    * recall can sit above theory-at-τ — theory is the worst case at
    * exactly τ, real pairs sit above it.
    *
    * Scale: ONE minhash pass (the d3 table, map-side chunk-mins); all
    * configs' band signatures ride one ≤Σb-entry per-doc array explode
    * (signature-grained, never corpus×configs scans); each config's
    * candidates come from the same band-bucket equi-join shape d3 runs
    * (bounded by collision probability — the 8×1 bucket blow-up is the
    * permissive END of the sweep, visible in its n_candidates, never a
    * doc×doc join); the truth join is pair-grained against d2's
    * prefix-filtered output. */
  def d23BandingSweep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val arrays = shingleArrays(spark, dir).localCheckpoint(true)
    val truth = jaccardPairs(arrays, None, alreadyCheckpointed = true)
      .select(col("doc_id_1").as("d1"), col("doc_id_2").as("d2"),
        lit(1L).as("is_true"))
      .localCheckpoint(true) // joined by the scalar count AND per config
    val mh = minhashTable(arrays)
    val entries = D23Configs.zipWithIndex.flatMap { case ((b, r), ci) =>
      (0 until b).map { band =>
        val parts = (0 until r).map(j => col(s"h${band * r + j}"))
        struct(lit(ci.toLong).as("cfg"), lit(band).as("band"),
          md5(concat_ws("|", parts: _*)).as("bsig"))
      }
    }
    val sig = mh.select(col("doc_id"), explode(array(entries: _*)).as("e"))
      .select(col("doc_id"), col("e.cfg").as("cfg"), col("e.band").as("band"),
        col("e.bsig").as("bsig"))
      .localCheckpoint(true) // both sides of the bucket join
    val cand = sig.select(col("doc_id").as("d1"), col("cfg"), col("band"), col("bsig"))
      .join(sig.select(col("doc_id").as("d2"), col("cfg"), col("band"), col("bsig")),
        Seq("cfg", "band", "bsig"))
      .filter(col("d1") < col("d2"))
      .select(col("cfg"), col("d1"), col("d2")).distinct()
    val perCfg = cand.join(truth.drop("is_true"), Seq("d1", "d2"), "left_semi")
      .groupBy(col("cfg")).agg(count(lit(1)).as("n_hits"))
      .join(cand.groupBy(col("cfg")).agg(count(lit(1)).as("n_candidates")),
        Seq("cfg"), "right")
    val cfgRows = D23Configs.zipWithIndex
      .map { case ((b, r), ci) => (ci.toLong, b.toLong, r.toLong, lshTheoryE6(b, r)) }
      .toDF("cfg", "bands", "rows_per_band", "theory_e6")
    val nTrue = truth.agg(count(lit(1)).as("n_true_pairs"))
    broadcast(cfgRows).join(perCfg, Seq("cfg"), "left")
      .join(broadcast(nTrue))
      .select(col("bands"), col("rows_per_band"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("n_true_pairs"),
        expr("coalesce(n_hits, 0L) * CAST(1000000 AS DECIMAL(38,0))" +
          " div greatest(n_true_pairs, 1)")
          .as("recall_e6"),
        expr("coalesce(n_hits, 0L) * CAST(1000000 AS DECIMAL(38,0))" +
          " div greatest(coalesce(n_candidates, 0L), 1)")
          .as("precision_e6"),
        col("theory_e6"))
      .orderBy(col("rows_per_band"))
  }

  private lazy val d23OracleSql: String = {
    val cfgValues = D23Configs.zipWithIndex.map { case ((b, r), ci) =>
      s"($ci, $b, $r, ${lshTheoryE6(b, r)})" }.mkString(", ")
    s"""WITH $shinglesCte,
       |p AS (${jaccardSelectSql("")}),
       |mh AS (
       | SELECT doc_id, r.seed,
       |  min(substr(md5(CAST(r.seed // $MinhashChunksPerDigest AS VARCHAR) || ':' || CAST(h AS VARCHAR)),
       |      1 + $MinhashChunkHex * (r.seed % $MinhashChunksPerDigest), $MinhashChunkHex)) AS mh
       | FROM docsh, range($MinhashSeeds) r(seed) GROUP BY doc_id, r.seed),
       |cfg(cfg, bands, rows_per_band, theory_e6) AS (VALUES $cfgValues),
       |sig AS (
       | SELECT m.doc_id, c.cfg, m.seed // c.rows_per_band AS band,
       |  md5(string_agg(m.mh, '|' ORDER BY m.seed)) AS bsig
       | FROM mh m JOIN cfg c ON m.seed < c.bands * c.rows_per_band
       | GROUP BY 1, 2, 3),
       |cand AS (
       | SELECT DISTINCT a.cfg, a.doc_id AS d1, b.doc_id AS d2
       | FROM sig a JOIN sig b ON a.cfg = b.cfg AND a.band = b.band
       |  AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
       |tr AS (SELECT doc_id_1 AS d1, doc_id_2 AS d2 FROM p),
       |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_true_pairs FROM tr),
       |agg AS (
       | SELECT cand.cfg, CAST(count(*) AS BIGINT) AS n_candidates,
       |  CAST(sum(CASE WHEN tr.d1 IS NULL THEN 0 ELSE 1 END) AS BIGINT)
       |    AS n_hits
       | FROM cand LEFT JOIN tr ON cand.d1 = tr.d1 AND cand.d2 = tr.d2
       | GROUP BY 1)
       |SELECT CAST(c.bands AS BIGINT) AS bands,
       | CAST(c.rows_per_band AS BIGINT) AS rows_per_band,
       | CAST(COALESCE(n_candidates, 0) AS BIGINT) AS n_candidates,
       | CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits, n_true_pairs,
       | CAST(COALESCE(n_hits, 0) * 1000000
       |   // greatest(n_true_pairs, 1) AS BIGINT) AS recall_e6,
       | CAST(COALESCE(n_hits, 0) * 1000000
       |   // greatest(COALESCE(n_candidates, 0), 1) AS BIGINT) AS precision_e6,
       | CAST(c.theory_e6 AS BIGINT) AS theory_e6
       |FROM cfg c LEFT JOIN agg ON c.cfg = agg.cfg CROSS JOIN nt
       |ORDER BY rows_per_band""".stripMargin
  }

  // ---------------------------------------------------------------- d24

  /** `d24_df_profile`: the shingle document-frequency profile and
    * posting-list COST MODEL — per log2 df bucket: distinct shingles,
    * posting rows, and the exact unfiltered candidate-pair volume
    * (Σ df·(df−1)/2 — what a naive shingle equi-join would generate from
    * that bucket), with e6 shares; `~TOTAL` carries the corpus-wide
    * numbers. This is the capacity-planning pass an operator runs
    * BEFORE d2/d17 at a new corpus scale: the pair volume concentrates
    * in the top df buckets, and this table is what sizes the
    * prefix-filter block size / containment hash blocks (and predicts
    * what d23's permissive bandings will cost). Pair counts ride
    * Decimal(38,0) and emit as digits-strings (the q43 discipline —
    * Σ df² wraps BIGINT long before 100 TB); shares emit BIGINT via
    * `div`.
    *
    * Scale: one shingle scan collapses to the distinct-shingle df
    * aggregate (map-side partials), that collapses to ≤64 log2 buckets;
    * the bucket frame is checkpointed once for its two grain
    * consumers — nothing beyond the df aggregate is corpus-sized. */
  def d24DfProfile(spark: SparkSession, dir: String): DataFrame = {
    val pairsCol = expr(
      "CAST(CAST(df AS DECIMAL(38,0)) * (df - 1L) / 2 AS DECIMAL(38,0))")
    val per = shingleRows(spark, dir)
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .groupBy(length(bin(col("df"))).cast("long").as("fbin"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(col("df")).as("n_postings"),
        sum(pairsCol).as("pairs"))
      .localCheckpoint(true) // <=64 rows; per-bucket + ~TOTAL read it
    val scal = per.agg(sum(col("n_postings")).as("tot_post"),
      sum(col("pairs")).as("tot_pairs"))
    val rows = per.join(broadcast(scal))
      .select(lpad(col("fbin").cast("string"), 2, "0").as("key"),
        col("fbin"), col("n_shingles"), col("n_postings"),
        expr("n_postings * CAST(1000000 AS DECIMAL(38,0)) div greatest(tot_post, 1)")
          .as("posting_share_e6"),
        col("pairs").cast("string").as("cand_pairs"),
        expr("pairs * 1000000 div greatest(tot_pairs, 1)")
          .as("pair_share_e6"))
    val tot = per.agg(sum(col("n_shingles")).as("n_shingles"),
        sum(col("n_postings")).as("n_postings"),
        sum(col("pairs")).as("pairs"))
      .select(lit("~TOTAL").as("key"), lit(null).cast("long").as("fbin"),
        col("n_shingles"), col("n_postings"),
        lit(1000000L).as("posting_share_e6"),
        col("pairs").cast("string").as("cand_pairs"),
        lit(1000000L).as("pair_share_e6"))
    rows.unionByName(tot).orderBy(col("key"))
  }

  private lazy val d24OracleSql: String =
    s"""WITH $shinglesCte,
       |dfreq AS (SELECT h, CAST(count(*) AS BIGINT) AS df
       | FROM docsh GROUP BY h),
       |per AS (
       | SELECT CAST(length(bin(df)) AS BIGINT) AS fbin,
       |  CAST(count(*) AS BIGINT) AS n_shingles,
       |  CAST(sum(df) AS BIGINT) AS n_postings,
       |  CAST(sum(CAST(df AS HUGEINT) * (df - 1) // 2) AS HUGEINT) AS pairs
       | FROM dfreq GROUP BY 1),
       |scal AS (SELECT CAST(sum(n_postings) AS BIGINT) AS tot_post,
       |  CAST(sum(pairs) AS HUGEINT) AS tot_pairs FROM per)
       |SELECT * FROM (
       | SELECT lpad(CAST(fbin AS VARCHAR), 2, '0') AS key, fbin,
       |  n_shingles, n_postings,
       |  CAST(n_postings * 1000000 // greatest(tot_post, 1) AS BIGINT)
       |    AS posting_share_e6,
       |  CAST(pairs AS VARCHAR) AS cand_pairs,
       |  CAST(pairs * 1000000 // greatest(tot_pairs, 1) AS BIGINT)
       |    AS pair_share_e6
       | FROM per CROSS JOIN scal
       | UNION ALL
       | SELECT '~TOTAL', CAST(NULL AS BIGINT),
       |  CAST(sum(n_shingles) AS BIGINT), CAST(sum(n_postings) AS BIGINT),
       |  CAST(1000000 AS BIGINT),
       |  CAST(CAST(sum(pairs) AS HUGEINT) AS VARCHAR),
       |  CAST(1000000 AS BIGINT)
       | FROM per
       |) ORDER BY key""".stripMargin

  /** `d25_dedup_epochs`: what dedup does to the MIXTURE — per source,
    * the token mass a min-id dedup keeps vs drops, and the effective
    * epoch multiplier (tokens-with-dups ÷ tokens-kept, e6): training on
    * the raw corpus implicitly shows each kept document `cluster_size`
    * times, so a source's raw t9 share overstates its post-dedup share
    * by exactly this factor — the correction a mixing plan (t9/t30/t28)
    * must apply AFTER dedup. Cross-source keeper movement is part of
    * the audit: a mirror source whose clusters' min-id keepers live in
    * the original source keeps NOTHING (`tokens_kept` 0, `epochs_e6`
    * −1 flags it) — its entire mass was someone else's copy. Per
    * source: docs, raw tokens, keepers landing in this source, tokens
    * kept/dropped, drop share (e6), epoch multiplier (e6); `~TOTAL`
    * foots (the corpus epoch multiplier is the d6-family headline).
    *
    * Scale: the cluster table is d6's pair-bounded components; ALL docs
    * enter via a LEFT join on the doc key (a singleton is its own
    * cluster — coalesce, no extra pass); the keeper election is a
    * cluster-grain min; everything collapses to |sources| rows with
    * map-side partials. Shares ride Decimal(38,0) → BIGINT (the
    * t30/s25 envelope). One token-count scan, two doc-grain equi
    * shuffles, nothing pairwise beyond what d6 already bounded. */
  def d25DedupEpochs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(wsTokens(col("text"))).cast("long").as("n_toks"))
    val member = docs
      .join(d6DedupClusters(spark, dir).select(col("doc_id"), col("cluster_id")),
        Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
    val keepers = member.groupBy(col("cluster_id"))
      .agg(min(col("doc_id")).as("keeper"))
    val per = member.join(keepers, Seq("cluster_id"))
      .withColumn("kept", (col("doc_id") === col("keeper")).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        sum(col("kept")).as("n_keepers"),
        sum(col("kept") * col("n_toks")).as("tokens_kept"),
        sum((lit(1L) - col("kept")) * col("n_toks")).as("tokens_dropped"))
      .localCheckpoint(true) // |sources| rows; per-source + ~TOTAL read it
    def shaped(df: DataFrame, key: Column): DataFrame =
      df.select(key.as("source"), col("n_docs"), col("n_tokens"),
        col("n_keepers"), col("tokens_kept"), col("tokens_dropped"),
        expr("tokens_dropped * CAST(1000000 AS DECIMAL(38,0))" +
          " div greatest(n_tokens, 1)").as("drop_share_e6"),
        when(col("tokens_kept") > 0L,
          expr("n_tokens * CAST(1000000 AS DECIMAL(38,0)) div tokens_kept"))
          .otherwise(-1L).as("epochs_e6"))
    shaped(per, col("source"))
      .unionByName(shaped(
        per.agg(sum(col("n_docs")).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(col("n_keepers")).as("n_keepers"),
          sum(col("tokens_kept")).as("tokens_kept"),
          sum(col("tokens_dropped")).as("tokens_dropped")), lit("~TOTAL")))
      .orderBy(col("source"))
  }

  private lazy val d25OracleSql: String =
    s"""WITH RECURSIVE $shinglesCte,
       |p AS (${jaccardSelectSql("")}),
       |edges AS (
       | SELECT doc_id_1 AS a, doc_id_2 AS b FROM p
       | UNION ALL SELECT doc_id_2, doc_id_1 FROM p),
       |reach(v, l) AS (
       | SELECT DISTINCT a, a FROM edges
       | UNION
       | SELECT e.a, r.l FROM edges e JOIN reach r ON e.b = r.v),
       |cc AS (SELECT v AS doc_id, min(l) AS cluster_id FROM reach GROUP BY v),
       |docs AS (
       | SELECT doc_id, source,
       |  CAST(len(${graft.operators.TextAnalysis.toksCaseSql}) AS BIGINT)
       |   AS n_toks
       | FROM documents),
       |member AS (
       | SELECT d.doc_id, d.source, d.n_toks,
       |  COALESCE(cc.cluster_id, d.doc_id) AS cluster_id
       | FROM docs d LEFT JOIN cc ON cc.doc_id = d.doc_id),
       |kp AS (SELECT cluster_id, min(doc_id) AS keeper FROM member GROUP BY 1),
       |j AS (
       | SELECT m.source, m.n_toks,
       |  CASE WHEN m.doc_id = kp.keeper THEN 1 ELSE 0 END AS kept
       | FROM member m JOIN kp ON m.cluster_id = kp.cluster_id),
       |per AS (
       | SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       |  CAST(sum(kept) AS BIGINT) AS n_keepers,
       |  CAST(sum(kept * n_toks) AS BIGINT) AS tokens_kept,
       |  CAST(sum((1 - kept) * n_toks) AS BIGINT) AS tokens_dropped
       | FROM j GROUP BY 1),
       |u AS (
       | SELECT source, n_docs, n_tokens, n_keepers, tokens_kept,
       |  tokens_dropped
       | FROM per
       | UNION ALL
       | SELECT '~TOTAL', CAST(sum(n_docs) AS BIGINT),
       |  CAST(sum(n_tokens) AS BIGINT), CAST(sum(n_keepers) AS BIGINT),
       |  CAST(sum(tokens_kept) AS BIGINT), CAST(sum(tokens_dropped) AS BIGINT)
       | FROM per)
       |SELECT source, n_docs, n_tokens, n_keepers, tokens_kept,
       | tokens_dropped,
       | CAST(tokens_dropped * 1000000 // greatest(n_tokens, 1) AS BIGINT)
       |  AS drop_share_e6,
       | CASE WHEN tokens_kept > 0
       |  THEN CAST(n_tokens * 1000000 // tokens_kept AS BIGINT)
       |  ELSE CAST(-1 AS BIGINT) END AS epochs_e6
       |FROM u ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- d26

  /** `d26_embed_decontam`: SEMANTIC eval-set decontamination — d19's
    * split-leakage audit re-run in embedding space: a paraphrased or
    * translated train document shares almost no shingles with its eval
    * twin (d19 is blind to it) yet sits at high cosine, and it corrupts
    * the eval just as surely. For EVERY eval vector (val/test under t5's
    * stable md5 split — the same rule d19/d8 duplicate verbatim): how many
    * train vectors reach it through d5's banded candidate generation at
    * cosine ≥ τ, the worst train offender (max floored-e6 cosine, ties →
    * lowest train id — d19's two-aggregate + equi-join trick, no window),
    * and the `contaminated`/`clean` verdict. Unlike d19 this frame
    * includes the CLEAN rows — the output is the keep/drop GATE a
    * benchmark curator applies to the eval set, not just the offender
    * list — plus `~TOTAL_val`/`~TOTAL_test`/`~TOTAL` rollups carrying the
    * contamination counts the split is judged by.
    *
    * Scale: the pair table is d5's LSH-banded candidate set (band/sig
    * equi-join, never all-pairs); split tagging is a projection; the
    * cross-split subset is checkpointed once for its two grain consumers;
    * the eval universe is a corpus-sized projection joined once. At 100 TB
    * the same shape holds: eval sets are small, so the banded train×eval
    * candidate mass is eval-bounded. */
  /** d26's split-tagged candidate pairs: the CONFIRMED pairs are
    * checkpointed BEFORE split tagging — left in one plan, the md5 split
    * CASE pushes into the band-join condition and runs 4 md5s per
    * candidate band-row (pre-distinct, up to 16x per pair) — measured 4x
    * the whole query. On the materialized pair set it is one cheap
    * projection. Exposed at object scope so PlanSpec can pin the shape
    * (tag = projection over the materialized pair table, never a join
    * condition) on the production code path. */
  private[graft] def d26TaggedPairs(spark: SparkSession, dir: String): DataFrame =
    d5Pairs(spark, dir).localCheckpoint(true)
      .withColumn("s1", splitOf(col("vec_id_1")))
      .withColumn("s2", splitOf(col("vec_id_2")))
      .filter((col("s1") === "train") =!= (col("s2") === "train"))

  def d26EmbedDecontam(spark: SparkSession, dir: String): DataFrame = {
    val pairs = d26TaggedPairs(spark, dir)
    val lk = pairs.select(
      when(col("s1") === "train", col("vec_id_1"))
        .otherwise(col("vec_id_2")).as("train_vec"),
      when(col("s1") === "train", col("vec_id_2"))
        .otherwise(col("vec_id_1")).as("eval_vec"),
      col("cos_e6"))
      .localCheckpoint(true) // cross-split pairs; 2 grain consumers
    val g = lk.groupBy(col("eval_vec"))
      .agg(count(lit(1)).as("n_train_near"), max(col("cos_e6")).as("max_cos_e6"))
    val worst = g
      .join(lk.select(col("eval_vec"), col("cos_e6").as("max_cos_e6"),
        col("train_vec")), Seq("eval_vec", "max_cos_e6"))
      .groupBy(col("eval_vec"), col("n_train_near"), col("max_cos_e6"))
      .agg(min(col("train_vec")).as("worst_train_doc"))
    val evals = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id").as("eval_vec"))
      .withColumn("split", splitOf(col("eval_vec")))
      .filter(col("split") =!= "train")
    val per = evals.join(worst, Seq("eval_vec"), "left")
      .select(col("eval_vec"), col("split"),
        lit(1L).as("n_docs"),
        when(col("n_train_near").isNotNull, lit(1L)).otherwise(lit(0L))
          .as("n_contam"),
        coalesce(col("n_train_near"), lit(0L)).as("n_train_near"),
        coalesce(col("max_cos_e6"), lit(-1L)).as("max_cos_e6"),
        coalesce(col("worst_train_doc"), lit(-1L)).as("worst_train_doc"))
      .localCheckpoint(true) // per-eval verdicts; 3 grain consumers
    val perRows = per.select(
      col("eval_vec").cast("string").as("key"), col("split"), col("n_docs"),
      col("n_contam"), col("n_train_near"), col("max_cos_e6"),
      col("worst_train_doc"),
      when(col("n_contam") === 1L, lit("contaminated")).otherwise(lit("clean"))
        .as("verdict"))
    val bySplit = per.groupBy(col("split"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_contam")).as("n_contam"),
        sum(col("n_train_near")).as("n_train_near"),
        max(col("max_cos_e6")).as("max_cos_e6"))
      .select(concat(lit("~TOTAL_"), col("split")).as("key"), col("split"),
        col("n_docs"), col("n_contam"), col("n_train_near"), col("max_cos_e6"),
        lit(-1L).as("worst_train_doc"), lit("~TOTAL").as("verdict"))
    // the ~TOTAL row mirrors the oracle's empty-eval-set handling: a global
    // aggregate over zero rows emits NULL sums/max in Spark while the oracle
    // wraps them in COALESCE(...,0/-1) — coalesce here (and count for
    // n_docs) so the edge the oracle authors handled is engine-identical
    val total = per.agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(col("n_contam")), lit(0L)).as("n_contam"),
      coalesce(sum(col("n_train_near")), lit(0L)).as("n_train_near"),
      coalesce(max(col("max_cos_e6")), lit(-1L)).as("max_cos_e6"))
      .select(lit("~TOTAL").as("key"), lit("~TOTAL").as("split"),
        col("n_docs"), col("n_contam"), col("n_train_near"), col("max_cos_e6"),
        lit(-1L).as("worst_train_doc"), lit("~TOTAL").as("verdict"))
    perRows.unionAll(bySplit).unionAll(total).orderBy(col("key"))
  }

  private lazy val d26OracleSql: String = {
    def splitCase(id: String): String =
      s"""CASE WHEN CAST(('0x' || substr(md5(CAST($id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
         | WHEN CAST(('0x' || substr(md5(CAST($id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'val'
         | ELSE 'test' END""".stripMargin
    s"""WITH ${d5PairSql._1},
       |p AS (${d5PairSql._2}),
       |sp AS (
       | SELECT vec_id_1, vec_id_2, cos_e6,
       |  ${splitCase("vec_id_1")} AS s1,
       |  ${splitCase("vec_id_2")} AS s2
       | FROM p),
       |lk AS (
       | SELECT CASE WHEN s1 = 'train' THEN vec_id_1 ELSE vec_id_2 END AS train_vec,
       |  CASE WHEN s1 = 'train' THEN vec_id_2 ELSE vec_id_1 END AS eval_vec,
       |  cos_e6
       | FROM sp WHERE (s1 = 'train') <> (s2 = 'train')),
       |g AS (
       | SELECT eval_vec, CAST(count(*) AS BIGINT) AS n_train_near,
       |  max(cos_e6) AS max_cos_e6
       | FROM lk GROUP BY 1),
       |w AS (
       | SELECT g.eval_vec, g.n_train_near, g.max_cos_e6,
       |  min(l.train_vec) AS worst_train_doc
       | FROM g JOIN lk l ON l.eval_vec = g.eval_vec
       |   AND l.cos_e6 = g.max_cos_e6
       | GROUP BY 1, 2, 3),
       |ev AS (
       | SELECT vec_id AS eval_vec, ${splitCase("vec_id")} AS split
       | FROM embeddings
       | WHERE ${splitCase("vec_id")} <> 'train'),
       |d AS (
       | SELECT ev.eval_vec, ev.split, CAST(1 AS BIGINT) AS n_docs,
       |  CAST(CASE WHEN w.n_train_near IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
       |   AS n_contam,
       |  COALESCE(w.n_train_near, 0) AS n_train_near,
       |  COALESCE(w.max_cos_e6, -1) AS max_cos_e6,
       |  COALESCE(w.worst_train_doc, -1) AS worst_train_doc
       | FROM ev LEFT JOIN w ON w.eval_vec = ev.eval_vec)
       |SELECT key, split, n_docs, n_contam, n_train_near, max_cos_e6,
       | worst_train_doc, verdict
       |FROM (
       | SELECT CAST(eval_vec AS VARCHAR) AS key, split, n_docs, n_contam,
       |  n_train_near, max_cos_e6, worst_train_doc,
       |  CASE WHEN n_contam = 1 THEN 'contaminated' ELSE 'clean' END AS verdict
       | FROM d
       | UNION ALL
       | SELECT '~TOTAL_' || split, split, CAST(count(*) AS BIGINT),
       |  CAST(sum(n_contam) AS BIGINT), CAST(sum(n_train_near) AS BIGINT),
       |  max(max_cos_e6), CAST(-1 AS BIGINT), '~TOTAL'
       | FROM d GROUP BY split
       | UNION ALL
       | SELECT '~TOTAL', '~TOTAL', CAST(count(*) AS BIGINT),
       |  COALESCE(CAST(sum(n_contam) AS BIGINT), 0),
       |  COALESCE(CAST(sum(n_train_near) AS BIGINT), 0),
       |  COALESCE(max(max_cos_e6), -1), CAST(-1 AS BIGINT), '~TOTAL'
       | FROM d
       |) ORDER BY key""".stripMargin
  }

  // ---------------------------------------------------------------- d27

  /** `d27_weighted_jaccard`: df-WEIGHTED resemblance — the modality the
    * unweighted family (d2/d3) lacks on boilerplate-heavy corpora. Plain
    * Jaccard scores every shingle equally, so two documents sharing a
    * large license header / navigation template / scraper chrome read as
    * near-dups even when ALL their real content differs — and,
    * symmetrically, two true copies wrapped in different templates score
    * low. The fix is the TF-IDF idea applied to resemblance (Broder's
    * weighted-resemblance form): a shingle's weight is `1e6 div df` —
    * the rarer the shingle, the more a match of it means; a template
    * shingle present in hundreds of documents weighs ~nothing (the df
    * profile d24 sizes is exactly the weight table this consumes).
    * Weighted Jaccard of a pair = Σ_{h∈A∩B} w(h) / Σ_{h∈A∪B} w(h), all
    * integer arithmetic (weights, sums, and the τ test as cross-mult) so
    * both engines agree bit-for-bit. Candidates come from the SAME
    * MinHash/LSH banding d3 uses — signatures straight from the distinct
    * (doc_id, h) rows. Emitted: every candidate pair passing EITHER τ
    * (=[[TauNum]]/[[TauDen]], d3's operating point), with both scores
    * and the three-way verdict — `both` (agreed dup), `plain_only` (the
    * boilerplate over-score d3 would wrongly collapse), `weighted_only`
    * (the template-diluted true dup d3 would miss) — so the artifact IS
    * the keep/drop disagreement audit the weighting exists for.
    *
    * Scale: the shingle rows are checkpointed once and feed the df
    * aggregate (map-side partial, broadcast back under the d2
    * size-adaptive rule), the signature table and both pair-join sides;
    * the weighted-intersection join is candidate-bounded (band
    * equi-join first, never all-pairs), pair×shared-shingle grained —
    * the d3 confirm shape with a weight column. */
  def d27WeightedJaccard(spark: SparkSession, dir: String): DataFrame = {
    // distinct (doc_id, h): exact SET semantics for both the df counts
    // and the weight sums (a 60-bit within-doc collision would otherwise
    // double-count its weight)
    val sh = shingleRows(spark, dir).distinct().localCheckpoint(true)
    val dfreq = sh.groupBy(col("h")).agg(count(lit(1)).as("df")).localCheckpoint(true)
    val dfreqSide = if (dfreq.count() <= DfreqBroadcastLimit) broadcast(dfreq) else dfreq
    val wp = sh.join(dfreqSide, Seq("h"))
      .select(col("doc_id"), col("h"), expr("1000000L div df").as("w"))
      .localCheckpoint(true) // doc totals + both pair-join sides
    val docW = wp.groupBy(col("doc_id"))
      .agg(sum(col("w")).as("dw"), count(lit(1)).as("n"))
    val cand = bandedPairs(minhashTableRows(sh))
    val inter = cand
      .join(wp.select(col("doc_id").as("d1"), col("h"), col("w")), Seq("d1"))
      .join(wp.select(col("doc_id").as("d2"), col("h")), Seq("d2", "h"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n_common"), sum(col("w")).as("inter_w"))
    val plainDup = col("n_common") * TauDen >= col("union_n") * TauNum
    val wDup = col("inter_w") * TauDen >= col("union_w") * TauNum
    inter
      .join(docW.select(col("doc_id").as("d1"),
        col("dw").as("dw1"), col("n").as("n1")), Seq("d1"))
      .join(docW.select(col("doc_id").as("d2"),
        col("dw").as("dw2"), col("n").as("n2")), Seq("d2"))
      .withColumn("union_w", col("dw1") + col("dw2") - col("inter_w"))
      .withColumn("union_n", col("n1") + col("n2") - col("n_common"))
      .filter(plainDup || wDup)
      .select(col("d1").as("doc_id_1"), col("d2").as("doc_id_2"),
        col("n_common"),
        floor(col("n_common") * lit(1000000.0) / col("union_n"))
          .cast("long").as("jaccard_e6"),
        col("inter_w"), col("union_w"),
        floor(col("inter_w") * lit(1000000.0) / col("union_w"))
          .cast("long").as("wjaccard_e6"),
        when(plainDup && wDup, "both")
          .when(plainDup, "plain_only")
          .otherwise("weighted_only").as("verdict"))
      .orderBy(col("doc_id_1"), col("doc_id_2"))
  }

  private lazy val d27OracleSql: String =
    s"""WITH $shinglesCte,
       |$minhashCandCte,
       |ps AS MATERIALIZED (SELECT DISTINCT doc_id, h FROM docsh),
       |dfr AS (SELECT h, count(*) AS df FROM ps GROUP BY 1),
       |wp AS MATERIALIZED (
       | SELECT p.doc_id, p.h, 1000000 // d.df AS w
       | FROM ps p JOIN dfr d USING (h)),
       |dw AS (
       | SELECT doc_id, CAST(sum(w) AS BIGINT) AS dw,
       |  CAST(count(*) AS BIGINT) AS n
       | FROM wp GROUP BY 1),
       |iw AS (
       | SELECT c.cd1 AS d1, c.cd2 AS d2,
       |  CAST(count(*) AS BIGINT) AS n_common,
       |  CAST(sum(a.w) AS BIGINT) AS inter_w
       | FROM cand c
       |  JOIN wp a ON a.doc_id = c.cd1
       |  JOIN wp b ON b.doc_id = c.cd2 AND b.h = a.h
       | GROUP BY 1, 2)
       |SELECT i.d1 AS doc_id_1, i.d2 AS doc_id_2, i.n_common,
       | CAST(floor(i.n_common * 1000000.0 / (n1.n + n2.n - i.n_common))
       |  AS BIGINT) AS jaccard_e6,
       | i.inter_w, n1.dw + n2.dw - i.inter_w AS union_w,
       | CAST(floor(i.inter_w * 1000000.0 / (n1.dw + n2.dw - i.inter_w))
       |  AS BIGINT) AS wjaccard_e6,
       | CASE
       |  WHEN i.n_common * $TauDen >= (n1.n + n2.n - i.n_common) * $TauNum
       |   AND i.inter_w * $TauDen >= (n1.dw + n2.dw - i.inter_w) * $TauNum
       |   THEN 'both'
       |  WHEN i.n_common * $TauDen >= (n1.n + n2.n - i.n_common) * $TauNum
       |   THEN 'plain_only'
       |  ELSE 'weighted_only' END AS verdict
       |FROM iw i JOIN dw n1 ON n1.doc_id = i.d1 JOIN dw n2 ON n2.doc_id = i.d2
       |WHERE i.n_common * $TauDen >= (n1.n + n2.n - i.n_common) * $TauNum
       |  OR i.inter_w * $TauDen >= (n1.dw + n2.dw - i.inter_w) * $TauNum
       |ORDER BY doc_id_1, doc_id_2""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d27_weighted_jaccard" -> (d27WeightedJaccard _),
    "d25_dedup_epochs" -> (d25DedupEpochs _),
    "d26_embed_decontam" -> (d26EmbedDecontam _),
    "d24_df_profile" -> (d24DfProfile _),
    "d23_banding_sweep" -> (d23BandingSweep _),
    "d22_keeper_policy" -> (d22KeeperPolicy _),
    "d21_crosslang_dups" -> (d21CrosslangDups _),
    "d20_bloom_prefilter" -> (d20BloomPrefilter _),
    "d19_split_leakage" -> (d19SplitLeakage _),
    "d18_dup_spans" -> (d18DupSpans _),
    "d16_source_overlap" -> (d16SourceOverlap _),
    "d17_containment_dedup" -> (d17ContainmentDedup _),
    "d11_dedup_eval" -> (d11DedupEval _),
    "d1_dedup_exact" -> (d1DedupExact _),
    "d2_dedup_ngram" -> ((s: SparkSession, d: String) => d2DedupNgram(s, d)),
    "d3_dedup_minhash" -> (d3DedupMinhash _),
    "d4_dedup_simhash" -> (d4DedupSimhash _),
    "d5_dedup_embed" -> (d5DedupEmbed _),
    "d6_dedup_clusters" -> ((s: SparkSession, d: String) => d6DedupClusters(s, d)),
    "d7_embed_clusters" -> ((s: SparkSession, d: String) => d7EmbedClusters(s, d)),
    "d8_dedup_incremental" -> (d8DedupIncremental _),
    "d9_dedup_chunks" -> (d9DedupChunks _),
    "d10_dedup_fuzzy" -> (d10DedupFuzzy _),
    "d12_semantic_dedup" -> (d12SemanticDedup _),
    "d15_prototype_prune" -> (d15PrototypePrune _),
    "d13_threshold_sweep" -> (d13ThresholdSweep _),
    "d14_substring_dedup" -> (d14SubstringDedup _))
}
