package graft.queries

/** DuckDB-SQL generator for XXH64 (seed 42) — the EXACT hash Spark's
  * `xxhash64` built-in computes over a string's UTF-8 bytes. This is what
  * lets the two PRODUCTION kernel rows (`q_d4x_simhash_prod`,
  * `q_t5x_fingerprint_prod`) carry real value oracles: DuckDB has no
  * xxhash64 built-in, so the oracle SQL carries the whole algorithm as a
  * generated CTE chain — 64-bit wraparound arithmetic emulated in HUGEINT
  * (multiply-mod-2^64 via 32-bit limb splitting, rotates as
  * shift-mod-plus-shift, xor on UBIGINT), stripes as a recursive CTE, the
  * sub-32-byte tail statically unrolled with per-step applicability
  * guards. Self-contained single-statement SQL: runs in ANY stock DuckDB,
  * no UDF registration, no extension.
  *
  * Validated bit-exact against `org.apache.spark.sql.functions.xxhash64`
  * on empty/1..65-byte/1000-byte/multi-byte-UTF-8 inputs (XxHashOracleSpec
  * replays the generated SQL's arithmetic contract; the dev harness
  * cross-ran the SQL itself in DuckDB against Spark on 30 adversarial
  * vectors).
  *
  * Layout of the generated chain (input CTE must expose a VARCHAR column
  * `tok`; duplicates fine — hashed once per DISTINCT token):
  *   x0/x1     distinct tokens, hex bytes, byte length, stripe count
  *   xs        recursive 32-byte stripe fold, 4 accumulators (n >= 32)
  *   xsf/g*    stripe convergence + the 4 XXH64 merge rounds
  *   xh0       unified seed+P5 / merged start, `+ len`
  *   t., q4., b. tail: <=3 8-byte rounds, 4-byte round, <=3 byte rounds
  *   f1..f5    avalanche finalization
  *   <out>     (tok, h_u HUGEINT in [0,2^64), h_s signed BIGINT)
  */
object DuckXxh64 {

  private val M = "18446744073709551616::HUGEINT" // 2^64
  private val S = "4294967296::HUGEINT"           // 2^32

  private val P1 = BigInt("11400714785074694791")
  private val P2 = BigInt("14029467366897019727")
  private val P3 = BigInt("1609587929392839161")
  private val P4 = BigInt("9650029242287828579")
  private val P5 = BigInt("2870177450012600261")
  private val Seed = BigInt(42)
  private val M64 = (BigInt(1) << 64) - 1

  private def hl(c: BigInt): String = s"$c::HUGEINT"

  /** (a * c) mod 2^64 — `a` a short column ref (expanded 4x), c constant.
    * 32-bit limb split keeps every intermediate below 2^65 << HUGEINT max.
    */
  private def mulmodc(a: String, c: BigInt): String = {
    val cl = c & 0xFFFFFFFFL
    val ch = c >> 32
    s"((($a % $S) * ${hl(cl)} + (((($a // $S) * ${hl(cl)} + " +
      s"($a % $S) * ${hl(ch)}) % $S) * $S)) % $M)"
  }

  /** rotl64 — the two shifted halves occupy disjoint bits, so + is |. */
  private def rotl(a: String, r: Int): String =
    s"((($a * ${hl(BigInt(1) << r)}) % $M) + ($a // ${hl(BigInt(1) << (64 - r))}))"

  private def xor64(a: String, b: String): String =
    s"xor(($a)::UBIGINT, ($b)::UBIGINT)::HUGEINT"

  /** Little-endian lane: `width` bytes at 0-based byte offset `off` (an
    * expression), read from the hex rendering by reversed-pair concat.
    */
  private def lane(hx: String, off: String, width: Int): String = {
    val parts = (width - 1) to 0 by -1 map { k =>
      s"substr($hx, 2*($off)+${2 * k + 1}, 2)"
    }
    s"('0x' || ${parts.mkString(" || ")})::UBIGINT::HUGEINT"
  }

  /** Chain step CTEs: each body uses `@` as the previous CTE's name. */
  private def chain(steps: Seq[(String, String)], first: String): (String, String) = {
    var src = first
    val out = steps.map { case (name, body) =>
      val t = s"$name AS (${body.replace("@", src)})"
      src = name
      t
    }
    (out.mkString(",\n"), src)
  }

  /** The full xxh64 CTE chain. `src` must yield VARCHAR `tok`. Appends
    * CTEs ending in `out`(tok, h_u, h_s). Must be placed under a
    * `WITH RECURSIVE` header.
    */
  def hashCtes(src: String, out: String): String = {
    val ctes = scala.collection.mutable.ArrayBuffer[String]()

    ctes += s"x0 AS (SELECT DISTINCT tok FROM $src)"
    ctes += ("x1 AS (SELECT tok, hex(encode(tok)) AS hx, " +
      "octet_length(encode(tok)) AS n, " +
      "octet_length(encode(tok)) // 32 AS nst FROM x0)")

    // ---- stripe phase (n >= 32): recursive CTE, 4 accumulators ----
    val v10 = (Seed + P1 + P2) & M64
    val v20 = (Seed + P2) & M64
    val v30 = Seed
    val v40 = (Seed - P1) & M64
    val lanes = (0 until 4).map { k =>
      s"CASE WHEN i < nst THEN ${lane("hx", s"32*i+${8 * k}", 8)} ELSE 0::HUGEINT END AS l${k + 1}"
    }.mkString(", ")
    val mults = (0 until 4).map(k => s"${mulmodc(s"l${k + 1}", P2)} AS m${k + 1}").mkString(", ")
    val adds = (0 until 4).map(k => s"((v${k + 1} + m${k + 1}) % $M) AS a${k + 1}").mkString(", ")
    val rots = (0 until 4).map(k => s"${rotl(s"a${k + 1}", 31)} AS r${k + 1}").mkString(", ")
    val outs = (0 until 4).map(k => s"${mulmodc(s"r${k + 1}", P1)} AS v${k + 1}").mkString(", ")
    ctes += s"""xs AS (
  SELECT tok, hx, n, nst, 0 AS i,
         ${hl(v10)} AS v1, ${hl(v20)} AS v2, ${hl(v30)} AS v3, ${hl(v40)} AS v4
  FROM x1 WHERE n >= 32
  UNION ALL
  SELECT tok, hx, n, nst, i+1, v1, v2, v3, v4 FROM (
    SELECT tok, hx, n, nst, i, $outs FROM (
      SELECT *, $rots FROM (
        SELECT *, $adds FROM (
          SELECT *, $mults FROM (
            SELECT *, $lanes FROM xs WHERE i < nst
          )
        )
      )
    )
  )
)"""
    ctes += s"""xsf AS (SELECT tok, v1, v2, v3, v4,
  ((${rotl("v1", 1)} + ${rotl("v2", 7)} + ${rotl("v3", 12)} + ${rotl("v4", 18)}) % $M) AS hh
  FROM xs WHERE i = nst)"""

    // 4 merge rounds: hh = (xor(hh, round(0, v_k)) * P1 + P4) mod 2^64
    val mergeSteps = (1 to 4).flatMap { k =>
      val p = s"g$k"
      Seq(
        s"${p}m" -> s"SELECT *, ${mulmodc(s"v$k", P2)} AS ${p}_m FROM @",
        s"${p}r" -> s"SELECT *, ${rotl(s"${p}_m", 31)} AS ${p}_r FROM @",
        s"${p}o" -> s"SELECT *, ${mulmodc(s"${p}_r", P1)} AS ${p}_o FROM @",
        s"${p}x" -> s"SELECT *, ${xor64("hh", s"${p}_o")} AS ${p}_x FROM @",
        s"${p}f" -> s"SELECT * REPLACE (((${mulmodc(s"${p}_x", P1)} + ${hl(P4)}) % $M) AS hh) FROM @")
    }
    val (mergeText, mergeLast) = chain(mergeSteps, "xsf")
    ctes += mergeText
    ctes += s"xmerged AS (SELECT tok, hh FROM $mergeLast)"

    // ---- unified start: h = (seed+P5 for short | merged) + n ----
    ctes += s"""xh0 AS (
  SELECT x1.tok, x1.hx, x1.n, x1.nst,
         ((COALESCE(xmerged.hh, ${hl((Seed + P5) & M64)}) + x1.n) % $M) AS hh
  FROM x1 LEFT JOIN xmerged ON x1.tok = xmerged.tok)"""

    // ---- tail: base offset 32*nst, r = n - 32*nst in [0, 32) ----
    val tail = scala.collection.mutable.ArrayBuffer[(String, String)](
      "tr" -> s"SELECT *, (n - 32*nst) AS r FROM @")
    for (j <- 0 until 3) { // up to 3 8-byte rounds
      val p = s"t$j"
      val off = s"32*nst+${8 * j}"
      val guard = s"r >= ${8 * (j + 1)}"
      tail ++= Seq(
        s"${p}l" -> s"SELECT *, CASE WHEN $guard THEN ${lane("hx", off, 8)} ELSE 0::HUGEINT END AS ${p}_l FROM @",
        s"${p}m" -> s"SELECT *, ${mulmodc(s"${p}_l", P2)} AS ${p}_m FROM @",
        s"${p}r" -> s"SELECT *, ${rotl(s"${p}_m", 31)} AS ${p}_r FROM @",
        s"${p}o" -> s"SELECT *, ${mulmodc(s"${p}_r", P1)} AS ${p}_o FROM @",
        s"${p}x" -> s"SELECT *, ${xor64("hh", s"${p}_o")} AS ${p}_x FROM @",
        s"${p}t" -> s"SELECT *, ${rotl(s"${p}_x", 27)} AS ${p}_t FROM @",
        s"${p}f" -> s"SELECT * REPLACE (CASE WHEN $guard THEN ((${mulmodc(s"${p}_t", P1)} + ${hl(P4)}) % $M) ELSE hh END AS hh) FROM @")
    }
    val off4 = "32*nst + 8*(r//8)" // 4-byte round when r%8 >= 4
    tail ++= Seq(
      "q4l" -> s"SELECT *, CASE WHEN r % 8 >= 4 THEN ${lane("hx", off4, 4)} ELSE 0::HUGEINT END AS q4_l FROM @",
      "q4m" -> s"SELECT *, ${mulmodc("q4_l", P1)} AS q4_m FROM @",
      "q4x" -> s"SELECT *, ${xor64("hh", "q4_m")} AS q4_x FROM @",
      "q4r" -> s"SELECT *, ${rotl("q4_x", 23)} AS q4_r FROM @",
      "q4f" -> s"SELECT * REPLACE (CASE WHEN r % 8 >= 4 THEN ((${mulmodc("q4_r", P2)} + ${hl(P3)}) % $M) ELSE hh END AS hh) FROM @",
      "q4o" -> s"SELECT *, (r % 8) % 4 AS nb, 32*nst + 8*(r//8) + CASE WHEN r % 8 >= 4 THEN 4 ELSE 0 END AS boff FROM @")
    for (j <- 0 until 3) { // up to 3 byte rounds
      val p = s"b$j"
      tail ++= Seq(
        s"${p}l" -> s"SELECT *, CASE WHEN nb > $j THEN ${lane("hx", s"boff+$j", 1)} ELSE 0::HUGEINT END AS ${p}_l FROM @",
        s"${p}m" -> s"SELECT *, ${mulmodc(s"${p}_l", P5)} AS ${p}_m FROM @",
        s"${p}x" -> s"SELECT *, ${xor64("hh", s"${p}_m")} AS ${p}_x FROM @",
        s"${p}r" -> s"SELECT *, ${rotl(s"${p}_x", 11)} AS ${p}_r FROM @",
        s"${p}f" -> s"SELECT * REPLACE (CASE WHEN nb > $j THEN ${mulmodc(s"${p}_r", P1)} ELSE hh END AS hh) FROM @")
    }
    tail ++= Seq( // avalanche: h ^= h>>33; h*=P2; h ^= h>>29; h*=P3; h ^= h>>32
      "f1" -> s"SELECT * REPLACE (${xor64("hh", "hh // 8589934592::HUGEINT")} AS hh) FROM @",
      "f2" -> s"SELECT * REPLACE (${mulmodc("hh", P2)} AS hh) FROM @",
      "f3" -> s"SELECT * REPLACE (${xor64("hh", "hh // 536870912::HUGEINT")} AS hh) FROM @",
      "f4" -> s"SELECT * REPLACE (${mulmodc("hh", P3)} AS hh) FROM @",
      "f5" -> s"SELECT * REPLACE (${xor64("hh", s"hh // ${hl(BigInt(1) << 32)}")} AS hh) FROM @")
    val (tailText, tailLast) = chain(tail.toSeq, "xh0")
    ctes += tailText
    ctes += (s"$out AS (SELECT tok, hh AS h_u, " +
      s"(CASE WHEN hh >= ${hl(BigInt(1) << 63)} THEN hh - $M ELSE hh END)::BIGINT AS h_s " +
      s"FROM $tailLast)")
    ctes.mkString(",\n")
  }

  /** 64-row (bit index, 2^bit HUGEINT) lookup for exact bit extraction. */
  private def bitsCte: String = {
    val rows = (0 until 64).map(j => s"($j, ${hl(BigInt(1) << j)})").mkString(", ")
    s"bits(j, p) AS (SELECT * FROM (VALUES $rows))"
  }

  /** Oracle for q_d4x_simhash_prod: frequency-weighted 64-bit Charikar
    * SimHash over whitespace tokens with xxh64 token hashes, then the
    * brute-force hamming<=3 pair set — value-identical to the blocked
    * plan by the q_d4b pigeonhole-completeness gate.
    */
  def simhashProdOracle: String =
    s"""WITH RECURSIVE
toksrc AS (
  SELECT doc_id, unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                             ELSE string_split_regex(lower(trim(text)), '\\s+') END) AS tok
  FROM documents),
${hashCtes("toksrc", "xh")},
$bitsCte,
tf AS (SELECT doc_id, tok, count(*) AS c FROM toksrc GROUP BY 1, 2),
votes AS (
  SELECT t.doc_id, b.j, max(b.p) AS p,
         sum(t.c * CASE WHEN (x.h_u // b.p) % 2 = 1 THEN 1 ELSE -1 END) AS v
  FROM tf t JOIN xh x USING (tok) CROSS JOIN bits b
  GROUP BY 1, 2),
sigs0 AS (
  SELECT doc_id, sum(CASE WHEN v > 0 THEN p ELSE 0::HUGEINT END) AS sig
  FROM votes GROUP BY doc_id),
sigs AS (
  SELECT d.doc_id, COALESCE(s.sig, 0::HUGEINT)::UBIGINT AS sig
  FROM documents d LEFT JOIN sigs0 s USING (doc_id)),
ham AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         bit_count(xor(a.sig, b.sig)) AS hd
  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id)
SELECT id_a, id_b, CAST(hd AS INT) AS hamming
FROM ham WHERE hd <= 3 ORDER BY id_a, id_b"""

  /** Oracle for q_t5x_fingerprint_prod: winnowing (k=5 char shingles,
    * w=4 windows, SIGNED min, distinct+sort) over xxh64 shingle hashes,
    * reported as fingerprint size + md5 of the comma-joined signed values.
    */
  def fingerprintProdOracle: String =
    s"""WITH RECURSIVE
d AS (SELECT doc_id, lower(trim(text)) AS t FROM documents),
pos AS (SELECT doc_id, t, unnest(CASE WHEN length(t) < 5 THEN [1]
                                      ELSE range(1, length(t) - 3) END) AS i FROM d),
shl AS (SELECT doc_id, i, CASE WHEN length(t) < 5 THEN t ELSE substr(t, i, 5) END AS tok FROM pos),
${hashCtes("shl", "xh")},
hs AS (SELECT s.doc_id, s.i, x.h_s FROM shl s JOIN xh x USING (tok)),
cnt AS (SELECT doc_id, count(*) AS nh FROM hs GROUP BY 1),
wmins AS (
  SELECT h.doc_id, h.i, c.nh,
         CASE WHEN c.nh <= 4 THEN min(h.h_s) OVER (PARTITION BY h.doc_id)
              ELSE min(h.h_s) OVER (PARTITION BY h.doc_id ORDER BY h.i
                                    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) END AS m
  FROM hs h JOIN cnt c USING (doc_id)),
kept AS (SELECT doc_id, m FROM wmins
         WHERE (nh <= 4 AND i = 1) OR (nh > 4 AND i <= nh - 3)),
fp AS (SELECT doc_id, list(DISTINCT m ORDER BY m) AS f FROM kept GROUP BY doc_id)
SELECT doc_id, CAST(len(f) AS INT) AS fp_size, md5(array_to_string(f, ',')) AS fp_md5
FROM fp ORDER BY doc_id"""
}
