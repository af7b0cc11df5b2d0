package graft.queries

import graft.functions.TextOps

/** DuckDB oracle SQL for the text / dedup / similarity operators.
  *
  * Much of this is *generated* from the same constants the Spark operators
  * use (stopword list, language markers, minhash seeds, LSH hyperplane
  * components) so the two sides cannot drift. All hashing is md5 → identical
  * hex in both engines; integer outputs are BIGINT on both sides; float
  * accumulation is element-wise double in index order.
  */
object OracleSqlText {

  /** Shared CTE: whitespace tokens per document (parametrized source so
    * composed pipelines can run the same fragment over a canonicalized
    * corpus CTE). */
  private def toksCteFrom(src: String): String =
    s"toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM $src)"
  private val toksCte = toksCteFrom("documents")

  /** Shared CTE: distinct 3-gram shingles per document (docs with ≥3 tokens). */
  private val shinglesCte =
    """sh AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(toks) - 2),
                                      i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM toks WHERE len(toks) >= 3
)"""

  val dedupExact: String = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS canonical_doc_id, COUNT(*) AS group_size
FROM documents GROUP BY md5(text) ORDER BY content_hash"""

  /** Batch twin of StreamingAnalytics.streamingDedup's CONTRACT — exactly
    * one survivor per content hash (the replay harness counts emitted rows
    * per hash; survivor identity is arrival-order-nondeterministic within
    * a micro-batch and deliberately not pinned). */
  val streamingDedup: String = """
SELECT md5(text) AS content_hash, CAST(1 AS BIGINT) AS n_passed
FROM documents GROUP BY md5(text) ORDER BY content_hash"""

  /** Raw-jaccard filter, rounded output — mirrors Dedup.verifyPairs: the
    * Spark side's lossless candidate filters guarantee recall only for
    * J ≥ t exactly, so the threshold must compare the unrounded value. */
  private val verifySql = """
v AS (
  SELECT doc_a, doc_b,
         len(list_intersect(sa.sh, sb.sh))::DOUBLE /
           (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jaccard_raw
  FROM cand
  JOIN sh sa ON sa.doc_id = cand.doc_a
  JOIN sh sb ON sb.doc_id = cand.doc_b
)
SELECT doc_a, doc_b, ROUND(jaccard_raw, 4) AS jaccard
FROM v WHERE jaccard_raw >= 0.5 ORDER BY doc_a, doc_b"""

  val ngramJaccard: String = s"""
WITH $toksCte,
$shinglesCte,
inv AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
$verifySql"""

  /** Mirrors Dedup.incrementalNearDups over the md5-split corpus (first
    * md5 hex digit of doc_id < '4' → the ~25% "new batch"; rest "existing"):
    * the candidate CTE is the simple cross-side inverted join — the Spark
    * side's prefix/positional/index-prefix prunes are lossless, so the full
    * join is the correct oracle. */
  val incrementalNearDups: String = s"""
WITH $toksCte,
$shinglesCte,
tagged AS (SELECT doc_id, sh,
                  substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4' AS is_new
           FROM sh),
inv_n AS (SELECT doc_id, unnest(sh) AS shingle FROM tagged WHERE is_new),
inv_e AS (SELECT doc_id, unnest(sh) AS shingle FROM tagged WHERE NOT is_new),
cand AS (
  SELECT DISTINCT n.doc_id AS new_doc_id, e.doc_id AS existing_doc_id
  FROM inv_n n JOIN inv_e e USING (shingle)
),
v AS (
  SELECT new_doc_id, existing_doc_id,
         len(list_intersect(sa.sh, sb.sh))::DOUBLE /
           (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jaccard_raw
  FROM cand
  JOIN tagged sa ON sa.doc_id = cand.new_doc_id
  JOIN tagged sb ON sb.doc_id = cand.existing_doc_id
)
SELECT new_doc_id, existing_doc_id, ROUND(jaccard_raw, 4) AS jaccard
FROM v WHERE jaccard_raw >= 0.5 ORDER BY new_doc_id, existing_doc_id"""

  /** Mirrors Dedup.compactionCadence: replays BOTH index rank orders from
    * scratch — the FROZEN order (dfreq over the base snapshot alone,
    * appended/probe shingles 0-filled) and the REFRESHED one (dfreq over
    * base ∪ appended) — and counts the probe's prefix-filter candidate
    * pairs per phase. The prefix rule, size filter, positional overlap
    * bound and index bound replicate the Spark conditions exactly; the
    * double literals are interpolated from the SAME Scala constants the
    * operator uses, so the IEEE arithmetic is engine-identical. */
  def compactionCadence(threshold: Double = 0.5): String = {
    val tOver1pt = threshold / (1 + threshold)
    val t2Over1pt = 2 * threshold / (1 + threshold)
    def prefixCte(name: String, invSrc: String, dfreqSrc: String): String = s"""
$name AS (
  SELECT doc_id, shingle, sz, rn FROM (
    SELECT i.doc_id, i.shingle, i.sz,
           ROW_NUMBER() OVER (PARTITION BY i.doc_id
                              ORDER BY COALESCE(d.dfreq, 0), i.shingle) AS rn
    FROM $invSrc i LEFT JOIN $dfreqSrc d USING (shingle)) t
  WHERE rn <= sz - CEIL($threshold * sz) + 1
)"""
    def candCte(name: String, probePre: String, existPre: String): String = s"""
$name AS (
  SELECT DISTINCT a.doc_id AS new_doc_id, b.doc_id AS existing_doc_id
  FROM $probePre a JOIN $existPre b USING (shingle)
  WHERE LEAST(a.sz, b.sz) >= CEIL($threshold * GREATEST(a.sz, b.sz))
    AND LEAST(a.rn, b.rn) - 1 +
        LEAST(a.sz - a.rn, b.sz - b.rn) + 1 >= CEIL($tOver1pt * (a.sz + b.sz))
    AND (CASE WHEN a.sz <= b.sz THEN a.rn ELSE b.rn END) <=
        (CASE WHEN a.sz <= b.sz THEN a.sz ELSE b.sz END) -
          CEIL($t2Over1pt * (CASE WHEN a.sz <= b.sz THEN a.sz ELSE b.sz END)) + 1
)"""
    s"""
WITH $toksCte,
$shinglesCte,
tagged AS (SELECT doc_id, sh,
                  substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h
           FROM sh),
inv_base AS (SELECT doc_id, len(sh) AS sz, unnest(sh) AS shingle
             FROM tagged WHERE h >= '8'),
inv_exist AS (SELECT doc_id, len(sh) AS sz, unnest(sh) AS shingle
              FROM tagged WHERE h >= '4'),
inv_probe AS (SELECT doc_id, len(sh) AS sz, unnest(sh) AS shingle
              FROM tagged WHERE h < '4'),
dfreq0 AS (SELECT shingle, COUNT(*) AS dfreq FROM inv_base GROUP BY 1),
dfreq1 AS (SELECT shingle, COUNT(*) AS dfreq FROM inv_exist GROUP BY 1),
${prefixCte("pre_exist0", "inv_exist", "dfreq0")},
${prefixCte("pre_probe0", "inv_probe", "dfreq0")},
${prefixCte("pre_exist1", "inv_exist", "dfreq1")},
${prefixCte("pre_probe1", "inv_probe", "dfreq1")},
${candCte("cand0", "pre_probe0", "pre_exist0")},
${candCte("cand1", "pre_probe1", "pre_exist1")},
n_probe AS (SELECT COUNT(*) AS n_probe_docs FROM tagged WHERE h < '4'),
counts AS (
  SELECT 'appended' AS phase,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM cand0) AS n_candidates,
         (SELECT CAST(n_probe_docs AS BIGINT) FROM n_probe) AS n_probe_docs
  UNION ALL
  SELECT 'compacted',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM cand1),
         (SELECT CAST(n_probe_docs AS BIGINT) FROM n_probe))
SELECT phase, n_candidates, n_probe_docs,
       CAST(n_candidates * 1000000 // NULLIF(n_probe_docs, 0) AS BIGINT)
         AS cand_per_doc_micro
FROM counts ORDER BY phase"""
  }

  /** The containment candidate CTE chain (reads `sh`): inverted index →
    * frequency-ascending prefixes sized by each doc's own set → lossless
    * candidate pairs. Shared by [[containmentPairs]] and [[curationV3]]. */
  private def containmentCandCtes(threshold: Double): String = s"""
inv AS (SELECT doc_id, len(sh) AS sz, unnest(sh) AS shingle FROM sh),
dfreq AS (SELECT shingle, COUNT(*) AS dfreq FROM inv GROUP BY 1),
pre AS (
  SELECT doc_id AS p_doc, shingle FROM (
    SELECT i.doc_id, i.shingle, i.sz,
           ROW_NUMBER() OVER (PARTITION BY i.doc_id ORDER BY d.dfreq, i.shingle) AS rn
    FROM inv i JOIN dfreq d USING (shingle)) t
  WHERE rn <= sz - CEIL($threshold * sz) + 1
),
cand AS (
  SELECT DISTINCT LEAST(p.p_doc, f.doc_id) AS doc_a,
                  GREATEST(p.p_doc, f.doc_id) AS doc_b
  FROM pre p JOIN inv f USING (shingle)
  WHERE p.p_doc <> f.doc_id
)"""

  /** Mirrors Dedup.containmentPairs: asymmetric prefix filter (each doc
    * probes by its own size against the FULL index), min-size denominator,
    * raw-value threshold with rounded output. */
  def containmentPairs(threshold: Double = 0.8): String = s"""
WITH $toksCte,
$shinglesCte,
${containmentCandCtes(threshold)},
v AS (
  SELECT doc_a, doc_b,
         len(list_intersect(sa.sh, sb.sh))::DOUBLE / LEAST(len(sa.sh), len(sb.sh)) AS c_raw
  FROM cand
  JOIN sh sa ON sa.doc_id = cand.doc_a
  JOIN sh sb ON sb.doc_id = cand.doc_b
)
SELECT doc_a, doc_b, ROUND(c_raw, 4) AS containment
FROM v WHERE c_raw >= $threshold ORDER BY doc_a, doc_b"""

  /** First-8-hex-chars-of-md5 as a base integer for the minhash universal
    * hash family (DuckDB has no conv()). */
  private[queries] def hex8IntSql(arg: String): String =
    (0 until 8).map { i =>
      val mult = java.lang.Long.parseLong("1" + "0" * (7 - i), 16) // 16^(7-i)
      s"(strpos('0123456789abcdef', substr(md5($arg), ${i + 1}, 1)) - 1) * $mult"
    }.mkString(" + ")

  /** Band key b: concat of arithmetic-permutation min-hashes for seeds
    * 3b..3b+2 — mirrors Dedup.minhashLsh (same prime, same (a,b) seeds). */
  private def bandKeySql(b: Int): String = {
    val p = graft.operators.Dedup.MinhashPrime
    (0 until 3).map { j =>
      val (a, bb) = graft.operators.Dedup.MinhashSeeds(b * 3 + j)
      s"list_min(list_transform(hv, h -> ($a * h + $bb) % $p))"
    }.mkString("concat_ws('_', ", ", ", ")")
  }

  /** Twin of Dedup.lshParamsGate: every probability is the SAME
    * left-associated multiplication chain the Scala solver folds (each
    * step one correctly-rounded IEEE multiply — library pow() carries no
    * cross-engine guarantee), expanded into SQL text per candidate from
    * the same menu; eligibility and the chosen row re-derive with the
    * same integer-micro logic. Literals are ::DOUBLE — a bare 0.5 would
    * be DECIMAL in DuckDB and the arithmetic would diverge. */
  def lshParams(threshold: Double = 0.5,
      signatureLen: Int = graft.operators.Dedup.MinhashSeeds.length,
      maxFpLowMicro: Long = 200000L, maxFnHighMicro: Long = 200000L): String = {
    val low = threshold / 2
    val high = (1.0 + threshold) / 2
    def prod(x: String, n: Int): String = Seq.fill(n)(x).mkString("(", " * ", ")")
    val candRows = graft.operators.Dedup.lshCandidateParams(signatureLen)
      .map { case (b, r) =>
        val det = s"1.0 - ${prod(s"(1.0 - ${prod(s"CAST($threshold AS DOUBLE)", r)})", b)}"
        val fp = s"1.0 - ${prod(s"(1.0 - ${prod(s"CAST($low AS DOUBLE)", r)})", b)}"
        val fnq = prod(s"(1.0 - ${prod(s"CAST($high AS DOUBLE)", r)})", b)
        s"""  SELECT CAST($b AS BIGINT) AS bands, CAST($r AS BIGINT) AS rows_per_band,
         FLOOR(($det) * 1000000)::BIGINT AS detect_at_target_micro,
         FLOOR(($fp) * 1000000)::BIGINT AS fp_at_low_micro,
         FLOOR(($fnq) * 1000000)::BIGINT AS fn_at_high_micro"""
      }.mkString("\n  UNION ALL\n")
    s"""
WITH cand AS (
$candRows
), scored AS (
  SELECT bands, rows_per_band, detect_at_target_micro, fp_at_low_micro,
         fn_at_high_micro,
         ABS(detect_at_target_micro - 500000) AS midpoint_err_micro,
         CASE WHEN fp_at_low_micro <= $maxFpLowMicro
                AND fn_at_high_micro <= $maxFnHighMicro
              THEN 1 ELSE 0 END AS eligible
  FROM cand
)
SELECT bands, rows_per_band, detect_at_target_micro, fp_at_low_micro,
       fn_at_high_micro, midpoint_err_micro, CAST(eligible AS BIGINT) AS eligible,
       CAST(CASE WHEN eligible = 1 AND ROW_NUMBER() OVER (
              PARTITION BY eligible ORDER BY midpoint_err_micro, bands) = 1
            THEN 1 ELSE 0 END AS BIGINT) AS chosen
FROM scored ORDER BY bands"""
  }

  val minhashLsh: String = s"""
WITH $toksCte,
$shinglesCte,
shv AS (
  SELECT doc_id, sh,
         list_transform(sh, x -> (${hex8IntSql("x")}) % ${graft.operators.Dedup.MinhashPrime}) AS hv
  FROM sh
),
banded AS (
${(0 until 4).map(b =>
    s"  SELECT doc_id, $b AS band, ${bandKeySql(b)} AS key FROM shv")
    .mkString("\n  UNION ALL\n")}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
$verifySql"""

  /** First-15-hex-chars-of-md5 as a 60-bit integer (DuckDB has no conv()) —
    * the span-hash width: wide enough that corpus-scale window counts don't
    * saturate the hash space, still inside signed BIGINT. */
  private def hex15IntSql(arg: String): String =
    (0 until 15).map { i =>
      val mult = java.lang.Long.parseLong("1" + "0" * (14 - i), 16) // 16^(14-i)
      s"(strpos('0123456789abcdef', substr(md5($arg), ${i + 1}, 1)) - 1) * $mult"
    }.mkString(" + ")

  /** First-4-hex-chars-of-md5 as an integer (DuckDB has no conv()). */
  private def hex4IntSql(arg: String): String =
    (0 until 4).map { i =>
      val mult = math.pow(16, 3 - i).toLong
      s"(strpos('0123456789abcdef', substr(md5($arg), ${i + 1}, 1)) - 1) * $mult"
    }.mkString(" + ")

  val simhash: String = s"""
WITH $toksCte,
hv AS (
  SELECT doc_id,
         list_transform(list_distinct(toks), t -> ${hex4IntSql("t")}) AS hv
  FROM toks
)
SELECT doc_id,
       CAST(${(0 until 16).map(b =>
    s"(CASE WHEN list_sum(list_transform(hv, v -> ((v >> $b) & 1) * 2 - 1)) >= 0 THEN ${1 << b} ELSE 0 END)")
    .mkString(" + ")} AS BIGINT) AS simhash16
FROM hv ORDER BY doc_id"""

  val simhashPairs: String = s"""
WITH $toksCte,
hv AS (
  SELECT doc_id,
         list_transform(list_distinct(toks), t -> ${hex4IntSql("t")}) AS hv
  FROM toks
),
s AS (
  SELECT doc_id,
         CAST(${(0 until 16).map(b =>
    s"(CASE WHEN list_sum(list_transform(hv, v -> ((v >> $b) & 1) * 2 - 1)) >= 0 THEN ${1 << b} ELSE 0 END)")
    .mkString(" + ")} AS BIGINT) AS simhash16
  FROM hv
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.simhash16
FROM s a JOIN s b ON a.simhash16 = b.simhash16 AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b"""

  val tokenStats: String = s"""
WITH $toksCte
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_unique_tokens,
       ROUND(len(list_distinct(toks))::DOUBLE / len(toks), 4) AS type_token_ratio
FROM toks ORDER BY doc_id"""

  private val stopwordIn = TextOps.Stopwords.map(w => s"'$w'").mkString(", ")

  val qualityScore: String = s"""
WITH $toksCte,
q AS (
  SELECT t.doc_id,
         length(d.text) AS n_chars,
         len(toks) AS n_tokens,
         len(list_filter(toks, x -> x IN ($stopwordIn))) AS n_stopwords,
         length(regexp_replace(d.text, '[a-z0-9 ]', '', 'g')) AS n_punct
  FROM toks t JOIN documents d ON d.doc_id = t.doc_id
)
SELECT doc_id, n_chars, n_tokens, n_stopwords, n_punct,
       ROUND(n_stopwords::DOUBLE / n_tokens, 4) AS stopword_ratio,
       ROUND(n_punct::DOUBLE / NULLIF(n_chars, 0), 4) AS punct_ratio,
       ROUND(LEAST(n_tokens, 200)::DOUBLE / 200.0 *
             (1.0 - ROUND(n_punct::DOUBLE / NULLIF(n_chars, 0), 4)), 4) AS quality_score
FROM q ORDER BY doc_id"""

  private val markerValues =
    TextOps.LangMarkers.map { case (l, w) => s"('$l', '$w')" }.mkString(", ")

  /** The marker-vote CTE chain [[languageId]], [[langConfusion]] and
    * [[curationV2]] share; `src` is the doc table the vote reads. */
  private def langIdCtes(src: String = "documents"): String = s"""markers(cand_lang, word) AS (VALUES $markerValues),
ex AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM $src),
votes AS (
  SELECT doc_id, cand_lang, COUNT(*) AS votes
  FROM ex JOIN markers USING (word) GROUP BY doc_id, cand_lang
),
best AS (
  SELECT doc_id, cand_lang, votes
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY votes DESC, cand_lang) AS rn
        FROM votes) t
  WHERE rn = 1
)"""

  val languageId: String = s"""
WITH ${langIdCtes()}
SELECT d.doc_id, COALESCE(b.cand_lang, 'und') AS predicted_lang,
       COALESCE(b.votes, 0) AS marker_votes
FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
ORDER BY d.doc_id"""

  /** Mirrors TextOps.langConfusion: prediction joined to the labeled
    * lang, (label, predicted) rollup with per-label shares. */
  val langConfusion: String = s"""
WITH ${langIdCtes()},
pred AS (
  SELECT d.doc_id, d.lang AS label_lang,
         COALESCE(b.cand_lang, 'und') AS predicted_lang
  FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
),
g AS (
  SELECT label_lang, predicted_lang, COUNT(*) AS n_docs
  FROM pred GROUP BY 1, 2
)
SELECT label_lang, predicted_lang, n_docs,
       ROUND(n_docs * 100.0 / SUM(n_docs) OVER (PARTITION BY label_lang), 2)
         AS pct_of_label
FROM g ORDER BY label_lang, predicted_lang"""

  val fingerprint: String = """
SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint
FROM documents ORDER BY doc_id"""

  val winnowFingerprints: String = s"""
WITH $toksCte,
p AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' ')) AS sh_pos
  FROM toks WHERE len(toks) >= 6
),
h AS (
  SELECT doc_id, list_transform(sh_pos, x -> ${hex8IntSql("x")}) AS hv FROM p
),
m AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(hv) - 3),
                                      j -> list_min(hv[j:j+3]))) AS fps
  FROM h
)
SELECT doc_id, unnest(fps) AS fingerprint FROM m ORDER BY doc_id, fingerprint"""

  /** Winnow-pair twin: same fingerprint CTEs as winnowFingerprints, then
    * the inverted-index pair count at minShared = 2. */
  val winnowPairs: String = s"""
WITH $toksCte,
p AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' ')) AS sh_pos
  FROM toks WHERE len(toks) >= 6
),
h AS (
  SELECT doc_id, list_transform(sh_pos, x -> ${hex8IntSql("x")}) AS hv FROM p
),
m AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(hv) - 3),
                                      j -> list_min(hv[j:j+3]))) AS fps
  FROM h
),
fp AS (SELECT doc_id, unnest(fps) AS fingerprint FROM m)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared_fingerprints
FROM fp a JOIN fp b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= 2
ORDER BY doc_a, doc_b"""

  val bpeTokenStats: String = s"""
WITH $toksCte,
c AS (
  SELECT t.doc_id,
         CAST(len(regexp_extract_all(d.text, '${TextOps.BpePattern}')) AS BIGINT) AS n_bpe_tokens,
         len(toks) AS n_ws_tokens
  FROM toks t JOIN documents d ON d.doc_id = t.doc_id
)
SELECT doc_id, n_bpe_tokens, n_ws_tokens,
       ROUND(n_bpe_tokens::DOUBLE / n_ws_tokens, 4) AS tokens_per_word
FROM c ORDER BY doc_id"""

  val topTokens: String = s"""
WITH ex AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
SELECT token, COUNT(*) AS occurrences, COUNT(DISTINCT doc_id) AS doc_frequency
FROM ex GROUP BY token
ORDER BY occurrences DESC, token LIMIT 20"""

  /** Twin of TextOps.zipfFit: identical (freq desc, token) rank order,
    * micro-nat quantization of each ln on exact integers, HUGEINT OLS
    * sums, and the same double-cast-first expression nesting in the
    * readout so both engines evaluate one fixed tree. */
  def zipfFit(k: Int = 1000): String = s"""
WITH occ AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
census AS (SELECT token, COUNT(*) AS freq FROM occ GROUP BY token
           ORDER BY freq DESC, token LIMIT $k),
ranked AS (SELECT freq,
                  ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS rank
           FROM census),
pts AS (SELECT CAST(floor(ln(rank::DOUBLE) * 1e6) AS BIGINT) AS x,
               CAST(floor(ln(freq::DOUBLE) * 1e6) AS BIGINT) AS y
        FROM ranked),
s AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy
      FROM pts)
SELECT n AS n_tokens,
       ROUND((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
             NULLIF(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE, 0.0), 6)
         AS slope,
       ROUND((sy::DOUBLE - ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
                            NULLIF(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE, 0.0))
                           * sx::DOUBLE) / n::DOUBLE / 1e6, 6) AS intercept_ln,
       ROUND((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) *
             (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
             NULLIF((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) *
                    (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE), 0.0), 6)
         AS r2
FROM s"""

  /** Mirrors TextOps.sourceDivergence: identical expression nesting for
    * the per-term contribution (same double divisions, same `ln`, same
    * ×1e6 quantization) so both engines sum the SAME integers. */
  def sourceDivergence: String = s"""
WITH occ AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
st AS (SELECT source, token, COUNT(*) AS stf FROM occ GROUP BY 1, 2),
ss AS (SELECT source, COUNT(*) AS s_total FROM occ GROUP BY 1),
ct AS (SELECT token, COUNT(*) AS ctf FROM occ GROUP BY 1),
tot AS (SELECT COUNT(*) AS n_total FROM occ),
c AS (
  SELECT st.source,
         CAST(ROUND((st.stf::DOUBLE / ss.s_total) *
                    LN((st.stf::DOUBLE * tot.n_total) / (ss.s_total::DOUBLE * ct.ctf))
                    * 1000000) AS BIGINT) AS micro
  FROM st JOIN ss USING (source) JOIN ct USING (token) CROSS JOIN tot
)
SELECT source, COUNT(*) AS n_terms,
       CAST(SUM(micro) AS BIGINT) / 1000000.0 AS kl_divergence
FROM c GROUP BY 1 ORDER BY source"""

  /** Mirrors TextOps.tokenEntropy: per-(source,token) −p·ln p terms
    * quantized to integer micro-nats (the sourceDivergence discipline),
    * BIGINT sum, integer-div type-token ratio, NULL evenness for
    * single-type vocabularies. */
  val tokenEntropy: String = s"""
WITH occ AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
st AS (SELECT source, token, COUNT(*) AS stf FROM occ GROUP BY 1, 2),
ss AS (SELECT source, CAST(SUM(stf) AS BIGINT) AS n_tokens,
              CAST(COUNT(*) AS BIGINT) AS n_types
       FROM st GROUP BY 1),
m AS (
  SELECT st.source, ss.n_tokens, ss.n_types,
         CAST(ROUND(-((st.stf::DOUBLE / ss.n_tokens) *
                      LN(st.stf::DOUBLE / ss.n_tokens)) * 1000000) AS BIGINT) AS micro
  FROM st JOIN ss USING (source)
)
SELECT source,
       CAST(MAX(n_tokens) AS BIGINT) AS n_tokens,
       CAST(MAX(n_types) AS BIGINT) AS n_types,
       CAST(SUM(micro) AS BIGINT) / 1000000.0 AS entropy_nats,
       CASE WHEN MAX(n_types) <= 1 THEN NULL
            ELSE ROUND((CAST(SUM(micro) AS BIGINT) / 1000000.0) /
                       LN(MAX(n_types)::DOUBLE), 4)
       END AS evenness,
       MAX(n_types) * 10000 // MAX(n_tokens) AS ttr_bp
FROM m GROUP BY 1 ORDER BY source"""

  /** Mirrors TextOps.negativeSampling: tf^0.75 as sqrt(sqrt(tf³)) over
    * the same fixed-order double product, micro-quantized before the
    * exact BIGINT running sum; shares are integer ppm. */
  val negativeSampling: String = s"""
WITH tf AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY 1
),
wm AS (
  SELECT token, tf,
         CAST(ROUND(sqrt(sqrt(tf::DOUBLE * tf * tf)) * 1000000) AS BIGINT) AS w_micro
  FROM tf
),
r AS (
  SELECT token, tf, w_micro,
         CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, token) AS BIGINT) AS rank,
         CAST(SUM(w_micro) OVER (ORDER BY tf DESC, token
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_micro,
         CAST(SUM(w_micro) OVER () AS BIGINT) AS total_micro
  FROM wm
)
SELECT token, tf, w_micro, rank, cum_micro * 1000000 // total_micro AS cum_ppm
FROM r ORDER BY rank"""

  /** Mirrors TextOps.sourceOverlap — the oracle uses the token-keyed
    * self-join form (the Spark side explodes per-token rosters), so the
    * gate proves roster-pair generation against the join definition. */
  val sourceOverlap: String = """
WITH st AS (SELECT DISTINCT source, unnest(string_split(text, ' ')) AS token
            FROM documents),
n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_types FROM st GROUP BY 1),
pair AS (
  SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM st a JOIN st b USING (token)
  WHERE a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_common,
       na.n_types AS types_a, nb.n_types AS types_b,
       n_common * 10000 // (na.n_types + nb.n_types - n_common) AS jaccard_bp
FROM pair JOIN n na ON na.source = src_a JOIN n nb ON nb.source = src_b
ORDER BY src_a, src_b"""

  /** Mirrors TextOps.pmiPairs: offset-1/2 ordered pairs from the same
    * narrow positional transform, marginals from the pair census, one
    * micro-quantized ln per emitted top-k row. */
  def pmiPairs(maxOffset: Int = 2, topK: Int = 50): String = {
    val unions = (1 to maxOffset).map { d =>
      s"""  SELECT unnest(list_transform(generate_series(1, len(toks) - $d),
           i -> {'tok_a': toks[i], 'tok_b': toks[i+$d]})) AS p
  FROM toks WHERE len(toks) > $d"""
    }.mkString("\n  UNION ALL\n")
    s"""
WITH $toksCte,
pr AS (
$unions
),
cnt AS (SELECT p.tok_a AS tok_a, p.tok_b AS tok_b, CAST(COUNT(*) AS BIGINT) AS c
        FROM pr GROUP BY 1, 2),
ua AS (SELECT tok_a, CAST(SUM(c) AS BIGINT) AS ca FROM cnt GROUP BY 1),
ub AS (SELECT tok_b, CAST(SUM(c) AS BIGINT) AS cb FROM cnt GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cnt),
top AS (
  SELECT tok_a, tok_b, c FROM cnt ORDER BY c DESC, tok_a, tok_b LIMIT $topK
)
SELECT tok_a, tok_b, c,
       CAST(ROUND(LN(c::DOUBLE * n / (ca::DOUBLE * cb)) * 1000000) AS BIGINT)
         AS pmi_micro
FROM top JOIN ua USING (tok_a) JOIN ub USING (tok_b) CROSS JOIN tot
ORDER BY c DESC, tok_a, tok_b"""
  }

  /** Mirrors TextOps.vocabCoverage: census → (tf desc, token) rank →
    * running sum → checkpoint ranks; integer basis points via `//`. */
  def vocabCoverage(ks: Seq[Int] = Seq(10, 100, 1000, 10000)): String = s"""
WITH ex AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (SELECT token, COUNT(*) AS tf FROM ex GROUP BY 1),
t AS (SELECT CAST(SUM(tf) AS BIGINT) AS n_total, COUNT(*) AS n_vocab FROM tf),
r AS (
  SELECT token, tf,
         CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, token) AS BIGINT) AS rank,
         CAST(SUM(tf) OVER (ORDER BY tf DESC, token
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tf
  FROM tf
)
SELECT rank AS top_k, cum_tf AS covered_tokens, n_total AS total_tokens,
       n_vocab AS vocab_size, cum_tf * 10000 // n_total AS coverage_bp
FROM r CROSS JOIN t
WHERE rank IN (${ks.mkString(", ")})
ORDER BY top_k"""

  val repetitionStats: String = s"""
WITH $toksCte,
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+1], ' '))) AS bigram
  FROM toks WHERE len(toks) >= 2
),
cnt AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram),
agg AS (SELECT doc_id, SUM(c) AS n, MAX(c) AS mx, COUNT(*) AS dn FROM cnt GROUP BY doc_id)
SELECT doc_id, CAST(n AS BIGINT) AS n_bigrams,
       ROUND(1.0 - dn::DOUBLE / n, 4) AS dup_bigram_frac,
       ROUND(mx::DOUBLE / n, 4) AS top_bigram_frac
FROM agg ORDER BY doc_id"""

  val rollingHash: String = s"""
SELECT doc_id,
       CAST(list_reduce(
         list_prepend(0, list_transform(generate_series(1, length(text)),
                                        i -> CAST(ascii(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT))),
         (acc, c) -> (acc * ${TextOps.RollingHashBase} + c) % ${TextOps.RollingHashMod}) AS BIGINT)
         AS rolling_hash
FROM documents ORDER BY doc_id"""

  /** Element-wise double dot product in index order (mirrors
    * Similarity.dotProduct). */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, len($a)), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))"

  /** NULLIF denominator mirrors Similarity.safeDenom — a zero vector makes
    * cosine null on both engines instead of crashing (Spark ANSI) or
    * producing inf (DuckDB IEEE). */
  private def cosSql(a: String, b: String): String =
    s"ROUND(${dotSql(a, b)} / NULLIF(sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}), 0), 6)"

  /** Exact-cosine top-k (mirrors Similarity.bruteForceTopK) at pool size
    * `k` — the k=5 form is the ann_cosine_topk gate; hybridRrf pools at 10. */
  private def cosTopKSql(k: Int): String = s"""
WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ${cosSql("q.q_emb", "e.embedding")} AS cosine_sim
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cosine_sim, rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM scored) t
WHERE rank <= $k ORDER BY query_id, rank"""

  val annTopK: String = cosTopKSql(5)

  /** Mirrors Similarity.filteredTopK: the brute-force oracle with the
    * label predicate in the join — candidates are the query's label
    * partition only. */
  def annFilteredTopK(k: Int = 5, nQueries: Int = 5): String = s"""
WITH q AS (SELECT vec_id AS query_id, label, embedding AS q_emb
           FROM embeddings WHERE vec_id < $nQueries),
scored AS (
  SELECT q.query_id, CAST(q.label AS BIGINT) AS label, e.vec_id AS neighbor_id,
         ${cosSql("q.q_emb", "e.embedding")} AS cosine_sim
  FROM q JOIN embeddings e ON e.label = q.label AND e.vec_id <> q.query_id
)
SELECT query_id, label, neighbor_id, cosine_sim, rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM scored) t
WHERE rank <= $k ORDER BY query_id, rank"""

  /** Mirrors Similarity.rrfFusion: the two ANN oracles as derived tables,
    * integer micro-unit contributions (1e6 // (kRrf+rank)), full join on
    * (query, neighbor), re-rank with neighbor_id tie-break. */
  def annRrfFusion(k: Int = 5, kRrf: Int = 60): String = s"""
WITH a AS (SELECT query_id, neighbor_id, rank AS rank_cos FROM ($annTopK) t1),
b AS (SELECT query_id, neighbor_id, rank AS rank_lsh FROM ($annLshTopK) t2),
f AS (
  SELECT query_id, neighbor_id, rank_cos, rank_lsh,
         CAST(COALESCE(1000000 // ($kRrf + rank_cos), 0) +
              COALESCE(1000000 // ($kRrf + rank_lsh), 0) AS BIGINT) AS rrf_micro
  FROM a FULL JOIN b USING (query_id, neighbor_id)
),
r AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY rrf_micro DESC, neighbor_id) AS BIGINT)
              AS fused_rank
  FROM f
)
SELECT query_id, neighbor_id, rank_cos, rank_lsh, rrf_micro, fused_rank
FROM r WHERE fused_rank <= $k ORDER BY query_id, fused_rank"""

  /** Mirrors Search.bm25TopK: rational-idf BM25 with integer-micro per-term
    * contributions (floored before the sum so the per-doc score is an exact
    * BIGINT total, immune to float summation order). The k1/b-derived
    * constants are interpolated from the SAME Scala doubles the Spark side
    * uses (Double.toString round-trips bit-exactly), never re-derived in
    * SQL — `1.2 + 1.0` need not round to the literal `2.2`. */
  def bm25TopK(k: Int = 5, nQueries: Int = 5,
      k1: Double = 1.2, b: Double = 0.75): String = s"""
WITH $toksCte,
t AS (SELECT doc_id, unnest(toks) AS term FROM toks),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
dl AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM toks),
corpus AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
qt AS (SELECT doc_id AS query_id, unnest(list_distinct(toks)) AS term
       FROM toks WHERE doc_id < $nQueries),
qs AS (SELECT query_id, term, df, n_docs, sum_dl
       FROM qt JOIN dfq USING (term) CROSS JOIN corpus),
s AS (
  SELECT qs.query_id, tf.doc_id,
         (qs.n_docs::DOUBLE - qs.df::DOUBLE + 0.5) / (qs.df::DOUBLE + 0.5) AS idf,
         (tf.tf::DOUBLE * ${k1 + 1.0}) /
           (tf.tf::DOUBLE + $k1 * (${1.0 - b} + $b *
              (dl.dl::DOUBLE / (qs.sum_dl::DOUBLE / qs.n_docs::DOUBLE)))) AS sat
  FROM tf JOIN qs USING (term) JOIN dl ON dl.doc_id = tf.doc_id
  WHERE tf.doc_id <> qs.query_id
),
sc AS (
  SELECT query_id, doc_id,
         CAST(SUM(CAST(floor(idf * sat * 1000000.0) AS BIGINT)) AS BIGINT) AS score_micro
  FROM s GROUP BY 1, 2
),
r AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rank
  FROM sc
)
SELECT query_id, doc_id, score_micro, rank
FROM r WHERE rank <= $k ORDER BY query_id, rank"""

  /** Mirrors Search.hybridRrf: BM25 lexical top-`poolK` fused with exact-
    * cosine dense top-`poolK` by integer RRF micro-units. */
  def hybridRrf(k: Int = 5, poolK: Int = 10, kRrf: Int = 60): String = s"""
WITH lex AS (SELECT query_id, doc_id, rank AS rank_lex FROM (${bm25TopK(poolK)}) t1),
dense AS (SELECT query_id, neighbor_id AS doc_id, rank AS rank_dense
          FROM (${cosTopKSql(poolK)}) t2),
f AS (
  SELECT query_id, doc_id, rank_lex, rank_dense,
         CAST(COALESCE(1000000 // ($kRrf + rank_lex), 0) +
              COALESCE(1000000 // ($kRrf + rank_dense), 0) AS BIGINT) AS rrf_micro
  FROM lex FULL JOIN dense USING (query_id, doc_id)
),
r AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY rrf_micro DESC, doc_id) AS BIGINT)
              AS fused_rank
  FROM f
)
SELECT query_id, doc_id, rank_lex, rank_dense, rrf_micro, fused_rank
FROM r WHERE fused_rank <= $k ORDER BY query_id, fused_rank"""

  /** Mirrors Search.phraseTopK: positional bigram stream semi-joined
    * against the probe phrases (each probe doc's leading two tokens),
    * consecutive-occurrence count, per-query top-k. */
  def phraseTopK(k: Int = 5, nQueries: Int = 5): String = s"""
WITH $toksCte,
t2 AS (SELECT doc_id, toks FROM toks WHERE len(toks) >= 2),
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+1], ' '))) AS bigram
  FROM t2
),
ph AS (
  SELECT doc_id AS query_id, array_to_string(toks[1:2], ' ') AS phrase
  FROM t2 WHERE doc_id < $nQueries
),
c AS (
  SELECT ph.query_id, bg.doc_id, ph.phrase, COUNT(*) AS n_occurrences
  FROM bg JOIN ph ON bg.bigram = ph.phrase AND bg.doc_id <> ph.query_id
  GROUP BY 1, 2, 3
),
r AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY n_occurrences DESC, doc_id) AS BIGINT) AS rank
  FROM c
)
SELECT query_id, doc_id, phrase, n_occurrences, rank
FROM r WHERE rank <= $k ORDER BY query_id, rank"""

  /** Mirrors Validators.linregProfile: per-source normal-equations fit of
    * n_chars on token count from exact BIGINT moment sums (DuckDB's
    * SUM(BIGINT) returns HUGEINT — CAST back before the arithmetic so the
    * factor products stay in the same integer domain Spark computes in). */
  val linregProfile: String = s"""
WITH b AS (
  SELECT source, len(string_split(text, ' '))::BIGINT AS x, n_chars AS y
  FROM documents
),
m AS (
  SELECT source, COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM b GROUP BY source
),
f AS (
  SELECT source, n,
         n * sxy - sx * sy AS a_,
         n * sxx - sx * sx AS b_,
         n * syy - sy * sy AS c_,
         sx, sy
  FROM m
)
SELECT source, n,
       ROUND(a_::DOUBLE / NULLIF(b_, 0)::DOUBLE, 8) AS slope,
       ROUND((sy::DOUBLE - (a_::DOUBLE / NULLIF(b_, 0)::DOUBLE) * sx::DOUBLE)
             / n::DOUBLE, 8) AS intercept,
       ROUND((a_::DOUBLE * a_::DOUBLE) /
             NULLIF(b_::DOUBLE * c_::DOUBLE, 0.0), 8) AS r2
FROM f ORDER BY source"""

  /** Mirrors TextOps.qualityCalibrated: the quality oracle as a derived
    * table, per-source integer-bp percentile with (score, doc_id) tie
    * order, null scores excluded, keep = top share cut. */
  def qualityCalibrated(keepBp: Int = 3000): String = s"""
WITH q AS (SELECT doc_id, quality_score FROM ($qualityScore) t
           WHERE quality_score IS NOT NULL),
j AS (
  SELECT d.doc_id, d.source, q.quality_score
  FROM documents d JOIN q USING (doc_id)
),
r AS (
  SELECT doc_id, source, quality_score,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
                                 ORDER BY quality_score, doc_id) AS BIGINT) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
  FROM j
)
SELECT doc_id, source, quality_score,
       CAST(CASE WHEN n_src = 1 THEN 0
                 ELSE ((rk - 1) * 10000) // (n_src - 1) END AS BIGINT) AS pct_rank_bp,
       CASE WHEN n_src = 1 THEN 0
            ELSE ((rk - 1) * 10000) // (n_src - 1) END >= ${10000 - keepBp} AS keep
FROM r ORDER BY doc_id"""

  /** Mirrors TextOps.perplexityFilter: the bigram-LM oracle as a derived
    * table, then the qualityCalibrated percentile/keep form over
    * avg_logprob (ascending rank: worst perplexity first). */
  def perplexityFilter(keepBp: Int = 7000): String = s"""
WITH lm AS (SELECT doc_id, avg_logprob FROM ($bigramLogProb) t),
j AS (
  SELECT d.doc_id, d.source, lm.avg_logprob
  FROM documents d JOIN lm USING (doc_id)
),
r AS (
  SELECT doc_id, source, avg_logprob,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
                                 ORDER BY avg_logprob, doc_id) AS BIGINT) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
  FROM j
)
SELECT doc_id, source, avg_logprob,
       CAST(CASE WHEN n_src = 1 THEN 0
                 ELSE ((rk - 1) * 10000) // (n_src - 1) END AS BIGINT) AS pct_rank_bp,
       CASE WHEN n_src = 1 THEN 0
            ELSE ((rk - 1) * 10000) // (n_src - 1) END >= ${10000 - keepBp} AS keep
FROM r ORDER BY doc_id"""

  /** Mirrors Similarity.labelScatter: exact integer-micro centroids (the
    * Lloyd convention, [[microMeanBody]]), rounded-6 index-order cosines
    * micro-quantized before the per-label mean, |labels|² between-centroid
    * stage. */
  val labelScatter: String = s"""
WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
comp AS (
  SELECT label, unnest(embedding) AS comp, generate_subscripts(embedding, 1) AS pos
  FROM e
),
cm AS (${microMeanBody("label, pos", "comp")}),
cents AS (SELECT label, list(mean ORDER BY pos) AS centroid FROM cm GROUP BY 1),
w0 AS (
  SELECT e.label, ${cosSql("e.embedding", "c.centroid")} AS cos0
  FROM e JOIN cents c USING (label)
),
w AS (SELECT label, CASE WHEN isnan(cos0) THEN NULL ELSE cos0 END AS cos FROM w0),
wm AS (
  SELECT label, COUNT(*) AS n_vecs,
         CAST(SUM(CAST(floor(cos * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_micro,
         MIN(CAST(floor(cos * 1000000.0) AS BIGINT)) AS min_micro
  FROM w GROUP BY 1
),
p0 AS (
  SELECT a.label, b.label AS other_label,
         ${cosSql("a.centroid", "b.centroid")} AS bcos0
  FROM cents a JOIN cents b ON b.label <> a.label
),
p AS (SELECT label, other_label,
             CASE WHEN isnan(bcos0) THEN NULL ELSE bcos0 END AS bcos FROM p0),
n AS (
  SELECT label, other_label AS nearest_label, bcos AS between_cos
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                                     ORDER BY bcos DESC, other_label) AS rn
        FROM p) t
  WHERE rn = 1
)
SELECT wm.label, wm.n_vecs,
       ROUND(CAST(wm.sum_micro AS DOUBLE) / wm.n_vecs / 1000000.0, 4) AS avg_within_cos,
       ROUND(CAST(wm.min_micro AS DOUBLE) / 1000000.0, 4) AS min_within_cos,
       n.nearest_label, n.between_cos
FROM wm JOIN n USING (label) ORDER BY wm.label"""

  val nearDupPairs: String = s"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ${cosSql("a.embedding", "b.embedding")} AS cosine_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.45
ORDER BY vec_a, vec_b"""

  /** Multi-table SRP-LSH near-dup twin (mirrors Similarity.nearDupPairsLsh):
    * the same 240 hyperplanes as a VALUES CTE, the same index-order double
    * dot products for the sign bits, the same (table, code) equality
    * candidates, the same exact verify. */
  def nearDupPairsLsh(threshold: Double = 0.45, bits: Int = 5, tables: Int = 48, dim: Int = 64): String = {
    val planeRows = (0 until bits * tables).map { p =>
      val comps = (0 until dim)
        .map(d => graft.operators.Similarity.planeComponent(p, d)).mkString("[", ", ", "]")
      s"($p, $comps)"
    }.mkString(",\n  ")
    s"""
WITH planes(p, comps) AS (VALUES
  $planeRows),
bits AS (
  SELECT e.vec_id, p.p,
         CASE WHEN list_sum(list_transform(generate_series(1, $dim),
                    d -> e.embedding[d]::DOUBLE * p.comps[d])) >= 0 THEN 1 ELSE 0 END AS bit
  FROM embeddings e CROSS JOIN planes p
),
codes AS (
  SELECT vec_id, p // $bits AS tbl, CAST(SUM(bit * (1 << (p % $bits))) AS BIGINT) AS code
  FROM bits GROUP BY vec_id, p // $bits
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM codes a JOIN codes b ON a.tbl = b.tbl AND a.code = b.code AND a.vec_id < b.vec_id
),
v AS (
  SELECT c.vec_a, c.vec_b, ${cosSql("a.embedding", "b.embedding")} AS cosine_sim
  FROM cand c
  JOIN embeddings a ON a.vec_id = c.vec_a
  JOIN embeddings b ON b.vec_id = c.vec_b
)
SELECT vec_a, vec_b, cosine_sim FROM v WHERE cosine_sim >= $threshold
ORDER BY vec_a, vec_b"""
  }

  /** Sign-random-projection bucket id — embeds the exact hyperplane
    * constants Similarity.lshBucket computes driver-side, summed in the same
    * left-to-right order so the sign decisions are bit-identical. */
  private def bucketSql(embCol: String, nPlanes: Int, dim: Int): String =
    (0 until nPlanes).map { p =>
      val dot = (0 until dim).map(d =>
        s"$embCol[${d + 1}]::DOUBLE * ${graft.operators.Similarity.planeComponent(p, d)}")
        .mkString(" + ")
      s"(CASE WHEN ($dot) >= 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")

  val annLshTopK: String = s"""
WITH b AS (SELECT vec_id, embedding, ${bucketSql("embedding", 4, 64)} AS bucket FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS q_emb, bucket FROM b WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ${cosSql("q.q_emb", "e.embedding")} AS cosine_sim
  FROM q JOIN b e ON e.bucket = q.bucket AND e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cosine_sim, rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM scored) t
WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Composed curation twin (mirrors Curation.curate with the default
    * thresholds): quality ≥ 0.3 ∧ n_tokens ≥ 5 ∧ lang = en, then exact-dedup
    * canonicalization among the survivors. */
  val curation: String = s"""
WITH $toksCte,
q AS (
  SELECT t.doc_id, d.text,
         len(toks) AS n_tokens,
         ROUND(LEAST(len(toks), 200)::DOUBLE / 200.0 *
               (1.0 - ROUND(length(regexp_replace(d.text, '[a-z0-9 ]', '', 'g'))::DOUBLE
                            / NULLIF(length(d.text), 0), 4)), 4) AS quality_score
  FROM toks t JOIN documents d ON d.doc_id = t.doc_id
),
markers(cand_lang, word) AS (VALUES $markerValues),
ex AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
votes AS (
  SELECT doc_id, cand_lang, COUNT(*) AS votes
  FROM ex JOIN markers USING (word) GROUP BY doc_id, cand_lang
),
best AS (
  SELECT doc_id, cand_lang FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY votes DESC, cand_lang) AS rn
    FROM votes) t
  WHERE rn = 1
),
lang AS (
  SELECT d.doc_id, COALESCE(b.cand_lang, 'und') AS predicted_lang
  FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
),
f AS (
  SELECT q.doc_id, q.text, q.n_tokens, q.quality_score, lang.predicted_lang
  FROM q JOIN lang ON lang.doc_id = q.doc_id
  WHERE q.quality_score >= 0.3 AND q.n_tokens >= 5 AND lang.predicted_lang = 'en'
),
c AS (SELECT MIN(doc_id) AS doc_id FROM f GROUP BY md5(text))
SELECT f.doc_id, CAST(f.n_tokens AS BIGINT) AS n_tokens, f.quality_score, f.predicted_lang
FROM f JOIN c USING (doc_id) ORDER BY f.doc_id"""

  /** v2 curation twin (mirrors Curation.curateV2 with the default
    * thresholds): exact-dedup canonicalization FIRST (novelty is
    * corpus-relative — see the operator scaladoc), then every signal over
    * the deduplicated corpus, then the gates. */
  def curationV2(minQuality: Double = 0.3, minTokens: Int = 5,
      maxTokens: Int = 5000, lang: String = "en", minNovelty: Double = 0.1,
      minLogProb: Double = -3.45): String = s"""
WITH canon AS (
  SELECT d.doc_id, d.text
  FROM documents d
  JOIN (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)) cc
    USING (doc_id)
),
toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM canon),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(toks) - 4),
                                      i -> array_to_string(toks[i:i+4], ' '))) AS sh
  FROM toks WHERE len(toks) >= 5
),
q AS (
  SELECT t.doc_id,
         len(toks) AS n_tokens,
         ROUND(LEAST(len(toks), 200)::DOUBLE / 200.0 *
               (1.0 - ROUND(length(regexp_replace(d.text, '[a-z0-9 ]', '', 'g'))::DOUBLE
                            / NULLIF(length(d.text), 0), 4)), 4) AS quality_score
  FROM toks t JOIN canon d ON d.doc_id = t.doc_id
),
${langIdCtes("canon")},
lang AS (
  SELECT d.doc_id, COALESCE(b.cand_lang, 'und') AS predicted_lang
  FROM canon d LEFT JOIN best b ON d.doc_id = b.doc_id
),
sstream AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
sdf AS (SELECT shingle, COUNT(*) AS df FROM sstream GROUP BY 1),
nov AS (
  SELECT doc_id,
         ROUND(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 4)
           AS novelty_ratio
  FROM sstream JOIN sdf USING (shingle) GROUP BY doc_id
),
occ AS (SELECT doc_id, unnest(toks) AS token FROM toks),
tf AS (SELECT token, COUNT(*) AS tf FROM occ GROUP BY 1),
tot AS (SELECT COUNT(*) AS n_total FROM occ),
lpt AS (SELECT token, ln(tf::DOUBLE / n_total) AS logprob FROM tf CROSS JOIN tot),
lp AS (
  SELECT doc_id, ROUND(AVG(logprob), 4) AS avg_logprob
  FROM occ JOIN lpt USING (token) GROUP BY doc_id
)
SELECT q.doc_id, CAST(q.n_tokens AS BIGINT) AS n_tokens, q.quality_score,
       lang.predicted_lang, nov.novelty_ratio, lp.avg_logprob
FROM q
JOIN lang ON lang.doc_id = q.doc_id
JOIN nov ON nov.doc_id = q.doc_id
JOIN lp ON lp.doc_id = q.doc_id
WHERE q.quality_score >= $minQuality AND q.n_tokens BETWEEN $minTokens AND $maxTokens
  AND lang.predicted_lang = '$lang'
  AND nov.novelty_ratio >= $minNovelty AND lp.avg_logprob >= $minLogProb
ORDER BY q.doc_id"""

  /** KMV distinct-count sketch twin (mirrors Sketches.kmvDistinct over
    * events.user_id, k=256): same md5-derived [0,2³²) hashes, same k-th
    * order statistic, same (k−1)·2³²/h_k estimator. */
  val sketchKmvDistinct: String = s"""
WITH h AS (
  SELECT DISTINCT (${hex8IntSql("user_id::VARCHAR")}) AS hv FROM events
),
t AS (
  SELECT COUNT(*) AS m, MAX(hv) AS kth_hash
  FROM (SELECT hv FROM h ORDER BY hv LIMIT 256) s
),
e AS (SELECT COUNT(*) AS exact_distinct FROM h),
r AS (
  SELECT CAST(256 AS BIGINT) AS k, kth_hash,
         ROUND(CASE WHEN m < 256 THEN m::DOUBLE
                    ELSE 255.0 * 4294967296.0 / NULLIF(kth_hash, 0) END, 4) AS kmv_estimate,
         exact_distinct
  FROM t, e
)
SELECT k, kth_hash, kmv_estimate, exact_distinct,
       ROUND(ABS(kmv_estimate - exact_distinct) / exact_distinct, 4) AS rel_error
FROM r"""

  /** Per-group KMV twin (events.user_id distinct per event_type, k=64). */
  val sketchKmvByType: String = s"""
WITH h AS (
  SELECT DISTINCT event_type, (${hex8IntSql("user_id::VARCHAR")}) AS hv FROM events
),
t AS (
  SELECT event_type, COUNT(*) AS m, MAX(hv) AS kth_hash FROM (
    SELECT event_type, hv,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
    FROM h) s
  WHERE rn <= 64 GROUP BY event_type
),
e AS (SELECT event_type, COUNT(*) AS exact_distinct FROM h GROUP BY event_type),
r AS (
  SELECT t.event_type, CAST(64 AS BIGINT) AS k, t.kth_hash,
         ROUND(CASE WHEN t.m < 64 THEN t.m::DOUBLE
                    ELSE 63.0 * 4294967296.0 / NULLIF(t.kth_hash, 0) END, 4) AS kmv_estimate,
         e.exact_distinct
  FROM t JOIN e ON e.event_type = t.event_type
)
SELECT event_type, k, kth_hash, kmv_estimate, exact_distinct,
       ROUND(ABS(kmv_estimate - exact_distinct) / exact_distinct, 4) AS rel_error
FROM r ORDER BY event_type"""

  /** Mirrors Sketches.kmvJaccardPairs over events (event-type pairs,
    * user_id keys): per-type k-min sketches, per-pair k smallest of the
    * sketch union with membership tags, ρ = both/|L|, L's own KMV union
    * estimate, intersection = ρ·union; exact Jaccard from the full
    * distinct projection rides along. */
  def sketchKmvJaccard(k: Int = 256): String = s"""
WITH h AS (
  SELECT DISTINCT event_type AS grp, (${hex8IntSql("user_id::VARCHAR")}) AS hv FROM events
),
sk AS (
  SELECT grp, hv FROM (
    SELECT grp, hv, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY hv) AS rn
    FROM h) s
  WHERE rn <= $k
),
pairs AS (
  SELECT a.grp AS type_a, b.grp AS type_b
  FROM (SELECT DISTINCT grp FROM sk) a, (SELECT DISTINCT grp FROM sk) b
  WHERE a.grp < b.grp
),
member AS (
  SELECT p.type_a, p.type_b, s.hv,
         MAX(CASE WHEN s.grp = p.type_a THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN s.grp = p.type_b THEN 1 ELSE 0 END) AS in_b
  FROM pairs p JOIN sk s ON s.grp = p.type_a OR s.grp = p.type_b
  GROUP BY 1, 2, 3
),
ell AS (
  SELECT type_a, type_b, COUNT(*) AS m, MAX(hv) AS kth_hash,
         CAST(SUM(in_a * in_b) AS BIGINT) AS n_both
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY type_a, type_b ORDER BY hv) AS rn
        FROM member) t
  WHERE rn <= $k GROUP BY 1, 2
),
sizes AS (SELECT grp, COUNT(*) AS n FROM h GROUP BY 1),
inter AS (
  SELECT x.grp AS type_a, y.grp AS type_b, COUNT(*) AS n_inter
  FROM h x JOIN h y ON y.hv = x.hv AND x.grp < y.grp
  GROUP BY 1, 2
),
exact AS (
  SELECT p.type_a, p.type_b,
         CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
         sa.n AS n_a, sb.n AS n_b
  FROM pairs p
  JOIN sizes sa ON sa.grp = p.type_a
  JOIN sizes sb ON sb.grp = p.type_b
  LEFT JOIN inter i ON i.type_a = p.type_a AND i.type_b = p.type_b
)
SELECT e.type_a, e.type_b, CAST($k AS BIGINT) AS k, e.m,
       ROUND(n_both::DOUBLE / e.m, 4) AS jaccard_est,
       ROUND(CASE WHEN e.m < $k THEN e.m::DOUBLE
                  ELSE ${k - 1}.0 * 4294967296.0 / NULLIF(e.kth_hash, 0) END, 4) AS union_est,
       ROUND((n_both::DOUBLE / e.m) *
             CASE WHEN e.m < $k THEN e.m::DOUBLE
                  ELSE ${k - 1}.0 * 4294967296.0 / NULLIF(e.kth_hash, 0) END, 4)
         AS intersection_est,
       ROUND(x.n_inter::DOUBLE / (x.n_a + x.n_b - x.n_inter), 4) AS exact_jaccard
FROM ell e JOIN exact x ON x.type_a = e.type_a AND x.type_b = e.type_b
ORDER BY e.type_a, e.type_b"""

  /** IVF ANN oracle: the k-means quantizer IS SQL-expressible once the Lloyd
    * rounds are unrolled — init from the `nCentroids` lowest vec_ids, then
    * per round: assign by argmin of ‖c‖² − 2·v·c (ties → lowest cell, the
    * array_position-of-min semantics), recompute per-(cell,pos) means
    * ROUND(AVG, 6)::FLOAT (the rounding pins double-summation order on both
    * engines), empty cells keep their previous centroid. Mirrors
    * Similarity.ivfTopK arithmetic exactly: index-order double accumulation
    * for cc and dots, score = cc − 2·dot. */
  /** Exact integer-micro mean body shared by every Lloyd-style centroid
    * build (round-9 verdict #6 — retires ROUND(AVG(double), 6), whose
    * partial-sum order is engine-internal): NaN comps null out of the
    * census, each comp floors to integer micro, the mean is
    * floor_div(sum, count) in integer arithmetic (everything non-negative
    * or exactly divisible, so `//` is floor), and one deterministic /1e6
    * denormalizes. `src` must be an aliased relation exposing ($keys,
    * comp). Twin: Similarity.compMicro/microMean. */
  private def microMeanBody(keys: String, src: String): String = s"""
  SELECT $keys,
         CASE WHEN cnt = 0 THEN NULL
              ELSE (((sm - ((sm % cnt + cnt) % cnt)) // cnt)::DOUBLE / 1000000.0)::FLOAT
         END AS mean
  FROM (
    SELECT $keys, SUM(xm) AS sm, COUNT(xm) AS cnt
    FROM (SELECT $keys,
                 CASE WHEN isnan(comp::DOUBLE) THEN NULL
                      ELSE CAST(floor(comp::DOUBLE * 1e6) AS BIGINT) END AS xm
          FROM $src q0) q
    GROUP BY $keys) g"""

  /** The shared deterministic-k-means CTE chain (init from lowest vec_ids,
    * `iters` unrolled Lloyd rounds, final assignment): yields `s${iters+1}`
    * (per-vector per-centroid scores) and `cells` (vec_id, embedding,
    * cell). Used by [[annIvfTopK]] and [[semDedup]] — one quantizer, two
    * operators, zero drift. */
  private def ivfCellsCtes(nCentroids: Int, iters: Int, dim: Int,
      trainSrc: String = "embeddings", assignSrc: String = "embeddings",
      prefix: String = ""): String = {
    val p = prefix
    def scoresCte(i: Int, prev: String, src: String = assignSrc) = s"""
${p}s$i AS (
  SELECT e.vec_id, e.embedding, c.cell,
         list_sum(list_transform(generate_series(1, $dim),
                  d -> c.centroid[d]::DOUBLE * c.centroid[d]::DOUBLE))
         - 2.0 * list_sum(list_transform(generate_series(1, $dim),
                  d -> e.embedding[d]::DOUBLE * c.centroid[d]::DOUBLE)) AS score
  FROM $src e CROSS JOIN $prev c
)"""
    def lloydCtes(i: Int): String = s"""${scoresCte(i, s"${p}c${i - 1}", trainSrc)},
${p}a$i AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score, cell) AS rn FROM ${p}s$i) t
  WHERE rn = 1
),
${p}m$i AS (${microMeanBody("cell, pos", s"""(
    SELECT cell, unnest(embedding) AS comp,
           unnest(generate_series(1, len(embedding))) AS pos
    FROM ${p}a$i)""")}
),
${p}c$i AS (
  SELECT p.cell, COALESCE(n.centroid, p.centroid) AS centroid
  FROM ${p}c${i - 1} p
  LEFT JOIN (SELECT cell, list(mean ORDER BY pos) AS centroid FROM ${p}m$i GROUP BY cell) n
    USING (cell)
)"""
    s"""${p}c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS centroid
  FROM $trainSrc ORDER BY vec_id LIMIT $nCentroids
),
${(1 to iters).map(lloydCtes).mkString(",")},
${scoresCte(iters + 1, s"${p}c$iters")},
${p}cells AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score, cell) AS rn
    FROM ${p}s${iters + 1}) t
  WHERE rn = 1
)"""
  }

  /** Mirrors Similarity.pqCodes: per-subspace Lloyd chains (the
    * [[ivfCellsCtes]] construction on an embedding slice, CTE names
    * prefixed `p{s}`), final assignment keeps the chosen score so the
    * readout can recompose ‖v−c‖² = v·v + score; NaN subspaces yield
    * NULL err on both engines (CASE-guarded before the BIGINT cast). */
  /** The per-subspace Lloyd chains shared by [[embedPqCodes]] and
    * [[annPqTopK]]: for each subspace `s`, yields `p{s}e` (the slice),
    * `p{s}v` (v·v), `p{s}c{iters}` (the final codebook) and `p{s}cells`
    * (assignment + chosen score). */
  private def pqChains(m: Int, subDim: Int, k: Int, iters: Int): String = {
    def chain(s: Int): String = {
      val o = s * subDim
      val src = s"p${s}e"
      def scoresCte(i: Int, prev: String) = s"""
p${s}s$i AS (
  SELECT e.vec_id, e.embedding, c.cell,
         list_sum(list_transform(generate_series(1, $subDim),
                  d -> c.centroid[d]::DOUBLE * c.centroid[d]::DOUBLE))
         - 2.0 * list_sum(list_transform(generate_series(1, $subDim),
                  d -> e.embedding[d]::DOUBLE * c.centroid[d]::DOUBLE)) AS score
  FROM $src e CROSS JOIN $prev c
)"""
      def lloydCtes(i: Int): String = s"""${scoresCte(i, s"p${s}c${i - 1}")},
p${s}a$i AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score, cell) AS rn
    FROM p${s}s$i) t
  WHERE rn = 1
),
p${s}m$i AS (${microMeanBody("cell, pos", s"""(
    SELECT cell, unnest(embedding) AS comp,
           unnest(generate_series(1, len(embedding))) AS pos
    FROM p${s}a$i)""")}
),
p${s}c$i AS (
  SELECT p.cell, COALESCE(n.centroid, p.centroid) AS centroid
  FROM p${s}c${i - 1} p
  LEFT JOIN (SELECT cell, list(mean ORDER BY pos) AS centroid
             FROM p${s}m$i GROUP BY cell) n
    USING (cell)
)"""
      s"""$src AS (
  SELECT vec_id, embedding[${o + 1}:${o + subDim}] AS embedding FROM embeddings
),
p${s}v AS (
  SELECT vec_id,
         list_sum(list_transform(generate_series(1, $subDim),
                  d -> embedding[d]::DOUBLE * embedding[d]::DOUBLE)) AS vv
  FROM $src
),
p${s}c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS centroid
  FROM $src ORDER BY vec_id LIMIT $k
),
${(1 to iters).map(lloydCtes).mkString(",")},
${scoresCte(iters + 1, s"p${s}c$iters")},
p${s}cells AS (
  SELECT vec_id, cell, score FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score, cell) AS rn
    FROM p${s}s${iters + 1}) t
  WHERE rn = 1
)"""
    }
    (0 until m).map(chain).mkString(",")
  }

  def embedPqCodes(m: Int = 4, subDim: Int = 16, k: Int = 8,
      iters: Int = 2): String = {
    val joins = (0 until m).map(s =>
      s"JOIN p${s}cells c$s USING (vec_id) JOIN p${s}v v$s USING (vec_id)").mkString("\n")
    val codeCols = (0 until m).map(s =>
      s"CAST(c$s.cell AS BIGINT) AS code_$s").mkString(",\n       ")
    val errTerms = (0 until m).map(s =>
      s"CASE WHEN isnan(v$s.vv + c$s.score) THEN NULL ELSE CAST(FLOOR((v$s.vv + c$s.score) * 1e6) AS BIGINT) END")
      .mkString("\n         + ")
    s"""
WITH ${pqChains(m, subDim, k, iters)}
SELECT e.vec_id,
       $codeCols,
       ($errTerms) AS err_micros
FROM (SELECT vec_id FROM embeddings) e
$joins
ORDER BY e.vec_id"""
  }

  /** Mirrors Similarity.pqTopK: per-query distance tables to the
    * codebook centroids (same q·q − 2 q·c + c·c composition as the
    * Spark kernels, floored micro partials), summed by code lookup via
    * the `+` chain (NULL propagates — the Spark side guards its SUM to
    * match), per-query rank with NULLS LAST and neighbor tie-break. */
  def annPqTopK(nQueries: Int = 5, kTop: Int = 5, m: Int = 4,
      subDim: Int = 16, k: Int = 8, iters: Int = 2): String = {
    def distCte(s: Int): String = {
      val o = s * subDim
      s"""
d$s AS (
  SELECT query_id, cell,
         CASE WHEN isnan(raw) THEN NULL
              ELSE CAST(FLOOR(raw * 1e6) AS BIGINT) END AS micro
  FROM (
    SELECT q.query_id, c.cell,
           list_sum(list_transform(generate_series(1, $subDim),
                    d -> q.embedding[$o + d]::DOUBLE * q.embedding[$o + d]::DOUBLE))
           - 2.0 * list_sum(list_transform(generate_series(1, $subDim),
                    d -> q.embedding[$o + d]::DOUBLE * c.centroid[d]::DOUBLE))
           + list_sum(list_transform(generate_series(1, $subDim),
                    d -> c.centroid[d]::DOUBLE * c.centroid[d]::DOUBLE)) AS raw
    FROM q CROSS JOIN p${s}c$iters c) t
)"""
    }
    val cellJoins = (1 until m).map(s => s"JOIN p${s}cells r$s USING (vec_id)").mkString("\n  ")
    val distJoins = (0 until m).map(s =>
      if (s == 0) s"JOIN d0 ON d0.cell = r0.cell"
      else s"JOIN d$s ON d$s.query_id = d0.query_id AND d$s.cell = r$s.cell").mkString("\n  ")
    val microSum = (0 until m).map(s => s"d$s.micro").mkString(" + ")
    s"""
WITH ${pqChains(m, subDim, k, iters)},
q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < $nQueries),
${(0 until m).map(distCte).mkString(",")},
adc AS (
  SELECT d0.query_id, r0.vec_id AS neighbor_id, $microSum AS adc_micros
  FROM p0cells r0
  $cellJoins
  $distJoins
  WHERE r0.vec_id <> d0.query_id
)
SELECT query_id, neighbor_id, adc_micros, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY adc_micros ASC NULLS LAST, neighbor_id) AS BIGINT) AS rank
  FROM adc) t
WHERE rank <= $kTop ORDER BY query_id, rank"""
  }

  def annIvfTopK(nQueries: Int = 5, k: Int = 5, nCentroids: Int = 8,
      nProbe: Int = 2, iters: Int = 3, dim: Int = 64): String = {
    s"""
WITH ${ivfCellsCtes(nCentroids, iters, dim)},
probe AS (
  SELECT vec_id AS query_id, embedding AS q_emb, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score, cell) AS rn
    FROM s${iters + 1} WHERE vec_id < $nQueries) t
  WHERE rn <= $nProbe
),
scored AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
         ${cosSql("p.q_emb", "c.embedding")} AS cosine_sim
  FROM probe p JOIN cells c USING (cell)
  WHERE c.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, cosine_sim, rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM scored) t
WHERE rank <= $k ORDER BY query_id, rank"""
  }

  /** Mirrors the `ann_ivf_indexed_append` gate: the quantizer trains ONLY on
    * the "existing" split (md5 first hex digit of vec_id >= '2', ~87%), the
    * final assignment covers every vector — exactly what build-then-append
    * produces, since appended vectors are assigned to the frozen centroids.
    * Everything else (probe, scoring, tie-breaks) is [[annIvfTopK]]. */
  def annIvfIndexedAppend(nQueries: Int = 5, k: Int = 5, nCentroids: Int = 8,
      nProbe: Int = 2, iters: Int = 3, dim: Int = 64): String = {
    s"""
WITH train AS (
  SELECT * FROM embeddings
  WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) >= '2'
),
${ivfCellsCtes(nCentroids, iters, dim, trainSrc = "train")},
probe AS (
  SELECT vec_id AS query_id, embedding AS q_emb, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score, cell) AS rn
    FROM s${iters + 1} WHERE vec_id < $nQueries) t
  WHERE rn <= $nProbe
),
scored AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
         ${cosSql("p.q_emb", "c.embedding")} AS cosine_sim
  FROM probe p JOIN cells c USING (cell)
  WHERE c.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, cosine_sim, rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM scored) t
WHERE rank <= $k ORDER BY query_id, rank"""
  }

  /** Mirrors Similarity.ivfRecallDrift: the shared quantizer CTEs build
    * the frozen centroids; the drifted batch (ids offset, components ×
    * 0.0625 — an exact power-of-two float scaling) is assigned to them
    * with the same argmin-score/lowest-cell rule; both phases' probes and
    * exact brute-force rankings replay the annIvfTopK shapes; the final
    * projection re-derives recall, drop, and the rebuild trigger in the
    * same integer arithmetic. */
  def annRecallDrift(nQueries: Int = 5, k: Int = 5, nCentroids: Int = 8,
      nProbe: Int = 2, iters: Int = 3, dim: Int = 64): String = {
    val poss = nQueries.toLong * k
    val off = graft.operators.Similarity.DriftIdOffset
    def scoreExpr(e: String, c: String): String = s"""
         list_sum(list_transform(generate_series(1, $dim),
                  d -> $c.centroid[d]::DOUBLE * $c.centroid[d]::DOUBLE))
         - 2.0 * list_sum(list_transform(generate_series(1, $dim),
                  d -> $e.embedding[d]::DOUBLE * $c.centroid[d]::DOUBLE))"""
    s"""
WITH ${ivfCellsCtes(nCentroids, iters, dim)},
bprobe AS (
  SELECT vec_id AS query_id, embedding AS q_emb, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score, cell) AS rn
    FROM s${iters + 1} WHERE vec_id < $nQueries) t
  WHERE rn <= $nProbe),
btopk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY p.query_id
             ORDER BY ${cosSql("p.q_emb", "c.embedding")} DESC, c.vec_id) AS rank
    FROM bprobe p JOIN cells c USING (cell) WHERE c.vec_id <> p.query_id) t
  WHERE rank <= $k),
bexact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY ${cosSql("q.embedding", "e.embedding")} DESC, e.vec_id) AS rank
    FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
    WHERE q.vec_id < $nQueries) t
  WHERE rank <= $k),
shifted AS (
  SELECT vec_id + $off AS vec_id,
         list_transform(embedding, x -> (x::DOUBLE * 0.0625)::FLOAT) AS embedding
  FROM embeddings
  WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) < '2'),
driftq AS (SELECT vec_id, embedding FROM shifted ORDER BY vec_id LIMIT $nQueries),
scells AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY ${scoreExpr("e", "c")}, c.cell) AS rn
    FROM shifted e CROSS JOIN c$iters c) t
  WHERE rn = 1),
postings2 AS (
  SELECT vec_id, embedding, cell FROM cells
  UNION ALL SELECT vec_id, embedding, cell FROM scells),
dprobe AS (
  SELECT vec_id AS query_id, embedding AS q_emb, cell FROM (
    SELECT q.vec_id, q.embedding, c.cell,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY ${scoreExpr("q", "c")}, c.cell) AS rn
    FROM driftq q CROSS JOIN c$iters c) t
  WHERE rn <= $nProbe),
dtopk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY p.query_id
             ORDER BY ${cosSql("p.q_emb", "c.embedding")} DESC, c.vec_id) AS rank
    FROM dprobe p JOIN postings2 c USING (cell) WHERE c.vec_id <> p.query_id) t
  WHERE rank <= $k),
corpus2 AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL SELECT vec_id, embedding FROM shifted),
dexact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY ${cosSql("q.embedding", "e.embedding")} DESC, e.vec_id) AS rank
    FROM driftq q JOIN corpus2 e ON e.vec_id <> q.vec_id) t
  WHERE rank <= $k),
ph AS (
  SELECT 'baseline' AS phase,
         (SELECT COUNT(*) FROM btopk JOIN bexact USING (query_id, neighbor_id)) AS hits
  UNION ALL
  SELECT 'drifted',
         (SELECT COUNT(*) FROM dtopk JOIN dexact USING (query_id, neighbor_id))),
r AS (
  SELECT phase, CAST(hits AS BIGINT) AS hits, CAST($poss AS BIGINT) AS possible,
         CAST(hits * 1000000 // $poss AS BIGINT) AS recall_micro
  FROM ph)
SELECT phase, hits, possible, recall_micro,
       CAST(b.base_recall - recall_micro AS BIGINT) AS drop_vs_baseline_micro,
       CAST(CASE WHEN b.base_recall - recall_micro > 100000 THEN 1 ELSE 0 END
            AS BIGINT) AS rebuild
FROM r CROSS JOIN (SELECT recall_micro AS base_recall FROM r
                   WHERE phase = 'baseline') b
ORDER BY phase"""
  }

  /** Mirrors Similarity.ivfRebuildRecovery: the annRecallDrift protocol
    * (frozen-centroid build, norm-collapsed append, baseline + drifted
    * probes) followed by the EXECUTED spherical rebuild — a second Lloyd
    * chain (prefix `rb`) over corpus2 in UNIT space (each vector divided
    * by its index-order double L2 norm and cast back to FLOAT; zero/NaN
    * norms keep the raw vector, the Spark `unitized` CASE verbatim),
    * postings re-assigned by unit-space argmin, drift queries assigned by
    * their unit vectors, scoring still the rounded cosine on raw
    * embeddings. The rebuilt row's drop must come back under the 100000-
    * micro trigger — the IvfRebuildSpec pins that, this twin pins the
    * arithmetic cross-engine. */
  def annRebuildRecovery(nQueries: Int = 10, k: Int = 10, nCentroids: Int = 16,
      nProbe: Int = 2, iters: Int = 3, dim: Int = 64): String = {
    val poss = nQueries.toLong * k
    val off = graft.operators.Similarity.DriftIdOffset
    // shared with the Spark operator (drift-proofing): 2^-10, exact decimal
    val scale = graft.operators.Similarity.RecoveryDriftScale
    val frac = graft.operators.Similarity.RecoveryDriftFracHex
    def scoreExpr(emb: String, c: String): String = s"""
         list_sum(list_transform(generate_series(1, $dim),
                  d -> $c.centroid[d]::DOUBLE * $c.centroid[d]::DOUBLE))
         - 2.0 * list_sum(list_transform(generate_series(1, $dim),
                  d -> $emb[d]::DOUBLE * $c.centroid[d]::DOUBLE))"""
    def unitExpr(src: String): String = s"""
  SELECT vec_id, embedding AS raw_emb,
         CASE WHEN nrm IS NULL OR nrm = 0 OR isnan(nrm) THEN embedding
              ELSE list_transform(embedding, x -> (x::DOUBLE / nrm)::FLOAT)
         END AS embedding
  FROM (SELECT vec_id, embedding,
               sqrt(${dotSql("embedding", "embedding")}) AS nrm
        FROM $src) t0"""
    s"""
WITH ${ivfCellsCtes(nCentroids, iters, dim)},
bprobe AS (
  SELECT vec_id AS query_id, embedding AS q_emb, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score, cell) AS rn
    FROM s${iters + 1} WHERE vec_id < $nQueries) t
  WHERE rn <= $nProbe),
btopk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY p.query_id
             ORDER BY ${cosSql("p.q_emb", "c.embedding")} DESC, c.vec_id) AS rank
    FROM bprobe p JOIN cells c USING (cell) WHERE c.vec_id <> p.query_id) t
  WHERE rank <= $k),
bexact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY ${cosSql("q.embedding", "e.embedding")} DESC, e.vec_id) AS rank
    FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
    WHERE q.vec_id < $nQueries) t
  WHERE rank <= $k),
shifted AS (
  SELECT vec_id + $off AS vec_id,
         list_transform(embedding, x -> (x::DOUBLE * $scale)::FLOAT) AS embedding
  FROM embeddings
  WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) < '$frac'),
driftq AS (SELECT vec_id, embedding FROM shifted ORDER BY vec_id LIMIT $nQueries),
twinq AS (SELECT vec_id - $off AS vec_id FROM driftq),
tprobe AS (
  SELECT vec_id AS query_id, embedding AS q_emb, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score, cell) AS rn
    FROM s${iters + 1} WHERE vec_id IN (SELECT vec_id FROM twinq)) t
  WHERE rn <= $nProbe),
ttopk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY p.query_id
             ORDER BY ${cosSql("p.q_emb", "c.embedding")} DESC, c.vec_id) AS rank
    FROM tprobe p JOIN cells c USING (cell) WHERE c.vec_id <> p.query_id) t
  WHERE rank <= $k),
texact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY ${cosSql("q.embedding", "e.embedding")} DESC, e.vec_id) AS rank
    FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
    WHERE q.vec_id IN (SELECT vec_id FROM twinq)) t
  WHERE rank <= $k),
scells AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY ${scoreExpr("e.embedding", "c")}, c.cell) AS rn
    FROM shifted e CROSS JOIN c$iters c) t
  WHERE rn = 1),
postings2 AS (
  SELECT vec_id, embedding, cell FROM cells
  UNION ALL SELECT vec_id, embedding, cell FROM scells),
dprobe AS (
  SELECT vec_id AS query_id, embedding AS q_emb, cell FROM (
    SELECT q.vec_id, q.embedding, c.cell,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY ${scoreExpr("q.embedding", "c")}, c.cell) AS rn
    FROM driftq q CROSS JOIN c$iters c) t
  WHERE rn <= $nProbe),
dtopk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY p.query_id
             ORDER BY ${cosSql("p.q_emb", "c.embedding")} DESC, c.vec_id) AS rank
    FROM dprobe p JOIN postings2 c USING (cell) WHERE c.vec_id <> p.query_id) t
  WHERE rank <= $k),
corpus2 AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL SELECT vec_id, embedding FROM shifted),
dexact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY ${cosSql("q.embedding", "e.embedding")} DESC, e.vec_id) AS rank
    FROM driftq q JOIN corpus2 e ON e.vec_id <> q.vec_id) t
  WHERE rank <= $k),
u2 AS (${unitExpr("corpus2")}),
${ivfCellsCtes(nCentroids, iters, dim, trainSrc = "u2", assignSrc = "u2",
      prefix = "rb")},
rbpost AS (
  SELECT c2.vec_id, c2.embedding, rb.cell
  FROM corpus2 c2 JOIN rbcells rb USING (vec_id)),
uq AS (${unitExpr("driftq")}),
rprobe AS (
  SELECT vec_id AS query_id, raw_emb AS q_emb, cell FROM (
    SELECT q.vec_id, q.raw_emb, c.cell,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY ${scoreExpr("q.embedding", "c")}, c.cell) AS rn
    FROM uq q CROSS JOIN rbc$iters c) t
  WHERE rn <= $nProbe),
rtopk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY p.query_id
             ORDER BY ${cosSql("p.q_emb", "c.embedding")} DESC, c.vec_id) AS rank
    FROM rprobe p JOIN rbpost c USING (cell) WHERE c.vec_id <> p.query_id) t
  WHERE rank <= $k),
ph AS (
  SELECT 'baseline' AS phase,
         (SELECT COUNT(*) FROM btopk JOIN bexact USING (query_id, neighbor_id)) AS hits
  UNION ALL
  SELECT 'twin',
         (SELECT COUNT(*) FROM ttopk JOIN texact USING (query_id, neighbor_id))
  UNION ALL
  SELECT 'drifted',
         (SELECT COUNT(*) FROM dtopk JOIN dexact USING (query_id, neighbor_id))
  UNION ALL
  SELECT 'rebuilt',
         (SELECT COUNT(*) FROM rtopk JOIN dexact USING (query_id, neighbor_id))),
r AS (
  SELECT phase, CAST(hits AS BIGINT) AS hits, CAST($poss AS BIGINT) AS possible,
         CAST(hits * 1000000 // $poss AS BIGINT) AS recall_micro
  FROM ph)
SELECT phase, hits, possible, recall_micro,
       CAST(b.base_recall - recall_micro AS BIGINT) AS drop_vs_baseline_micro,
       CAST(CASE WHEN phase IN ('drifted', 'rebuilt')
                  AND b.base_recall - recall_micro > 100000
                 THEN 1 ELSE 0 END AS BIGINT) AS rebuild_due,
       CAST(CASE WHEN phase IN ('drifted', 'rebuilt')
                 THEN t.twin_recall - recall_micro ELSE 0 END
            AS BIGINT) AS drop_vs_twin_micro,
       CAST(CASE WHEN phase = 'rebuilt'
                  AND t.twin_recall - recall_micro <= 100000
                  AND recall_micro >= d.drift_recall
                 THEN 1 ELSE 0 END AS BIGINT) AS recovered
FROM r
CROSS JOIN (SELECT recall_micro AS base_recall FROM r WHERE phase = 'baseline') b
CROSS JOIN (SELECT recall_micro AS twin_recall FROM r WHERE phase = 'twin') t
CROSS JOIN (SELECT recall_micro AS drift_recall FROM r WHERE phase = 'drifted') d
ORDER BY phase"""
  }

  /** Mirrors Similarity.kmeansClusters: the shared Lloyd quantizer CTEs'
    * final assignment plus a per-cluster size census. */
  def embedKmeans(nCentroids: Int = 8, iters: Int = 3, dim: Int = 64): String = s"""
WITH ${ivfCellsCtes(nCentroids, iters, dim)},
sz AS (SELECT cell, COUNT(*) AS n FROM cells GROUP BY cell)
SELECT c.vec_id, CAST(c.cell AS BIGINT) AS cluster, CAST(sz.n AS BIGINT) AS cluster_size
FROM cells c JOIN sz USING (cell) ORDER BY vec_id"""

  /** Mirrors Similarity.outlierScreen: the shared quantizer CTEs, exact
    * integer micro² distance to the assigned (FLOAT-cast) centroid with
    * NaN components nulled on both sides, quantile_cont tail threshold,
    * strict > membership. */
  def embedOutliers(nCentroids: Int = 8, iters: Int = 3, dim: Int = 64,
      tailBp: Int = 500): String = s"""
WITH ${ivfCellsCtes(nCentroids, iters, dim)},
comps AS (
  SELECT cl.vec_id, cl.cell,
         unnest(generate_series(1, len(cl.embedding))) AS pos,
         unnest(cl.embedding) AS x
  FROM cells cl),
terms AS (
  SELECT c.vec_id, c.cell,
         (CASE WHEN isnan(c.x) THEN NULL
               ELSE CAST(floor(c.x::DOUBLE * 1e6) AS BIGINT) END
          - CASE WHEN isnan(ct.centroid[c.pos]::DOUBLE) THEN NULL
                 ELSE CAST(floor(ct.centroid[c.pos]::DOUBLE * 1e6) AS BIGINT) END)
           AS df
  FROM comps c JOIN c$iters ct ON ct.cell = c.cell),
d2 AS (
  SELECT vec_id, cell, CAST(SUM(df * df) AS BIGINT) AS dist2_micro2
  FROM terms GROUP BY 1, 2),
thr AS (SELECT quantile_cont(dist2_micro2, ${1.0 - tailBp / 10000.0}) AS thr FROM d2)
SELECT vec_id, CAST(cell AS BIGINT) AS cluster, dist2_micro2,
       dist2_micro2 > thr AS is_outlier
FROM d2 CROSS JOIN thr ORDER BY vec_id"""

  /** Mirrors Similarity.diversitySample: hash-rank cap per k-means
    * cluster over the same quantizer CTEs. */
  def sampleDiversity(perCluster: Int = 10, nCentroids: Int = 8,
      iters: Int = 3, dim: Int = 64): String = s"""
WITH ${ivfCellsCtes(nCentroids, iters, dim)},
r AS (
  SELECT vec_id, CAST(cell AS BIGINT) AS cluster,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY cell
           ORDER BY (${hex8IntSql("vec_id::VARCHAR")}), vec_id) AS BIGINT) AS sample_rank
  FROM cells
)
SELECT vec_id, cluster, sample_rank FROM r
WHERE sample_rank <= $perCluster ORDER BY cluster, sample_rank"""

  /** Mirrors Similarity.semDedup: the same Lloyd quantizer CTEs as the IVF
    * oracle, an in-cell lower-id self-join with the exact rounded cosine
    * (NaN ≥ tau is TRUE in DuckDB's total order — the kernel's
    * `passes(NaN)` mirrors exactly that), max-sim evidence pair per
    * dropped vector, left join back to the roster. */
  def semDedup(tau: Double = 0.45, nCentroids: Int = 8, iters: Int = 3,
      dim: Int = 64): String = s"""
WITH ${ivfCellsCtes(nCentroids, iters, dim)},
p AS (
  SELECT b.vec_id AS vec_id, a.vec_id AS lower_id,
         ${cosSql("a.embedding", "b.embedding")} AS cos
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
),
q AS (SELECT * FROM p WHERE cos >= $tau),
best AS (
  SELECT vec_id, lower_id AS nn_lower_id, cos AS nn_lower_sim
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY cos DESC, lower_id) AS rn FROM q) t
  WHERE rn = 1
)
SELECT c.vec_id, CAST(c.cell AS BIGINT) AS cell, b.nn_lower_id, b.nn_lower_sim,
       (b.nn_lower_id IS NOT NULL) AS dropped
FROM cells c LEFT JOIN best b USING (vec_id)
ORDER BY vec_id"""

  /** Image-decode oracle: DuckDB cannot decode a PNG, but it doesn't have
    * to — the fixture pixels are a pure function of doc_id
    * (Multimodal.withImagePayloads: w = 4 + id mod 5, h = 3 + id mod 4,
    * pixel = (31·id + 7x + 13y) mod 256), so the expected decode output is
    * recomputed analytically here. The Spark side gets these numbers by
    * actually round-tripping ImageIO PNG bytes; a hash match therefore
    * certifies the real codec path, which is exactly what a stored-
    * expected-values gate is for. The tiny fixed 8×6 grid is filtered per
    * doc (w ≤ 8, h ≤ 6 by construction). */
  private val imageFixtureCtes: String = """px AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
),
vals AS (
  SELECT d.doc_id, d.w, d.h, gx.x AS x, gy.y AS y,
         (d.doc_id * 31 + 7 * gx.x + 13 * gy.y) % 256 AS v
  FROM px d
  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS x) gx
  CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS y) gy
  WHERE gx.x < d.w AND gy.y < d.h
)"""

  val mmFeatures: String = s"""
WITH $imageFixtureCtes
SELECT doc_id, w AS img_w, h AS img_h,
       CAST(SUM(v) AS BIGINT) AS px_sum, MIN(v) AS px_min, MAX(v) AS px_max
FROM vals GROUP BY doc_id, w, h ORDER BY doc_id"""

  /** Twin of Multimodal.imageAHashGroups: bit i (row-major) of the aHash
    * is v·(w·h) > Σv — the same integer cross-multiply the Spark side
    * computes over pixels it actually DECODED; the group predicate mirrors
    * mmPhashDedup's removed-rows convention. Fixture pixel patterns repeat
    * every lcm(5,4,256) = 1280 doc_ids, so groups genuinely occur. */
  val mmImageAHash: String = s"""
WITH $imageFixtureCtes,
t AS (SELECT doc_id, CAST(MAX(w * h) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS total
      FROM vals GROUP BY doc_id),
hsh AS (
  SELECT v.doc_id,
         CAST(COALESCE(SUM(CASE WHEN v.v * t.n > t.total
                                THEN CAST(1 AS BIGINT) << (v.y * v.w + v.x)
                                ELSE 0 END), 0) AS BIGINT) AS ahash
  FROM vals v JOIN t ON t.doc_id = v.doc_id
  GROUP BY v.doc_id
)
SELECT doc_id, ahash, canonical_doc_id, group_size FROM (
  SELECT doc_id, ahash,
         MIN(doc_id) OVER (PARTITION BY ahash) AS canonical_doc_id,
         CAST(COUNT(*) OVER (PARTITION BY ahash) AS BIGINT) AS group_size
  FROM hsh) g
WHERE group_size > 1 ORDER BY doc_id"""

  /** Twin of Multimodal.poolImages: the same 2×2 floor_div average pool
    * replayed on the fixture formula (edge blocks pool what they cover —
    * GROUP BY x//2, y//2 is exactly that windowing). */
  val mmImageDownsample: String = s"""
WITH $imageFixtureCtes,
pooled AS (
  SELECT doc_id, x // 2 AS ox, y // 2 AS oy,
         CAST(SUM(v) AS BIGINT) // COUNT(*) AS pv
  FROM vals GROUP BY doc_id, x // 2, y // 2
),
agg AS (
  SELECT doc_id, CAST(SUM(pv) AS BIGINT) AS pool_sum,
         MIN(pv) AS pool_min, MAX(pv) AS pool_max
  FROM pooled GROUP BY doc_id
)
SELECT p.doc_id, (p.w + 1) // 2 AS out_w, (p.h + 1) // 2 AS out_h,
       a.pool_sum, a.pool_min, a.pool_max
FROM px p JOIN agg a USING (doc_id) ORDER BY p.doc_id"""

  /** Audio fixture CTEs: the closed form of Multimodal.withAudioPayloads'
    * waveform — n = 800 + (doc_id mod 5)·80 samples,
    * s_k = ((doc_id·31 + 17k) mod 2003) − 1001 — so expected features are
    * derivable without decoding a byte. `sp` is the previous sample for
    * the zero-crossing census (NULL at k = 0: s·NULL < 0 is never true,
    * matching the Spark side's k ≥ 1 guard). */
  private val audioFixtureCtes: String = """au AS (
  SELECT doc_id, 800 + (doc_id % 5) * 80 AS n FROM documents
),
smp AS (
  SELECT a.doc_id, a.n, g.k,
         ((a.doc_id * 31 + g.k * 17) % 2003) - 1001 AS s,
         CASE WHEN g.k >= 1
              THEN ((a.doc_id * 31 + (g.k - 1) * 17) % 2003) - 1001 END AS sp
  FROM au a
  CROSS JOIN (SELECT unnest(generate_series(0, 1119)) AS k) g
  WHERE g.k < a.n
)"""

  /** Twin of Multimodal.audioFeatures: the fixture formula's expected
    * clip stats — a hash match proves the PCM16 WAV encode → decode →
    * stats path sample-exact (the decode-proof shape of mmFeatures for
    * the audio modality). */
  val mmAudioFeatures: String = s"""
WITH $audioFixtureCtes
SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_samples,
       CAST(MAX(n) // 8 AS BIGINT) AS duration_ms,
       CAST(SUM(s * s) AS BIGINT) AS energy,
       CAST(SUM(CASE WHEN s * sp < 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross,
       CAST(MAX(ABS(s)) AS BIGINT) AS peak
FROM smp GROUP BY doc_id ORDER BY doc_id"""

  /** Twin of Multimodal.audioTopFrames: 160-sample frame energies from
    * the fixture formula, top-3 per clip by (energy desc, frame). */
  val mmAudioTopFrames: String = s"""
WITH $audioFixtureCtes,
fr AS (
  SELECT doc_id, k // 160 AS frame, CAST(SUM(s * s) AS BIGINT) AS frame_energy
  FROM smp GROUP BY doc_id, k // 160
),
rk AS (
  SELECT doc_id, frame, frame_energy,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY frame_energy DESC, frame) AS BIGINT) AS loudness_rank
  FROM fr
)
SELECT doc_id, CAST(frame AS BIGINT) AS frame, frame_energy, loudness_rank
FROM rk WHERE loudness_rank <= 3 ORDER BY doc_id, loudness_rank"""

  /** Resize oracle: the stride-downsample byte math of Multimodal.resize in
    * SQL. Valid because the corpus is pure ASCII (byte i == char i, checked
    * across all SFs), so substr-by-char reconstructs the exact byte the
    * Spark side picks: index floor(i·n/target) for i in 0..target-1. */
  /** Mirrors Multimodal.phashGroups: 32-bit block-mean hash over the
    * payload bytes (ASCII corpus: byte i == ascii(char i), the resize
    * precondition), integer cross-multiplied mean comparison, equal-hash
    * groups with the exact-dedup removed-rows convention. */
  def mmPhashDedup(bits: Int = 32): String = s"""
WITH ch AS (
  SELECT doc_id, length(text) AS n,
         list_transform(generate_series(1, length(text)),
                        i -> ascii(substr(text, i, 1))) AS bytes
  FROM documents
),
t AS (SELECT doc_id, n, bytes,
             CAST(COALESCE(list_sum(bytes), 0) AS BIGINT) AS total FROM ch),
h AS (
  SELECT doc_id,
         CAST(COALESCE(list_sum(list_transform(generate_series(0, ${bits - 1}), k ->
           CASE WHEN CAST(COALESCE(list_sum(
                       bytes[((k * n) // $bits) + 1 : ((k + 1) * n) // $bits]), 0)
                     AS BIGINT) * n
                   > total * (((k + 1) * n) // $bits - (k * n) // $bits)
                THEN 1 << k ELSE 0 END)), 0) AS BIGINT) AS phash32
  FROM t
)
SELECT doc_id, phash32, canonical_doc_id, group_size FROM (
  SELECT doc_id, phash32,
         MIN(doc_id) OVER (PARTITION BY phash32) AS canonical_doc_id,
         CAST(COUNT(*) OVER (PARTITION BY phash32) AS BIGINT) AS group_size
  FROM h) g
WHERE group_size > 1 ORDER BY doc_id"""

  val mmResize: String = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS orig_bytes,
       CAST(LEAST(length(text), 64) AS BIGINT) AS n_out_bytes,
       CASE WHEN length(text) <= 64 THEN md5(text)
            ELSE md5(array_to_string(list_transform(generate_series(0, 63),
                   i -> substr(text, CAST(FLOOR(i * (length(text)::DOUBLE / 64)) AS INT) + 1, 1)), ''))
       END AS out_md5
FROM documents ORDER BY doc_id"""

  /** Frame-sampling oracle: fixed 32-byte chunks, every 2nd kept — one row
    * per sampled frame with offset/size/md5 (ASCII byte==char as above). */
  val mmFrames: String = """
WITH f AS (
  SELECT doc_id, text,
         unnest(list_filter(generate_series(0, CAST(CEIL(length(text) / 32.0) AS INT) - 1),
                            i -> i % 2 = 0)) AS frame_index
  FROM documents
)
SELECT doc_id,
       CAST(frame_index AS BIGINT) AS frame_index,
       CAST(frame_index * 32 AS BIGINT) AS "offset",
       CAST(LEAST(32, length(text) - frame_index * 32) AS BIGINT) AS n_bytes,
       md5(substr(text, frame_index * 32 + 1, 32)) AS frame_md5
FROM f ORDER BY doc_id, frame_index"""

  /** Shared CTE chain: documents → 16-bit simhash → equal-sketch pairs →
    * bidirectional edge list (used by the dedup-clusters and pagerank
    * oracles — one graph definition, zero drift). */
  private val simhashGraphCtes: String = s"""$toksCte,
hv AS (
  SELECT doc_id,
         list_transform(list_distinct(toks), t -> ${hex4IntSql("t")}) AS hv
  FROM toks
),
s AS (
  SELECT doc_id,
         CAST(${(0 until 16).map(b =>
    s"(CASE WHEN list_sum(list_transform(hv, v -> ((v >> $b) & 1) * 2 - 1)) >= 0 THEN ${1 << b} ELSE 0 END)")
    .mkString(" + ")} AS BIGINT) AS simhash16
  FROM hv
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM s a JOIN s b ON a.simhash16 = b.simhash16 AND a.doc_id < b.doc_id
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
)"""

  /** Dedup-clusters oracle: connected components over the simhash pair
    * graph as a recursive transitive closure; cluster id = minimum reachable
    * doc_id — exactly Dedup.dedupClusters' min-label fixpoint. */
  val dedupClusters: String = s"""
WITH RECURSIVE $simhashGraphCtes,
reach(doc_id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.doc_id = e.dst
)
SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id ORDER BY doc_id"""

  /** Mirrors Graph.kCore over the simhash pair graph: the same edge CTEs,
    * `rounds` peel rounds unrolled (fixed rounds make the oracle possible,
    * as with pageRank), survivor degrees coalesced to 0. */
  def kCore(k: Int = 2, rounds: Int = 4): String = {
    def peel(i: Int): String = s""",
d$i AS (
  SELECT e.src AS id, COUNT(*) AS deg
  FROM edges e
  JOIN a${i - 1} x ON x.id = e.src
  JOIN a${i - 1} y ON y.id = e.dst
  GROUP BY 1),
a$i AS (SELECT id FROM d$i WHERE deg >= $k)"""
    s"""
WITH $simhashGraphCtes,
a0 AS (SELECT DISTINCT src AS id FROM edges)
${(1 to rounds).map(peel).mkString}
SELECT a.id AS doc_id, COALESCE(f.deg, 0) AS core_deg
FROM a$rounds a
LEFT JOIN (
  SELECT e.src AS id, COUNT(*) AS deg
  FROM edges e
  JOIN a$rounds x ON x.id = e.src
  JOIN a$rounds y ON y.id = e.dst
  GROUP BY 1) f ON f.id = a.id
ORDER BY doc_id"""
  }

  /** Mirrors Graph.pageRank over the simhash pair graph: the same edge
    * CTEs as [[dedupClusters]], `iters` power iterations unrolled as CTEs
    * (fixed iteration count is what makes the oracle possible). Rank state
    * is exact integer pico-units like the Spark side (round-9 verdict #6):
    * floor_div contributions, exact BIGINT/HUGEINT sums, a dm/10⁶
    * rational damping multiply — everything ≥ 0 so `//` is floor — and a
    * single /1e12 display division at the end. */
  def pageRank(damping: Double = 0.85, iters: Int = 5): String = {
    val dm = math.round(damping * 1e6) // damping as a rational dm/1e6
    val tele = (1000000L - dm) * 1000000000000L
    def iterCte(i: Int): String = s"""
r$i AS (
  SELECT d.id,
         ($tele - $tele % (1000000 * nn.n_nodes)) // (1000000 * nn.n_nodes)
           + ($dm * COALESCE(c.s, 0) - ($dm * COALESCE(c.s, 0)) % 1000000) // 1000000
           AS rank_pico
  FROM deg d CROSS JOIN nn
  LEFT JOIN (SELECT e.dst,
                    SUM((r.rank_pico - r.rank_pico % e.deg) // e.deg) AS s
             FROM r${i - 1} r JOIN out_edges e ON r.id = e.src
             GROUP BY e.dst) c ON c.dst = d.id
)"""
    s"""
WITH $simhashGraphCtes,
deg AS (SELECT src AS id, COUNT(*) AS deg FROM edges GROUP BY 1),
out_edges AS (
  SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d ON d.id = e.src
),
nn AS (SELECT COUNT(*) AS n_nodes FROM deg),
r0 AS (SELECT id, (1000000000000 - 1000000000000 % nn.n_nodes) // nn.n_nodes AS rank_pico
       FROM deg CROSS JOIN nn),
${(1 to iters).map(iterCte).mkString(",")}
SELECT d.id AS doc_id, d.deg AS degree,
       ROUND(r.rank_pico::DOUBLE / 1e12, 8) AS pagerank
FROM deg d JOIN r$iters r ON r.id = d.id
ORDER BY doc_id"""
  }

  /** Mirrors Dedup.contaminationPairs over a doc_id % `mod` probe subset. */
  def contamination(n: Int = 3, minShared: Int = 3, mod: Int = 97): String = s"""
WITH $toksCte,
$shinglesCte,
tr AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
pr AS (SELECT doc_id AS probe_id, unnest(sh) AS shingle FROM sh WHERE doc_id % $mod = 0)
SELECT tr.doc_id, pr.probe_id, COUNT(*) AS shared_ngrams
FROM tr JOIN pr USING (shingle)
GROUP BY tr.doc_id, pr.probe_id
HAVING COUNT(*) >= $minShared AND tr.doc_id != pr.probe_id
ORDER BY doc_id, probe_id"""

  /** Mirrors TrainPrep.assignSplits: md5-of-id bucket, threshold split. */
  def trainSplits(valPct: Int = 10, testPct: Int = 10, buckets: Int = 100): String = s"""
WITH b AS (
  SELECT doc_id,
         CAST((${hex8IntSql("doc_id::VARCHAR")}) % $buckets AS BIGINT) AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < $testPct THEN 'test'
            WHEN bucket < ${testPct + valPct} THEN 'validation'
            ELSE 'train' END AS split
FROM b ORDER BY doc_id"""

  /** First `n` md5 hex chars of `arg` as a BIGINT (generalizes
    * [[hex8IntSql]]; n ≤ 15 keeps the value inside a signed long). */
  private def hexNIntSql(arg: String, n: Int): String = {
    require(n <= 15, "16 hex chars overflow a signed long")
    (0 until n).map { i =>
      val mult = java.math.BigInteger.valueOf(16L).pow(n - 1 - i)
      s"(strpos('0123456789abcdef', substr(md5($arg), ${i + 1}, 1)) - 1) * $mult"
    }.mkString(" + ")
  }

  /** Mirrors TrainPrep.shardManifest: the trainSplits bucket map, an
    * md5-derived shard, BIT_XOR of 60-bit per-doc content hashes (order-
    * independent — the same reason the Spark side uses it). */
  def shardManifest(nShards: Int = 8, valPct: Int = 10, testPct: Int = 10,
      buckets: Int = 100): String = s"""
WITH b AS (
  SELECT doc_id, text,
         CAST((${hex8IntSql("doc_id::VARCHAR")}) % $buckets AS BIGINT) AS bucket,
         CAST((${hex8IntSql(s"'sh|' || doc_id::VARCHAR")}) % $nShards AS BIGINT) AS shard,
         CAST((${hexNIntSql("text", 15)}) AS BIGINT) AS ck,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
  FROM documents
),
sp AS (
  SELECT *, CASE WHEN bucket < $testPct THEN 'test'
                 WHEN bucket < ${testPct + valPct} THEN 'validation'
                 ELSE 'train' END AS split
  FROM b
)
SELECT split, shard, COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id,
       CAST(bit_xor(ck) AS BIGINT) AS checksum60
FROM sp GROUP BY split, shard ORDER BY split, shard"""

  /** Mirrors Dedup.keepBest: quality-ranked survivor per simhash near-dup
    * cluster; emitted rows are the removed members. The quality scores
    * come from the [[qualityScore]] query nested as a subselect (the
    * qualityCalibrated convention), cluster labels from the same
    * recursive closure as [[dedupClusters]]. */
  val dedupKeepBest: String = s"""
WITH RECURSIVE $simhashGraphCtes,
reach(doc_id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.doc_id = e.dst
),
cl AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id),
qs AS (SELECT doc_id, quality_score FROM ($qualityScore) t),
ranked AS (
  SELECT c.doc_id, c.cluster_id, q.quality_score,
         ROW_NUMBER() OVER (PARTITION BY c.cluster_id
           ORDER BY q.quality_score DESC NULLS LAST, c.doc_id) AS rk,
         FIRST_VALUE(c.doc_id) OVER (PARTITION BY c.cluster_id
           ORDER BY q.quality_score DESC NULLS LAST, c.doc_id) AS survivor_doc,
         FIRST_VALUE(q.quality_score) OVER (PARTITION BY c.cluster_id
           ORDER BY q.quality_score DESC NULLS LAST, c.doc_id) AS survivor_quality
  FROM cl c JOIN qs q ON c.doc_id = q.doc_id
)
SELECT doc_id, cluster_id, quality_score, survivor_doc, survivor_quality
FROM ranked WHERE rk >= 2 ORDER BY doc_id"""

  /** Mirrors TrainPrep.leakageSafeSplits: the trainSplits bucket split
    * keyed on the near-dup cluster id (dedupClusters' min-label fixpoint
    * over the simhash pair graph); docs outside the pair graph are their
    * own singleton cluster. */
  def leakageSafeSplits(valPct: Int = 10, testPct: Int = 10,
      buckets: Int = 100): String = s"""
WITH RECURSIVE $simhashGraphCtes,
reach(doc_id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.doc_id = e.dst
),
cl AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id),
a AS (
  SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
),
b AS (
  SELECT doc_id, cluster_id,
         CAST((${hex8IntSql("cluster_id::VARCHAR")}) % $buckets AS BIGINT) AS bucket
  FROM a
)
SELECT doc_id, cluster_id, bucket,
       CASE WHEN bucket < $testPct THEN 'test'
            WHEN bucket < ${testPct + valPct} THEN 'validation'
            ELSE 'train' END AS split
FROM b ORDER BY doc_id"""

  /** Mirrors TrainPrep.epochShuffle: hash("epoch:doc_id") rank within
    * (epoch, shard). */
  def epochShuffle(epochs: Int = 3, docsPerShard: Int = 1000): String = s"""
WITH b AS (
  SELECT doc_id, CAST(doc_id // $docsPerShard AS BIGINT) AS shard,
         CAST(e.epoch AS BIGINT) AS epoch,
         CAST((${hex8IntSql(s"epoch::VARCHAR || ':' || doc_id::VARCHAR")}) AS BIGINT) AS hv
  FROM documents
  CROSS JOIN (SELECT unnest(generate_series(0, ${epochs - 1})) AS epoch) e
)
SELECT doc_id, epoch, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY epoch, shard
                               ORDER BY hv, doc_id) AS BIGINT) AS shuffle_rank
FROM b ORDER BY epoch, shard, shuffle_rank"""

  /** Mirrors Sampling.tokenBudgetSample: greedy per-source prefix in
    * (hash, id) order while the PRIOR running token count is under
    * budget. DuckDB's windowed SUM(BIGINT) is HUGEINT — cast back. */
  def tokenBudgetSample(budgetTokens: Long = 800L): String = s"""
WITH t AS (
  SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST((${hex8IntSql("doc_id::VARCHAR")}) AS BIGINT) AS hv
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY hv, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prior
  FROM t
)
SELECT doc_id, source, n_tokens, CAST(prior + n_tokens AS BIGINT) AS cum_tokens
FROM c WHERE prior < $budgetTokens ORDER BY doc_id"""

  /** Mirrors TrainPrep.packSequences: sharded token-stream packing. */
  def packSequences(maxTokens: Int = 512, docsPerShard: Int = 1000): String = s"""
WITH $toksCte,
t AS (
  SELECT doc_id,
         CAST(FLOOR(doc_id / $docsPerShard) AS BIGINT) AS shard,
         len(toks)::BIGINT AS n_tokens
  FROM toks
),
c AS (
  -- DuckDB's windowed SUM(BIGINT) yields HUGEINT; CAST back so prior and
  -- every value derived from it stay BIGINT like the Spark side.
  SELECT doc_id, shard, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prior
  FROM t
)
SELECT doc_id, n_tokens, shard,
       CAST(FLOOR(prior / $maxTokens) AS BIGINT) AS pack_id,
       CAST(prior - CAST(FLOOR(prior / $maxTokens) AS BIGINT) * $maxTokens AS BIGINT) AS pack_offset
FROM c ORDER BY doc_id"""

  /** Shared chunk CTE chain (mirrors TrainPrep.chunkWindows):
    * n_chunks = 1 + ceil(max(n−W,0)/S) in the same div/mod form, 1-based
    * inclusive list slice, md5 of the space-rejoined slice so chunk
    * CONTENT is verified cross-engine. Ends in `ch(doc_id, chunk_id,
    * start_tok, n_toks, chunk_hash)`. */
  private def chunksCte(window: Int, stride: Int): String = s"""$toksCte,
b AS (
  SELECT doc_id, toks, len(toks)::BIGINT AS n_tokens,
         1 + (GREATEST(len(toks)::BIGINT - $window, 0) // $stride)
           + CASE WHEN GREATEST(len(toks)::BIGINT - $window, 0) % $stride > 0
                  THEN 1 ELSE 0 END AS n_chunks
  FROM toks
),
c AS (
  SELECT doc_id, toks, n_tokens,
         unnest(generate_series(0, n_chunks - 1)) AS chunk_id
  FROM b
),
ch AS (
  SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         CAST(chunk_id * $stride AS BIGINT) AS start_tok,
         CAST(LEAST($window, n_tokens - chunk_id * $stride) AS BIGINT) AS n_toks,
         md5(array_to_string(
           toks[CAST(chunk_id * $stride + 1 AS BIGINT) :
                CAST(chunk_id * $stride + LEAST($window, n_tokens - chunk_id * $stride) AS BIGINT)],
           ' ')) AS chunk_hash
  FROM c
)"""

  def chunkWindows(window: Int = 64, stride: Int = 48): String = s"""
WITH ${chunksCte(window, stride)}
SELECT doc_id, chunk_id, start_tok, n_toks, chunk_hash
FROM ch ORDER BY doc_id, chunk_id"""

  /** Mirrors TrainPrep.chunkDupes: copy-count window on chunk_hash,
    * (doc_id, chunk_id)-ordered survivor, duplicates are rank ≥ 2. */
  def chunkDupes(window: Int = 64, stride: Int = 48): String = s"""
WITH ${chunksCte(window, stride)},
d AS (
  SELECT doc_id, chunk_id, start_tok, chunk_hash,
         CAST(COUNT(*) OVER (PARTITION BY chunk_hash) AS BIGINT) AS n_copies,
         ROW_NUMBER() OVER (PARTITION BY chunk_hash ORDER BY doc_id, chunk_id) AS rk,
         FIRST_VALUE(doc_id) OVER (PARTITION BY chunk_hash
           ORDER BY doc_id, chunk_id) AS survivor_doc,
         FIRST_VALUE(chunk_id) OVER (PARTITION BY chunk_hash
           ORDER BY doc_id, chunk_id) AS survivor_chunk
  FROM ch
)
SELECT doc_id, chunk_id, start_tok, chunk_hash,
       survivor_doc, survivor_chunk, n_copies
FROM d WHERE n_copies > 1 AND rk >= 2
ORDER BY doc_id, chunk_id"""

  /** Mirrors Sampling.stratifiedSample: exact-count per-stratum hash
    * sample; the keep rule is the pure-integer form of
    * rank ≤ ceil(n·pct/100). */
  def stratifiedSample(stratumCol: String = "lang", pct: Int = 20): String = s"""
WITH b AS (
  SELECT doc_id, $stratumCol AS stratum,
         CAST((${hex8IntSql("doc_id::VARCHAR")}) AS BIGINT) AS hv
  FROM documents
),
r AS (
  SELECT doc_id, stratum,
         CAST(row_number() OVER (PARTITION BY stratum ORDER BY hv, doc_id) AS BIGINT)
           AS sample_rank,
         COUNT(*) OVER (PARTITION BY stratum) AS n_stratum
  FROM b
)
SELECT doc_id, stratum, sample_rank
FROM r WHERE (sample_rank - 1) * 100 < n_stratum * $pct
ORDER BY stratum, sample_rank"""

  /** Mirrors Sampling.temperatureSample: sqrt weights (the one
    * correctly-rounded power) quantized to integer micros, pure-BIGINT
    * largest-remainder apportionment, census-clamped quotas, then the
    * stratified (hv, id) rank keep within each source. */
  def temperatureSample(target: Int = 200): String = s"""
WITH b AS (
  SELECT doc_id, source,
         CAST((${hex8IntSql("doc_id::VARCHAR")}) AS BIGINT) AS hv
  FROM documents
),
c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_src FROM b GROUP BY 1),
w AS (
  SELECT source, n_src,
         CAST(ROUND(sqrt(n_src::DOUBLE) * 1000000) AS BIGINT) AS wq
  FROM c
),
q1 AS (
  SELECT source, n_src, wq, CAST(SUM(wq) OVER () AS BIGINT) AS w_total FROM w
),
q2 AS (
  SELECT source, n_src,
         CAST(($target * wq) // w_total AS BIGINT) AS base_q,
         CAST(($target * wq) % w_total AS BIGINT) AS rem
  FROM q1
),
q3 AS (
  SELECT source, n_src, base_q, rem,
         CAST(SUM(base_q) OVER () AS BIGINT) AS sum_base,
         CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS BIGINT) AS rem_rank
  FROM q2
),
k AS (
  SELECT source,
         LEAST(n_src, base_q +
               CASE WHEN rem_rank <= $target - sum_base THEN 1 ELSE 0 END) AS quota
  FROM q3
),
r AS (
  SELECT b.doc_id, b.source,
         CAST(ROW_NUMBER() OVER (PARTITION BY b.source ORDER BY hv, doc_id) AS BIGINT)
           AS sample_rank,
         k.quota
  FROM b JOIN k USING (source)
)
SELECT doc_id, source, sample_rank
FROM r WHERE sample_rank <= quota
ORDER BY source, sample_rank"""

  /** Mirrors Sampling.uniformSample: k smallest id-hashes, id tie-break. */
  def uniformSample(k: Int = 100): String = s"""
SELECT doc_id, source,
       CAST((${hex8IntSql("doc_id::VARCHAR")}) AS BIGINT) AS hv
FROM documents
ORDER BY hv, doc_id LIMIT $k"""

  /** Mirrors Sampling.weightedTopK: Efraimidis–Spirakis key ln(u)/w with
    * u = (hash32(id)+1)/2³², top-k by key desc — ln and IEEE division are
    * correctly-rounded on both engines, so the drawn set and the
    * nano-quantized key match bit-for-bit. */
  def weightedTopK(k: Int = 200, weightCol: String = "n_chars"): String = s"""
WITH b AS (
  SELECT doc_id, source, GREATEST(CAST($weightCol AS BIGINT), 1) AS weight,
         (CAST((${hex8IntSql("doc_id::VARCHAR")}) AS BIGINT) + 1) / 4294967296.0 AS u
  FROM documents
),
keyed AS (
  SELECT doc_id, source, weight, ln(u) / CAST(weight AS DOUBLE) AS es_key FROM b
),
top AS (
  SELECT doc_id, source, weight, es_key
  FROM keyed ORDER BY es_key DESC, doc_id LIMIT $k
)
SELECT doc_id, source, weight,
       CAST(floor(es_key * 1e9) AS BIGINT) AS es_key_nano,
       CAST(ROW_NUMBER() OVER (ORDER BY es_key DESC, doc_id) AS BIGINT) AS sample_rank
FROM top ORDER BY sample_rank"""

  /** Mirrors Sampling.weightedMix over [[graft.operators.Sampling.GateWeights]]. */
  def weightedMix(weights: Map[String, Int] = graft.operators.Sampling.GateWeights,
      defaultPct: Int = 50): String = {
    val cases = weights.toSeq.sortBy(_._1)
      .map { case (src, p) => s"WHEN '$src' THEN $p" }.mkString(" ")
    s"""
WITH b AS (
  SELECT doc_id, source,
         CAST((${hex8IntSql("doc_id::VARCHAR")}) % 100 AS BIGINT) AS bucket
  FROM documents
)
SELECT doc_id, source, bucket
FROM b WHERE bucket < CASE source $cases ELSE $defaultPct END
ORDER BY doc_id"""
  }

  /** Mirrors TextOps.tfidfTopTerms (linear-idf variant — see its scaladoc
    * for why ln() is deliberately avoided cross-engine). */
  def tfidfTopTerms(k: Int = 5): String = s"""
WITH $toksCte,
t AS (SELECT doc_id, unnest(toks) AS term FROM toks),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
s AS (
  SELECT doc_id, term, tf, df,
         ROUND(tf * (n_docs::DOUBLE / df), 4) AS score
  FROM tf JOIN dfq USING (term) CROSS JOIN nd
),
r AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term)
                 AS BIGINT) AS rank
  FROM s
)
SELECT doc_id, term, tf, df, score, rank
FROM r WHERE rank <= $k ORDER BY doc_id, rank"""

  /** Mirrors TrainPrep.curriculumBins. */
  def curriculumBins(binWidth: Int = 64, maxBin: Int = 7, shardsPerBin: Int = 4): String = s"""
WITH $toksCte,
t AS (
  SELECT doc_id, len(toks)::BIGINT AS n_tokens,
         CAST((${hex8IntSql("doc_id::VARCHAR")}) AS BIGINT) AS hv
  FROM toks
)
SELECT doc_id, n_tokens,
       LEAST(CAST(FLOOR(n_tokens / $binWidth) AS BIGINT), CAST($maxBin AS BIGINT)) AS bin,
       hv % $shardsPerBin AS shard
FROM t ORDER BY doc_id"""

  /** Mirrors TextOps.noveltyStats: distinct shingles → df census →
    * per-doc novel (df = 1) rollup. */
  def noveltyStats: String = s"""
WITH $toksCte,
$shinglesCte,
s AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
d AS (SELECT shingle, COUNT(*) AS df FROM s GROUP BY 1)
SELECT doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       ROUND(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 4) AS novelty_ratio
FROM s JOIN d USING (shingle)
GROUP BY doc_id ORDER BY doc_id"""

  /** Mirrors TextOps.lengthHistogram: integer `div` binning, top bin
    * clamped, share of corpus per bin. */
  def lengthHistogram(binWidth: Int = 64, nBins: Int = 32): String = s"""
WITH $toksCte,
b AS (
  SELECT LEAST(${nBins - 1}, len(toks) // $binWidth) AS bin,
         CAST(len(toks) AS BIGINT) AS n_tokens
  FROM toks
),
g AS (
  SELECT bin, COUNT(*) AS n_docs,
         MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens
  FROM b GROUP BY 1
)
SELECT bin, bin * $binWidth AS bin_lo, n_docs, min_tokens, max_tokens,
       ROUND(n_docs * 100.0 / SUM(n_docs) OVER (), 2) AS pct_docs
FROM g ORDER BY bin"""

  /** Mirrors TextOps.unigramLogProb: occurrence stream → token-frequency
    * census → 1-row total → ln P(token) per token → per-doc rollup.
    * `ln` (natural log) — DuckDB's `log` is base-10. */
  def unigramLogProb: String = s"""
WITH $toksCte,
occ AS (SELECT doc_id, unnest(toks) AS token FROM toks),
tf AS (SELECT token, COUNT(*) AS tf FROM occ GROUP BY 1),
tot AS (SELECT COUNT(*) AS n_total FROM occ),
lp AS (SELECT token, ln(tf::DOUBLE / n_total) AS logprob FROM tf CROSS JOIN tot)
SELECT doc_id, COUNT(*) AS n_tokens,
       ROUND(AVG(logprob), 4) AS avg_logprob,
       ROUND(MIN(logprob), 4) AS min_logprob
FROM occ JOIN lp USING (token)
GROUP BY doc_id ORDER BY doc_id"""

  /** Mirrors TextOps.qualityHistogramPct: fixed score bins, per-(source,
    * bin) histogram, strictly-below cumulative, broadcast-back estimate in
    * the same bp basis as qualityCalibrated. */
  def qualityHistogramPct(nBins: Int = 100, keepBp: Int = 3000): String = s"""
WITH q AS (SELECT doc_id, quality_score FROM ($qualityScore) t
           WHERE quality_score IS NOT NULL),
scored AS (
  SELECT d.doc_id, d.source, q.quality_score,
         LEAST(CAST(floor(q.quality_score * $nBins) AS BIGINT), ${nBins - 1}) AS bin
  FROM documents d JOIN q USING (doc_id)
),
hist AS (SELECT source, bin, COUNT(*) AS n_bin FROM scored GROUP BY 1, 2),
cum AS (
  SELECT source, bin,
         CAST(COALESCE(SUM(n_bin) OVER (PARTITION BY source ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_below,
         CAST(SUM(n_bin) OVER (PARTITION BY source) AS BIGINT) AS n_src
  FROM hist
)
SELECT s.doc_id, s.source, s.quality_score, s.bin,
       CAST(CASE WHEN c.n_src = 1 THEN 0
                 ELSE (c.cum_below * 10000) // (c.n_src - 1) END AS BIGINT)
         AS approx_pct_bp,
       CASE WHEN c.n_src = 1 THEN 0
            ELSE (c.cum_below * 10000) // (c.n_src - 1) END >= ${10000 - keepBp}
         AS keep_approx
FROM scored s JOIN cum c USING (source, bin)
ORDER BY s.doc_id"""

  /** Mirrors TextOps.invertedIndex: (term, doc) table, full df/tf
    * aggregate, capped numerically-sorted posting strings. */
  def invertedIndex(cap: Int = 20): String = s"""
WITH $toksCte,
td AS (SELECT doc_id, unnest(toks) AS term FROM toks),
g AS (SELECT term, doc_id, COUNT(*) AS tf_doc FROM td GROUP BY 1, 2),
stats AS (
  SELECT term, COUNT(*) AS df, CAST(SUM(tf_doc) AS BIGINT) AS tf FROM g GROUP BY 1
),
p AS (
  SELECT term,
         array_to_string(list_sort(list(doc_id)), ',') AS postings
  FROM (SELECT term, doc_id,
               ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn
        FROM g) t
  WHERE rn <= $cap GROUP BY term
)
SELECT term, df, tf, postings, df > $cap AS truncated
FROM stats JOIN p USING (term) ORDER BY term"""

  /** Mirrors Validators.chiSquareIndependence over documents
    * (source × lang): cell census, marginals, micro-quantized cell
    * contributions, 1-row readout. */
  val chiSquareIndependence: String = """
WITH cells AS (
  SELECT source AS r, lang AS c, COUNT(*) AS o FROM documents GROUP BY 1, 2
),
rt AS (SELECT r, CAST(SUM(o) AS BIGINT) AS n_r FROM cells GROUP BY 1),
ct AS (SELECT c, CAST(SUM(o) AS BIGINT) AS n_c FROM cells GROUP BY 1),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n_total FROM cells),
contrib AS (
  SELECT cells.r, cells.c, o,
         CAST(floor((o::DOUBLE - (n_r::DOUBLE * n_c / n_total)) *
                    (o::DOUBLE - (n_r::DOUBLE * n_c / n_total)) /
                    (n_r::DOUBLE * n_c / n_total) * 1000000.0) AS BIGINT) AS micro
  FROM cells JOIN rt USING (r) JOIN ct USING (c) CROSS JOIN tot
)
SELECT CAST(COUNT(DISTINCT r) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT c) AS BIGINT) AS n_cols,
       COUNT(*) AS n_cells,
       CAST((COUNT(DISTINCT r) - 1) * (COUNT(DISTINCT c) - 1) AS BIGINT) AS dof,
       ROUND(CAST(SUM(micro) AS BIGINT)::DOUBLE / 1000000.0, 4) AS chi2
FROM contrib"""

  /** Mirrors TextOps.bigramLogProb: parallel-unnest bigram stream, three
    * censuses + 1-row total, Jelinek–Mercer ln P quantized to integer
    * micro-nats before the per-doc sum (associativity-proof), one division
    * chain at readout. CASTs defuse HUGEINT and DECIMAL literals. */
  def bigramLogProb: String = s"""
WITH $toksCte,
occ AS (SELECT unnest(toks) AS token FROM toks),
bi AS (
  SELECT doc_id, unnest(toks[1:len(toks)-1]) AS prev, unnest(toks[2:len(toks)]) AS cur
  FROM toks WHERE len(toks) >= 2
),
c2 AS (SELECT prev, cur, COUNT(*) AS c2 FROM bi GROUP BY 1, 2),
ctx AS (SELECT prev, COUNT(*) AS cctx FROM bi GROUP BY 1),
c1 AS (SELECT token AS cur, COUNT(*) AS c1 FROM occ GROUP BY 1),
tot AS (SELECT COUNT(*) AS n_total FROM occ),
lp AS (
  SELECT prev, cur,
         CAST(floor(ln(CAST(0.9 AS DOUBLE) * (c2::DOUBLE / cctx) +
                       CAST(0.1 AS DOUBLE) * (c1::DOUBLE / n_total)) * 1000000.0) AS BIGINT)
           AS micro
  FROM c2 JOIN ctx USING (prev) JOIN c1 USING (cur) CROSS JOIN tot
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(CAST(CAST(SUM(micro) AS BIGINT) AS DOUBLE) / COUNT(*) / 1000000.0, 4)
         AS avg_logprob,
       ROUND(CAST(MIN(micro) AS DOUBLE) / 1000000.0, 4) AS min_logprob
FROM bi JOIN lp USING (prev, cur)
GROUP BY doc_id ORDER BY doc_id"""

  /** Mirrors Sketches.cmsTokenCounts: d×w salted-md5 counter matrix, MIN
    * readout at the exact top-k tokens. Every constant renders from the
    * same (d, w, k) the Spark call uses. */
  def cmsTokenCounts(d: Int = 4, w: Int = 64, k: Int = 20): String = s"""
WITH $toksCte,
occ AS (SELECT unnest(toks) AS token FROM toks),
tf AS (SELECT token, COUNT(*) AS occurrences FROM occ GROUP BY 1),
rows_ AS (
  SELECT j, (${hex8IntSql("j::VARCHAR || '_' || token")}) % $w AS bucket, occurrences
  FROM tf CROSS JOIN (SELECT unnest(generate_series(0, ${d - 1})) AS j)
),
counters AS (
  SELECT j, bucket, CAST(SUM(occurrences) AS BIGINT) AS c FROM rows_ GROUP BY 1, 2
),
top AS (
  SELECT token, occurrences FROM tf
  ORDER BY occurrences DESC, token LIMIT $k
),
probes AS (
  SELECT token, occurrences, j,
         (${hex8IntSql("j::VARCHAR || '_' || token")}) % $w AS bucket
  FROM top CROSS JOIN (SELECT unnest(generate_series(0, ${d - 1})) AS j)
)
SELECT token, occurrences, MIN(c) AS cms_estimate,
       MIN(c) - occurrences AS overestimate
FROM probes JOIN counters USING (j, bucket)
GROUP BY token, occurrences
ORDER BY occurrences DESC, token"""

  /** Mirrors Sketches.heavyHitters over events.user_id: the Misra–Gries
    * mergeable-summary construction replayed shard-for-shard — same md5
    * occurrence sharding, same per-shard (k+1)-th-largest truncation,
    * same merged truncation, same exact verification pass and integer
    * filter. Every constant renders from the Spark call's (k, nShards). */
  def heavyHitters(k: Int = 128, nShards: Int = 16): String = s"""
WITH per AS (
  SELECT (${hex8IntSql("event_id::VARCHAR")}) % $nShards AS shard,
         user_id AS key, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT shard, key, c,
         ROW_NUMBER() OVER (PARTITION BY shard ORDER BY c DESC, key) AS rk
  FROM per
),
thr AS (SELECT shard, c AS t_s FROM ranked WHERE rk = ${k + 1}),
merged AS (
  SELECT key, CAST(SUM(mgc) AS BIGINT) AS m FROM (
    SELECT r.key, r.c - COALESCE(t.t_s, 0) AS mgc
    FROM ranked r LEFT JOIN thr t USING (shard)
  ) WHERE mgc > 0 GROUP BY 1
),
tg AS (
  SELECT CASE WHEN COUNT(*) < ${k + 1} THEN CAST(0 AS BIGINT)
              ELSE CAST(MIN(m) AS BIGINT) END AS t_g
  FROM (SELECT m, key FROM merged ORDER BY m DESC, key LIMIT ${k + 1})
),
cand AS (
  SELECT key, m - t_g AS mg_estimate FROM merged CROSS JOIN tg
  WHERE m - t_g > 0
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM per),
exact AS (
  SELECT key, CAST(SUM(c) AS BIGINT) AS occurrences FROM per
  WHERE key IN (SELECT key FROM cand) GROUP BY 1
)
SELECT e.key AS user_id, e.occurrences, c.mg_estimate,
       e.occurrences - c.mg_estimate AS underestimate,
       (e.occurrences * 1000000) // n AS share_ppm
FROM exact e JOIN cand c USING (key) CROSS JOIN tot
WHERE e.occurrences * ${k + 1} > n
ORDER BY occurrences DESC, user_id"""

  /** Twin of StreamingAnalytics.replayHeavyHitters: the plain batch
    * heavy-hitter SQL. The streamed MG candidate pass is provably a
    * superset of {key : freq > n/(k+1)} under ANY arrival order, chunking
    * or shard count (segment summaries merge with total truncation error
    * ≤ n/(k+1)), and the exact verify restores exact counts — so the
    * gated report reduces to GROUP BY + HAVING on both engines. */
  def streamingHeavyHitters(k: Int = 128): String = s"""
WITH tot AS (SELECT COUNT(*) AS n FROM events)
SELECT user_id, COUNT(*) AS occurrences,
       (COUNT(*) * 1000000) // n AS share_ppm
FROM events CROSS JOIN tot
GROUP BY user_id, n
HAVING COUNT(*) * ${k + 1} > n
ORDER BY occurrences DESC, user_id"""

  /** Mirrors StreamingAnalytics.replayCmsTopk: the per-hour single-pass
    * CMS — equal to the streamed micro-batch build by counter additivity.
    * Same salted md5 bucket family as [[cmsTokenCounts]]. */
  def streamingCmsTopk(d: Int = 4, w: Int = 64): String = s"""
WITH rows_ AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, j,
         (${hex8IntSql("j::VARCHAR || '_' || event_type")}) % $w AS bucket
  FROM events CROSS JOIN (SELECT unnest(generate_series(0, ${d - 1})) AS j)
),
counters AS (
  SELECT window_start, j, bucket, COUNT(*) AS c FROM rows_ GROUP BY 1, 2, 3
),
exact AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
         COUNT(*) AS occurrences
  FROM events GROUP BY 1, 2
),
probes AS (
  SELECT window_start, event_type, occurrences, j,
         (${hex8IntSql("j::VARCHAR || '_' || event_type")}) % $w AS bucket
  FROM exact CROSS JOIN (SELECT unnest(generate_series(0, ${d - 1})) AS j)
)
SELECT p.window_start, p.event_type, p.occurrences,
       MIN(c.c) AS cms_estimate,
       MIN(c.c) - p.occurrences AS overestimate
FROM probes p JOIN counters c
  ON c.window_start = p.window_start AND c.j = p.j AND c.bucket = p.bucket
GROUP BY 1, 2, 3
ORDER BY 1, 2"""

  /** Mirrors Dedup.substringSpans: positional L-token window hashes →
    * multi-doc census (MIN≠MAX on doc_id, the same expand-free form the
    * Spark side uses) → exact gram verification per (hv, gram) → per-doc
    * gaps-and-islands merge. Parallel unnest zips positions with grams. */
  def substringSpans(l: Int = 8): String = s"""
WITH $toksCte,
p AS (
  SELECT doc_id,
         unnest(generate_series(1, len(toks) - ${l - 1}))::BIGINT AS pos,
         unnest(list_transform(generate_series(1, len(toks) - ${l - 1}),
                               i -> array_to_string(toks[i:i+${l - 1}], ' '))) AS gram
  FROM toks WHERE len(toks) >= $l
),
ph AS (SELECT doc_id, pos, gram, (${hex15IntSql("gram")}) AS hv FROM p),
cand AS (SELECT hv FROM ph GROUP BY hv HAVING MIN(doc_id) <> MAX(doc_id)),
cpos AS (SELECT ph.* FROM ph JOIN cand USING (hv)),
ver AS (SELECT hv, gram FROM cpos GROUP BY hv, gram HAVING MIN(doc_id) <> MAX(doc_id)),
vpos AS (SELECT doc_id, pos FROM cpos JOIN ver USING (hv, gram)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + $l
              THEN 1 ELSE 0 END AS brk
  FROM vpos
),
g2 AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM isl
)
SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + ${l - 1} AS span_end,
       MAX(pos) + $l - MIN(pos) AS span_len, COUNT(*) AS n_windows
FROM g2 GROUP BY doc_id, island ORDER BY doc_id, span_start"""

  /** Mirrors Sketches.hllDistinct: raw HLL estimator with an exact-BIGINT
    * Σ2^(RMAX−M) and one double division — the scale constant is rendered
    * from the same Scala double the Spark side uses, and every power-of-two
    * constant is derived from the SAME `b` the Spark side is called with
    * (divisor 2^(32−b), rank cap RMAX=32−b+1, Σ fill-in 2^RMAX, m=2^b), so
    * changing the precision on one side cannot silently desync the gate. */
  /** Mirrors Sketches.bloomFpr: md5(key ":" j) mod m bit positions, the
    * set-bit roster, and the all-k-positions EXISTS membership verdict. */
  def sketchBloomFpr(minPrice: Double = 400000.0, mBits: Int = 1 << 14,
      kHashes: Int = 3): String = {
    def posSql(ref: String, j: Int): String =
      s"(${hex8IntSql(s"$ref::VARCHAR || ':$j'")}) % $mBits"
    s"""
WITH members AS (
  SELECT DISTINCT o_custkey AS key FROM orders WHERE o_totalprice > $minPrice
),
bits AS (
  ${(0 until kHashes).map(j => s"SELECT DISTINCT ${posSql("key", j)} AS bit FROM members")
        .mkString("\n  UNION\n  ")}
),
probes AS (
  SELECT c.c_custkey AS key, m.key IS NOT NULL AS is_member
  FROM customer c LEFT JOIN members m ON c.c_custkey = m.key
),
tested AS (
  SELECT p.key, p.is_member,
         ${(0 until kHashes).map(j =>
        s"EXISTS (SELECT 1 FROM bits b WHERE b.bit = ${posSql("p.key", j)})")
        .mkString("\n         AND ")} AS positive
  FROM probes p
)
SELECT CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
       CAST(SUM(CASE WHEN NOT is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_nonmembers,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS n_bits_set,
       CAST(SUM(CASE WHEN NOT is_member AND positive THEN 1 ELSE 0 END) AS BIGINT) AS n_fp,
       CAST(CAST(SUM(CASE WHEN NOT is_member AND positive THEN 1 ELSE 0 END) AS BIGINT)
            * 10000 // NULLIF(CAST(SUM(CASE WHEN NOT is_member THEN 1 ELSE 0 END) AS BIGINT), 0)
            AS BIGINT) AS fp_bp
FROM tested"""
  }

  def sketchHllDistinct(scale: Double, b: Int = 6): String = {
    val m = 1 << b
    val div = 1L << (32 - b)   // bucket divisor = 2^(32-b)
    val rmax = 32 - b + 1
    val fill = 1L << rmax      // empty-bucket Σ term = 2^RMAX
    s"""
WITH h AS (SELECT (${hex8IntSql("user_id::VARCHAR")}) AS hv FROM events),
reg AS (
  SELECT hv // $div AS bucket,
         MAX(CASE WHEN hv % $div = 0 THEN $rmax
                  ELSE $rmax - length(bin(hv % $div)) END) AS r
  FROM h GROUP BY 1
),
s AS (
  SELECT COUNT(*) AS n_buckets_set,
         CAST(SUM(1::BIGINT << CAST($rmax - r AS INTEGER)) AS BIGINT) AS s_present
  FROM reg
),
e AS (SELECT COUNT(DISTINCT user_id) AS exact_distinct FROM events),
r2 AS (
  SELECT CAST($m AS BIGINT) AS m, n_buckets_set,
         ROUND($scale / (s_present + ($m - n_buckets_set) * $fill), 2) AS est_distinct,
         exact_distinct
  FROM s, e
)
SELECT m, n_buckets_set, est_distinct, exact_distinct,
       ROUND(ABS(est_distinct - exact_distinct) / exact_distinct, 4) AS rel_error
FROM r2"""
  }

  /** Mirrors Sketches.hllDistinctByGroup over (event_type, user_id) —
    * the single-pass estimator with a GROUP BY threaded through every
    * stage; constants derive from `b` exactly like [[sketchHllDistinct]]. */
  def sketchHllByType(scale: Double, b: Int = 6): String = {
    val m = 1 << b
    val div = 1L << (32 - b)
    val rmax = 32 - b + 1
    val fill = 1L << rmax
    s"""
WITH h AS (SELECT event_type, (${hex8IntSql("user_id::VARCHAR")}) AS hv FROM events),
reg AS (
  SELECT event_type, hv // $div AS bucket,
         MAX(CASE WHEN hv % $div = 0 THEN $rmax
                  ELSE $rmax - length(bin(hv % $div)) END) AS r
  FROM h GROUP BY 1, 2
),
s AS (
  SELECT event_type, COUNT(*) AS n_buckets_set,
         CAST(SUM(1::BIGINT << CAST($rmax - r AS INTEGER)) AS BIGINT) AS s_present
  FROM reg GROUP BY 1
),
e AS (SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct FROM events GROUP BY 1),
r2 AS (
  SELECT event_type, CAST($m AS BIGINT) AS m, n_buckets_set,
         ROUND($scale / (s_present + ($m - n_buckets_set) * $fill), 2) AS est_distinct,
         exact_distinct
  FROM s JOIN e USING (event_type)
)
SELECT event_type, m, n_buckets_set, est_distinct, exact_distinct,
       ROUND(ABS(est_distinct - exact_distinct) / exact_distinct, 4) AS rel_error
FROM r2 ORDER BY event_type"""
  }

  /** Per-hour-window single-pass HLL (mirrors the streaming register
    * build + batch readout of StreamingAnalytics.replayHllRollup — equal
    * by register-MAX associativity; constants derive from `b` exactly like
    * [[sketchHllDistinct]]). */
  def sketchHllByWindow(scale: Double, b: Int = 6): String = {
    val m = 1 << b
    val div = 1L << (32 - b)
    val rmax = 32 - b + 1
    val fill = 1L << rmax
    s"""
WITH h AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
         (${hex8IntSql("user_id::VARCHAR")}) AS hv
  FROM events
),
reg AS (
  SELECT window_start, hv // $div AS bucket,
         MAX(CASE WHEN hv % $div = 0 THEN $rmax
                  ELSE $rmax - length(bin(hv % $div)) END) AS r
  FROM h GROUP BY 1, 2
),
s AS (
  SELECT window_start, COUNT(*) AS n_buckets_set,
         CAST(SUM(1::BIGINT << CAST($rmax - r AS INTEGER)) AS BIGINT) AS s_present
  FROM reg GROUP BY 1
),
e AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
         COUNT(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY 1
),
r2 AS (
  SELECT s.window_start, CAST($m AS BIGINT) AS m, n_buckets_set,
         ROUND($scale / (s_present + ($m - n_buckets_set) * $fill), 2) AS est_distinct,
         exact_distinct
  FROM s JOIN e USING (window_start)
)
SELECT window_start, m, n_buckets_set, est_distinct, exact_distinct,
       ((ABS(CAST(ROUND(est_distinct * 100, 0) AS BIGINT) - exact_distinct * 100) * 10000)
        // (exact_distinct * 100))::DOUBLE / 10000.0 AS rel_error
FROM r2 ORDER BY window_start"""
  }

  /** Mirrors Sketches.hllSlidingDistinct: hourly register tables fanned
    * out to their trailing readout hours, (hour, bucket) MAX merge, the
    * same power-of-two-exact raw estimator and integer-bp error. */
  def sketchHllSliding(scale: Double, windowHours: Int = 24, b: Int = 6): String = {
    val m = 1 << b
    val div = 1L << (32 - b)
    val rmax = 32 - b + 1
    val fill = 1L << rmax
    s"""
WITH h0 AS (
  SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) // 3600 AS h,
         user_id, (${hex8IntSql("user_id::VARCHAR")}) AS hv
  FROM events),
regs AS (
  SELECT h, hv // $div AS bucket,
         MAX(CASE WHEN hv % $div = 0 THEN $rmax
                  ELSE $rmax - length(bin(hv % $div)) END) AS r
  FROM h0 GROUP BY 1, 2),
live AS (SELECT DISTINCT h FROM h0),
fan AS (
  SELECT unnest(generate_series(h, h + ${windowHours - 1})) AS window_h, bucket, r
  FROM regs),
mg AS (
  SELECT f.window_h, f.bucket, MAX(f.r) AS r
  FROM fan f JOIN live l ON l.h = f.window_h GROUP BY 1, 2),
s AS (
  SELECT window_h, COUNT(*) AS n_buckets_set,
         CAST(SUM(1::BIGINT << CAST($rmax - r AS INTEGER)) AS BIGINT) AS s_present
  FROM mg GROUP BY 1),
pairs AS (SELECT DISTINCT h, user_id FROM h0),
fanx AS (
  SELECT unnest(generate_series(h, h + ${windowHours - 1})) AS window_h, user_id
  FROM pairs),
e AS (
  SELECT f.window_h, COUNT(DISTINCT f.user_id) AS exact_distinct
  FROM fanx f JOIN live l ON l.h = f.window_h GROUP BY 1),
r2 AS (
  SELECT s.window_h, CAST($m AS BIGINT) AS m, n_buckets_set,
         ROUND($scale / (s_present + ($m - n_buckets_set) * $fill), 2) AS est_distinct,
         exact_distinct
  FROM s JOIN e USING (window_h))
SELECT window_h, m, n_buckets_set, est_distinct, exact_distinct,
       ((ABS(CAST(ROUND(est_distinct * 100, 0) AS BIGINT) - exact_distinct * 100) * 10000)
        // (exact_distinct * 100))::DOUBLE / 10000.0 AS rel_error
FROM r2 ORDER BY window_h"""
  }

  /** Mirrors Sampling.capPerGroup over (source, doc_id) — the same md5
    * rank order as every sampling oracle. */
  def capPerSource(cap: Int = 10): String = s"""
WITH h AS (
  SELECT doc_id, source AS grp, (${hex8IntSql("doc_id::VARCHAR")}) AS hv FROM documents
),
r AS (
  SELECT doc_id, grp,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY hv, doc_id) AS sample_rank
  FROM h
)
SELECT doc_id, grp, CAST(sample_rank AS BIGINT) AS sample_rank
FROM r WHERE sample_rank <= $cap ORDER BY grp, sample_rank"""

  /** Mirrors Sketches.hashSampleQuantiles over events.value keyed by
    * event_id: bottom-k by the shared md5 order, nearest-rank-below
    * readout (an element, never an interpolation). */
  /** Mirrors Sketches.hdrQuantiles: the integer-bit-arithmetic HDR bucket
    * grid (octave = binary bit-length − 1 via format('{:b}'), sub-bucket =
    * top subBits+1 bits), register census, integer cumulative walk to the
    * lower quantile, half-cent midpoint estimates, and the exact walk at
    * unit resolution for the error audit — every step integer-exact, so
    * the twin is arithmetic identity, not float luck. */
  def hdrQuantiles(qs: Seq[Int] = Seq(50, 90, 99), subBits: Int = 5): String = {
    val s = subBits
    val m = 1L << s      // sub-buckets per octave
    val unit = 1L << (s + 1)
    val bound = 1000000L >> (s + 1)
    def decode(idxCol: String): String = s"""
         CASE WHEN $idxCol < 0 THEN 0
              WHEN $idxCol < $unit THEN $idxCol * 2
              ELSE (($idxCol % $m) + $m) * (1::BIGINT << CAST($idxCol // $m - 1 AS INT)) * 2
                   + (1::BIGINT << CAST($idxCol // $m - 1 AS INT)) - 1 END"""
    s"""
WITH cents AS (
  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
),
b AS (
  SELECT g, CASE WHEN c < 1 THEN CAST(-1 AS BIGINT)
                 WHEN length(format('{:b}', c)) - 1 <= $s THEN c
                 ELSE (length(format('{:b}', c)) - 1 - $s) * $m
                      + (c >> CAST(length(format('{:b}', c)) - 1 - $s AS INT)) END AS idx
  FROM cents
),
regs AS (SELECT g, idx, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
tot AS (SELECT g, SUM(cnt) AS n FROM regs GROUP BY 1),
cm AS (SELECT g, idx, SUM(cnt) OVER (PARTITION BY g ORDER BY idx) AS cum FROM regs),
q(q_pct) AS (VALUES ${qs.map(q => s"($q)").mkString(", ")}),
pick AS (
  SELECT cm.g, q.q_pct, t.n, MIN(cm.idx) AS idx
  FROM cm JOIN tot t USING (g) CROSS JOIN q
  WHERE cm.cum >= (q.q_pct * t.n + 99) // 100
  GROUP BY 1, 2, 3
),
est AS (SELECT g, q_pct, n, ${decode("idx")} AS est2 FROM pick),
xregs AS (SELECT g, c, COUNT(*) AS cnt FROM cents GROUP BY 1, 2),
xcm AS (SELECT g, c, SUM(cnt) OVER (PARTITION BY g ORDER BY c) AS cum FROM xregs),
xpick AS (
  SELECT xcm.g, q.q_pct, MIN(xcm.c) AS c
  FROM xcm JOIN tot t USING (g) CROSS JOIN q
  WHERE xcm.cum >= (q.q_pct * t.n + 99) // 100
  GROUP BY 1, 2
),
xact AS (SELECT g, q_pct, CASE WHEN c < 0 THEN 0 ELSE c * 2 END AS exact2 FROM xpick)
SELECT est.g AS event_type, CAST(est.q_pct AS BIGINT) AS q_pct,
       CAST(est.n AS BIGINT) AS n, CAST(est.est2 AS BIGINT) AS est2,
       CAST(xact.exact2 AS BIGINT) AS exact2,
       CAST(CASE WHEN xact.exact2 = 0 THEN 0
                 ELSE abs(est.est2 - xact.exact2) * 1000000 // xact.exact2
            END AS BIGINT) AS rel_err_ppm,
       (CASE WHEN xact.exact2 = 0 THEN 0
             ELSE abs(est.est2 - xact.exact2) * 1000000 // xact.exact2
        END) <= $bound AS within_bound
FROM est JOIN xact USING (g, q_pct)
ORDER BY event_type, q_pct"""
  }

  /** Mirrors Sketches.hdrSlidingQuantiles: per-day register censuses
    * merged by count addition across each trailing window, the same
    * integer walks (sketch grid + exact value grid), per window-end day. */
  def hdrSlidingQuantiles(qs: Seq[Int] = Seq(50, 99), windowDays: Int = 3,
      subBits: Int = 5): String = {
    val s = subBits
    val m = 1L << s
    val unit = 1L << (s + 1)
    val bound = 1000000L >> (s + 1)
    def decode(idxCol: String): String = s"""
         CASE WHEN $idxCol < 0 THEN 0
              WHEN $idxCol < $unit THEN $idxCol * 2
              ELSE (($idxCol % $m) + $m) * (1::BIGINT << CAST($idxCol // $m - 1 AS INT)) * 2
                   + (1::BIGINT << CAST($idxCol // $m - 1 AS INT)) - 1 END"""
    s"""
WITH cents AS (
  SELECT CAST(ts AS DATE) AS day, CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
),
b AS (
  SELECT day, CASE WHEN c < 1 THEN CAST(-1 AS BIGINT)
                   WHEN length(format('{:b}', c)) - 1 <= $s THEN c
                   ELSE (length(format('{:b}', c)) - 1 - $s) * $m
                        + (c >> CAST(length(format('{:b}', c)) - 1 - $s AS INT)) END AS idx
  FROM cents
),
dayregs AS (SELECT day, idx, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
days AS (SELECT DISTINCT day FROM dayregs),
members AS (
  SELECT d.day, md.day AS mday
  FROM days d JOIN days md
    ON md.day <= d.day AND md.day >= d.day - ${windowDays - 1}
),
merged AS (
  SELECT mem.day, r.idx, SUM(r.cnt) AS cnt
  FROM members mem JOIN dayregs r ON r.day = mem.mday
  GROUP BY 1, 2
),
tot AS (SELECT day, SUM(cnt) AS n_window FROM merged GROUP BY 1),
cm AS (SELECT day, idx, SUM(cnt) OVER (PARTITION BY day ORDER BY idx) AS cum FROM merged),
q(q_pct) AS (VALUES ${qs.map(q => s"($q)").mkString(", ")}),
pick AS (
  SELECT cm.day, q.q_pct, t.n_window, MIN(cm.idx) AS idx
  FROM cm JOIN tot t USING (day) CROSS JOIN q
  WHERE cm.cum >= (q.q_pct * t.n_window + 99) // 100
  GROUP BY 1, 2, 3
),
est AS (SELECT day, q_pct, n_window, ${decode("idx")} AS est2 FROM pick),
dayexact AS (SELECT day, c, COUNT(*) AS cnt FROM cents GROUP BY 1, 2),
mergedx AS (
  SELECT mem.day, x.c, SUM(x.cnt) AS cnt
  FROM members mem JOIN dayexact x ON x.day = mem.mday
  GROUP BY 1, 2
),
xcm AS (SELECT day, c, SUM(cnt) OVER (PARTITION BY day ORDER BY c) AS cum FROM mergedx),
xpick AS (
  SELECT xcm.day, q.q_pct, MIN(xcm.c) AS c
  FROM xcm JOIN tot t USING (day) CROSS JOIN q
  WHERE xcm.cum >= (q.q_pct * t.n_window + 99) // 100
  GROUP BY 1, 2
),
xact AS (SELECT day, q_pct, CASE WHEN c < 0 THEN 0 ELSE c * 2 END AS exact2 FROM xpick)
SELECT est.day AS day, CAST(est.q_pct AS BIGINT) AS q_pct,
       CAST(est.n_window AS BIGINT) AS n_window, CAST(est.est2 AS BIGINT) AS est2,
       CAST(xact.exact2 AS BIGINT) AS exact2,
       CAST(CASE WHEN xact.exact2 = 0 THEN 0
                 ELSE abs(est.est2 - xact.exact2) * 1000000 // xact.exact2
            END AS BIGINT) AS rel_err_ppm,
       (CASE WHEN xact.exact2 = 0 THEN 0
             ELSE abs(est.est2 - xact.exact2) * 1000000 // xact.exact2
        END) <= $bound AS within_bound
FROM est JOIN xact USING (day, q_pct)
ORDER BY day, q_pct"""
  }

  def hashSampleQuantiles(k: Int = 256, qs: Seq[Int] = Seq(10, 25, 50, 75, 90)): String = s"""
WITH s AS (
  SELECT value AS v, (${hex8IntSql("event_id::VARCHAR")}) AS hv
  FROM events WHERE value IS NOT NULL
  ORDER BY hv LIMIT $k
),
r AS (
  SELECT v, ROW_NUMBER() OVER (ORDER BY v, hv) AS rn, COUNT(*) OVER () AS m
  FROM s
),
q(q) AS (VALUES ${qs.map(q => s"($q)").mkString(", ")})
SELECT CAST(q AS BIGINT) AS q, v AS est_value, CAST(m AS BIGINT) AS sample_k
FROM r JOIN q ON rn = (q * (m - 1)) // 100 + 1
ORDER BY q"""

  /** Mirrors TextOps.scrubStats: URL → email regex redaction (RE2-safe
    * patterns shared with the Spark side; DuckDB needs the explicit 'g'
    * flag where Spark's regexp_replace is global by default), then
    * token-exact blocklist redaction. */
  /** The scrub CTE chain (s1/s2, parametrized source) — shared by
    * [[scrubStats]] and [[curationV3]]. */
  private def scrubCtes(src: String): String = {
    val url = TextOps.UrlPattern
    val email = TextOps.EmailPattern // '\.' passes through a SQL string literal verbatim
    val blocked = TextOps.BlocklistTerms.map(t => s"'$t'").mkString(", ")
    s"""s1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '$url')) AS BIGINT) AS n_urls,
         CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_emails,
         CAST(length(text) AS BIGINT) AS n_chars,
         string_split(regexp_replace(regexp_replace(text, '$url', '<URL>', 'g'),
                                     '$email', '<EMAIL>', 'g'), ' ') AS toks
  FROM $src
),
s2 AS (
  SELECT doc_id, n_urls, n_emails, n_chars,
         CAST(len(list_filter(toks, t -> t IN ($blocked))) AS BIGINT) AS n_blocklist,
         array_to_string(list_transform(toks,
           t -> CASE WHEN t IN ($blocked) THEN '<TERM>' ELSE t END), ' ') AS scrubbed
  FROM s1
)"""
  }

  val scrubStats: String = s"""
WITH ${scrubCtes("documents")}
SELECT doc_id, n_urls, n_emails, n_blocklist, n_chars,
       CAST(length(scrubbed) AS BIGINT) AS n_chars_scrubbed,
       md5(scrubbed) AS scrubbed_md5
FROM s2 ORDER BY doc_id"""

  /** Mirrors TextOps.c4Filters — metrics AND rule thresholds render from
    * TextOps.C4, so the two sides cannot drift; verdicts compare the
    * rounded metrics on both engines. */
  /** The C4 metric + verdict CTE chain (reads `toks`; yields `c4v` with
    * fail_rule) — shared by [[c4Filters]] and [[curationV3]]. */
  private val c4MetricCtes: String = {
    val c = TextOps.C4
    s"""c4m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         ROUND(list_sum(list_transform(toks, t -> len(t)))::DOUBLE / len(toks), 4)
           AS mean_token_len,
         ROUND(list_max(list_transform(list_distinct(toks),
                 t -> len(list_filter(toks, x -> x = t))))::DOUBLE / len(toks), 4)
           AS top_token_share,
         ROUND(len(list_distinct(toks))::DOUBLE / len(toks), 4) AS distinct_ratio
  FROM toks
),
c4v AS (
  SELECT *,
         CASE WHEN n_tokens < ${c.MinTokens} THEN 'too_short'
              WHEN n_tokens > ${c.MaxTokens} THEN 'too_long'
              WHEN mean_token_len < ${c.MinMeanTokenLen}
                OR mean_token_len > ${c.MaxMeanTokenLen} THEN 'token_len'
              WHEN top_token_share > ${c.MaxTopTokenShare} THEN 'repetition'
              WHEN distinct_ratio < ${c.MinDistinctRatio} THEN 'low_diversity'
         END AS fail_rule
  FROM c4m
)"""
  }

  val c4Filters: String = s"""
WITH $toksCte,
$c4MetricCtes
SELECT doc_id, n_tokens, mean_token_len, top_token_share, distinct_ratio,
       (fail_rule IS NULL) AS keep, fail_rule
FROM c4v ORDER BY doc_id"""

  /** Mirrors Curation.curateV3: canonicalize → containment drop (higher id
    * of any pair ≥ tau) → C4 + PII-density gates → per-source cap ranked
    * among survivors. Every fragment is the SAME CTE chain its standalone
    * oracle uses, re-sourced onto the canonical corpus. */
  def curationV3(tau: Double = 0.8, maxPii: Int = 2, cap: Int = 10): String = s"""
WITH canon AS (
  SELECT doc_id, text, source FROM (
    SELECT doc_id, text, source, MIN(doc_id) OVER (PARTITION BY md5(text)) AS _canon
    FROM documents) t
  WHERE doc_id = _canon
),
${toksCteFrom("canon")},
$shinglesCte,
${containmentCandCtes(tau)},
$c4MetricCtes,
cdrop AS (
  SELECT DISTINCT CASE WHEN ta < tb THEN doc_a
                       WHEN tb < ta THEN doc_b
                       ELSE GREATEST(doc_a, doc_b) END AS doc_id
  FROM (
    SELECT cand.doc_a, cand.doc_b, ma.n_tokens AS ta, mb.n_tokens AS tb,
           len(list_intersect(sa.sh, sb.sh))::DOUBLE / LEAST(len(sa.sh), len(sb.sh)) AS c_raw
    FROM cand
    JOIN sh sa ON sa.doc_id = cand.doc_a
    JOIN sh sb ON sb.doc_id = cand.doc_b
    JOIN c4m ma ON ma.doc_id = cand.doc_a
    JOIN c4m mb ON mb.doc_id = cand.doc_b) t
  WHERE c_raw >= $tau
),
${scrubCtes("canon")},
surv AS (
  SELECT c.doc_id, c.source, c4v.n_tokens,
         (${hex8IntSql("c.doc_id::VARCHAR")}) AS hv
  FROM canon c
  JOIN c4v ON c4v.doc_id = c.doc_id
  JOIN s2 ON s2.doc_id = c.doc_id
  WHERE c4v.fail_rule IS NULL
    AND s2.n_urls + s2.n_emails + s2.n_blocklist <= $maxPii
    AND c.doc_id NOT IN (SELECT doc_id FROM cdrop)
),
ranked AS (
  SELECT doc_id, source, n_tokens,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv, doc_id) AS sample_rank
  FROM surv
)
SELECT doc_id, source, n_tokens, CAST(sample_rank AS BIGINT) AS sample_rank
FROM ranked WHERE sample_rank <= $cap ORDER BY source, sample_rank"""

  /** Mirrors Curation.curateV4: the v3 skeleton + Gopher verdicts + the
    * CDC duplicated-chunk share ceiling (chars inside chunks shared
    * across canonical docs, exact BIGINT micro-units). */
  def curationV4(tau: Double = 0.8, maxPii: Int = 2, cap: Int = 10,
      maxDupShareMicro: Long = 600000L): String = s"""
WITH canon AS (
  SELECT doc_id, text, source FROM (
    SELECT doc_id, text, source, MIN(doc_id) OVER (PARTITION BY md5(text)) AS _canon
    FROM documents) t
  WHERE doc_id = _canon
),
${toksCteFrom("canon")},
$shinglesCte,
${containmentCandCtes(tau)},
$c4MetricCtes,
cdrop AS (
  SELECT DISTINCT CASE WHEN ta < tb THEN doc_a
                       WHEN tb < ta THEN doc_b
                       ELSE GREATEST(doc_a, doc_b) END AS doc_id
  FROM (
    SELECT cand.doc_a, cand.doc_b, ma.n_tokens AS ta, mb.n_tokens AS tb,
           len(list_intersect(sa.sh, sb.sh))::DOUBLE / LEAST(len(sa.sh), len(sb.sh)) AS c_raw
    FROM cand
    JOIN sh sa ON sa.doc_id = cand.doc_a
    JOIN sh sb ON sb.doc_id = cand.doc_b
    JOIN c4m ma ON ma.doc_id = cand.doc_a
    JOIN c4m mb ON mb.doc_id = cand.doc_b) t
  WHERE c_raw >= $tau
),
${scrubCtes("canon")},
${gopherCtes("canon")},
${cdcChunkRowCtes("canon")},
ccross AS (
  SELECT chunk FROM cch GROUP BY chunk HAVING COUNT(DISTINCT doc_id) >= 2
),
cdup AS (
  SELECT doc_id, SUM(length(chunk)) AS dup_chars
  FROM cch JOIN ccross USING (chunk) GROUP BY doc_id
),
cshare AS (
  SELECT c.doc_id,
         CAST(COALESCE(COALESCE(d.dup_chars, 0) * 1000000
                       // NULLIF(length(c.text), 0), 0) AS BIGINT)
           AS dup_share_micro
  FROM canon c LEFT JOIN cdup d USING (doc_id)
),
surv AS (
  SELECT c.doc_id, c.source, c4v.n_tokens,
         (${hex8IntSql("c.doc_id::VARCHAR")}) AS hv
  FROM canon c
  JOIN c4v ON c4v.doc_id = c.doc_id
  JOIN gv ON gv.doc_id = c.doc_id
  JOIN s2 ON s2.doc_id = c.doc_id
  JOIN cshare ON cshare.doc_id = c.doc_id
  WHERE c4v.fail_rule IS NULL
    AND gv.fail_rule IS NULL
    AND s2.n_urls + s2.n_emails + s2.n_blocklist <= $maxPii
    AND cshare.dup_share_micro <= $maxDupShareMicro
    AND c.doc_id NOT IN (SELECT doc_id FROM cdrop)
),
ranked AS (
  SELECT doc_id, source, n_tokens,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv, doc_id) AS sample_rank
  FROM surv
)
SELECT doc_id, source, n_tokens, CAST(sample_rank AS BIGINT) AS sample_rank
FROM ranked WHERE sample_rank <= $cap ORDER BY source, sample_rank"""

  /** Mirrors Sampling.classBalanced over embeddings: class census → 1-row
    * min → per-class (md5, id) rank ≤ min. */
  val sampleClassBalanced: String = s"""
WITH mn AS (
  SELECT MIN(n) AS min_class_n
  FROM (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label)
),
r AS (
  SELECT vec_id, CAST(label AS BIGINT) AS class,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY label
           ORDER BY (${hex8IntSql("vec_id::VARCHAR")}), vec_id) AS BIGINT)
           AS sample_rank
  FROM embeddings
)
SELECT vec_id, class, sample_rank FROM r, mn
WHERE sample_rank <= min_class_n ORDER BY class, sample_rank"""

  /** Mirrors Dedup.lshRecallEval: the two dedup oracles as derived
    * tables, semi-joined, integer recall/precision. */
  val dedupLshRecall: String = s"""
WITH ex AS (SELECT doc_a, doc_b FROM ($ngramJaccard) tx),
ls AS (SELECT doc_a, doc_b FROM ($minhashLsh) tl),
cm AS (SELECT ls.doc_a, ls.doc_b FROM ls JOIN ex USING (doc_a, doc_b))
SELECT (SELECT COUNT(*) FROM ex) AS n_exact,
       (SELECT COUNT(*) FROM ls) AS n_lsh,
       (SELECT COUNT(*) FROM cm) AS n_common,
       CAST((SELECT COUNT(*) FROM cm) * 1000000
            // NULLIF((SELECT COUNT(*) FROM ex), 0) AS BIGINT) AS recall_micro,
       CAST((SELECT COUNT(*) FROM cm) * 1000000
            // NULLIF((SELECT COUNT(*) FROM ls), 0) AS BIGINT) AS precision_micro"""

  /** Mirrors Dedup.lshScurve: the two dedup oracles as derived tables,
    * decile from the ROUND(4) jaccard, the same pow-free multiplication
    * chain for the analytic banding curve. */
  val dedupLshScurve: String = s"""
WITH ex AS (SELECT doc_a, doc_b, jaccard FROM ($ngramJaccard) tx),
ls AS (SELECT doc_a, doc_b FROM ($minhashLsh) tl),
m AS (
  SELECT ex.jaccard, CASE WHEN ls.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM ex LEFT JOIN ls USING (doc_a, doc_b)),
g AS (
  SELECT LEAST(CAST(floor(jaccard * 10) AS BIGINT), 9) AS decile,
         COUNT(*) AS n_pairs, CAST(SUM(hit) AS BIGINT) AS n_detected
  FROM m GROUP BY 1),
g2 AS (SELECT *, (CAST(decile AS DOUBLE) + 0.5) / 10.0 AS s FROM g),
g3 AS (SELECT *, (1.0 - s * s * s) AS q FROM g2),
g4 AS (SELECT *, q * q AS q2 FROM g3)
SELECT decile, n_pairs, n_detected,
       n_detected * 10000 // n_pairs AS detect_bp,
       CAST(floor((1.0 - q2 * q2) * 10000) AS BIGINT) AS analytic_bp
FROM g4 ORDER BY decile"""

  /** Mirrors TrainPrep.leakageAudit: simhash pairs × both split oracles,
    * straddle counts per method. */
  def leakageAudit(valPct: Int = 10, testPct: Int = 10): String = {
    def one(splitSql: String, name: String) = s"""
SELECT '$name' AS method, COUNT(*) AS n_pairs,
       CAST(SUM(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END) AS BIGINT)
         AS n_straddling,
       CAST(SUM(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END) * 1000000
            // NULLIF(COUNT(*), 0) AS BIGINT) AS straddle_micro
FROM pr
JOIN ($splitSql) a ON a.doc_id = pr.doc_a
JOIN ($splitSql) b ON b.doc_id = pr.doc_b"""
    s"""
WITH pr AS (SELECT doc_a, doc_b FROM ($simhashPairs) tp)
${one(trainSplits(valPct, testPct), "per_doc")}
UNION ALL${one(leakageSafeSplits(valPct, testPct), "per_cluster")}
ORDER BY method"""
  }

  /** Mirrors operators.BpeLearn: word-level BPE merge learning, `rounds`
    * unrolled CTE rounds. Sequences are double-separator (U+001F) wrapped
    * strings; `replace` is greedy-left non-overlapping on both engines, so
    * each round's rewrite matches the Spark operator byte-for-byte. A
    * round whose best pair falls below count 2 goes empty and every later
    * round no-ops via the coalesce(chr(1)) impossible-pattern guard. */
  private val BpeSep = "\u001f"

  private def bpeSql(rounds: Int): String = {
    val S = BpeSep
    val sb = new StringBuilder
    sb ++= s"""WITH d0 AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '),
                     t -> t <> '' AND NOT contains(t, '$S')) AS toks
  FROM documents
), s0 AS (
  SELECT doc_id, len(toks) AS n_tokens,
         array_to_string(list_transform(toks, t -> '$S' || t || '$S'), '') AS s
  FROM d0 WHERE len(toks) >= 1
)"""
    for (r <- 1 to rounds) {
      val p = r - 1
      sb ++= s""", t$r AS (
  SELECT doc_id, string_split(s[2:len(s)-1], '$S$S') AS toks FROM s$p
), p$r AS (
  SELECT pr.l AS l, pr.r AS r, COUNT(*) AS cnt FROM (
    SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                  i -> struct_pack(l := toks[i], r := toks[i+1]))) AS pr
    FROM t$r) GROUP BY 1, 2
), m$r AS (
  SELECT l, r, cnt FROM p$r WHERE cnt >= 2 ORDER BY cnt DESC, l, r LIMIT 1
), s$r AS (
  SELECT doc_id, n_tokens,
         replace(s,
           coalesce((SELECT '$S' || l || '$S$S' || r || '$S' FROM m$r), chr(1)),
           coalesce((SELECT '$S' || l || ' ' || r || '$S' FROM m$r), chr(1))) AS s
  FROM s$p
)"""
    }
    sb.toString
  }

  def bpeMerges(rounds: Int = 6): String =
    bpeSql(rounds) + "\n" + (1 to rounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS merge_rank, l AS left_sym, " +
        s"r AS right_sym, cnt AS pair_freq FROM m$r")
      .mkString("", "\nUNION ALL ", "\nORDER BY merge_rank")

  def bpeApply(rounds: Int = 6): String = {
    val S = BpeSep
    bpeSql(rounds) + s"""
SELECT doc_id, n_tokens,
       len(string_split(s[2:len(s)-1], '$S$S')) AS n_symbols,
       ROUND(len(string_split(s[2:len(s)-1], '$S$S'))::DOUBLE / n_tokens, 4)
         AS compression
FROM s$rounds ORDER BY doc_id"""
  }

  /** Mirrors BpeLearn.fertilityByLang: the same unrolled merge rounds,
    * then a language-keyed rollup of words/symbols/chars with the two
    * ratio divisions on identical integer sums. */
  def bpeFertility(rounds: Int = 6): String = {
    val S = BpeSep
    bpeSql(rounds) + s""",
app AS (
  SELECT doc_id, n_tokens,
         len(string_split(s[2:len(s)-1], '$S$S')) AS n_sym
  FROM s$rounds)
SELECT d.lang, COUNT(*) AS n_docs,
       CAST(SUM(a.n_tokens) AS BIGINT) AS n_words,
       CAST(SUM(a.n_sym) AS BIGINT) AS n_symbols,
       CAST(SUM(d.n_chars) AS BIGINT) AS n_chars,
       ROUND(CAST(SUM(a.n_sym) AS BIGINT)::DOUBLE
             / CAST(SUM(a.n_tokens) AS BIGINT), 4) AS fertility,
       ROUND(CAST(SUM(d.n_chars) AS BIGINT)::DOUBLE
             / CAST(SUM(a.n_sym) AS BIGINT), 4) AS chars_per_symbol
FROM app a JOIN documents d USING (doc_id)
GROUP BY 1 ORDER BY 1"""
  }

  /** Mirrors Similarity.sqTopK (asymmetric SQ8/ADC): per-dimension
    * [min,max] envelope census → linear uint8 quantization (floor + clamp
    * — floor because the two engines disagree on round-half rules) →
    * decode to float32 midpoints → exact rounded cosine of the RAW query
    * against the reconstruction. DuckDB's double→int cast rounds where
    * Spark's truncates, but the cast input is already an integral floor()
    * value so the two agree; the decode is a fixed double expression tree
    * rounded once to FLOAT — identical IEEE on both engines. */
  def annSqTopK(nQueries: Int = 5, k: Int = 5): String = s"""
WITH stats AS (
  SELECT d, MIN(v::DOUBLE) AS mn, MAX(v::DOUBLE) AS mx
  FROM (SELECT generate_subscripts(embedding, 1) AS d, unnest(embedding) AS v
        FROM embeddings)
  GROUP BY d
),
bounds AS (SELECT list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs FROM stats),
coded AS (
  SELECT vec_id,
         list_transform(generate_series(1, len(embedding)), i ->
           COALESCE(CAST(LEAST(255, GREATEST(0,
             floor((embedding[i]::DOUBLE - mns[i])
                   / NULLIF(mxs[i] - mns[i], 0) * 256))) AS INTEGER), 0)) AS code
  FROM embeddings, bounds
),
recon AS (
  SELECT vec_id,
         list_transform(generate_series(1, len(code)), i ->
           CAST(mns[i] + (code[i]::DOUBLE + 0.5) * (mxs[i] - mns[i]) / 256
                AS FLOAT)) AS recon
  FROM coded, bounds
),
q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
      WHERE vec_id < $nQueries),
scored AS (
  SELECT q.query_id, r.vec_id AS neighbor_id,
         ${cosSql("q.q_emb", "r.recon")} AS sq_sim
  FROM q JOIN recon r ON r.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, sq_sim, rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sq_sim DESC, neighbor_id) AS rank
      FROM scored) t
WHERE rank <= $k ORDER BY query_id, rank"""

  /** Mirrors Similarity.bqTopK: per-dim mean-sign bits decided by integer
    * cross-multiplication (xm·n > Σxm in HUGEINT ↔ Spark DECIMAL(38,0)),
    * packed into dim/32 32-bit words (shifts ≤ 2³¹ — no signed-bit wrap on
    * either engine), Hamming shortlist via bit_count(xor), exact rounded-
    * cosine rerank. The clean-vector guard applies to queries too, so both
    * engines rank the same probe set. */
  def annBqTopK(nQueries: Int = 5, k: Int = 5, dim: Int = 64,
      shortlist: Int = 20): String = {
    val nWords = dim / 32
    val wordExprs = (0 until nWords).map { w =>
      s"""CAST(list_sum(list_transform(generate_series(0, 31), i ->
         |  CASE WHEN CAST(floor(embedding[${w * 32} + i + 1]::DOUBLE * 1e6) AS HUGEINT) * n
         |            > sxs[${w * 32} + i + 1]
         |       THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT) AS w$w""".stripMargin
    }.mkString(",\n         ")
    val hammingExpr = (0 until nWords)
      .map(w => s"CAST(bit_count(xor(c.w$w, q.q_w$w)) AS BIGINT)")
      .mkString(" + ")
    s"""
WITH ce AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE len(embedding) >= $dim
    AND len(list_filter(embedding[1:$dim],
                        x -> x IS NULL OR isnan(x::DOUBLE))) = 0
),
st AS (
  SELECT d, SUM(CAST(floor(x::DOUBLE * 1e6) AS BIGINT))::HUGEINT AS sx
  FROM (SELECT generate_subscripts(embedding[1:$dim], 1) AS d,
               unnest(embedding[1:$dim]) AS x
        FROM ce)
  GROUP BY d
),
b AS (SELECT list(sx ORDER BY d) AS sxs,
             (SELECT COUNT(*)::HUGEINT FROM ce) AS n FROM st),
coded AS (
  SELECT vec_id, embedding,
         $wordExprs
  FROM ce, b
),
q AS (SELECT vec_id AS query_id, embedding AS q_emb,
             ${(0 until nWords).map(w => s"w$w AS q_w$w").mkString(", ")}
      FROM coded WHERE vec_id < $nQueries),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, c.embedding, q.q_emb,
         $hammingExpr AS hamming
  FROM q JOIN coded c ON c.vec_id <> q.query_id
),
sl AS (
  SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY hamming, neighbor_id) AS srn FROM scored) t
  WHERE srn <= $shortlist
),
rr AS (
  SELECT query_id, neighbor_id, hamming,
         ${cosSql("q_emb", "embedding")} AS cosine_sim
  FROM sl
)
SELECT query_id, neighbor_id, hamming, cosine_sim, rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM rr) t
WHERE rank <= $k ORDER BY query_id, rank"""
  }

  /** Mirrors Similarity.matryoshkaTopK: prefix-dim cosine shortlist, exact
    * full-dim rerank, both with the shared rounded-cosine tie-break
    * contract. */
  def annMatryoshkaTopK(nQueries: Int = 5, k: Int = 5, dPrefix: Int = 16,
      shortlist: Int = 20): String = s"""
WITH e AS (SELECT vec_id, embedding, embedding[1:$dPrefix] AS pre FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS q_emb, pre AS q_pre
      FROM e WHERE vec_id < $nQueries),
sc AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, e.embedding, q.q_emb,
         ${cosSql("q.q_pre", "e.pre")} AS prefix_sim
  FROM q JOIN e ON e.vec_id <> q.query_id
),
sl AS (
  SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY prefix_sim DESC, neighbor_id) AS srn FROM sc) t
  WHERE srn <= $shortlist
),
rr AS (
  SELECT query_id, neighbor_id, prefix_sim,
         ${cosSql("q_emb", "embedding")} AS cosine_sim
  FROM sl
)
SELECT query_id, neighbor_id, prefix_sim, cosine_sim, rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM rr) t
WHERE rank <= $k ORDER BY query_id, rank"""

  /** Mirrors Similarity.recallEval: every approximate oracle as a derived
    * table semi-joined against the exact oracle, integer recall. */
  def annRecallEval(nQueries: Int = 5, k: Int = 5): String = {
    val poss = nQueries.toLong * k
    val methods = Seq(
      "ivf" -> annIvfTopK(nQueries, k),
      "lsh" -> annLshTopK,
      "matryoshka" -> annMatryoshkaTopK(nQueries, k),
      "pq" -> annPqTopK(nQueries, k),
      "sq" -> annSqTopK(nQueries, k),
      "bq" -> annBqTopK(nQueries, k))
    val rows = methods.map { case (m, sql) =>
      s"""SELECT '$m' AS method,
       CAST((SELECT COUNT(*) FROM ($sql) am
             JOIN ex USING (query_id, neighbor_id)) AS BIGINT) AS hits"""
    }.mkString("\nUNION ALL\n")
    s"""
WITH ex AS (SELECT query_id, neighbor_id FROM (${annTopK}) tex)
SELECT method, hits, CAST($poss AS BIGINT) AS possible,
       CAST(hits * 1000000 // $poss AS BIGINT) AS recall_micro
FROM ($rows) ORDER BY method"""
  }

  /** Mirrors Dedup.cdcChunks: windowed Karp-Rabin boundary hash (same
    * power-of-31 literals, same mod), final-position boundary append,
    * chunk extraction by consecutive boundary pairs, census of chunks
    * seen ≥ 2 times. DuckDB's generate_series(8, n) is empty for n < 8,
    * so the Spark side's count-down guard has no twin here. */
  /** CDC chunk-row CTEs (cps/cb/cch) over `from` — shared by
    * [[cdcChunks]] and [[curationV4]]. */
  private def cdcChunkRowCtes(from: String, window: Int = 8, divisor: Int = 32): String = s"""
cps AS (
  SELECT doc_id, text,
    list_transform(
      list_filter(
        list_transform(generate_series($window, length(text)),
          i -> struct_pack(pos := i,
            h := list_sum(list_transform(generate_series(0, ${window - 1}),
              j -> ascii(substr(text, CAST(i - j AS INTEGER), 1))
                   * [1,31,961,29791,923521,28629151,887503681,27512614111][j+1]))
                 % 2147483647)),
        x -> x.h % $divisor = 0),
      x -> x.pos) AS ps
  FROM $from
),
cb AS (
  SELECT doc_id, text,
    CASE WHEN len(ps) > 0 AND ps[-1] = length(text)
         THEN ps ELSE list_append(ps, length(text)) END AS bnds
  FROM cps
),
cch AS (
  SELECT doc_id,
    unnest(list_transform(generate_series(1, len(bnds)), k ->
      substr(text,
        CAST((CASE WHEN k = 1 THEN 0 ELSE bnds[k - 1] END) + 1 AS INTEGER),
        CAST(bnds[k] - (CASE WHEN k = 1 THEN 0 ELSE bnds[k - 1] END) AS INTEGER))))
      AS chunk
  FROM cb
)"""

  def cdcChunks(window: Int = 8, divisor: Int = 32): String = s"""
WITH ${cdcChunkRowCtes("documents", window, divisor)}
SELECT chunk, CAST(length(chunk) AS BIGINT) AS chunk_len,
       COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
FROM cch GROUP BY chunk HAVING COUNT(*) >= 2 ORDER BY chunk"""

  /** Gopher metric + verdict CTEs (gtoks/gm/gv) over `from` — exact
    * micro-unit metrics, same first-failure rule order as
    * TextOps.gopherRules. Shared by [[gopherRules]] and [[curationV4]]. */
  private def gopherCtes(from: String): String = {
    import graft.functions.TextOps.Gopher._
    val stops = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""gtoks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM $from),
gm AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(toks, w -> length(w))) * 1000000
              // len(toks) AS BIGINT) AS mean_word_len_micro,
         CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) * 1000000
              // len(toks) AS BIGINT) AS frac_alpha_micro,
         CAST(len(list_filter(toks, w -> w IN ($stops))) AS BIGINT) AS stopword_count
  FROM gtoks
),
gv AS (
  SELECT *, CASE
    WHEN n_words < $MinWords THEN 'too_few_words'
    WHEN n_words > $MaxWords THEN 'too_many_words'
    WHEN mean_word_len_micro < $MinMeanLenMicro
      OR mean_word_len_micro > $MaxMeanLenMicro THEN 'word_length'
    WHEN frac_alpha_micro < $MinAlphaMicro THEN 'non_alpha'
    WHEN stopword_count < $MinStopwords THEN 'no_stopwords'
  END AS fail_rule
  FROM gm
)"""
  }

  val gopherRules: String = s"""
WITH ${gopherCtes("documents")}
SELECT doc_id, n_words, mean_word_len_micro, frac_alpha_micro, stopword_count,
       fail_rule IS NULL AS keep, fail_rule
FROM gv ORDER BY doc_id"""

  /** Mirrors TrainPrep.packAudit: the packSequences layout CTEs, then one
    * shard-keyed integer audit (ceiling division, boundary counts). */
  def packAudit(maxTokens: Int = 512, docsPerShard: Int = 1000): String = s"""
WITH $toksCte,
t AS (
  SELECT doc_id,
         CAST(FLOOR(doc_id / $docsPerShard) AS BIGINT) AS shard,
         len(toks)::BIGINT AS n_tokens
  FROM toks
),
c AS (
  SELECT doc_id, shard, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prior
  FROM t
),
p AS (
  SELECT shard, n_tokens,
         prior - (prior // $maxTokens) * $maxTokens AS pack_offset
  FROM c
),
a AS (
  SELECT shard, COUNT(*) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         CAST(SUM(CASE WHEN pack_offset + n_tokens > $maxTokens THEN 1 ELSE 0 END)
              AS BIGINT) AS straddle_docs
  FROM p GROUP BY shard
)
SELECT shard, n_docs,
       CAST((total_tokens + ${maxTokens - 1}) // $maxTokens AS BIGINT) AS n_packs,
       total_tokens,
       CAST((total_tokens + ${maxTokens - 1}) // $maxTokens * $maxTokens - total_tokens
            AS BIGINT) AS tail_waste_tokens,
       CAST(total_tokens * 1000000
            // NULLIF((total_tokens + ${maxTokens - 1}) // $maxTokens * $maxTokens, 0)
            AS BIGINT) AS fill_micro,
       straddle_docs,
       CAST(straddle_docs * 1000000 // NULLIF(n_docs, 0) AS BIGINT) AS straddle_micro
FROM a ORDER BY shard"""

  /** Mirrors Curation.dataCard: source-keyed volume/quality/distinct-hash
    * censuses + per-language micro-floored entropy terms. */
  val dataCard: String = s"""
WITH $toksCte,
q AS (
  SELECT t.doc_id,
         ROUND(LEAST(len(toks), 200)::DOUBLE / 200.0 *
               (1.0 - ROUND(length(regexp_replace(d.text, '[a-z0-9 ]', '', 'g'))::DOUBLE
                            / NULLIF(length(d.text), 0), 4)), 4) AS quality_score,
         len(toks)::BIGINT AS n_toks
  FROM toks t JOIN documents d ON d.doc_id = t.doc_id
),
vol AS (
  SELECT d.source,
         COUNT(*) AS n_docs,
         CAST(SUM(q.n_toks) AS BIGINT) AS n_tokens,
         COUNT(DISTINCT md5(d.text)) AS n_distinct,
         CAST(SUM(CAST(ROUND(q.quality_score * 10000) AS BIGINT)) AS BIGINT) AS q4_sum,
         COUNT(q.quality_score) AS q_n
  FROM documents d JOIN q ON q.doc_id = d.doc_id
  GROUP BY d.source
),
lc AS (
  SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY 1, 2
),
lt AS (
  SELECT source, lang, c, SUM(c) OVER (PARTITION BY source) AS n
  FROM lc
),
terms AS (
  SELECT source,
         CAST(floor(-(c::DOUBLE / n) * ln(c::DOUBLE / n) * 1e6) AS BIGINT) AS term_micro
  FROM lt
),
ent AS (
  SELECT source, CAST(SUM(term_micro) AS BIGINT) AS lang_entropy_micro,
         COUNT(*) AS n_langs
  FROM terms GROUP BY source
)
SELECT vol.source, vol.n_docs, vol.n_tokens,
       CAST((vol.n_docs - vol.n_distinct) * 1000000 // NULLIF(vol.n_docs, 0) AS BIGINT)
         AS dup_share_micro,
       CAST(vol.q4_sum * 100 // NULLIF(vol.q_n, 0) AS BIGINT) AS mean_quality_micro,
       ent.n_langs, ent.lang_entropy_micro
FROM vol JOIN ent ON ent.source = vol.source
ORDER BY vol.source"""

  /** Mirrors TextOps.rakeKeywords: stopword-run phrase candidates, integer
    * deg·10⁶ div freq word scores, ordered reassembly, top-k per doc. */
  def rakeKeywords(k: Int = 3): String = s"""
WITH $toksCte,
px AS (
  SELECT doc_id,
         unnest(generate_series(1, len(toks))) - 1 AS pos,
         unnest(toks) AS tok
  FROM toks
),
pos AS (
  SELECT doc_id, pos, tok,
         CASE WHEN tok IN ($stopwordIn) THEN 1 ELSE 0 END AS is_stop
  FROM px
),
runs AS (
  SELECT doc_id, pos, tok, is_stop,
         SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM pos
),
words AS (SELECT doc_id, run_id, pos, tok FROM runs WHERE is_stop = 0),
plen AS (SELECT doc_id, run_id, COUNT(*) AS plen FROM words GROUP BY 1, 2),
occ AS (
  SELECT w.doc_id, w.run_id, w.pos, w.tok, p.plen
  FROM words w JOIN plen p ON p.doc_id = w.doc_id AND p.run_id = w.run_id
),
ws AS (SELECT tok, COUNT(*) AS freq, SUM(plen) AS deg FROM occ GROUP BY tok),
wm AS (SELECT tok, CAST(deg * 1000000 // freq AS BIGINT) AS w_micro FROM ws),
ph AS (
  SELECT o.doc_id, o.run_id,
         string_agg(o.tok, ' ' ORDER BY o.pos) AS phrase,
         COUNT(*) AS n_words,
         CAST(SUM(wm.w_micro) AS BIGINT) AS score_micro
  FROM occ o JOIN wm ON wm.tok = o.tok
  GROUP BY 1, 2
),
dd AS (
  SELECT doc_id, phrase, MAX(n_words) AS n_words, MAX(score_micro) AS score_micro
  FROM ph GROUP BY 1, 2
),
rk AS (
  SELECT doc_id, phrase, n_words, score_micro,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score_micro DESC, phrase) AS rank
  FROM dd
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, phrase,
       CAST(n_words AS BIGINT) AS n_words, score_micro
FROM rk WHERE rank <= $k ORDER BY doc_id, rank"""

  /** Mirrors Validators.contractCheck: one aggregate pass, rules unpivoted
    * as uniform (rule_id, observed, bound, pass) rows; the lang domain
    * renders from the same LangMarkers constant. */
  val contractCheck: String = {
    val langIn = TextOps.LangMarkers.map(_._1).distinct.sorted
      .map(l => s"'$l'").mkString(", ")
    s"""
WITH m AS (
  SELECT CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_doc_id,
         CAST(COUNT(doc_id) - COUNT(DISTINCT doc_id) AS BIGINT) AS dup_doc_id,
         CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_text,
         CAST(SUM(CASE WHEN n_chars IS NULL OR text IS NULL THEN 1
                       WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT)
           AS n_chars_mismatch,
         CAST(SUM(CASE WHEN lang IS NULL THEN 1
                       WHEN lang NOT IN ($langIn) THEN 1 ELSE 0 END) AS BIGINT)
           AS lang_out_of_domain,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS source_cardinality,
         CAST(SUM(CASE WHEN n_chars IS NULL THEN 1
                       WHEN n_chars < 0 OR n_chars > 1000000 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_chars_out_of_range,
         CAST(MAX(length(text)) AS BIGINT) AS max_text_len
  FROM documents
),
rules AS (
  SELECT 'doc_id_not_null' AS rule_id, COALESCE(null_doc_id, 0) AS observed,
         CAST(0 AS BIGINT) AS bound FROM m
  UNION ALL SELECT 'doc_id_unique', COALESCE(dup_doc_id, 0), 0 FROM m
  UNION ALL SELECT 'lang_in_domain', COALESCE(lang_out_of_domain, 0), 0 FROM m
  UNION ALL SELECT 'max_text_len', COALESCE(max_text_len, 0), 1000000 FROM m
  UNION ALL SELECT 'n_chars_matches_text', COALESCE(n_chars_mismatch, 0), 0 FROM m
  UNION ALL SELECT 'n_chars_in_range', COALESCE(n_chars_out_of_range, 0), 0 FROM m
  UNION ALL SELECT 'source_cardinality', COALESCE(source_cardinality, 0), 64 FROM m
  UNION ALL SELECT 'text_not_null', COALESCE(null_text, 0), 0 FROM m
)
SELECT rule_id, observed, bound, observed <= bound AS pass
FROM rules ORDER BY rule_id"""
  }

  /** Mirrors Multimodal.hardNegativePairs: the phash CTE of [[mmPhashDedup]],
    * bandBits-bit band candidates, xor+bit_count Hamming, per-anchor top-k.
    * Constants render from the same (bits, bandBits, maxHamming, k). */
  def mmHardNegatives(bits: Int = 48, bandBits: Int = 12,
      maxHamming: Int = 8, k: Int = 5): String = {
    val nBands = bits / bandBits
    val mask = (1 << bandBits) - 1
    s"""
WITH ch AS (
  SELECT doc_id, length(text) AS n,
         list_transform(generate_series(1, length(text)),
                        i -> ascii(substr(text, i, 1))) AS bytes
  FROM documents
),
t AS (SELECT doc_id, n, bytes,
             CAST(COALESCE(list_sum(bytes), 0) AS BIGINT) AS total FROM ch),
h AS (
  SELECT doc_id,
         CAST(COALESCE(list_sum(list_transform(generate_series(0, ${bits - 1}), kk ->
           CASE WHEN CAST(COALESCE(list_sum(
                       bytes[((kk * n) // $bits) + 1 : ((kk + 1) * n) // $bits]), 0)
                     AS BIGINT) * n
                   > total * (((kk + 1) * n) // $bits - (kk * n) // $bits)
                THEN (1::BIGINT << kk) ELSE 0 END)), 0) AS BIGINT) AS phash32
  FROM t
),
bands AS (
  SELECT doc_id, phash32, b.b AS band_idx, (phash32 >> (b.b * $bandBits)) & $mask AS band_val
  FROM h, generate_series(0, ${nBands - 1}) b(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.phash32 AS ha, b.phash32 AS hb
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id < b.doc_id
),
scored AS (
  SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
  FROM cand
  WHERE bit_count(xor(ha, hb)) BETWEEN 1 AND $maxHamming
),
bidir AS (
  SELECT doc_a AS anchor_doc, doc_b AS neg_doc, hamming FROM scored
  UNION ALL
  SELECT doc_b AS anchor_doc, doc_a AS neg_doc, hamming FROM scored
),
ranked AS (
  SELECT anchor_doc, neg_doc, hamming,
         ROW_NUMBER() OVER (PARTITION BY anchor_doc
                            ORDER BY hamming, neg_doc) AS rank
  FROM bidir
)
SELECT anchor_doc, neg_doc, hamming, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= $k ORDER BY anchor_doc, rank"""
  }

  /** Mirrors TextOps.knBigramLogProb: one bigram-type census feeds the
    * three KN statistics; identical fixed double tree, micro-nat floors. */
  val knBigramLogProb: String = s"""
WITH $toksCte,
bi AS (
  SELECT doc_id, unnest(toks[1:len(toks)-1]) AS prev, unnest(toks[2:len(toks)]) AS cur
  FROM toks WHERE len(toks) >= 2
),
c2 AS (SELECT prev, cur, COUNT(*) AS c2 FROM bi GROUP BY 1, 2),
ctx AS (SELECT prev, SUM(c2) AS cctx, COUNT(*) AS n1w1 FROM c2 GROUP BY 1),
cont AS (SELECT cur, COUNT(*) AS ncont FROM c2 GROUP BY 1),
tot AS (SELECT COUNT(*) AS nbig FROM c2),
lp AS (
  SELECT prev, cur,
         CAST(floor(ln((c2::DOUBLE - CAST(0.75 AS DOUBLE)) / cctx +
                       ((CAST(0.75 AS DOUBLE) * n1w1) / cctx) *
                         (ncont::DOUBLE / nbig)) * 1000000.0) AS BIGINT) AS micro
  FROM c2 JOIN ctx USING (prev) JOIN cont USING (cur) CROSS JOIN tot
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(CAST(CAST(SUM(micro) AS BIGINT) AS DOUBLE) / COUNT(*) / 1000000.0, 4)
         AS avg_kn_logprob,
       ROUND(CAST(MIN(micro) AS DOUBLE) / 1000000.0, 4) AS min_kn_logprob
FROM bi JOIN lp USING (prev, cur)
GROUP BY doc_id ORDER BY doc_id"""

  /** Mirrors TextOps.knHeldoutLogProb: md5-stable 81/19 split, train-side
    * bigram census, held-out scoring with the three-branch backoff and
    * the add-one continuation floor — identical fixed double trees,
    * micro-nat floors before the per-doc sum. */
  val knHeldoutLogProb: String = s"""
WITH $toksCte,
tagged AS (
  SELECT doc_id, toks,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'd' AS is_train
  FROM toks),
bi AS (
  SELECT doc_id, is_train,
         unnest(toks[1:len(toks)-1]) AS prev, unnest(toks[2:len(toks)]) AS cur
  FROM tagged WHERE len(toks) >= 2),
c2 AS (SELECT prev, cur, COUNT(*) AS c2 FROM bi WHERE is_train GROUP BY 1, 2),
ctx AS (SELECT prev, SUM(c2) AS cctx, COUNT(*) AS n1w1 FROM c2 GROUP BY 1),
cont AS (SELECT cur, COUNT(*) AS ncont FROM c2 GROUP BY 1),
tot AS (
  SELECT (SELECT COUNT(*) FROM c2) AS nbig,
         (SELECT COUNT(*) FROM cont) AS vtypes),
scored AS (
  SELECT b.doc_id,
         CAST(floor(ln(
           CASE WHEN c.c2 IS NOT NULL THEN
             (c.c2::DOUBLE - CAST(0.75 AS DOUBLE)) / x.cctx +
             ((CAST(0.75 AS DOUBLE) * x.n1w1) / x.cctx) *
               (CAST(COALESCE(n.ncont, 0) + 1 AS DOUBLE) / (t.nbig + t.vtypes))
           WHEN x.cctx IS NOT NULL THEN
             ((CAST(0.75 AS DOUBLE) * x.n1w1) / x.cctx) *
               (CAST(COALESCE(n.ncont, 0) + 1 AS DOUBLE) / (t.nbig + t.vtypes))
           ELSE CAST(COALESCE(n.ncont, 0) + 1 AS DOUBLE) / (t.nbig + t.vtypes)
           END) * 1000000.0) AS BIGINT) AS micro,
         CASE WHEN c.c2 IS NULL THEN 1 ELSE 0 END AS oov
  FROM bi b
  LEFT JOIN c2 c ON b.prev = c.prev AND b.cur = c.cur
  LEFT JOIN ctx x ON b.prev = x.prev
  LEFT JOIN cont n ON b.cur = n.cur
  CROSS JOIN tot t
  WHERE NOT b.is_train)
SELECT doc_id, COUNT(*) AS n_bigrams,
       CAST(SUM(oov) AS BIGINT) AS oov_bigrams,
       ROUND(CAST(CAST(SUM(micro) AS BIGINT) AS DOUBLE) / COUNT(*) / 1000000.0, 4)
         AS avg_heldout_logprob,
       ROUND(CAST(MIN(micro) AS DOUBLE) / 1000000.0, 4) AS min_heldout_logprob
FROM scored GROUP BY doc_id ORDER BY doc_id"""

  /** Mirrors TrainPrep.preferencePairs: the simhash equal-sketch pair graph
    * joined twice against the ROUND(4)-pinned quality kernel; strict
    * inequality picks chosen/rejected. */
  val preferencePairs: String = s"""
WITH $simhashGraphCtes,
q AS (
  SELECT t.doc_id,
         ROUND(LEAST(len(toks), 200)::DOUBLE / 200.0 *
               (1.0 - ROUND(length(regexp_replace(d.text, '[a-z0-9 ]', '', 'g'))::DOUBLE
                            / NULLIF(length(d.text), 0), 4)), 4) AS quality_score
  FROM toks t JOIN documents d ON d.doc_id = t.doc_id
),
j AS (
  SELECT p.doc_a, p.doc_b, qa.quality_score AS qa, qb.quality_score AS qb
  FROM pairs p
  JOIN q qa ON qa.doc_id = p.doc_a
  JOIN q qb ON qb.doc_id = p.doc_b
  WHERE qa.quality_score IS NOT NULL AND qb.quality_score IS NOT NULL
    AND qa.quality_score <> qb.quality_score
)
SELECT CASE WHEN qa > qb THEN doc_a ELSE doc_b END AS chosen_doc,
       CASE WHEN qa > qb THEN doc_b ELSE doc_a END AS rejected_doc,
       CASE WHEN qa > qb THEN qa ELSE qb END AS chosen_score,
       CASE WHEN qa > qb THEN qb ELSE qa END AS rejected_score,
       ROUND((CASE WHEN qa > qb THEN qa ELSE qb END) -
             (CASE WHEN qa > qb THEN qb ELSE qa END), 4) AS margin
FROM j ORDER BY chosen_doc, rejected_doc"""

  /** Mirrors TextOps.nbLangConfusion: md5-stable 81/19 split, add-one
    * smoothed multinomial NB with micro-nat-quantized log weights, argmax
    * with lang tie-break, confusion counts over the held-out split. */
  val nbLangConfusion: String = s"""
WITH tagged AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'd' AS is_train
  FROM documents
),
tok AS (
  SELECT doc_id, lang, is_train, t, COUNT(*) AS tf
  FROM (SELECT doc_id, lang, is_train, unnest(toks) AS t FROM tagged)
  GROUP BY doc_id, lang, is_train, t
),
counts AS (
  SELECT lang AS m_lang, t, SUM(tf) AS c FROM tok WHERE is_train GROUP BY 1, 2
),
lt AS (SELECT m_lang, SUM(c) AS n_lang FROM counts GROUP BY m_lang),
vocab AS (SELECT COUNT(DISTINCT t) AS v FROM counts),
priors AS (
  SELECT lang AS m_lang, COUNT(DISTINCT doc_id) AS n_docs_lang
  FROM tok WHERE is_train GROUP BY 1
),
ntd AS (SELECT SUM(n_docs_lang) AS n_train FROM priors),
pm AS (
  SELECT m_lang,
         CAST(floor(ln(n_docs_lang::DOUBLE / n_train) * 1e6) AS BIGINT) AS prior_micro
  FROM priors, ntd
),
tt AS (SELECT * FROM tok WHERE NOT is_train),
grid AS (
  SELECT g.t, lt.m_lang,
         CAST(floor(ln((COALESCE(c.c, 0) + 1)::DOUBLE / (lt.n_lang + vocab.v)) * 1e6)
              AS BIGINT) AS w_micro
  FROM (SELECT DISTINCT t FROM tt) g
  CROSS JOIN lt
  LEFT JOIN counts c ON c.t = g.t AND c.m_lang = lt.m_lang
  CROSS JOIN vocab
),
sc AS (
  SELECT tt.doc_id, tt.lang, grid.m_lang,
         CAST(SUM(tt.tf * grid.w_micro) AS BIGINT) AS ll_micro
  FROM tt JOIN grid ON grid.t = tt.t
  GROUP BY 1, 2, 3
),
fin AS (
  SELECT sc.doc_id, sc.lang, sc.m_lang,
         ROW_NUMBER() OVER (PARTITION BY sc.doc_id
                            ORDER BY sc.ll_micro + pm.prior_micro DESC, sc.m_lang) AS rk
  FROM sc JOIN pm ON pm.m_lang = sc.m_lang
)
SELECT lang AS lang_actual, m_lang AS lang_pred, COUNT(*) AS n_docs
FROM fin WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2"""

  /** The DSIR weight CTE chain over `src` (yields `wts`: doc_id,
    * n_tokens, logratio_micro) — shared by [[dsirWeights]],
    * [[dsirResample]] and the v5 curation twin. */
  private[queries] def dsirCtes(targetLang: String = "en", buckets: Int = 256,
      src: String = "documents"): String = s"""occ0 AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM $src),
occ AS (
  SELECT doc_id, lang,
         CAST((${hex8IntSql("token")}) % $buckets AS BIGINT) AS bucket
  FROM occ0),
census AS (
  SELECT bucket, COUNT(*) AS r_cnt,
         CAST(SUM(CASE WHEN lang = '$targetLang' THEN 1 ELSE 0 END) AS BIGINT) AS t_cnt
  FROM occ GROUP BY 1),
tot AS (
  SELECT CAST(SUM(r_cnt) AS BIGINT) AS r_tot, CAST(SUM(t_cnt) AS BIGINT) AS t_tot
  FROM census),
lam AS (
  SELECT bucket,
         CAST(floor((ln((t_cnt + 1)::DOUBLE / (t_tot + $buckets)::DOUBLE) -
                     ln((r_cnt + 1)::DOUBLE / (r_tot + $buckets)::DOUBLE)) * 1e6)
              AS BIGINT) AS lam_micro
  FROM census CROSS JOIN tot),
wts AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         CAST(SUM(lam_micro) AS BIGINT) AS logratio_micro
  FROM occ JOIN lam USING (bucket)
  GROUP BY doc_id)"""

  /** Mirrors TextOps.dsirWeights: hashed-unigram bucket censuses in one
    * pass, add-one log-ratio floored to micro-nats per bucket, integer
    * per-doc sums. Same md5-hash32 bucket, same double expression. */
  def dsirWeights(targetLang: String = "en", buckets: Int = 256): String = s"""
WITH ${dsirCtes(targetLang, buckets)}
SELECT doc_id, n_tokens, logratio_micro,
       ROUND(logratio_micro::DOUBLE / n_tokens / 1e6, 4) AS avg_logratio
FROM wts ORDER BY doc_id"""

  /** Mirrors Curation.curateV5: canon window, the DSIR weight chain over
    * canon, quantile floor, and the outlier screen as a derived table —
    * each piece the same SQL its own gate runs. */
  def curationV5(targetLang: String = "en", buckets: Int = 256,
      dropBp: Int = 2500, nCentroids: Int = 8, iters: Int = 3,
      dim: Int = 64, tailBp: Int = 500): String = s"""
WITH canon AS (
  SELECT doc_id, text, lang, source FROM (
    SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS _c FROM documents) t
  WHERE doc_id = _c),
${dsirCtes(targetLang, buckets, "canon")},
thr AS (SELECT quantile_cont(logratio_micro, ${dropBp / 10000.0}) AS q_floor FROM wts),
outl AS (SELECT vec_id AS doc_id, is_outlier
         FROM (${embedOutliers(nCentroids, iters, dim, tailBp)}) z)
SELECT c.doc_id, c.source, w.logratio_micro
FROM canon c
JOIN wts w USING (doc_id)
CROSS JOIN thr
LEFT JOIN outl o USING (doc_id)
WHERE w.logratio_micro >= thr.q_floor AND NOT COALESCE(o.is_outlier, FALSE)
ORDER BY doc_id"""

  /** Mirrors TextOps.dsirResample: the weights query as a derived table,
    * the same (hash32+0.5)/2³² uniform and Gumbel-top-k key, integer-nano
    * key readout. */
  def dsirResample(targetLang: String = "en", buckets: Int = 256,
      k: Int = 100): String = s"""
WITH w AS (SELECT doc_id, logratio_micro FROM (${dsirWeights(targetLang, buckets)}) t),
keyed AS (
  SELECT doc_id, logratio_micro,
         logratio_micro::DOUBLE / 1e6
           - ln(-ln(((${hex8IntSql("doc_id::VARCHAR")}) + 0.5) / 4294967296.0))
           AS gkey
  FROM w)
SELECT doc_id, logratio_micro,
       CAST(floor(gkey * 1e9) AS BIGINT) AS gkey_nano,
       ROW_NUMBER() OVER (ORDER BY gkey DESC, doc_id) AS sample_rank
FROM keyed
ORDER BY gkey DESC, doc_id
LIMIT $k"""

}
