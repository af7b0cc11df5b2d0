package graft.queries

/** DuckDB oracle SQL — the ANSI-SQL twin of every Spark query in
  * [[graft.SparkEntry]], run by the driver over the same parquet tables.
  *
  * Mirroring contract (must hold for hash equality):
  *  - identical output column aliases (the comparator sorts columns by name);
  *  - identical deterministic total ORDER BY with tie-breaks;
  *  - identical ns→µs truncation (`CAST(ts AS TIMESTAMP)` truncates, exactly
  *    like Spark's `timestamp_micros(ts div 1000)`);
  *  - money outputs of *grouped* aggregates rounded to 2 decimals on both
  *    sides (summation order across engines differs by ~1e-12); running
  *    *window* sums are left unrounded — both engines accumulate
  *    sequentially in the same (CREATEDAT, TRANS_ID) order, so they are
  *    bit-identical.
  */
object OracleSql {

  // ---- query parameters (shared with SparkEntry) ----
  object Params {
    val CustA = "1"
    val CustB = "2"
    val AsOf = "2024-01-15 00:00:00"
    val Start = "2024-01-05 00:00:00"
    val End = "2024-01-25 00:00:00"
    val Day = "2024-01-15"
    val MonthFrom = "2024-01-01 00:00:00"
    val MonthUntil = "2024-02-01 00:00:00"
    val Threshold = 100.0
  }
  import Params._

  /** Shared pipeline CTEs: events → transactions → FIFO-matched →
    * balance history → current balances (mirrors Tables.transactions,
    * FifoMatcher.matchTransactions, BalanceAnalytics). */
  /** The events → transactions derivation alone (mirrors
    * Tables.transactions) — shared by [[pipelineCtes]] and the
    * standalone snapshot-merge oracle. */
  val txnsCte: String = """txns AS (
  SELECT CAST(event_id AS VARCHAR) AS transaction_id,
         CAST(user_id AS VARCHAR)  AS customer_id,
         CASE WHEN event_type IN ('purchase','error') THEN -value ELSE value END AS amount,
         CAST(ts AS TIMESTAMP)     AS ts_us,
         CASE WHEN event_type = 'purchase' THEN 'spent'
              WHEN event_type = 'error'    THEN 'expired'
              ELSE 'earned' END    AS transaction_type
  FROM events
)"""

  val pipelineCtes: String = s"""
$txnsCte,
ranked AS (
  SELECT transaction_id AS TRANS_ID, transaction_type AS TCTYPE, ts_us AS CREATEDAT,
         customer_id AS CUSTOMERID, amount AS AMOUNT,
         (transaction_type = 'earned') AS is_earned,
         ROW_NUMBER() OVER (PARTITION BY customer_id, (transaction_type = 'earned')
                            ORDER BY ts_us, transaction_id) AS rk
  FROM txns
),
matched AS (
  SELECT e.TRANS_ID, e.TCTYPE, e.CREATEDAT, e.CUSTOMERID, e.AMOUNT,
         se.TRANS_ID AS REDEEMID
  FROM ranked e
  LEFT JOIN ranked se
    ON se.CUSTOMERID = e.CUSTOMERID AND se.rk = e.rk AND NOT se.is_earned
  WHERE e.is_earned
  UNION ALL
  SELECT TRANS_ID, TCTYPE, CREATEDAT, CUSTOMERID, AMOUNT, NULL AS REDEEMID
  FROM ranked WHERE NOT is_earned
),
history0 AS (
  SELECT CUSTOMERID AS customer_id, CREATEDAT AS transaction_date,
         TRANS_ID AS transaction_id, TCTYPE AS transaction_type,
         AMOUNT AS transaction_amount,
         ROUND(SUM(CASE WHEN TCTYPE = 'earned'  THEN ABS(AMOUNT) ELSE 0.0 END) OVER wcum, 2) AS cumulative_earned,
         ROUND(SUM(CASE WHEN TCTYPE = 'spent'   THEN ABS(AMOUNT) ELSE 0.0 END) OVER wcum, 2) AS cumulative_spent,
         ROUND(SUM(CASE WHEN TCTYPE = 'expired' THEN ABS(AMOUNT) ELSE 0.0 END) OVER wcum, 2) AS cumulative_expired
  FROM matched
  WINDOW wcum AS (PARTITION BY CUSTOMERID ORDER BY CREATEDAT, TRANS_ID
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
balance_history AS (
  SELECT *, ROUND(cumulative_earned - cumulative_spent - cumulative_expired, 2) AS current_balance
  FROM history0
),
current_balances AS (
  SELECT customer_id, current_balance, cumulative_earned, cumulative_spent, cumulative_expired
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY customer_id
                    ORDER BY transaction_date DESC, transaction_id DESC) AS rn
        FROM balance_history) t
  WHERE rn = 1
)"""

  private def pipelined(body: String): String = s"WITH $pipelineCtes\n$body"

  val fifoMatch: String = pipelined(
    """SELECT TRANS_ID, TCTYPE, CREATEDAT, CUSTOMERID, AMOUNT, REDEEMID
FROM matched ORDER BY CUSTOMERID, CREATEDAT, TRANS_ID""")

  /** Twin of FifoMatcher.skewDecision: the whale census + dispatch rule,
    * replayed in exact integer arithmetic (ppm share via floor division,
    * threshold from the same WhaleShareMicro constant the Spark
    * dispatcher reads — interpolated so the two sides cannot drift). */
  val fifoSkewDecision: String = {
    val thr = graft.operators.FifoMatcher.WhaleShareMicro
    s"""WITH $txnsCte,
census AS (SELECT customer_id, COUNT(*) AS c FROM txns GROUP BY 1),
agg AS (SELECT CAST(SUM(c) AS BIGINT) AS total_rows,
               CAST(MAX(c) AS BIGINT) AS max_customer_rows FROM census)
SELECT total_rows, max_customer_rows,
       (max_customer_rows * 1000000) // total_rows AS share_ppm,
       max_customer_rows * 1000000 > total_rows * $thr AS whale,
       CASE WHEN max_customer_rows * 1000000 > total_rows * $thr
            THEN 'salted' ELSE 'primary' END AS variant
FROM agg"""
  }

  /** Twin of StreamingFifo.replayLedgerLateBoundedAudit: the batch matcher
    * is ground truth for ledger volume and match count, and the expected
    * beyond-bound drop count is EXACTLY zero (the replay delays rows one
    * chunk; the bound admits one chunk) — hardcoded so a nonzero counter
    * on the Spark side is a hash failure, not a silent curiosity. */
  val streamingBoundedAudit: String = pipelined(
    """SELECT COUNT(*) AS n_txns, COUNT(REDEEMID) AS n_matched,
       CAST(0 AS BIGINT) AS n_drop_late
FROM matched""")

  val balanceHistory: String = pipelined(
    """SELECT customer_id, transaction_date, transaction_id, transaction_type,
       transaction_amount, cumulative_earned, cumulative_spent, cumulative_expired,
       current_balance
FROM balance_history ORDER BY customer_id, transaction_date, transaction_id""")

  val currentBalances: String = pipelined(
    """SELECT customer_id, current_balance, cumulative_earned, cumulative_spent, cumulative_expired
FROM current_balances ORDER BY customer_id""")

  /** As-of join twin: per (customer, probe instant), the latest history row
    * at or before it — rank formulation with the same (date, id) tie-break
    * the union-window operator pins; LEFT keeps pre-history probes as null. */
  val asofBalanceJoin: String = pipelined(s"""
, probes AS (
  SELECT customer_id, ts
  FROM (SELECT DISTINCT customer_id FROM balance_history) c
  CROSS JOIN (VALUES (TIMESTAMP '$Start'), (TIMESTAMP '$AsOf'), (TIMESTAMP '$End')) t(ts)
),
j AS (
  SELECT p.customer_id, p.ts AS as_of_ts, h.current_balance,
         ROW_NUMBER() OVER (PARTITION BY p.customer_id, p.ts
                            ORDER BY h.transaction_date DESC, h.transaction_id DESC) AS rn
  FROM probes p LEFT JOIN balance_history h
    ON h.customer_id = p.customer_id AND h.transaction_date <= p.ts
)
SELECT customer_id, as_of_ts, current_balance
FROM j WHERE rn = 1 ORDER BY customer_id, as_of_ts""")

  /** Mirrors AsOfJoin.asOfNearest over the balance pipeline: the
    * declarative spec — per probe, rank the within-tolerance candidates on
    * each side (backward ties to the latest row, forward to the earliest),
    * then one CASE choosing the nearer side, backward on equal distance.
    * Distances are integer epoch seconds (floored on both engines). */
  def asofNearestJoin(tolSeconds: Long): String = pipelined(s"""
, probes AS (
  SELECT customer_id, ts
  FROM (SELECT DISTINCT customer_id FROM balance_history) c
  CROSS JOIN (VALUES (TIMESTAMP '$Start'), (TIMESTAMP '$AsOf'), (TIMESTAMP '$End')) t(ts)
),
back AS (
  SELECT p.customer_id, p.ts, h.transaction_date AS mts, h.current_balance AS bal,
         ROW_NUMBER() OVER (PARTITION BY p.customer_id, p.ts
                            ORDER BY h.transaction_date DESC, h.transaction_id DESC) AS rn
  FROM probes p JOIN balance_history h
    ON h.customer_id = p.customer_id AND h.transaction_date <= p.ts
   AND CAST(FLOOR(epoch(p.ts)) AS BIGINT) - CAST(FLOOR(epoch(h.transaction_date)) AS BIGINT) <= $tolSeconds
),
fwd AS (
  SELECT p.customer_id, p.ts, h.transaction_date AS mts, h.current_balance AS bal,
         ROW_NUMBER() OVER (PARTITION BY p.customer_id, p.ts
                            ORDER BY h.transaction_date ASC, h.transaction_id ASC) AS rn
  FROM probes p JOIN balance_history h
    ON h.customer_id = p.customer_id AND h.transaction_date >= p.ts
   AND CAST(FLOOR(epoch(h.transaction_date)) AS BIGINT) - CAST(FLOOR(epoch(p.ts)) AS BIGINT) <= $tolSeconds
),
j AS (
  SELECT p.customer_id, p.ts AS as_of_ts,
         b.mts AS b_ts, b.bal AS b_bal,
         f.mts AS f_ts, f.bal AS f_bal,
         CAST(FLOOR(epoch(p.ts)) AS BIGINT) - CAST(FLOOR(epoch(b.mts)) AS BIGINT) AS bd,
         CAST(FLOOR(epoch(f.mts)) AS BIGINT) - CAST(FLOOR(epoch(p.ts)) AS BIGINT) AS fd
  FROM probes p
  LEFT JOIN (SELECT * FROM back WHERE rn = 1) b
    ON b.customer_id = p.customer_id AND b.ts = p.ts
  LEFT JOIN (SELECT * FROM fwd WHERE rn = 1) f
    ON f.customer_id = p.customer_id AND f.ts = p.ts
),
c AS (
  SELECT *,
         (b_ts IS NOT NULL AND (f_ts IS NULL OR bd <= fd)) AS use_back,
         (f_ts IS NOT NULL AND NOT (b_ts IS NOT NULL AND bd <= fd)) AS use_fwd
  FROM j
)
SELECT customer_id, as_of_ts,
       CASE WHEN use_back THEN b_ts WHEN use_fwd THEN f_ts END AS matched_ts,
       CASE WHEN use_back THEN 'back' WHEN use_fwd THEN 'fwd' END AS matched_side,
       CAST(CASE WHEN use_back THEN bd WHEN use_fwd THEN fd END AS BIGINT) AS dist_seconds,
       CASE WHEN use_back THEN b_bal WHEN use_fwd THEN f_bal END AS current_balance
FROM c ORDER BY customer_id, as_of_ts""")

  // ---- Q1-Q12 (reference: src/sample_queries.sql) ----

  val q1: String = pipelined(s"""
, ranked_balances AS (
  SELECT customer_id, transaction_date, current_balance,
         ROW_NUMBER() OVER (PARTITION BY customer_id
                            ORDER BY transaction_date DESC, transaction_id DESC) AS rn
  FROM balance_history
  WHERE customer_id IN ('$CustA', '$CustB') AND transaction_date <= TIMESTAMP '$AsOf'
)
SELECT customer_id, transaction_date AS balance_as_of_date,
       current_balance AS thrive_cash_balance
FROM ranked_balances WHERE rn = 1 ORDER BY customer_id""")

  val q2: String = pipelined(s"""
SELECT customer_id, current_balance AS thrive_cash_balance,
       cumulative_earned, cumulative_spent, cumulative_expired
FROM current_balances WHERE customer_id IN ('$CustA', '$CustB') ORDER BY customer_id""")

  val q3: String = pipelined(s"""
SELECT customer_id, transaction_date, transaction_id, transaction_type,
       transaction_amount, cumulative_earned, cumulative_spent, cumulative_expired,
       current_balance
FROM balance_history WHERE customer_id = '$CustA'
ORDER BY transaction_date, transaction_id""")

  val q4: String = pipelined(s"""
, monthly AS (
  SELECT customer_id, CAST(DATE_TRUNC('month', transaction_date) AS TIMESTAMP) AS month,
         transaction_date, current_balance,
         ROW_NUMBER() OVER (PARTITION BY customer_id, DATE_TRUNC('month', transaction_date)
                            ORDER BY transaction_date DESC, transaction_id DESC) AS rn
  FROM balance_history WHERE customer_id = '$CustA'
)
SELECT customer_id, month, transaction_date AS last_transaction_date,
       current_balance AS month_end_balance
FROM monthly WHERE rn = 1 ORDER BY month""")

  val q5: String = pipelined(s"""
, on_date AS (
  SELECT customer_id, transaction_date, current_balance,
         ROW_NUMBER() OVER (PARTITION BY customer_id
                            ORDER BY transaction_date DESC, transaction_id DESC) AS rn
  FROM balance_history WHERE transaction_date <= TIMESTAMP '$AsOf'
)
SELECT customer_id, transaction_date AS balance_as_of_date, current_balance
FROM on_date WHERE rn = 1 AND current_balance > $Threshold
ORDER BY current_balance DESC, customer_id""")

  val q6: String = pipelined(s"""
, bs AS (
  SELECT customer_id, current_balance AS start_balance
  FROM (SELECT customer_id, current_balance,
               ROW_NUMBER() OVER (PARTITION BY customer_id
                                  ORDER BY transaction_date DESC, transaction_id DESC) AS rn
        FROM balance_history
        WHERE customer_id = '$CustA' AND transaction_date <= TIMESTAMP '$Start') t
  WHERE rn = 1
),
be AS (
  SELECT customer_id, current_balance AS end_balance
  FROM (SELECT customer_id, current_balance,
               ROW_NUMBER() OVER (PARTITION BY customer_id
                                  ORDER BY transaction_date DESC, transaction_id DESC) AS rn
        FROM balance_history
        WHERE customer_id = '$CustA' AND transaction_date <= TIMESTAMP '$End') t
  WHERE rn = 1
)
SELECT bs.customer_id, bs.start_balance, be.end_balance,
       (be.end_balance - bs.start_balance) AS balance_change,
       ROUND((be.end_balance - bs.start_balance) / NULLIF(bs.start_balance, 0) * 100, 2) AS pct_change
FROM bs JOIN be ON bs.customer_id = be.customer_id""")

  val q7: String = pipelined(s"""
, on_date AS (
  SELECT customer_id, transaction_date, current_balance, cumulative_earned,
         cumulative_spent, cumulative_expired,
         ROW_NUMBER() OVER (PARTITION BY customer_id
                            ORDER BY transaction_date DESC, transaction_id DESC) AS rn
  FROM balance_history WHERE transaction_date <= TIMESTAMP '$AsOf'
)
SELECT customer_id, transaction_date AS balance_as_of_date, current_balance,
       cumulative_earned, cumulative_spent, cumulative_expired
FROM on_date WHERE rn = 1
ORDER BY current_balance DESC, customer_id LIMIT 10""")

  val q8: String = pipelined(s"""
, on_date AS (
  SELECT customer_id, transaction_date, current_balance,
         ROW_NUMBER() OVER (PARTITION BY customer_id
                            ORDER BY transaction_date DESC, transaction_id DESC) AS rn
  FROM balance_history WHERE transaction_date <= TIMESTAMP '$AsOf'
)
SELECT customer_id, transaction_date AS balance_as_of_date, current_balance
FROM on_date WHERE rn = 1 AND current_balance = 0 ORDER BY customer_id""")

  val q9: String = pipelined(s"""
, on_date AS (
  SELECT customer_id, current_balance,
         ROW_NUMBER() OVER (PARTITION BY customer_id
                            ORDER BY transaction_date DESC, transaction_id DESC) AS rn
  FROM balance_history WHERE transaction_date <= TIMESTAMP '$AsOf'
)
SELECT COUNT(DISTINCT customer_id) AS total_customers,
       ROUND(AVG(current_balance), 2) AS avg_balance,
       ROUND(MIN(current_balance), 2) AS min_balance,
       ROUND(MAX(current_balance), 2) AS max_balance,
       ROUND(SUM(current_balance), 2) AS total_balance
FROM on_date WHERE rn = 1""")

  val q10: String = pipelined(s"""
SELECT customer_id, transaction_date, transaction_id, transaction_type,
       transaction_amount, current_balance AS balance_after_transaction
FROM balance_history
WHERE customer_id = '$CustA' AND CAST(transaction_date AS DATE) = DATE '$Day'
ORDER BY transaction_date, transaction_id""")

  val q11: String = pipelined(s"""
, daily AS (
  SELECT customer_id, CAST(CAST(transaction_date AS DATE) AS TIMESTAMP) AS date,
         transaction_date, current_balance,
         ROW_NUMBER() OVER (PARTITION BY customer_id, CAST(transaction_date AS DATE)
                            ORDER BY transaction_date DESC, transaction_id DESC) AS rn
  FROM balance_history
  WHERE customer_id = '$CustA'
    AND transaction_date >= TIMESTAMP '$MonthFrom'
    AND transaction_date <  TIMESTAMP '$MonthUntil'
)
SELECT customer_id, date, transaction_date AS last_transaction_time, current_balance
FROM daily WHERE rn = 1 ORDER BY date""")

  val q12: String = pipelined(s"""
SELECT customer_id, current_balance, cumulative_earned, cumulative_spent, cumulative_expired
FROM current_balances
WHERE cumulative_spent = 0 AND cumulative_expired = 0 AND cumulative_earned > 0
ORDER BY cumulative_earned DESC, customer_id""")

  val reportSummary: String = pipelined(s"""
, totals AS (
  SELECT COUNT(*) AS total_transactions,
         ROUND(SUM(CASE WHEN TCTYPE = 'earned' THEN AMOUNT ELSE 0.0 END), 2) AS total_earned,
         ROUND(SUM(CASE WHEN TCTYPE = 'spent' THEN ABS(AMOUNT) ELSE 0.0 END), 2) AS total_spent,
         ROUND(SUM(CASE WHEN TCTYPE = 'expired' THEN ABS(AMOUNT) ELSE 0.0 END), 2) AS total_expired,
         CAST(SUM(CASE WHEN TCTYPE = 'earned' AND REDEEMID IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS matching_records_count
  FROM matched
),
balances AS (
  SELECT COUNT(*) AS total_customers,
         ROUND(SUM(current_balance), 2) AS total_current_balance,
         CAST(SUM(CASE WHEN current_balance > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS customers_with_positive_balance
  FROM current_balances
)
SELECT total_transactions, total_earned, total_spent, total_expired,
       matching_records_count, total_customers, total_current_balance,
       customers_with_positive_balance
FROM totals CROSS JOIN balances""")

  val topBalances: String = pipelined(s"""
SELECT customer_id, current_balance, cumulative_earned, cumulative_spent, cumulative_expired
FROM current_balances
ORDER BY current_balance DESC, customer_id LIMIT 10""")

  // ---- validation surface (reference: src/thrive_cash_processing_dag.py) ----

  val vSourceQuality: String = pipelined(s"""
SELECT COUNT(*) AS row_count,
       CAST(SUM(CASE WHEN transaction_id   IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_transaction_id,
       CAST(SUM(CASE WHEN customer_id      IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_customer_id,
       CAST(SUM(CASE WHEN amount           IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_amount,
       CAST(SUM(CASE WHEN ts_us            IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_timestamp,
       CAST(SUM(CASE WHEN transaction_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_transaction_type,
       CAST(SUM(CASE WHEN TRY_CAST(CAST(amount AS VARCHAR) AS DOUBLE) IS NULL
                 AND amount IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS non_numeric_amount,
       CAST(SUM(CASE WHEN transaction_type NOT IN ('earned','spent','expired')
                THEN 1 ELSE 0 END) AS BIGINT) AS invalid_type_count
FROM txns""")

  val vReferentialIntegrity: String = pipelined(s"""
SELECT m.REDEEMID, m.TRANS_ID AS earned_id
FROM matched m
WHERE m.REDEEMID IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM matched s
                  WHERE s.TCTYPE IN ('spent','expired') AND s.TRANS_ID = m.REDEEMID)
ORDER BY m.REDEEMID""")

  val vBalanceEquation: String = pipelined(s"""
, eq AS (
  SELECT CUSTOMERID AS customer_id,
         SUM(CASE WHEN TCTYPE = 'earned' THEN AMOUNT ELSE 0.0 END) AS earned_total,
         ABS(SUM(CASE WHEN TCTYPE = 'spent' THEN AMOUNT ELSE 0.0 END)) AS spent_total,
         ABS(SUM(CASE WHEN TCTYPE = 'expired' THEN AMOUNT ELSE 0.0 END)) AS expired_total,
         SUM(CASE WHEN TCTYPE = 'earned' AND REDEEMID IS NULL THEN AMOUNT ELSE 0.0 END) AS remaining_unmatched
  FROM matched GROUP BY CUSTOMERID
)
SELECT customer_id,
       ROUND(earned_total, 2) AS earned_total,
       ROUND(spent_total, 2) AS spent_total,
       ROUND(expired_total, 2) AS expired_total,
       ROUND(remaining_unmatched, 2) AS remaining_unmatched,
       ROUND(ABS(earned_total - (spent_total + expired_total + remaining_unmatched)), 2) AS discrepancy,
       (ABS(earned_total - (spent_total + expired_total + remaining_unmatched)) <= 0.01) AS balanced
FROM eq ORDER BY customer_id""")

  val vChronology: String = pipelined(s"""
SELECT e.CUSTOMERID AS customer_id, e.TRANS_ID AS earned_id, e.CREATEDAT AS earned_at,
       e.REDEEMID, s.CREATEDAT AS redeemed_at
FROM matched e
JOIN matched s ON s.TCTYPE IN ('spent','expired') AND s.TRANS_ID = e.REDEEMID
WHERE e.REDEEMID IS NOT NULL AND e.CREATEDAT > s.CREATEDAT
ORDER BY customer_id, earned_id""")

  val vDupPairs: String = pipelined(s"""
SELECT TRANS_ID, REDEEMID, COUNT(*) AS cnt
FROM matched GROUP BY TRANS_ID, REDEEMID HAVING COUNT(*) > 1
ORDER BY TRANS_ID, REDEEMID""")

  val vResultSummary: String = pipelined(s"""
SELECT COUNT(*) AS total_rows,
       CAST(SUM(CASE WHEN REDEEMID IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS rows_with_redeemid,
       CAST(SUM(CASE WHEN REDEEMID IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS rows_without_redeemid,
       ROUND(SUM(CASE WHEN TCTYPE = 'earned' THEN AMOUNT ELSE 0.0 END), 2) AS total_earned,
       ROUND(ABS(SUM(CASE WHEN TCTYPE = 'spent' THEN AMOUNT ELSE 0.0 END)), 2) AS total_spent,
       ROUND(ABS(SUM(CASE WHEN TCTYPE = 'expired' THEN AMOUNT ELSE 0.0 END)), 2) AS total_expired,
       CAST(SUM(CASE WHEN TCTYPE IN ('spent','expired') AND REDEEMID IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS unmatched_spent_expired
FROM matched""")

  // ---- event-stream analytics over raw events ----

  private val evCte =
    """ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value, props
  FROM events)"""

  val eventsSessionize: String = s"""
WITH $evCte,
g AS (
  SELECT event_id, user_id, ts, value,
         CASE WHEN ts > LAG(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id"""

  val eventsHourly: String = s"""
WITH $evCte
SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS hour, event_type,
       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
FROM ev GROUP BY 1, 2 ORDER BY hour, event_type"""

  /** Batch twin of StreamingAnalytics.sessionRollup: gap-sessionization
    * with the session-window bounds — start = first event, end = last
    * event + gap. Split rule ts > prev + gap matches session_window's
    * touching-windows-merge semantics (spec-pinned at the exact boundary). */
  val streamingSessions: String = s"""
WITH $evCte,
g AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN ts > LAG(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM g
)
SELECT CAST(MIN(ts) AS TIMESTAMP) AS session_start,
       CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
       user_id, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
FROM s GROUP BY user_id, sess ORDER BY user_id, session_start"""

  /** Oracle for the two-stage salted aggregation: partial sums per
    * (key, salt) then the final rollup must equal the plain GROUP BY
    * (l_quantity is integral-valued, so double summation order is moot). */
  val aggSaltedSum: String = """
SELECT l_returnflag, SUM(l_quantity) AS sum_l_quantity
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Batch twin of StreamingAnalytics.windowedRollup: a 1-hour tumbling
    * window IS hour truncation, so once the replay harness has flushed
    * every window past the watermark the streaming result must equal this
    * plain GROUP BY. */
  val streamingRollup: String = s"""
WITH $evCte
SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS window_start,
       CAST(DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP) AS window_end,
       event_type, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
FROM ev GROUP BY 1, 2, 3 ORDER BY window_start, event_type"""

  val eventsPropsJson: String = s"""
WITH $evCte,
x AS (SELECT event_type,
             -- null-on-malformed parity with Spark's get_json_object + cast:
             -- DuckDB json_extract_string THROWS on invalid JSON and CAST
             -- throws on non-numeric values; guard + TRY_CAST both
             TRY_CAST(CASE WHEN props IS NULL OR NOT json_valid(props) THEN NULL
                           ELSE json_extract_string(props, '$$.k') END AS BIGINT) AS k
      FROM ev)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       ROUND(AVG(k), 4) AS avg_k
FROM x GROUP BY event_type ORDER BY event_type"""

  /** Interval-overlap concurrency twin: plain non-equi self-join (DuckDB
    * plans an IEJoin); the Spark side bins intervals and verifies exactly,
    * producing the identical counts. */
  val sessionsConcurrency: String = s"""
WITH $evCte,
g AS (
  SELECT event_id, user_id, ts, value,
         CASE WHEN ts > LAG(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s0 AS (
  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM g
),
sessions AS (
  SELECT user_id, session_id, MIN(ts) AS session_start, MAX(ts) AS session_end
  FROM s0 GROUP BY user_id, session_id
),
c AS (
  SELECT a.user_id, a.session_id, COUNT(*) AS cnt
  FROM sessions a JOIN sessions b
    ON a.session_start <= b.session_end AND b.session_start <= a.session_end
   AND NOT (a.user_id = b.user_id AND a.session_id = b.session_id)
  GROUP BY a.user_id, a.session_id
)
SELECT s.user_id, s.session_id, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS n_concurrent
FROM sessions s LEFT JOIN c USING (user_id, session_id)
ORDER BY user_id, session_id"""

  val eventsQuantiles: String = s"""
WITH $evCte
SELECT event_type, COUNT(*) AS n_events,
       ROUND(quantile_cont(value, 0.25), 4) AS p25,
       ROUND(quantile_cont(value, 0.5), 4) AS p50,
       ROUND(quantile_cont(value, 0.75), 4) AS p75,
       ROUND(quantile_cont(value, 0.95), 4) AS p95
FROM ev GROUP BY event_type ORDER BY event_type"""

  // ---- generic relational inventory over the TPC-H-ish tables ----

  val aggPricingSummary: String = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 2) AS avg_qty,
       ROUND(AVG(l_extendedprice), 2) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""

  /** Twin of RelationalQueries.topUnshippedOrders: the same cents ×
    * (100−pct) exact-integer revenue and full tie-break, so the top-k set
    * and order are engine-independent. */
  def topUnshippedOrders(segment: String = "BUILDING",
      asOf: String = "1997-06-30", k: Int = 10): String = s"""
SELECT o_orderkey, o_orderdate, o_orderpriority,
       ROUND(CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
                      (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                  AS BIGINT)::DOUBLE / 10000.0, 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > TIMESTAMP '$asOf 00:00:00'
  AND o_orderdate < TIMESTAMP '$asOf 00:00:00'
  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = '$segment')
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, o_orderkey
LIMIT $k"""

  /** Twin of RelationalQueries.largeVolumeOrders (Q18 shape): integral
    * quantities quantize to BIGINT before the sum, so threshold and
    * ranking are exact. */
  def largeVolumeOrders(minQty: Long = 300L, k: Int = 20): String = s"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate, total_qty
FROM (
  SELECT l_orderkey, CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING total_qty > $minQty
) t
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey
LIMIT $k"""

  /** Twin of RelationalQueries.promoRevenueShare (Q14 shape): one
    * conditional integer rollup; share_bp is the integer basis-point
    * floor (`//` on positives ≡ Spark's `div`). */
  /** Mirrors RelationalQueries.nationTradeVolume (TPC-H Q7 shape): the same
    * nation dimension aliased twice, exact integer units, one division for
    * the readable revenue. */
  def nationTradeVolume(nationA: String = "NATION_1",
      nationB: String = "NATION_2"): String = s"""
WITH f AS (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
           (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS unit
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name IN ('$nationA', '$nationB')
    AND n2.n_name IN ('$nationA', '$nationB')
    AND n1.n_name <> n2.n_name
)
SELECT supp_nation, cust_nation, l_year,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(unit AS HUGEINT)) AS BIGINT) AS volume_units,
       ROUND(CAST(SUM(CAST(unit AS HUGEINT)) AS DOUBLE) / 10000.0, 2) AS revenue
FROM f GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  /** Mirrors RelationalQueries.latePriorityOrders (TPC-H Q4 shape): the
    * correlated EXISTS the Spark side realizes as a keyed left-semi join
    * with a non-equi date residual. */
  def latePriorityOrders(graceDays: Int = 60, from: String = "1995-01-01",
      until: String = "1998-01-01"): String = s"""
SELECT o_orderpriority, COUNT(*) AS late_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '$from 00:00:00'
  AND o_orderdate <  TIMESTAMP '$until 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL $graceDays DAY)
GROUP BY 1 ORDER BY 1"""

  /** Twin of RelationalQueries.returnedItemCustomers (TPC-H Q10 shape):
    * same exact-integer revenue, same c_custkey tie-break. */
  def returnedItemCustomers(from: String = "1997-01-01",
      until: String = "1997-04-01", k: Int = 20): String = s"""
SELECT c_custkey, c_name, n_name AS nation,
       ROUND(CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
                      (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                  AS BIGINT)::DOUBLE / 10000.0, 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '$from 00:00:00'
  AND o_orderdate < TIMESTAMP '$until 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT $k"""

  /** Twin of RelationalQueries.topSupplier (TPC-H Q15 shape): the max
    * equality runs on the exact integer unit; division only at display. */
  def topSupplier(from: String = "1997-01-01",
      until: String = "1997-04-01"): String = s"""
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
                  (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
              AS BIGINT) AS rev_unit
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '$from 00:00:00'
    AND l_shipdate < TIMESTAMP '$until 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name,
       ROUND(rev_unit::DOUBLE / 10000.0, 2) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_unit = (SELECT MAX(rev_unit) FROM rev)
ORDER BY s_suppkey"""

  /** Twin of RelationalQueries.smallQuantityRevenue (TPC-H Q17 shape):
    * membership via the same integer cross-multiplication qty·5·n < sum. */
  def smallQuantityRevenue(brand: String = "Brand#23"): String = s"""
WITH bl AS (
  SELECT l_partkey, CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = '$brand')),
census AS (
  SELECT l_partkey AS t_partkey, CAST(SUM(qty) AS BIGINT) AS sum_qty,
         COUNT(*) AS n_lines
  FROM bl GROUP BY l_partkey)
SELECT ROUND((CAST(SUM(cents) AS BIGINT)::DOUBLE / 100.0) / 7.0, 2) AS avg_yearly,
       COUNT(*) AS qualifying_lines
FROM bl JOIN census ON l_partkey = t_partkey
WHERE qty * 5 * n_lines < sum_qty"""

  /** Twin of RelationalQueries.disjunctiveRevenue (TPC-H Q19 shape):
    * identical three-branch disjunction and per-branch counts. */
  def disjunctiveRevenue(): String = """
WITH j AS (
  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
         (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS unit,
         CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty, p_brand, p_size
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand IN ('Brand#12', 'Brand#23', 'Brand#34')),
f AS (
  SELECT *,
    (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND qty BETWEEN 1  AND 11) AS b1,
    (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND qty BETWEEN 10 AND 20) AS b2,
    (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND qty BETWEEN 20 AND 30) AS b3
  FROM j)
SELECT ROUND(CAST(SUM(unit) AS BIGINT)::DOUBLE / 10000.0, 2) AS revenue,
       CAST(SUM(CASE WHEN b1 THEN 1 ELSE 0 END) AS BIGINT) AS branch1_lines,
       CAST(SUM(CASE WHEN b2 THEN 1 ELSE 0 END) AS BIGINT) AS branch2_lines,
       CAST(SUM(CASE WHEN b3 THEN 1 ELSE 0 END) AS BIGINT) AS branch3_lines
FROM f
WHERE b1 OR b2 OR b3"""

  /** Twin of RelationalQueries.marketShare (TPC-H Q8 shape): same
    * conditional integer rollup and exact basis-point floor. */
  def marketShare(custRegion: String = "EUROPE", partType: String = "PROMO",
      suppNation: String = "NATION_3"): String = s"""
WITH f AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
         (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS unit,
         n_name AS supp_nation
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = '$partType')
    AND o_custkey IN (
      SELECT c_custkey FROM customer
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region ON cn.n_regionkey = r_regionkey
      WHERE r_name = '$custRegion'))
SELECT yr,
       ROUND(CAST(nation_units AS BIGINT)::DOUBLE / 10000.0, 2) AS nation_revenue,
       ROUND(CAST(total_units AS BIGINT)::DOUBLE / 10000.0, 2) AS total_revenue,
       CAST(nation_units * 10000 // total_units AS BIGINT) AS share_bp
FROM (
  SELECT yr,
         SUM(CASE WHEN supp_nation = '$suppNation' THEN unit ELSE 0 END) AS nation_units,
         SUM(unit) AS total_units
  FROM f GROUP BY yr)
ORDER BY yr"""

  /** Twin of RelationalQueries.nationProfit (TPC-H Q9 shape): profit as
    * the exact integer at the shared 10⁻⁴ scale — no rounded double
    * (profit sums land on .xx5 boundaries where the engines' rounding
    * disagrees). */
  def nationProfit(nameToken: String = "widget"): String = s"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(SUM(
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
         (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) -
         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) * 100 *
         CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
         AS profit_units
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%$nameToken%'
GROUP BY n_name, yr
ORDER BY nation, yr DESC"""

  /** Twin of RelationalQueries.supplierValueConcentration (TPC-H Q11
    * shape): threshold via value·n·20 > 21·total integer cross-multiply. */
  def supplierValueConcentration(): String = """
WITH rollup AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM lineitem GROUP BY l_suppkey),
t AS (
  SELECT CAST(SUM(value_cents) AS BIGINT) AS total_cents, COUNT(*) AS n_suppliers
  FROM rollup)
SELECT s_suppkey, s_name, value_cents,
       CAST(value_cents * 10000 // total_cents AS BIGINT) AS share_bp
FROM rollup CROSS JOIN t
JOIN supplier ON l_suppkey = s_suppkey
WHERE value_cents * n_suppliers * 20 > total_cents * 21
ORDER BY value_cents DESC, s_suppkey"""

  /** Twin of RelationalQueries.supplierVariety (TPC-H Q16 shape): same
    * below-mean exclusion via integer cross-multiply, NOT IN, and
    * COUNT(DISTINCT). */
  def supplierVariety(sizes: Seq[Int] = Seq(1, 9, 14, 19, 23, 36, 45, 49)): String = s"""
WITH stats AS (
  SELECT CAST(SUM(CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_cents,
         COUNT(*) AS n_supp
  FROM supplier),
bad AS (
  SELECT s_suppkey FROM supplier CROSS JOIN stats
  WHERE CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) * n_supp < sum_cents)
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size IN (${sizes.mkString(", ")})
  AND l_suppkey NOT IN (SELECT s_suppkey FROM bad)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  /** Twin of RelationalQueries.surgeSuppliers (TPC-H Q20 shape): the
    * same qty_year·2 > qty_total integer test over the composite census. */
  def surgeSuppliers(yr: Int = 1997): String = s"""
WITH census AS (
  SELECT l_suppkey, l_partkey,
         CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS qty_total,
         CAST(SUM(CASE WHEN year(l_shipdate) = $yr
                       THEN CAST(floor(l_quantity + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS qty_year
  FROM lineitem GROUP BY l_suppkey, l_partkey)
SELECT DISTINCT s_suppkey, s_name
FROM census JOIN supplier ON l_suppkey = s_suppkey
WHERE qty_year * 2 > qty_total
ORDER BY s_suppkey"""

  /** Twin of RelationalQueries.revenueScalar (TPC-H Q6 shape): same
    * integer discount band and exact revenue units. */
  def revenueScalar(from: String = "1997-01-01", until: String = "1998-01-01",
      minPct: Int = 5, maxPct: Int = 7, maxQty: Int = 24): String = s"""
SELECT revenue_units,
       ROUND(revenue_units::DOUBLE / 10000.0, 2) AS revenue,
       qualifying_lines
FROM (
  SELECT CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
                  CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_units,
         COUNT(*) AS qualifying_lines
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '$from 00:00:00'
    AND l_shipdate < TIMESTAMP '$until 00:00:00'
    AND CAST(floor(l_discount * 100 + 0.5) AS BIGINT) BETWEEN $minPct AND $maxPct
    AND CAST(floor(l_quantity + 0.5) AS BIGINT) < $maxQty)"""

  /** Twin of RelationalQueries.spendQuartiles: quantile_cont matches
    * Spark's percentile interpolation on integer cents; `<=` boundary. */
  def spendQuartiles(): String = """
WITH o AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
b AS (
  SELECT quantile_cont(cents, 0.25) AS q1, quantile_cont(cents, 0.5) AS q2,
         quantile_cont(cents, 0.75) AS q3
  FROM o)
SELECT quartile, COUNT(*) AS n_orders, CAST(SUM(cents) AS BIGINT) AS sum_cents,
       MIN(cents) AS min_cents, MAX(cents) AS max_cents
FROM (
  SELECT cents,
         CAST(CASE WHEN cents <= q1 THEN 1 WHEN cents <= q2 THEN 2
                   WHEN cents <= q3 THEN 3 ELSE 4 END AS BIGINT) AS quartile
  FROM o CROSS JOIN b)
GROUP BY quartile ORDER BY quartile"""

  /** Twin of RelationalQueries.customerSpendQuartiles: identical NTILE
    * bucket sizing and the (cents, orderkey) deterministic order. */
  def customerSpendQuartiles(): String = """
WITH o AS (
  SELECT o_custkey, o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders),
t AS (
  SELECT cents,
         CAST(NTILE(4) OVER (
           PARTITION BY o_custkey ORDER BY cents, o_orderkey) AS BIGINT)
           AS quartile
  FROM o)
SELECT quartile, COUNT(*) AS n_orders, CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM t GROUP BY quartile ORDER BY quartile"""

  /** Twin of RelationalQueries.minPriceSupplier (TPC-H Q2 shape): same
    * per-part min-rank with the (cents, suppkey) tie-break. */
  def minPriceSupplier(size: Int = 15): String = s"""
WITH j AS (
  SELECT l_partkey, p_name, l_suppkey,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS line_cents,
         ROW_NUMBER() OVER (
           PARTITION BY l_partkey
           ORDER BY CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT), l_suppkey) AS rn
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_size = $size)
SELECT l_partkey AS p_partkey, p_name, s_name, n_name AS nation,
       line_cents AS min_cents
FROM j
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE rn = 1
ORDER BY p_partkey"""

  /** Twin of RelationalQueries.localSupplierVolume (TPC-H Q5 shape): the
    * local-supplier equality in the join, exact integer units summed as
    * HUGEINT ↔ Spark DECIMAL(38,0), one display division. */
  def localSupplierVolume(regionName: String = "EUROPE",
      from: String = "1995-01-01", until: String = "1999-01-01"): String = s"""
SELECT n_name AS nation, COUNT(*) AS n_lines,
       CAST(SUM(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
                (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS HUGEINT))
         AS BIGINT) AS volume_units,
       ROUND(CAST(SUM(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
                (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS HUGEINT))
             AS DOUBLE) / 10000.0, 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '$regionName'
  AND o_orderdate >= TIMESTAMP '$from 00:00:00'
  AND o_orderdate <  TIMESTAMP '$until 00:00:00'
GROUP BY 1 ORDER BY volume_units DESC, nation"""

  /** Twin of RelationalQueries.lateLinePriorityCensus (TPC-H Q12 shape,
    * linestatus-as-shipmode adaptation): conditional split inside one
    * rollup, lateness as the join residual. */
  def lateLinePriorityCensus(graceDays: Int = 60, from: String = "1996-01-01",
      until: String = "1998-01-01"): String = s"""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '$from 00:00:00'
  AND l_shipdate <  TIMESTAMP '$until 00:00:00'
  AND l_shipdate > o_orderdate + INTERVAL $graceDays DAY
GROUP BY 1 ORDER BY 1"""

  /** Twin of RelationalQueries.waitingSuppliers (TPC-H Q21 shape): the
    * exists/not-exists pair expressed as the same per-order rollup the
    * Spark side uses (n_supp > 1 ∧ n_late = 1), so both engines decide
    * membership from identical integer counts. */
  def waitingSuppliers(graceDays: Int = 60): String = s"""
WITH per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL $graceDays DAY
               THEN l_suppkey END) AS n_late,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL $graceDays DAY
             THEN l_suppkey END) AS late_supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1)
SELECT s_name, COUNT(*) AS numwait
FROM per_order JOIN supplier ON late_supp = s_suppkey
WHERE n_supp > 1 AND n_late = 1
GROUP BY 1 ORDER BY numwait DESC, s_name"""

  def promoRevenueShare(from: String = "1997-01-01",
      until: String = "1998-01-01"): String = s"""
SELECT ROUND(CAST(promo_units AS DOUBLE) / 10000.0, 2) AS promo_revenue,
       ROUND(CAST(total_units AS DOUBLE) / 10000.0, 2) AS total_revenue,
       CAST(promo_units * 10000 // total_units AS BIGINT) AS share_bp
FROM (
  SELECT
    CAST(SUM(CASE WHEN p_type = 'PROMO'
      THEN CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
           (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) ELSE 0 END) AS BIGINT)
      AS promo_units,
    CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
             (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT)
      AS total_units
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '$from 00:00:00'
    AND l_shipdate <  TIMESTAMP '$until 00:00:00'
) t"""

  /** Twin of RelationalQueries.idleRichCustomers (Q22 shape): the
    * above-mean membership is the integer cross-multiplication
    * `bal·n > Σ` — the mean never materializes on either engine. */
  val idleRichCustomers: String = """
WITH pos AS (
  SELECT CAST(SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS pos_sum,
         COUNT(*) AS pos_n
  FROM customer WHERE c_acctbal > 0
)
SELECT n_name AS nation, COUNT(*) AS numcust,
       ROUND(CAST(SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0, 2)
         AS totacctbal
FROM customer CROSS JOIN pos
JOIN nation ON c_nationkey = n_nationkey
WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * pos_n > pos_sum
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY n_name
ORDER BY nation"""

  /** Twin of RelationalQueries.trailingSpend: the same RANGE frame over
    * epoch seconds (value bounds, peers included → order-free sum). */
  def trailingSpend(days: Int = 90): String = {
    val secs = days.toLong * 86400L
    s"""
SELECT o_custkey, o_orderkey, o_orderdate,
       ROUND(CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
           PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
           RANGE BETWEEN $secs PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0, 2)
         AS trailing_spend
FROM orders
ORDER BY o_custkey, o_orderdate, o_orderkey"""
  }

  /** Twin of RelationalQueries.orderCountDistribution (Q13 shape): the
    * zero-order cohort comes from the LEFT join. */
  val orderCountDistribution: String = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC"""

  val revenueByNation: String = """
SELECT r_name AS region, n_name AS nation,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS lineitem_count
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY revenue DESC, nation"""

  val aggPricingFiltered: String = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 2) AS avg_qty,
       ROUND(AVG(l_extendedprice), 2) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""

  val customersWithBigOrders: String = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice >= 400000)
ORDER BY c_custkey"""

  val customersWithoutOrders: String = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey"""

  /** Plain semi-join twin of the bloom-prefiltered join (the probe only
    * drops rows the semi join would drop anyway — false positives die in
    * the join, so the composition is exactly this SQL). */
  val bloomFilteredRevenue: String = """
SELECT l_returnflag,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS lineitem_count
FROM lineitem
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_orderkey = l_orderkey AND o_totalprice >= 450000)
GROUP BY l_returnflag
ORDER BY l_returnflag"""

  /** Mirrors EventQueries.funnel (view → click → purchase): per-step
    * arrival is a cumulative conditional MIN over (ts, event_id) order
    * whose condition references the previous step — chained CTEs because
    * SQL can't reference a window alias in its own SELECT. */
  val eventsFunnel: String = s"""
WITH $evCte,
f0 AS (
  SELECT user_id, ts, event_id, event_type,
         MIN(CASE WHEN event_type = 'view' THEN ts END) OVER w AS s0
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
f1 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND s0 IS NOT NULL THEN ts END)
              OVER w AS s1
  FROM f0
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
f2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND s1 IS NOT NULL THEN ts END)
              OVER w AS s2
  FROM f1
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
u AS (SELECT user_id, MIN(s0) AS t0, MIN(s1) AS t1, MIN(s2) AS t2 FROM f2 GROUP BY user_id),
c AS (SELECT COUNT(t0) AS n0, COUNT(t1) AS n1, COUNT(t2) AS n2 FROM u)
SELECT step, step_name, n_users, ROUND((n_users::DOUBLE * 100) / NULLIF(n0, 0), 2) AS pct_of_first
FROM (
  SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name, n0 AS n_users, n0 FROM c
  UNION ALL SELECT CAST(2 AS BIGINT), 'click', n1, n0 FROM c
  UNION ALL SELECT CAST(3 AS BIGINT), 'purchase', n2, n0 FROM c
)
ORDER BY step"""

  /** Mirrors EventQueries.funnelWindowed: the [[eventsFunnel]] chain with
    * the completion-window predicate on each step count. */
  def eventsFunnelWindowed(windowHours: Int = 24): String = {
    val winUs = windowHours * 3600L * 1000000L
    s"""
WITH $evCte,
f0 AS (
  SELECT user_id, ts, event_id, event_type,
         MIN(CASE WHEN event_type = 'view' THEN ts END) OVER w AS s0
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
f1 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND s0 IS NOT NULL THEN ts END)
              OVER w AS s1
  FROM f0
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
f2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND s1 IS NOT NULL THEN ts END)
              OVER w AS s2
  FROM f1
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
u AS (SELECT user_id, MIN(s0) AS t0, MIN(s1) AS t1, MIN(s2) AS t2 FROM f2 GROUP BY user_id),
c AS (
  SELECT
    COUNT(CASE WHEN t0 IS NOT NULL
               AND epoch_us(t0) - epoch_us(t0) <= $winUs THEN 1 END) AS n0,
    COUNT(CASE WHEN t1 IS NOT NULL
               AND epoch_us(t1) - epoch_us(t0) <= $winUs THEN 1 END) AS n1,
    COUNT(CASE WHEN t2 IS NOT NULL
               AND epoch_us(t2) - epoch_us(t0) <= $winUs THEN 1 END) AS n2
  FROM u
)
SELECT step, step_name, n_users, ROUND((n_users::DOUBLE * 100) / NULLIF(n0, 0), 2) AS pct_of_first
FROM (
  SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name, n0 AS n_users, n0 FROM c
  UNION ALL SELECT CAST(2 AS BIGINT), 'click', n1, n0 FROM c
  UNION ALL SELECT CAST(3 AS BIGINT), 'purchase', n2, n0 FROM c
)
ORDER BY step"""
  }

  /** Mirrors SnapshotMerge.balanceUpsert: full-outer join + coalesce —
    * the MERGE INTO lowering. */
  /** Twin of SnapshotMerge.rollupMaintain — deliberately NOT a replay of
    * the merge: the ONE-PASS RECOMPUTE over all rows (with FILTER
    * aggregates deriving the base/delta presence for `status`). A hash
    * match therefore proves the maintenance identity itself:
    * merge(rollup(base), rollup(delta)) = rollup(all). Cents fix-up and
    * NULL/NaN nulling identical to the Spark side; the sum emits BIGINT
    * per the gate-boundary law. */
  def rollupMaintain(cutoff: String = "2024-01-16 00:00:00"): String = s"""
WITH c AS (
  SELECT event_type, ts,
         CASE WHEN value IS NULL OR isnan(value) THEN NULL
              ELSE CAST(floor(value * 100 + 0.5) AS BIGINT) END AS cents
  FROM events
),
g AS (
  SELECT event_type,
         STRFTIME(ts, '%Y-%m-%d') AS day,
         COUNT(*) AS n,
         CAST(SUM(CAST(cents AS HUGEINT)) AS BIGINT) AS cents_sum,
         MIN(cents) AS cents_min,
         MAX(cents) AS cents_max,
         COUNT(*) FILTER (WHERE ts < TIMESTAMP '$cutoff') AS n_base,
         COUNT(*) FILTER (WHERE ts >= TIMESTAMP '$cutoff') AS n_delta
  FROM c GROUP BY 1, 2
)
SELECT event_type, day, n, cents_sum, cents_min, cents_max,
       CASE WHEN n_base = 0 THEN 'new'
            WHEN n_delta = 0 THEN 'carried'
            ELSE 'updated' END AS status
FROM g ORDER BY event_type, day"""

  def balanceUpsert(cutoff: String): String = s"""
WITH $txnsCte,
s AS (
  SELECT customer_id, ROUND(SUM(amount), 2) AS snapshot_balance
  FROM txns WHERE ts_us < TIMESTAMP '$cutoff' GROUP BY 1
),
d AS (
  SELECT customer_id, ROUND(SUM(amount), 2) AS delta_change
  FROM txns WHERE ts_us >= TIMESTAMP '$cutoff' GROUP BY 1
)
SELECT COALESCE(s.customer_id, d.customer_id) AS customer_id,
       snapshot_balance, delta_change,
       ROUND(COALESCE(snapshot_balance, 0) + COALESCE(delta_change, 0), 2)
         AS merged_balance,
       CASE WHEN snapshot_balance IS NULL THEN 'new'
            WHEN delta_change IS NULL THEN 'carried'
            ELSE 'updated' END AS status
FROM s FULL JOIN d ON s.customer_id = d.customer_id
ORDER BY customer_id"""

  /** Mirrors EventQueries.slidingRollup: each event expanded into its
    * len/slide covering slide-aligned windows (time_bucket origins are
    * midnight-aligned on both engines; `slideMinutes` must divide the
    * day and `windowMinutes`). */
  def eventsSliding(windowMinutes: Int = 60, slideMinutes: Int = 15): String = {
    require(windowMinutes % slideMinutes == 0 && 1440 % slideMinutes == 0,
      s"slide $slideMinutes must divide the window $windowMinutes and the day")
    val replicas = windowMinutes / slideMinutes
    s"""
WITH $evCte,
w AS (
  SELECT event_type, value,
         time_bucket(INTERVAL $slideMinutes MINUTES, ts) - k * INTERVAL $slideMinutes MINUTES AS window_start
  FROM ev CROSS JOIN (SELECT unnest(generate_series(0, ${replicas - 1})) AS k)
)
SELECT window_start, window_start + INTERVAL $windowMinutes MINUTES AS window_end, event_type,
       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
FROM w GROUP BY 1, 2, 3 ORDER BY window_start, event_type"""
  }

  /** Mirrors EventQueries.valueDeciles: NTILE over the shared
    * (value, event_id) total order, per-bucket count + range. */
  def eventsDeciles(buckets: Int = 10): String = s"""
WITH $evCte,
d AS (
  SELECT event_type, value,
         CAST(NTILE($buckets) OVER (PARTITION BY event_type
                                    ORDER BY value, event_id) AS BIGINT) AS decile
  FROM ev
)
SELECT event_type, decile, COUNT(*) AS n_events,
       ROUND(MIN(value), 2) AS lo_value,
       ROUND(MAX(value), 2) AS hi_value
FROM d GROUP BY 1, 2 ORDER BY event_type, decile"""

  /** Mirrors EventQueries.scd2Status: lag flags run starts, lead expires
    * them, (ts, event_id) is the shared total order. */
  val eventsScd2: String = s"""
WITH $evCte,
x AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(event_type) OVER w AS prev_type
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
r AS (
  SELECT user_id, ts, event_id, event_type FROM x
  WHERE prev_type IS NULL OR prev_type <> event_type
),
s AS (
  SELECT user_id, event_type AS status, ts AS valid_from,
         LEAD(ts) OVER w AS valid_to,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS version
  FROM r WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, version, status, valid_from, valid_to
FROM s ORDER BY user_id, version"""

  /** Mirrors StreamingAnalytics.replayStreamJoin: the streaming inner
    * interval join's emitted multiset IS the batch interval join (in-order
    * replay; see the operator scaladoc), so the oracle is the plain SQL
    * join. */
  val streamingJoin: String = s"""
WITH $evCte,
v AS (SELECT user_id, ts AS view_ts FROM ev WHERE event_type = 'view'),
p AS (SELECT user_id, ts AS purchase_ts FROM ev WHERE event_type = 'purchase')
SELECT user_id, view_ts, purchase_ts,
       DATE_DIFF('second', view_ts, purchase_ts) AS delay_s
FROM v JOIN p USING (user_id)
WHERE purchase_ts >= view_ts AND purchase_ts <= view_ts + INTERVAL 1 HOUR
ORDER BY user_id, view_ts, purchase_ts"""

  /** Mirrors EventQueries.retention: distinct user-day activity →
    * per-user first-day cohort → (cohort, offset) rollup → cohort-size
    * window over the aggregated frame. */
  val eventsRetention: String = s"""
WITH $evCte,
ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM ev),
c AS (SELECT user_id, d, MIN(d) OVER (PARTITION BY user_id) AS cohort_day FROM ud),
r AS (
  SELECT cohort_day, DATE_DIFF('day', cohort_day, d) AS day_offset,
         COUNT(*) AS n_active
  FROM c GROUP BY 1, 2
),
z AS (
  SELECT *, MAX(CASE WHEN day_offset = 0 THEN n_active END)
              OVER (PARTITION BY cohort_day) AS cohort_size
  FROM r
)
SELECT cohort_day, day_offset, n_active, cohort_size,
       ROUND(n_active * 100.0 / cohort_size, 2) AS pct_retained
FROM z ORDER BY cohort_day, day_offset"""

  /** Mirrors EventQueries.anomalyDays: (type, day) rollup → trailing
    * window mean → flag on the ROUNDED ratio (both engines cut at the
    * same reproducible value). */
  def eventsAnomaly(win: Int = 7, hi: Double = 1.5, lo: Double = 0.5): String = s"""
WITH $evCte,
daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n_events
  FROM ev GROUP BY 1, 2
),
grid AS (
  SELECT s.event_type, CAST(g.x AS DATE) AS d
  FROM (SELECT event_type, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY 1) s,
       unnest(generate_series(s.d0, s.d1, INTERVAL '1 day')) AS g(x)
),
dense AS (
  SELECT grid.event_type, grid.d, COALESCE(n.n_events, 0) AS n_events
  FROM grid LEFT JOIN daily n ON n.event_type = grid.event_type AND n.d = grid.d
),
t AS (
  SELECT event_type, d, n_events,
         AVG(n_events) OVER w AS trailing_avg_raw,
         COUNT(n_events) OVER w AS n_trailing
  FROM dense
  WINDOW w AS (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN $win PRECEDING AND 1 PRECEDING)
),
r AS (
  SELECT event_type, d, n_events,
         ROUND(trailing_avg_raw, 4) AS trailing_avg,
         ROUND(n_events / trailing_avg_raw, 4) AS ratio
  FROM t WHERE n_trailing = $win AND trailing_avg_raw > 0
)
SELECT event_type, d, n_events, trailing_avg, ratio,
       CAST(CASE WHEN ratio >= $hi OR ratio <= $lo THEN 1 ELSE 0 END AS INTEGER)
         AS is_anomaly
FROM r ORDER BY event_type, d"""

  /** The mask-doubling bit spread ZOrder.spread16 uses, as SQL (decimal
    * renderings of 0x00FF00FF / 0x0F0F0F0F / 0x33333333 / 0x55555555). */
  private def spreadSql(e: String): String = {
    val a = s"(($e) & 65535)"
    val b = s"((($a | ($a << 8)) & 16711935))"
    val c = s"((($b | ($b << 4)) & 252645135))"
    val d = s"((($c | ($c << 2)) & 858993459))"
    s"((($d | ($d << 1)) & 1431655765))"
  }

  /** Mirrors ZOrder.zorderStats over orders (o_custkey × orderdate-days):
    * identical interleave, bucketing, and bounding-box rollup. */
  def zorderStats(bucketBits: Int = 10): String = {
    val shift = 32 - bucketBits
    s"""
WITH b AS (
  SELECT o_custkey & 65535 AS xd,
         DATE_DIFF('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) & 65535 AS yd
  FROM orders
),
z AS (
  SELECT xd, yd,
         ((${spreadSql("xd")}) | ((${spreadSql("yd")}) << 1)) >> $shift AS zbucket
  FROM b
)
SELECT zbucket, COUNT(*) AS n_rows,
       MIN(xd) AS x_min, MAX(xd) AS x_max,
       MIN(yd) AS y_min, MAX(yd) AS y_max,
       MAX(xd) - MIN(xd) + 1 AS x_span,
       MAX(yd) - MIN(yd) + 1 AS y_span
FROM z GROUP BY 1 ORDER BY 1"""
  }

  /** Mirrors EventQueries.pivotMonthly: one FILTER column per type from
    * the shared EventTypes constant. */
  def eventsPivotMonthly(types: Seq[String]): String = {
    val cols = types.map(t =>
      s"""ROUND(SUM(value) FILTER (event_type = '$t'), 2) AS "$t"""").mkString(",\n       ")
    s"""
WITH $evCte
SELECT date_trunc('month', ts) AS month,
       $cols
FROM ev GROUP BY 1 ORDER BY 1"""
  }

  /** Mirrors RelationalQueries.ordersRollup: GROUP BY ROLLUP with
    * GROUPING() disambiguating subtotal rows. */
  val ordersRollup: String = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""

  /** Mirrors RelationalQueries.ordersGroupingSets: the two independent
    * margins from one scan. */
  val ordersGroupingSets: String = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""

  /** Mirrors EventQueries.trailingFeatures: identical integer-second RANGE
    * frames ([-w, -1] — strictly before the current second). FLOOR before
    * the BIGINT cast: DuckDB's double→int cast rounds to nearest where
    * Spark's unix_timestamp floors. */
  val trailingFeatures: String = """
WITH e AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
         CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
  FROM events
)
SELECT event_id, user_id, ts,
       COUNT(*) OVER w1 AS n_prev_1h,
       ROUND(COALESCE(SUM(value) OVER w24, 0.0), 2) AS sum_value_24h,
       sec - LAG(sec, 1) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS secs_since_prev
FROM e
WINDOW w1 AS (PARTITION BY user_id ORDER BY sec RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING),
       w24 AS (PARTITION BY user_id ORDER BY sec RANGE BETWEEN 86400 PRECEDING AND 1 PRECEDING)
ORDER BY user_id, event_id"""

  /** Mirrors RelationalQueries.fkOrphanProfile — generated from the SAME
    * FkRelations constant, one UNION ALL arm per edge. */
  def fkOrphanProfile: String =
    RelationalQueries.FkRelations.map { case (c, ck, p, pk) =>
      s"""SELECT '$c.$ck->$p.$pk' AS relation,
       (SELECT COUNT(*) FROM $c) AS n_child_rows,
       (SELECT COUNT(*) FROM $c WHERE $ck IS NULL) AS n_null_keys,
       (SELECT COUNT(*) FROM $c WHERE $ck IS NOT NULL
          AND $ck NOT IN (SELECT $pk FROM $p WHERE $pk IS NOT NULL)) AS n_orphans"""
    }.mkString("\nUNION ALL\n") + "\nORDER BY relation"

  /** Mirrors RelationalQueries.basketTriangles: thresholded co-purchase
    * edges, degree census, oriented two-path triangle join, basis-point
    * clustering readout. */
  def basketTriangles(minSupport: Int = 3): String = s"""
WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b, COUNT(*) AS support
  FROM i a JOIN i b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
e AS (SELECT a, b FROM p WHERE support >= $minSupport),
deg AS (
  SELECT v, COUNT(*) AS deg
  FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) GROUP BY 1
),
nw AS (SELECT COUNT(*) AS n_nodes,
              CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
ne AS (SELECT COUNT(*) AS n_edges FROM e),
tr AS (SELECT COUNT(*) AS n_triangles
       FROM e e1 JOIN e e2 ON e1.b = e2.a JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b)
SELECT n_nodes, n_edges, n_wedges, n_triangles,
       CASE WHEN n_wedges = 0 THEN NULL
            ELSE (3 * n_triangles * 10000) // n_wedges END AS clustering_bp
FROM ne CROSS JOIN nw CROSS JOIN tr"""

  /** Mirrors RelationalQueries.basketPairs: within-order pair space, exact
    * integer counts, one rounded double division for lift. */
  def basketPairs(minSupport: Int = 3): String = s"""
WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM i),
f AS (SELECT l_partkey, COUNT(*) AS cnt FROM i GROUP BY 1),
p AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS support
  FROM i a JOIN i b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT part_a, part_b, support, fa.cnt AS cnt_a, fb.cnt AS cnt_b,
       ROUND(support::DOUBLE * n.n_orders / (fa.cnt * fb.cnt), 4) AS lift
FROM p
JOIN f fa ON fa.l_partkey = p.part_a
JOIN f fb ON fb.l_partkey = p.part_b
CROSS JOIN n
WHERE support >= $minSupport
ORDER BY part_a, part_b"""

  /** Mirrors EventQueries.rfmSegments: per-user rollup against the corpus
    * horizon, NTILE(5) quintiles under deterministic (metric, user_id)
    * orders, the composed segment code. */
  val rfmSegments: String = """
WITH h AS (SELECT MAX(CAST(ts AS DATE)) AS horizon FROM events),
u AS (
  SELECT user_id, MAX(CAST(ts AS DATE)) AS last_day, COUNT(*) AS frequency,
         ROUND(SUM(value), 2) AS monetary
  FROM events GROUP BY 1
),
m AS (
  SELECT user_id, CAST(h.horizon - last_day AS BIGINT) AS recency_days,
         frequency, monetary
  FROM u CROSS JOIN h
),
s AS (
  SELECT user_id, recency_days, frequency, monetary,
         CAST(NTILE(5) OVER (ORDER BY recency_days, user_id) AS BIGINT) AS r_score,
         CAST(NTILE(5) OVER (ORDER BY frequency DESC, user_id) AS BIGINT) AS f_score,
         CAST(NTILE(5) OVER (ORDER BY monetary DESC, user_id) AS BIGINT) AS m_score
  FROM m
)
SELECT user_id, recency_days, frequency, monetary, r_score, f_score, m_score,
       r_score::VARCHAR || f_score::VARCHAR || m_score::VARCHAR AS rfm_code
FROM s ORDER BY user_id"""

  /** Mirrors EventQueries.lastTouchAttribution: IGNORE-NULLS carry of the
    * last view/click over the strictly-before frame, microsecond-exact
    * interval horizon cutoff, channel rollup. */
  def lastTouchAttribution(lookbackHours: Int = 72): String = s"""
WITH $evCte,
c AS (
  SELECT event_id, user_id, ts, event_type, value,
         LAST_VALUE(CASE WHEN event_type IN ('view','click') THEN event_type END
                    IGNORE NULLS) OVER w AS last_touch,
         LAST_VALUE(CASE WHEN event_type IN ('view','click') THEN ts END
                    IGNORE NULLS) OVER w AS last_touch_ts
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT CASE WHEN last_touch_ts IS NOT NULL
            AND ts <= last_touch_ts + INTERVAL $lookbackHours HOUR
       THEN last_touch ELSE 'direct' END AS channel,
       COUNT(*) AS n_purchases, ROUND(SUM(value), 2) AS revenue
FROM c WHERE event_type = 'purchase'
GROUP BY 1 ORDER BY channel"""

  /** Mirrors EventQueries.sessionPaths: the sessionize boundary CTE, a
    * per-session ordered STRING_AGG of the first maxSteps types, the
    * (n desc, path) top-k. */
  def sessionPaths(gapMinutes: Int = 30, maxSteps: Int = 5,
      topK: Int = 20): String = s"""
WITH $evCte,
g AS (
  SELECT event_id, user_id, ts, event_type,
         CASE WHEN ts > LAG(ts) OVER w + INTERVAL $gapMinutes MINUTE THEN 1 ELSE 0 END AS new_sess
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM g
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_id ORDER BY ts, event_id) AS rn
  FROM s
),
p AS (
  SELECT user_id, session_id, STRING_AGG(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= $maxSteps GROUP BY 1, 2
)
SELECT path, COUNT(*) AS n_sessions
FROM p GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT $topK"""

  /** Mirrors EventQueries.dailyDecompose: integer-cent daily rollup,
    * centered MA via `//`, sign-split seasonal mean, /100.0 readout. */
  def dailyDecompose(halfWindow: Int = 3): String = s"""
WITH $evCte,
d AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM ev GROUP BY 1
),
t AS (
  SELECT day, CAST((day - DATE '1970-01-05') % 7 AS INT) AS dow, cents,
         CAST(SUM(cents) OVER w AS BIGINT) AS w_sum,
         COUNT(*) OVER w AS w_cnt
  FROM d
  WINDOW w AS (ORDER BY day ROWS BETWEEN $halfWindow PRECEDING AND $halfWindow FOLLOWING)
),
t2 AS (
  SELECT *, w_sum // w_cnt AS trend_cents,
         cents - (w_sum // w_cnt) AS dev_cents
  FROM t
),
s AS (
  SELECT dow,
         CAST(SIGN(CAST(SUM(dev_cents) AS BIGINT)) *
              (ABS(CAST(SUM(dev_cents) AS BIGINT)) // COUNT(*)) AS BIGINT) AS seasonal_cents
  FROM t2 GROUP BY 1
)
SELECT t2.day, t2.dow, t2.cents / 100.0 AS revenue, t2.trend_cents / 100.0 AS trend,
       s.seasonal_cents / 100.0 AS seasonal,
       (t2.cents - t2.trend_cents - s.seasonal_cents) / 100.0 AS residual
FROM t2 JOIN s USING (dow) ORDER BY day"""

  /** Mirrors EventQueries.dailyAcf: integer-cent daily series per type,
    * one UNION ALL branch per lag (SQL LAG takes no variable offset),
    * exact-integer sufficient statistics, the sqrt·sqrt readout, NULL on
    * constant series. CASTs defuse DuckDB's HUGEINT SUM. */
  def dailyAcf(maxLag: Int = 7): String = {
    val branches = (1 to maxLag).map(kk => s"""
  SELECT event_type, $kk AS lag_days, cents AS x,
         LAG(cents, $kk) OVER (PARTITION BY event_type ORDER BY day) AS y
  FROM d""").mkString(" UNION ALL")
    s"""
WITH $evCte,
d AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM ev GROUP BY 1, 2
),
l AS ($branches),
p AS (SELECT * FROM l WHERE y IS NOT NULL),
agg AS (
  SELECT event_type, lag_days, COUNT(*) AS n_pairs,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM p GROUP BY 1, 2
)
SELECT event_type, CAST(lag_days AS BIGINT) AS lag_days, n_pairs,
       CASE WHEN n_pairs * sxx - sx * sx = 0 OR n_pairs * syy - sy * sy = 0
            THEN NULL
            ELSE ROUND(CAST(n_pairs * sxy - sx * sy AS DOUBLE) /
                       (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)) *
                        sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE))), 4)
       END AS acf
FROM agg ORDER BY event_type, lag_days"""
  }

  /** Mirrors EventQueries.activityStreaks: distinct (user, day),
    * gaps-and-islands island id, best island by (len desc, start). */
  val activityStreaks: String = """
WITH e AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
i AS (
  SELECT user_id, day,
         CAST(day - DATE '1970-01-01' AS BIGINT) -
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS island
  FROM e
),
g AS (
  SELECT user_id, island, COUNT(*) AS len,
         MIN(day) AS streak_start, MAX(day) AS streak_end
  FROM i GROUP BY 1, 2
),
t AS (SELECT user_id, COUNT(*) AS n_active_days FROM e GROUP BY 1),
b AS (
  SELECT * FROM (
    SELECT g.*, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY len DESC, streak_start) AS rn
    FROM g) x
  WHERE rn = 1
)
SELECT b.user_id, t.n_active_days, b.len AS longest_streak,
       b.streak_start, b.streak_end
FROM b JOIN t USING (user_id) ORDER BY user_id"""

  /** Mirrors EventQueries.dailyCusum: integer-cent daily series, truncating
    * sign-split mean, exact running deviation sum, one sd-normalized
    * double readout. */
  val dailyCusum: String = """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
),
s AS (SELECT COUNT(*) AS n_days, CAST(SUM(cents) AS BIGINT) AS total,
             CAST(SUM(cents * cents) AS BIGINT) AS sxx
      FROM d),
c AS (
  SELECT day, cents,
         CAST(SIGN(total) * (ABS(total) // n_days) AS BIGINT) AS mean_cents,
         n_days, total, sxx
  FROM d CROSS JOIN s
),
c2 AS (
  SELECT day, cents, cents - mean_cents AS dev_cents,
         CAST(SUM(cents - mean_cents) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cusum_cents,
         n_days, total, sxx
  FROM c
)
SELECT day, cents, dev_cents, cusum_cents,
       CASE WHEN n_days * sxx - total * total <= 0 THEN NULL
            ELSE ROUND(cusum_cents::DOUBLE /
                       (sqrt(CAST(n_days * sxx - total * total AS DOUBLE)) / n_days), 4)
       END AS cusum_sigma
FROM c2 ORDER BY day"""

  /** Mirrors StreamingAnalytics.replayThresholdAlerts: the first row at
    * or over the threshold in the per-user (ts, event_type, cents)-ordered
    * running cent sum — the batch definition the streaming latch must
    * reproduce across micro-batch boundaries. */
  def thresholdAlerts(thresholdCents: Long = 250000L): String = s"""
WITH e AS (
  SELECT user_id, ts, event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
c AS (
  SELECT user_id, ts, cents,
         CAST(SUM(cents) OVER w AS BIGINT) AS cum_cents,
         ROW_NUMBER() OVER w AS rn
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type, cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
f AS (
  SELECT user_id, ts, cum_cents,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS k
  FROM c WHERE cum_cents >= $thresholdCents
)
SELECT user_id, ts AS alert_ts, cum_cents
FROM f WHERE k = 1 ORDER BY user_id"""

  /** Mirrors StreamingAnalytics.replayThresholdAlertsExpiring: the
    * engine-probed extra-batch timer semantics rendered literally —
    * chunk assignment from stageChunks' BOUNDARY table (lo + (span·k)//B,
    * never a closed-form division: the two disagree at non-divisible
    * boundaries), watermark per chunk as the running max event-µs floored
    * to ms, per-(user, batch) timers T = greatest(last_ms + H_ms,
    * wm(prev−1) + 1) with wm(−1) = 0 (Spark's initial watermark), a reset
    * before appearance batch q iff q ≥ prev+2 AND wm(q−2) > T(prev)
    * (strict — the engine evicts iff timer < watermark) —
    * the PRE-STAGED-file semantics: the source always has the next chunk
    * pending, so timers fire only in file batches where the user is
    * absent, and a group with data is invoked with hasTimedOut = false
    * even if its timer expired (the exhausted-source probe fires between
    * any two batches instead; see the operator's scaladoc) — sessions as
    * the running reset count, and the per-session first crossing of the
    * running cents sum in (ts, event_type, cents) order. H replicates the
    * operator's derivation exactly: µs = greatest(1000, span // (2·B)),
    * ms = greatest(1, µs // 1000) (Duration.toMillis truncates). */
  def thresholdAlertsExpiring(thresholdCents: Long = 250000L,
      batches: Int = 24): String = s"""
WITH e AS (
  SELECT user_id, ts, event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS cents,
         epoch_us(ts) AS mic
  FROM events
),
par AS (
  SELECT min(mic) AS lo, max(mic) - min(mic) + 1 AS sp,
         GREATEST(1, GREATEST(1000, (max(mic) - min(mic) + 1) // ${2 * batches}) // 1000) AS hms
  FROM e
),
bounds AS (
  SELECT k, (SELECT lo + (sp * k) // $batches FROM par) AS b
  FROM range(${batches + 1}) t(k)
),
ch AS (
  SELECT e.*, CAST(max(bd.k) AS INT) AS chunk
  FROM e JOIN bounds bd ON bd.b <= e.mic AND bd.k < $batches
  GROUP BY ALL
),
cw AS (
  SELECT k, max(mx) OVER (ORDER BY k) AS cmx
  FROM (SELECT chunk AS k, max(mic) AS mx FROM ch GROUP BY 1) t
),
ub AS (
  SELECT user_id, chunk, max(mic // 1000) AS last_ms
  FROM ch GROUP BY 1, 2
),
ub2 AS (
  SELECT user_id, chunk, last_ms,
         lag(chunk) OVER u AS pchunk, lag(last_ms) OVER u AS plast
  FROM ub WINDOW u AS (PARTITION BY user_id ORDER BY chunk)
),
ub3 AS (
  SELECT user_id, chunk,
         -- STRICT >: Spark 4.1.2 evicts iff timeoutTimestamp < watermark
         -- (FlatMapGroupsWithStateExecBase InputProcessor, lcmp/ifge — so
         -- wm(q-2) must EXCEED the timer T(p); at exact equality the
         -- engine keeps the session). Round-13 ADVICE.
         CASE WHEN pchunk IS NULL OR chunk - pchunk < 2 THEN 0
              WHEN COALESCE((SELECT max(cmx) FROM cw WHERE k <= ub2.chunk - 2), 0) // 1000
                   > GREATEST(plast + (SELECT hms FROM par),
                        COALESCE((SELECT max(cmx) FROM cw WHERE k <= ub2.pchunk - 1), 0) // 1000 + 1)
              THEN 1 ELSE 0 END AS reset
  FROM ub2
),
ss AS (
  SELECT user_id, chunk,
         SUM(reset) OVER (PARTITION BY user_id ORDER BY chunk) AS session
  FROM ub3
),
rows2 AS (
  SELECT ch.user_id, ch.ts, ch.event_type, ch.cents, ss.session
  FROM ch JOIN ss ON ss.user_id = ch.user_id AND ss.chunk = ch.chunk
),
c AS (
  SELECT user_id, session, ts, cents,
         CAST(SUM(cents) OVER w AS BIGINT) AS cum_cents,
         ROW_NUMBER() OVER w AS rn
  FROM rows2
  WINDOW w AS (PARTITION BY user_id, session ORDER BY ts, event_type, cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
f AS (
  SELECT user_id, ts, cum_cents,
         ROW_NUMBER() OVER (PARTITION BY user_id, session ORDER BY rn) AS j
  FROM c WHERE cum_cents >= $thresholdCents
)
SELECT user_id, ts AS alert_ts, cum_cents
FROM f WHERE j = 1 ORDER BY user_id, alert_ts"""

  /** Mirrors RelationalQueries.yoyRevenue: per-row cent rounding before
    * the BIGINT sum, sign-split integer basis-point growth (the
    * dailyCusum truncation form), NULL first year. */
  val yoyRevenue: String = """
WITH base AS (
  SELECT n.n_name AS nation,
         CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
              AS BIGINT) AS rev_cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
lagd AS (
  SELECT nation, yr, rev_cents,
         LAG(rev_cents, 1) OVER (PARTITION BY nation ORDER BY yr) AS prev_cents
  FROM base
)
SELECT nation, yr, rev_cents, prev_cents,
       CASE WHEN prev_cents IS NULL THEN NULL
            ELSE CAST(SIGN(rev_cents - prev_cents) *
                      (ABS(rev_cents - prev_cents) * 10000 // prev_cents) AS BIGINT)
       END AS yoy_bp
FROM lagd ORDER BY nation, yr"""

  /** Mirrors EventQueries.psiDrift: calendar-midpoint split, reference
    * decile edges at ranks (k·n div buckets), strictly-below edge
    * counting off the per-type edge list, Laplace-smoothed micro-nat
    * PSI terms (the KL ROUND(…*1e6) discipline). */
  def psiDrift(buckets: Int = 10): String = {
    val edgeRanks = (1 until buckets).map(k => s"(n_ref * $k) // $buckets").mkString(", ")
    s"""
WITH rows_ AS (
  SELECT CAST(ts AS DATE) AS day, event_id, event_type, value FROM events
),
bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM rows_),
tagged AS (
  SELECT r.event_id, r.event_type, r.value,
         r.day < (b.d0 + CAST((b.d1 - b.d0 + 2) // 2 AS INTEGER)) AS is_ref
  FROM rows_ r CROSS JOIN bounds b
),
nref AS (
  SELECT event_type, COUNT(*) AS n_ref FROM tagged WHERE is_ref GROUP BY event_type
),
ranked AS (
  SELECT t.event_type, t.value,
         ROW_NUMBER() OVER (PARTITION BY t.event_type
                            ORDER BY t.value, t.event_id) AS rk
  FROM tagged t WHERE t.is_ref
),
edges AS (
  SELECT r.event_type, r.value AS edge
  FROM ranked r JOIN nref n USING (event_type)
  WHERE r.rk IN ($edgeRanks)
),
elist AS (
  SELECT event_type, list(edge ORDER BY edge) AS edges FROM edges GROUP BY event_type
),
binned AS (
  SELECT t.event_type, t.is_ref,
         CASE WHEN e.edges IS NULL THEN 1
              ELSE 1 + len(list_filter(e.edges, x -> x < t.value)) END AS bin
  FROM tagged t LEFT JOIN elist e USING (event_type)
),
counts AS (
  SELECT event_type, CAST(bin AS BIGINT) AS bin,
         CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
         CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS c_cur
  FROM binned GROUP BY 1, 2
),
totals AS (
  SELECT event_type, CAST(SUM(c_ref) AS BIGINT) AS n_ref,
         CAST(SUM(c_cur) AS BIGINT) AS n_cur
  FROM counts GROUP BY event_type
)
SELECT c.event_type, c.bin, c.c_ref, c.c_cur,
       CAST(ROUND((((c.c_cur + 1)::DOUBLE / (t.n_cur + $buckets))
                   - ((c.c_ref + 1)::DOUBLE / (t.n_ref + $buckets)))
                  * ln(((c.c_cur + 1)::DOUBLE / (t.n_cur + $buckets))
                       / ((c.c_ref + 1)::DOUBLE / (t.n_ref + $buckets)))
                  * 1000000) AS BIGINT) AS psi_micro
FROM counts c JOIN totals t USING (event_type)
ORDER BY c.event_type, c.bin"""
  }

  /** Mirrors EventQueries.forecastBacktest: calendar day−7 self-join
    * (gap days never slide the season), integer-cent errors, dow 0 =
    * Sunday on both engines. */
  def forecastBacktest(season: Int = 7): String = s"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
),
j AS (
  SELECT a.day, a.cents, f.cents AS forecast_cents
  FROM daily a JOIN daily f ON a.day = f.day + $season
)
SELECT CAST(EXTRACT(DOW FROM day) AS BIGINT) AS dow,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(ABS(cents - forecast_cents)) AS BIGINT) //
         CAST(COUNT(*) AS BIGINT) AS mae_cents,
       CAST(SUM(cents - forecast_cents) AS BIGINT) AS bias_cents
FROM j GROUP BY 1 ORDER BY 1"""

  /** Mirrors EventQueries.abLift: portable-hash variant assignment
    * (null user_id lands in B via the shared CASE ELSE branch), per-user
    * conversion/revenue rollup, 1-row conditional pivot, sign-split
    * integer-bp lift (the yoyRevenue truncation form). */
  val abLift: String = s"""
WITH pu AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN COALESCE(CAST(ROUND(value * 100) AS BIGINT), 0)
                       ELSE 0 END) AS BIGINT) AS cents,
         CASE WHEN (${OracleSqlText.hex8IntSql("user_id::VARCHAR")}) % 2 = 0
              THEN 'A' ELSE 'B' END AS variant
  FROM events GROUP BY user_id
),
v AS (
  SELECT CAST(SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_users_a,
         CAST(SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_users_b,
         CAST(SUM(CASE WHEN variant = 'A' THEN converted ELSE 0 END) AS BIGINT) AS n_conv_a,
         CAST(SUM(CASE WHEN variant = 'B' THEN converted ELSE 0 END) AS BIGINT) AS n_conv_b,
         CAST(SUM(CASE WHEN variant = 'A' THEN cents ELSE 0 END) AS BIGINT) AS cents_a,
         CAST(SUM(CASE WHEN variant = 'B' THEN cents ELSE 0 END) AS BIGINT) AS cents_b
  FROM pu
),
b AS (
  SELECT n_users_a, n_users_b, cents_a, cents_b,
         n_conv_a * 10000 // NULLIF(n_users_a, 0) AS conv_a_bp,
         n_conv_b * 10000 // NULLIF(n_users_b, 0) AS conv_b_bp
  FROM v
)
SELECT n_users_a, n_users_b, conv_a_bp, conv_b_bp,
       CASE WHEN conv_a_bp IS NULL OR conv_a_bp = 0 THEN NULL
            ELSE CAST(SIGN(conv_b_bp - conv_a_bp) *
                      (ABS(conv_b_bp - conv_a_bp) * 10000 // conv_a_bp) AS BIGINT)
       END AS lift_bp,
       cents_a // NULLIF(n_users_a, 0) AS cents_per_user_a,
       cents_b // NULLIF(n_users_b, 0) AS cents_per_user_b
FROM b"""

  /** Mirrors EventQueries.didLift: the same per-user pre/post rollup as
    * the CUPED twin, four cohort means as single divisions, the DiD as
    * the identical fixed double tree. */
  def didLift(cut: String = "2024-01-16 00:00:00"): String = s"""
WITH pu AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '$cut' AND event_type = 'purchase'
                       THEN COALESCE(CAST(ROUND(value * 100) AS BIGINT), 0)
                       ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN ts >= TIMESTAMP '$cut' AND event_type = 'purchase'
                       THEN COALESCE(CAST(ROUND(value * 100) AS BIGINT), 0)
                       ELSE 0 END) AS BIGINT) AS y,
         CASE WHEN (${OracleSqlText.hex8IntSql("user_id::VARCHAR")}) % 2 = 0
              THEN 'A' ELSE 'B' END AS variant
  FROM events GROUP BY user_id
),
v AS (
  SELECT CAST(SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN variant = 'A' THEN x ELSE 0 END) AS BIGINT) AS sx_a,
         CAST(SUM(CASE WHEN variant = 'A' THEN y ELSE 0 END) AS BIGINT) AS sy_a,
         CAST(SUM(CASE WHEN variant = 'B' THEN x ELSE 0 END) AS BIGINT) AS sx_b,
         CAST(SUM(CASE WHEN variant = 'B' THEN y ELSE 0 END) AS BIGINT) AS sy_b
  FROM pu
)
SELECT n_a, n_b,
       ROUND(sx_a::DOUBLE / n_a, 4) AS mean_pre_a,
       ROUND(sy_a::DOUBLE / n_a, 4) AS mean_post_a,
       ROUND(sx_b::DOUBLE / n_b, 4) AS mean_pre_b,
       ROUND(sy_b::DOUBLE / n_b, 4) AS mean_post_b,
       ROUND((sy_b::DOUBLE / n_b - sx_b::DOUBLE / n_b)
             - (sy_a::DOUBLE / n_a - sx_a::DOUBLE / n_a), 4) AS did_cents
FROM v"""

  /** Mirrors EventQueries.cupedLift: per-user pre/post cents, HUGEINT
    * n·Σxy − Σx·Σy moment forms, the same fixed double trees for θ, the
    * adjusted means and ρ², one ROUND at the readout. */
  def cupedLift(cut: String = "2024-01-16 00:00:00"): String = s"""
WITH pu AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '$cut' AND event_type = 'purchase'
                       THEN COALESCE(CAST(ROUND(value * 100) AS BIGINT), 0)
                       ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN ts >= TIMESTAMP '$cut' AND event_type = 'purchase'
                       THEN COALESCE(CAST(ROUND(value * 100) AS BIGINT), 0)
                       ELSE 0 END) AS BIGINT) AS y,
         CASE WHEN (${OracleSqlText.hex8IntSql("user_id::VARCHAR")}) % 2 = 0
              THEN 'A' ELSE 'B' END AS variant
  FROM events GROUP BY user_id
),
g AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
         SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
         SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
  FROM pu
),
v AS (
  SELECT variant, COUNT(*) AS n_v,
         SUM(CAST(x AS HUGEINT)) AS sx_v, SUM(CAST(y AS HUGEINT)) AS sy_v
  FROM pu GROUP BY 1
),
t AS (
  SELECT v.*, g.n, g.sx,
         g.n * g.sxy - g.sx * g.sy AS num,
         g.n * g.sxx - g.sx * g.sx AS denx,
         g.n * g.syy - g.sy * g.sy AS deny
  FROM v CROSS JOIN g
)
SELECT variant, n_v,
       ROUND(sy_v::DOUBLE / n_v, 4) AS mean_y,
       ROUND(sy_v::DOUBLE / n_v
             - (CASE WHEN denx = 0 THEN 0.0 ELSE num::DOUBLE / denx::DOUBLE END)
               * (sx_v::DOUBLE / n_v - sx::DOUBLE / n), 4) AS mean_y_adj,
       ROUND(CASE WHEN denx = 0 THEN 0.0
                  ELSE num::DOUBLE / denx::DOUBLE END, 6) AS theta,
       ROUND(CASE WHEN denx = 0 OR deny = 0 THEN 0.0
                  ELSE (num::DOUBLE / denx::DOUBLE) * (num::DOUBLE / deny::DOUBLE)
             END, 6) AS rho2
FROM t ORDER BY variant"""

  /** Mirrors EventQueries.dailyEwma: list_prepend(0.0) left fold
    * acc ← (acc+x)/2 over the chronological trailing window (dyadic
    * weights are exact in doubles; fold order fixes the rounding
    * sequence), integer-shift normalizer, one ROUND at the readout. */
  def dailyEwma(k: Int = 30): String = s"""
WITH d AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
),
w AS (
  SELECT day, cents,
         list(cents) OVER (ORDER BY day
           ROWS BETWEEN ${k - 1} PRECEDING AND CURRENT ROW) AS xs
  FROM d
)
SELECT day, cents, CAST(len(xs) AS BIGINT) AS m,
       CAST(ROUND(
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list_transform(xs, x -> x::DOUBLE)),
                     (acc, x) -> (acc + x) / 2.0)
         / (1.0 - 1.0 / CAST(1::BIGINT << len(xs) AS DOUBLE))
       ) AS BIGINT) AS ewma_cents
FROM w ORDER BY day"""

  /** Mirrors EventQueries.typeTransitions: lag-derived (from, to) pairs
    * with '_start_' for stream heads, share-of-from via the engine-proven
    * `n * 100.0 / SUM() OVER` idiom. */
  /** Twin of EventQueries.markovStationary: same lag census, unrolled
    * damped power iterations in exact integer pico-units (HUGEINT on this
    * side — everything ≥ 0 so `//` is floor), one /1e12 display division. */
  def markovStationary(damping: Double = 0.85, iters: Int = 5): String = {
    val dm = math.round(damping * 1e6)
    val tele = (1000000L - dm) * 1000000000000L
    def dang = "(dg.dang - dg.dang % nn.n_states) // nn.n_states"
    def iterCte(i: Int): String = s"""
p$i AS (
  SELECT st.state,
         ($tele - $tele % (1000000 * nn.n_states)) // (1000000 * nn.n_states)
           + ($dm * (COALESCE(c.s, 0) + $dang)
              - ($dm * (COALESCE(c.s, 0) + $dang)) % 1000000) // 1000000
           AS pi_pico
  FROM states st CROSS JOIN nn
  CROSS JOIN (SELECT COALESCE(SUM(p.pi_pico), 0) AS dang
              FROM p${i - 1} p LEFT JOIN out_totals o ON o.from_type = p.state
              WHERE o.from_type IS NULL) dg
  LEFT JOIN (SELECT t.to_type AS state,
                    SUM((CAST(p.pi_pico AS HUGEINT) * t.n_ij
                         - (CAST(p.pi_pico AS HUGEINT) * t.n_ij) % o.n_i) // o.n_i) AS s
             FROM p${i - 1} p
             JOIN trans t ON t.from_type = p.state
             JOIN out_totals o ON o.from_type = t.from_type
             GROUP BY t.to_type) c ON c.state = st.state
)"""
    s"""
WITH e AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
),
lagged AS (
  SELECT LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS from_type,
         event_type AS to_type
  FROM e
),
trans AS (SELECT from_type, to_type, COUNT(*) AS n_ij FROM lagged
          WHERE from_type IS NOT NULL GROUP BY 1, 2),
out_totals AS (SELECT from_type, SUM(n_ij) AS n_i FROM trans GROUP BY 1),
states AS (SELECT DISTINCT event_type AS state FROM e),
nn AS (SELECT COUNT(*) AS n_states FROM states),
p0 AS (SELECT state,
              (1000000000000 - 1000000000000 % nn.n_states) // nn.n_states AS pi_pico
       FROM states CROSS JOIN nn),
${(1 to iters).map(iterCte).mkString(",")}
SELECT st.state, CAST(COALESCE(o.n_i, 0) AS BIGINT) AS n_out,
       ROUND(p.pi_pico::DOUBLE / 1e12, 8) AS stationary_p
FROM states st
JOIN p$iters p ON p.state = st.state
LEFT JOIN out_totals o ON o.from_type = st.state
ORDER BY st.state"""
  }

  val typeTransitions: String = """
WITH e AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
),
t AS (
  SELECT COALESCE(LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                  '_start_') AS from_type,
         event_type AS to_type
  FROM e
),
g AS (SELECT from_type, to_type, COUNT(*) AS n_transitions FROM t GROUP BY 1, 2)
SELECT from_type, to_type, n_transitions,
       ROUND(n_transitions * 100.0 / SUM(n_transitions) OVER (PARTITION BY from_type), 2)
         AS pct_of_from
FROM g ORDER BY from_type, to_type"""

  /** Mirrors EventQueries.debounce: the sessionize boundary rule as a
    * filter — chain runs on the raw-previous gap, keep run heads. */
  def debounce(withinSeconds: Int = 300): String = s"""
WITH e AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
),
r AS (
  SELECT *,
         CASE WHEN prev_ts IS NULL
                OR ts > prev_ts + INTERVAL $withinSeconds SECOND THEN 1 ELSE 0 END AS new_run
  FROM (SELECT *, LAG(ts, 1) OVER w AS prev_ts FROM e
        WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)) t
),
runs AS (
  SELECT *, SUM(new_run) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM r
),
kept AS (
  SELECT event_id, user_id, ts, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type, run_id
                            ORDER BY ts, event_id) AS rn
  FROM runs
)
SELECT event_id, user_id, ts, event_type
FROM kept WHERE rn = 1 ORDER BY user_id, event_id"""

  /** Mirrors RelationalQueries.ordersCube: GROUP BY CUBE with the same
    * GROUPING() bit convention as the rollup oracle. */
  val ordersCube: String = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""

  /** Mirrors RelationalQueries.profileColumns over orders — generated from
    * the same column list (ProfiledOrderCols) as the Spark side. */
  val profileOrders: String = {
    val branches = RelationalQueries.ProfiledOrderCols.map { c =>
      s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT($c) AS n_nulls, COUNT(DISTINCT $c) AS n_distinct FROM orders"""
    }.mkString("\n  UNION ALL\n  ")
    s"""
WITH p AS (
  $branches
)
SELECT column_name, n_rows, n_nulls, n_distinct FROM p ORDER BY column_name"""
  }

  /** The gap-fill body, shared by the gapfill gate and its consumers
    * (avg-daily-balance): day-end balances, per-customer day spine to the
    * global last day, IGNORE NULLS carry-forward into `filled`. */
  private val gapFillCte: String = """
, day_end AS (
  SELECT customer_id, CAST(transaction_date AS DATE) AS day,
         current_balance AS observed_balance
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY customer_id, CAST(transaction_date AS DATE)
                                     ORDER BY transaction_date DESC, transaction_id DESC) AS rn
        FROM balance_history) t
  WHERE rn = 1
),
bounds AS (SELECT customer_id, MIN(day) AS first_day FROM day_end GROUP BY 1),
g AS (SELECT MAX(day) AS last_day FROM day_end),
spine AS (
  SELECT customer_id,
         CAST(unnest(generate_series(first_day, last_day, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds, g
),
filled AS (
  SELECT s.customer_id, s.day,
         LAST_VALUE(d.observed_balance IGNORE NULLS)
           OVER (PARTITION BY s.customer_id ORDER BY s.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS balance,
         (d.observed_balance IS NOT NULL) AS is_observed
  FROM spine s LEFT JOIN day_end d ON d.customer_id = s.customer_id AND d.day = s.day
)"""

  /** Mirrors BalanceAnalytics.gapFillDaily. */
  val gapFillDaily: String = pipelined(gapFillCte + """
SELECT customer_id, day, balance, is_observed
FROM filled ORDER BY customer_id, day""")

  /** Mirrors BalanceAnalytics.avgDailyBalance: integer cent sum over the
    * gap-filled series, read out via the sign-split truncating integer
    * division (CAST defuses DuckDB's HUGEINT SUM). */
  val avgDailyBalance: String = pipelined(gapFillCte + """
, a AS (
  SELECT customer_id, COUNT(*) AS n_days,
         CAST(SUM(CAST(ROUND(balance * 100) AS BIGINT)) AS BIGINT) AS cents_sum,
         MIN(day) AS first_day, MAX(day) AS last_day
  FROM filled GROUP BY 1
)
SELECT customer_id, n_days,
       SIGN(cents_sum) * ((ABS(cents_sum) * 100) // n_days) / 10000.0 AS avg_daily_balance,
       first_day, last_day
FROM a ORDER BY customer_id""")

  /** Mirrors BalanceAnalytics.balanceTrend: day-end reduction, exact
    * integer sufficient statistics over (epoch day, cents), one double
    * division, NULL for single-day customers. */
  val balanceTrend: String = pipelined("""
, day_end AS (
  SELECT customer_id,
         CAST(CAST(transaction_date AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
         CAST(ROUND(current_balance * 100) AS BIGINT) AS y
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY customer_id, CAST(transaction_date AS DATE)
                                     ORDER BY transaction_date DESC, transaction_id DESC) AS rn
        FROM balance_history) t
  WHERE rn = 1
),
a AS (
  SELECT customer_id, COUNT(*) AS n_days,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM day_end GROUP BY 1
)
SELECT customer_id, n_days,
       CASE WHEN n_days * sxx - sx * sx = 0 THEN NULL
            ELSE ROUND(CAST(n_days * sxy - sx * sy AS DOUBLE) /
                       (n_days * sxx - sx * sx), 4)
       END AS slope_cents_per_day
FROM a ORDER BY customer_id""")

  /** Mirrors RelationalQueries.tierLookupJoin — dimension VALUES and bin
    * width render from the same constants; the bin expansion + residual
    * range filter reproduce the banded-join rewrite exactly. */
  val tierLookupJoin: String = {
    val w = RelationalQueries.TierBinWidth
    val dimRows = RelationalQueries.PriceTiers
      .map { case (lo, hi, t) => s"($lo, $hi, '$t')" }.mkString(", ")
    s"""
WITH dim(lo, hi, tier) AS (VALUES $dimRows),
e AS (
  SELECT lo, hi, tier, unnest(generate_series(lo // $w, (hi - 1) // $w)) AS bin
  FROM dim
),
f AS (
  SELECT o_totalprice, CAST(FLOOR(o_totalprice / $w) AS INT) AS bin FROM orders
)
SELECT tier, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total_price
FROM f JOIN e USING (bin)
WHERE o_totalprice >= lo AND o_totalprice < hi
GROUP BY tier ORDER BY tier"""
  }

  /** Plain-join twin of the salted join (salting is a physical rewrite —
    * the result multiset is identical by construction). */
  val saltedRevenueByPriority: String = """
SELECT o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS lineitem_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority"""

  val topkOrders: String = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""

  val customerOrderRank: String = """
SELECT o_custkey, o_orderkey, o_totalprice, rnk
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders) t
WHERE rnk <= 3
ORDER BY o_custkey, rnk"""

  /** Mirrors RelationalQueries.paretoFrontier: the NOT EXISTS dominance
    * definition itself — the declarative spec the window formulation must
    * equal; dominance on integer cents and calendar days. */
  val paretoFrontier: String = """
WITH pts AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
         CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS date_days
  FROM orders
)
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM pts o
WHERE NOT EXISTS (
  SELECT 1 FROM pts p
  WHERE p.price_cents >= o.price_cents AND p.date_days >= o.date_days
    AND (p.price_cents > o.price_cents OR p.date_days > o.date_days))
ORDER BY o_orderkey"""

  /** Mirrors Validators.benfordProfile: cents fix-up via floor(+0.5),
    * leading digit from the INTEGER's text rendering (double→text differs
    * across engines; integer→text does not), shares in integer basis
    * points; the Benford expectation renders from the same
    * [[graft.operators.Validators.BenfordBp]] table the Spark plan uses.
    * CASTs defuse DuckDB's HUGEINT window SUM. */
  def benfordProfile: String = {
    val benfordValues = graft.operators.Validators.BenfordBp.toSeq.sortBy(_._1)
      .map { case (d, bp) => s"($d, $bp)" }.mkString(", ")
    s"""
WITH $txnsCte,
cents AS (
  SELECT transaction_type,
         CAST(floor(abs(amount) * 100 + 0.5) AS BIGINT) AS cents
  FROM txns
),
digits AS (
  SELECT transaction_type,
         CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
         COUNT(*) AS n
  FROM cents WHERE cents > 0
  GROUP BY 1, 2
),
b AS (SELECT * FROM (VALUES $benfordValues) AS t(digit, benford_bp))
SELECT transaction_type, digit, CAST(n AS BIGINT) AS n,
       CAST(n * 10000 // CAST(SUM(n) OVER (PARTITION BY transaction_type) AS BIGINT) AS BIGINT) AS share_bp,
       CAST(benford_bp AS BIGINT) AS benford_bp,
       CAST(n * 10000 // CAST(SUM(n) OVER (PARTITION BY transaction_type) AS BIGINT) - benford_bp AS BIGINT) AS dev_bp
FROM digits JOIN b USING (digit)
ORDER BY transaction_type, digit"""
  }

  /** Mirrors FuzzyJoin.editDistancePairs: ground truth is the quadratic
    * distinct-name self-join under `levenshtein` — both engines ship the
    * unit-cost Wagner–Fischer metric, so the oracle needs no filter chain;
    * the Spark side must make its q-gram blocking LOSSLESS to hash-match. */
  def fuzzyPartPairs(d: Int = 2): String = s"""
WITH n AS (SELECT DISTINCT p_name AS name FROM part)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS edit_distance
FROM n a JOIN n b ON a.name < b.name AND levenshtein(a.name, b.name) <= $d
ORDER BY name_a, name_b"""

  /** Mirrors FuzzyJoin.canonicalNames: transitive closure over the fuzzy
    * pair graph (recursive CTE — the same min-label fixpoint
    * OracleSqlText.dedupClusters uses, here over string labels under
    * binary collation), singletons self-mapped, cluster-size window. */
  def fuzzyCanonicalNames(d: Int = 2): String = s"""
WITH RECURSIVE n AS (SELECT DISTINCT p_name AS name FROM part),
pairs AS (
  SELECT a.name AS name_a, b.name AS name_b
  FROM n a JOIN n b ON a.name < b.name AND levenshtein(a.name, b.name) <= $d
),
edges AS (
  SELECT name_a AS src, name_b AS dst FROM pairs
  UNION
  SELECT name_b AS src, name_a AS dst FROM pairs
),
reach(name, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.name = e.dst
),
lab AS (SELECT name, MIN(r) AS canon FROM reach GROUP BY name),
m AS (
  SELECT n.name, COALESCE(lab.canon, n.name) AS canonical
  FROM n LEFT JOIN lab USING (name)
)
SELECT name, canonical,
       CAST(COUNT(*) OVER (PARTITION BY canonical) AS BIGINT) AS cluster_size
FROM m ORDER BY name"""

  /** Mirrors Validators.corrProfile: exact 128-bit integer moments
    * (DuckDB SUM(BIGINT) = HUGEINT ↔ Spark DECIMAL(38,0)), doubles only
    * at the final fixed-tree conversion; sqrt is IEEE-correctly-rounded
    * on both engines. */
  val corrProfile: String = """
WITH b AS (
  SELECT l_returnflag,
         CAST(l_quantity AS BIGINT) AS x,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y,
         CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS z
  FROM lineitem
),
m AS (
  SELECT l_returnflag, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(z) AS sz,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(z * z) AS szz,
         SUM(x * y) AS sxy, SUM(z * y) AS szy
  FROM b GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       ROUND((n * sxy - sx * sy)::DOUBLE /
             NULLIF(sqrt((n * sxx - sx * sx)::DOUBLE *
                         (n * syy - sy * sy)::DOUBLE), 0.0), 8) AS corr_qty_price,
       ROUND((n * szy - sz * sy)::DOUBLE /
             NULLIF(sqrt((n * szz - sz * sz)::DOUBLE *
                         (n * syy - sy * sy)::DOUBLE), 0.0), 8) AS corr_disc_price
FROM m ORDER BY l_returnflag"""

  /** Mirrors Physical.skewProfile for one (name, table, key): count
    * census → count-of-counts → exact p99 via the integer-ceiling
    * cumulative rule (cum·100 ≥ keys·99), all-BIGINT derived metrics. */
  private def skewCensusSql(name: String, table: String, key: String): String = s"""
SELECT '$name' AS key_name,
       CAST(tot_rows AS BIGINT) AS total_rows,
       CAST(tot_keys AS BIGINT) AS distinct_keys,
       CAST(mx AS BIGINT) AS max_key_rows,
       CAST(p99 AS BIGINT) AS p99_key_rows,
       CAST(tot_rows * 1000000 // tot_keys AS BIGINT) AS avg_rows_micro,
       CAST(mx * tot_keys * 1000000 // tot_rows AS BIGINT) AS skew_ratio_micro,
       CAST((mx * tot_keys + tot_rows - 1) // tot_rows AS BIGINT) AS recommended_salt
FROM (SELECT SUM(c * nk) AS tot_rows, SUM(nk) AS tot_keys, MAX(c) AS mx
      FROM (SELECT c, COUNT(*) AS nk
            FROM (SELECT $key AS k, COUNT(*) AS c FROM $table GROUP BY 1) GROUP BY c)) tot,
     (SELECT MIN(c) AS p99 FROM (
        SELECT c, SUM(nk) OVER (ORDER BY c
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM (SELECT c, COUNT(*) AS nk
              FROM (SELECT $key AS k, COUNT(*) AS c FROM $table GROUP BY 1) GROUP BY c)) cw,
        (SELECT SUM(nk) AS tk FROM (SELECT c, COUNT(*) AS nk
              FROM (SELECT $key AS k, COUNT(*) AS c FROM $table GROUP BY 1) GROUP BY c)) tt
      WHERE cum * 100 >= tk * 99) p"""

  val skewProfile: String =
    Seq(("events.user_id", "events", "user_id"),
      ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
      ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
      ("orders.o_custkey", "orders", "o_custkey"),
      ("documents.source", "documents", "source"))
      .map { case (n, t, k) => skewCensusSql(n, t, k) }
      .mkString("", "\nUNION ALL", "\nORDER BY key_name")

  /** Mirrors Physical.compactionPlan over documents-as-files: per-source
    * ordered cumsum of openCost-padded sizes, bin = start offset // target,
    * per-bin rollup. */
  def compactionPlan(targetBytes: Long = 4096L, openCost: Long = 128L): String = s"""
WITH f AS (
  SELECT source AS part, doc_id AS file_id, n_chars + $openCost AS sz
  FROM documents
),
c AS (
  SELECT part, file_id, sz,
         SUM(sz) OVER (PARTITION BY part ORDER BY file_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM f
)
SELECT part, CAST((cum - sz) // $targetBytes AS BIGINT) AS bin,
       COUNT(*) AS n_files, CAST(SUM(sz) AS BIGINT) AS bin_bytes,
       MIN(file_id) AS first_file_id, MAX(file_id) AS last_file_id
FROM c GROUP BY 1, 2 ORDER BY part, bin"""

  /** Mirrors EventQueries.botScreen: exact HUGEINT gap moments (the
    * corrProfile discipline — g² overflows BIGINT at day-scale gaps),
    * integer-micro cv², NULLIF guards for single-event/zero-span users. */
  def botScreen(minEvents: Int = 20, cv2MicroMax: Long = 100000L): String = s"""
WITH g AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
),
a AS (
  SELECT user_id, COUNT(*) AS n_events,
         CAST((MAX(us) - MIN(us)) // 1000000 AS BIGINT) AS span_seconds,
         COUNT(gap) AS k, SUM(gap) AS s,
         SUM(gap::HUGEINT * gap) AS s2
  FROM g GROUP BY user_id
)
SELECT user_id, n_events, span_seconds,
       CAST(s // NULLIF(k, 0) AS BIGINT) AS avg_gap_us, cv2_micro,
       (n_events >= $minEvents AND cv2_micro IS NOT NULL
        AND cv2_micro < $cv2MicroMax) AS is_regular
FROM (SELECT *, CAST((k::HUGEINT * s2 - s::HUGEINT * s) * 1000000
                     // NULLIF(s::HUGEINT * s, 0) AS BIGINT) AS cv2_micro
      FROM a) t
ORDER BY user_id"""

  /** Mirrors Validators.ksProfile: the (source × value) grid with both
    * cumulative counts, exact BIGINT D·10⁶, one row per source. */
  val ksProfile: String = """
WITH census AS (
  SELECT source, n_chars, COUNT(*) AS c FROM documents GROUP BY 1, 2
),
vals AS (
  SELECT n_chars, SUM(c) AS call,
         SUM(SUM(c)) OVER (ORDER BY n_chars
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_all
  FROM census GROUP BY n_chars
),
per_source AS (SELECT source, SUM(c) AS n1 FROM census GROUP BY source),
tot AS (SELECT SUM(c) AS n FROM census),
grid AS (
  SELECT ps.source, ps.n1, t.n, v.n_chars, v.cum_all, COALESCE(ce.c, 0) AS c
  FROM per_source ps CROSS JOIN tot t CROSS JOIN vals v
  LEFT JOIN census ce ON ce.source = ps.source AND ce.n_chars = v.n_chars
),
cums AS (
  SELECT *, SUM(c) OVER (PARTITION BY source ORDER BY n_chars
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_s
  FROM grid
)
SELECT source, CAST(MAX(n1) AS BIGINT) AS n_rows,
       CAST(MAX(n - n1) AS BIGINT) AS n_rest,
       CAST(MAX(abs(cum_s * (n - n1) - (cum_all - cum_s) * n1) * 1000000
                // (n1 * (n - n1))) AS BIGINT) AS ks_micro
FROM cums GROUP BY source ORDER BY source"""

  /** Mirrors the graph_link_prediction gate (Graph.linkPrediction over the
    * co-purchase part graph): bidirectional edge list, hub-capped two-hop
    * paths keyed on the middle node, anti-join against existing edges,
    * exact integer Resource-Allocation micro-units, full-tie-break top-k. */
  def linkPrediction(hubCap: Int = 256, k: Int = 100): String = s"""
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS (SELECT a.p AS pa, b.p AS pb
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
bi AS (SELECT pa AS x, pb AS y FROM e UNION ALL SELECT pb, pa FROM e),
deg AS (SELECT x, COUNT(*) AS d FROM bi GROUP BY x),
bridges AS (
  SELECT bi.x AS z, bi.y AS n, deg.d
  FROM bi JOIN deg ON deg.x = bi.x AND deg.d <= $hubCap
),
cand AS (
  SELECT b1.n AS pa, b2.n AS pb, b1.d AS dz
  FROM bridges b1 JOIN bridges b2 ON b1.z = b2.z AND b1.n < b2.n
),
new_links AS (
  SELECT c.pa, c.pb, c.dz FROM cand c
  LEFT JOIN e ON e.pa = c.pa AND e.pb = c.pb
  WHERE e.pa IS NULL
)
SELECT pa, pb, CAST(SUM(1000000 // dz) AS BIGINT) AS ra_micro,
       COUNT(*) AS n_common
FROM new_links GROUP BY pa, pb
ORDER BY ra_micro DESC, pa, pb LIMIT $k"""

  /** Mirrors the join_interval_events gate (AsOfJoin.intervalJoin + count
    * rollup): the oracle is the PLAIN non-equi trailing-window join the
    * bucketed plan must reproduce exactly — the gate proves the
    * bucketization is lossless and duplicate-free, not just plausible. */
  def intervalClicksBeforePurchase(windowMinutes: Int = 30): String = s"""
WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT event_id AS c_id, user_id, ts AS c_ts
      FROM events WHERE event_type = 'click')
SELECT p.purchase_id, p.user_id, COUNT(c.c_id) AS n_clicks,
       MAX(c.c_ts) AS last_click_ts
FROM p LEFT JOIN c
  ON c.user_id = p.user_id
 AND c.c_ts > p.p_ts - INTERVAL $windowMinutes MINUTE
 AND c.c_ts <= p.p_ts
GROUP BY 1, 2 ORDER BY purchase_id"""

  /** Mirrors Validators.momentsProfile: cents fix-up, exact HUGEINT power
    * sums (↔ Spark DECIMAL(38,0)), then the identical fixed double tree
    * for the raw-moment expansion of m₂/m₃/m₄. */
  val momentsProfile: String = """
WITH b AS (
  SELECT event_type, CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS HUGEINT) AS x
  FROM events
),
m AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(x) AS s1, SUM(x * x) AS s2,
         SUM(x * x * x) AS s3, SUM(x * x * x * x) AS s4
  FROM b GROUP BY event_type
),
r AS (
  SELECT event_type, CAST(n AS BIGINT) AS n,
         s1::DOUBLE / n::DOUBLE AS mean,
         s2::DOUBLE / n::DOUBLE AS r2,
         s3::DOUBLE / n::DOUBLE AS r3,
         s4::DOUBLE / n::DOUBLE AS r4
  FROM m
),
c AS (
  SELECT event_type, n, mean,
         r2 - mean * mean AS m2,
         r3 - 3.0 * mean * r2 + 2.0 * mean * mean * mean AS m3,
         r4 - 4.0 * mean * r3 + 6.0 * mean * mean * r2
            - 3.0 * mean * mean * mean * mean AS m4
  FROM r
)
SELECT event_type, n,
       ROUND(mean / 100.0, 6) AS mean_value,
       ROUND(sqrt(m2) / 100.0, 6) AS stddev_value,
       ROUND(m3 / NULLIF(pow(m2, 1.5), 0.0), 6) AS skewness,
       ROUND(m4 / NULLIF(m2 * m2, 0.0) - 3.0, 6) AS kurtosis_excess
FROM c ORDER BY event_type"""

  /** Mirrors Validators.madOutliers: cents-fixed integers, exact
    * interpolated medians (quantile_cont ↔ Spark percentile), the same
    * 4.4478 fence literal. */
  val madOutliers: String = """
WITH b AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
med AS (
  SELECT event_type, quantile_cont(c, 0.5) AS med_c, COUNT(*) AS n
  FROM b GROUP BY event_type
),
dev AS (
  SELECT b.event_type, med.n, med.med_c,
         abs(b.c::DOUBLE - med.med_c) AS adev
  FROM b JOIN med ON med.event_type = b.event_type
),
mad AS (
  SELECT event_type, MAX(n) AS n, MAX(med_c) AS med_c,
         quantile_cont(adev, 0.5) AS mad_c
  FROM dev GROUP BY event_type
),
agg AS (
  SELECT dev.event_type, MAX(mad.n) AS n, MAX(mad.med_c) AS med_c,
         MAX(mad.mad_c) AS mad_c,
         SUM(CASE WHEN dev.adev > 4.4478 * mad.mad_c THEN 1 ELSE 0 END) AS bad
  FROM dev JOIN mad ON mad.event_type = dev.event_type
  GROUP BY dev.event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       ROUND(med_c / 100.0, 4) AS median_value,
       ROUND(mad_c / 100.0, 4) AS mad_value,
       CAST(bad AS BIGINT) AS n_outliers,
       ROUND(bad::DOUBLE / n, 6) AS outlier_share
FROM agg ORDER BY event_type"""

  /** Mirrors EventQueries.abSrmCheck: same variant hash as abLift, two-cell
    * integer chi2 in micro units, HUGEINT-safe square, shared flag literal. */
  val abSrmCheck: String = s"""
WITH u AS (SELECT DISTINCT user_id FROM events),
a AS (
  SELECT COUNT(*) AS n_users,
         SUM(CASE WHEN (${OracleSqlText.hex8IntSql("user_id::VARCHAR")}) % 2 = 0
                  THEN 1 ELSE 0 END) AS n_a
  FROM u
),
c AS (
  SELECT CAST(n_users AS BIGINT) AS n_users, CAST(n_a AS BIGINT) AS n_a,
         CAST(n_users - n_a AS BIGINT) AS n_b,
         CAST(CAST(2 * n_a - n_users AS HUGEINT) * (2 * n_a - n_users) * 1000000
              // NULLIF(CAST(n_users AS HUGEINT), 0) AS BIGINT) AS srm_chi2_micro
  FROM a
)
SELECT n_users, n_a, n_b, srm_chi2_micro,
       srm_chi2_micro > 3841459 AS srm_flag
FROM c"""

  /** Mirrors Validators.giniProfile: the (type, value) census, run-wise
    * rank arithmetic series, HUGEINT combination, integer micro division. */
  val giniProfile: String = """
WITH b AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
census AS (
  SELECT event_type, c, COUNT(*) AS cnt FROM b GROUP BY 1, 2
),
runs AS (
  SELECT event_type, c, cnt,
         COALESCE(SUM(cnt) OVER (PARTITION BY event_type ORDER BY c
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before,
         cnt * (cnt + 1) // 2 AS tri
  FROM census
),
agg AS (
  SELECT event_type,
         SUM(cnt) AS n,
         SUM(c * cnt) AS t,
         SUM(CAST(c AS HUGEINT) * (CAST(cum_before AS HUGEINT) * cnt + tri)) AS s
  FROM runs GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       ROUND(t::DOUBLE / 100.0, 2) AS total_value,
       CAST((2 * s - (CAST(n AS HUGEINT) + 1) * CAST(t AS HUGEINT)) * 1000000
            // NULLIF(CAST(n AS HUGEINT) * CAST(t AS HUGEINT), 0) AS BIGINT) AS gini_micro
FROM agg ORDER BY event_type"""

  /** Mirrors Validators.mutualInfoProfile: three categorical entropy
    * censuses (lang / source / joint), each term −p·ln p the identical
    * IEEE tree of exact integers rounded to micro-nats before the BIGINT
    * sum; MI by the entropy identity, one NULLIF-guarded 4-dp NMI. */
  val mutualInfoProfile: String = """
WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
hl AS (
  SELECT COUNT(*) AS n_lang,
         SUM(CAST(ROUND(-((c::DOUBLE / n_docs) * ln(c::DOUBLE / n_docs))
                        * 1000000) AS BIGINT)) AS h_lang_micro
  FROM (SELECT lang, COUNT(*) AS c FROM documents GROUP BY 1), n
),
hs AS (
  SELECT COUNT(*) AS n_source,
         SUM(CAST(ROUND(-((c::DOUBLE / n_docs) * ln(c::DOUBLE / n_docs))
                        * 1000000) AS BIGINT)) AS h_source_micro
  FROM (SELECT source, COUNT(*) AS c FROM documents GROUP BY 1), n
),
hj AS (
  SELECT COUNT(*) AS n_pairs,
         SUM(CAST(ROUND(-((c::DOUBLE / n_docs) * ln(c::DOUBLE / n_docs))
                        * 1000000) AS BIGINT)) AS h_joint_micro
  FROM (SELECT lang, source, COUNT(*) AS c FROM documents GROUP BY 1, 2), n
)
SELECT n_docs, n_lang, n_source, n_pairs,
       CAST(h_lang_micro AS BIGINT) AS h_lang_micro,
       CAST(h_source_micro AS BIGINT) AS h_source_micro,
       CAST(h_joint_micro AS BIGINT) AS h_joint_micro,
       CAST(h_lang_micro + h_source_micro - h_joint_micro AS BIGINT) AS mi_micro,
       ROUND((h_lang_micro + h_source_micro - h_joint_micro)::DOUBLE
             / NULLIF(sqrt(h_lang_micro::DOUBLE * h_source_micro::DOUBLE), 0),
             4) AS nmi
FROM n, hl, hs, hj"""

  /** Mirrors Similarity.embeddingCovariance: micro-quantized coordinates,
    * exact integer sufficient statistics, the identical final double tree. */
  /** Twin of Similarity.embeddingPcaPower: replays the IDENTICAL integer
    * power-iteration trajectory in a recursive CTE. C is carried as a
    * flat K² list in the recursion state and the matvec is nested list
    * lambdas — NOT a join: a correlated subquery against a materialized
    * CTE inside a recursive term silently yields NULL in DuckDB (probed),
    * and re-inlining the census per round is 10× slower. HUGEINT `//`
    * truncates toward zero, matching Scala BigInt division exactly. */
  def embeddingPcaPower(kDims: Int = 8, iters: Int = 500): String = s"""
WITH RECURSIVE p AS (
  SELECT i.i AS dim_i, j.j AS dim_j
  FROM generate_series(0, ${kDims - 1}) i(i), generate_series(0, ${kDims - 1}) j(j)
),
clean AS (
  SELECT * FROM embeddings
  WHERE len(embedding) >= $kDims
    AND len(list_filter(embedding[1:$kDims],
                        x -> x IS NULL OR isnan(x::DOUBLE))) = 0
),
a AS (
  SELECT p.dim_i, p.dim_j, COUNT(*) AS n,
         SUM(CAST(floor(e.embedding[p.dim_i + 1]::DOUBLE * 1e6) AS BIGINT)) AS sx,
         SUM(CAST(floor(e.embedding[p.dim_j + 1]::DOUBLE * 1e6) AS BIGINT)) AS sy,
         SUM(CAST(floor(e.embedding[p.dim_i + 1]::DOUBLE * 1e6) AS HUGEINT) *
             CAST(floor(e.embedding[p.dim_j + 1]::DOUBLE * 1e6) AS BIGINT)) AS sxy
  FROM clean e, p
  GROUP BY 1, 2
),
cmat AS (
  SELECT list(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT)
              ORDER BY dim_i, dim_j) AS c
  FROM a
),
it(iter, v, c) AS (
  SELECT 0, (SELECT list(CAST(1000000 AS HUGEINT)) FROM range($kDims)),
         (SELECT c FROM cmat)
  UNION ALL
  SELECT iter + 1,
         list_transform(raw, x -> CASE WHEN mx = 0 THEN CAST(0 AS HUGEINT)
                                       ELSE x * 1000000 // mx END),
         c
  FROM (
    SELECT iter, c,
           list_transform(generate_series(1, $kDims), i ->
             list_aggregate(list_transform(generate_series(1, $kDims), j ->
               c[(i - 1) * $kDims + j] * v[j]), 'sum')) AS raw
    FROM it WHERE iter < $iters
  ) t,
  LATERAL (SELECT list_aggregate(list_transform(raw, y -> abs(y)), 'max') AS mx) u
),
fin AS (SELECT v FROM it WHERE iter = $iters),
signfix AS (
  SELECT COALESCE((SELECT CASE WHEN v[k] < 0 THEN -1 ELSE 1 END
                   FROM (SELECT unnest(generate_series(1, $kDims)) AS k) q, fin
                   WHERE v[k] <> 0 ORDER BY k LIMIT 1), 1) AS sgn
)
SELECT CAST(d.k - 1 AS BIGINT) AS dim,
       CAST(sgn * v[d.k] AS BIGINT) AS v_micro,
       ROUND(CAST(sgn * v[d.k] AS DOUBLE) / 1e6, 6) AS loading
FROM fin, signfix, (SELECT unnest(generate_series(1, $kDims)) AS k) d
WHERE EXISTS (SELECT 1 FROM clean)
ORDER BY dim"""

  def embeddingCovariance(kDims: Int = 8): String = s"""
WITH p AS (
  SELECT i.i AS dim_i, j.j AS dim_j
  FROM generate_series(0, ${kDims - 1}) i(i), generate_series(0, ${kDims - 1}) j(j)
  WHERE i.i <= j.j
),
clean AS (
  SELECT * FROM embeddings
  WHERE len(embedding) >= $kDims
    AND len(list_filter(embedding[1:$kDims],
                        x -> x IS NULL OR isnan(x::DOUBLE))) = 0
),
m AS (
  SELECT p.dim_i, p.dim_j,
         CAST(floor(e.embedding[p.dim_i + 1]::DOUBLE * 1e6) AS BIGINT) AS xi,
         CAST(floor(e.embedding[p.dim_j + 1]::DOUBLE * 1e6) AS BIGINT) AS xj
  FROM clean e, p
),
a AS (
  SELECT dim_i, dim_j, COUNT(*) AS n,
         SUM(xi) AS sx, SUM(xj) AS sy,
         SUM(xi * xj) AS sxy, SUM(xi * xi) AS sxx, SUM(xj * xj) AS syy
  FROM m GROUP BY 1, 2
)
SELECT CAST(dim_i AS BIGINT) AS dim_i, CAST(dim_j AS BIGINT) AS dim_j,
       CAST(n AS BIGINT) AS n,
       ROUND(((n * sxy - sx * sy)::DOUBLE / (n::DOUBLE * n::DOUBLE)) / 1e12, 10) AS cov,
       ROUND((n * sxy - sx * sy)::DOUBLE /
             NULLIF(sqrt((n * sxx - sx * sx)::DOUBLE *
                         (n * syy - sy * sy)::DOUBLE), 0.0), 8) AS corr
FROM a ORDER BY dim_i, dim_j"""

  /** Mirrors EventQueries.abPowerAnalysis: identical z literals and double
    * tree over exact integer cells; NULLIF guards zero delta / empty arm. */
  val abPowerAnalysis: String = s"""
WITH pu AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
         CASE WHEN (${OracleSqlText.hex8IntSql("user_id::VARCHAR")}) % 2 = 0
              THEN 1 ELSE 0 END AS is_a
  FROM events GROUP BY user_id
),
c AS (
  SELECT CAST(SUM(is_a) AS BIGINT) AS n_a,
         CAST(SUM(1 - is_a) AS BIGINT) AS n_b,
         CAST(SUM(converted * is_a) AS BIGINT) AS conv_a,
         CAST(SUM(converted * (1 - is_a)) AS BIGINT) AS conv_b
  FROM pu
),
d AS (
  SELECT n_a, n_b, conv_a, conv_b,
         (conv_a + conv_b)::DOUBLE / (n_a + n_b) AS p_pooled,
         conv_b::DOUBLE / n_b - conv_a::DOUBLE / n_a AS delta,
         pow(1.959964 + 0.841621, 2.0) AS z2
  FROM c
)
SELECT n_a, n_b, conv_a, conv_b,
       ROUND(p_pooled, 6) AS p_pooled,
       ROUND(delta, 6) AS delta_observed,
       CAST(ceil(2.0 * z2 * (p_pooled * (1.0 - p_pooled)) /
                 NULLIF(delta * delta, 0.0)) AS BIGINT) AS n_required_per_arm,
       ROUND(sqrt(2.0 * z2 * (p_pooled * (1.0 - p_pooled)) /
                  NULLIF(LEAST(n_a, n_b)::DOUBLE, 0.0)), 6) AS mde_at_current_n
FROM d"""

  /** Mirrors Similarity.embeddingStandardize: same clean-vector guard and
    * micro quantization as the covariance census, and the same EXACT
    * INTEGER z derivation — V = n·sxx − sx², S = isqrt(V) (double seed,
    * one-step correction), z_micro = floor_div((n·xm − sx)·1e6, S) — so
    * both engines compute identical integers with no double tree. */
  def embeddingStandardize(kDims: Int = 8): String = s"""
WITH clean AS (
  SELECT * FROM embeddings
  WHERE len(embedding) >= $kDims
    AND len(list_filter(embedding[1:$kDims],
                        x -> x IS NULL OR isnan(x::DOUBLE))) = 0
),
m AS (
  SELECT CAST(g.i - 1 AS BIGINT) AS dim,
         CAST(floor(e.embedding[g.i]::DOUBLE * 1e6) AS BIGINT) AS xm
  FROM clean e, generate_series(1, $kDims) g(i)
),
st AS (
  SELECT dim, COUNT(*) AS n, SUM(xm) AS sx,
         SUM(CAST(xm AS HUGEINT) * xm) AS sxx
  FROM m GROUP BY dim
),
vv AS (
  SELECT dim, n, sx,
         CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS v
  FROM st
),
isq AS (
  SELECT dim, n, sx, v,
         CASE WHEN (s0 + 1) * (s0 + 1) <= v THEN s0 + 1
              WHEN s0 * s0 > v THEN s0 - 1
              ELSE s0 END AS s
  FROM (SELECT *, CAST(floor(sqrt(v::DOUBLE)) AS HUGEINT) AS s0 FROM vv)
),
z AS (
  SELECT dim,
         CASE WHEN v = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST((a - (a % s + s) % s) // s AS BIGINT)
         END AS z_micro
  FROM (
    SELECT m.dim, i.v, i.s,
           (CAST(i.n AS HUGEINT) * m.xm - i.sx) * 1000000 AS a
    FROM m JOIN isq i ON i.dim = m.dim
  )
)
SELECT dim, n,
       CAST((sz - (sz % n + n) % n) // n AS BIGINT) AS mean_z_micro,
       CAST((szz - (szz % e + e) % e) // e AS BIGINT) AS var_z_micro
FROM (
  SELECT dim, COUNT(*) AS n,
         SUM(CAST(z_micro AS HUGEINT)) AS sz,
         SUM(CAST(z_micro AS HUGEINT) * z_micro) AS szz,
         CAST(COUNT(*) AS HUGEINT) * 1000000 AS e
  FROM z GROUP BY dim
) ORDER BY dim"""

  /** Mirrors EventQueries.cohortLtv: day cohort axis (DATE subtraction),
    * cents revenue, domain-sized cumulative window, exact micro per-user
    * division. */
  val cohortLtv: String = """
WITH b AS (
  SELECT user_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         CAST(ts AS DATE) AS d
  FROM events
),
coh AS (
  SELECT user_id, MIN(d) AS cohort_day FROM b GROUP BY user_id
),
sizes AS (
  SELECT cohort_day, COUNT(*) AS n_users FROM coh GROUP BY cohort_day
),
matrix AS (
  SELECT coh.cohort_day, CAST(b.d - coh.cohort_day AS BIGINT) AS age_days,
         COUNT(*) AS n_purchases, SUM(b.cents) AS rev_cents
  FROM b JOIN coh ON coh.user_id = b.user_id
  WHERE b.event_type = 'purchase'
  GROUP BY 1, 2
),
cum AS (
  SELECT m.cohort_day, m.age_days, s.n_users, m.n_purchases, m.rev_cents,
         SUM(m.rev_cents) OVER (PARTITION BY m.cohort_day ORDER BY m.age_days
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_cents
  FROM matrix m JOIN sizes s ON s.cohort_day = m.cohort_day
)
SELECT cohort_day,
       CAST(age_days AS BIGINT) AS age_days,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(n_purchases AS BIGINT) AS n_purchases,
       ROUND(rev_cents / 100.0, 2) AS revenue,
       CAST(cum_cents * 1000000 // (n_users * 100) AS BIGINT) AS ltv_micro
FROM cum ORDER BY cohort_day, age_days"""

  /** Digest twin for `source_orc_roundtrip`: the identical per-priority
    * digest computed straight from the source parquet. DuckDB has no ORC
    * reader — a hash match therefore proves the Spark ORC sink+scan
    * preserved every key, cent, char and day (see
    * sources/FormatRoundtrip.scala). Sums promote to HUGEINT ↔ the Spark
    * side's DECIMAL(38,0); cents derive from the identical IEEE
    * FLOOR(price*100). */
  def formatRoundtripFull: String = roundtripDigestSql("")

  /** Twin for `layout_partitioned_prune`: the same digest restricted to the
    * partitions the pruned Spark scan keeps (FormatRoundtrip.prunedPriorities
    * — the IN list below must stay in sync with it). */
  def formatRoundtripPruned: String =
    roundtripDigestSql("WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')")

  /** Twin of RelationalQueries.ordersUnpivot: the UNION ALL long form —
    * the explicit spelling of what unpivot/melt does. */
  val ordersUnpivot: String = """
WITH d AS (
  SELECT o_orderpriority,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents_sum,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
  FROM orders GROUP BY 1
)
SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM d
UNION ALL
SELECT o_orderpriority, 'cents_sum', cents_sum FROM d
UNION ALL
SELECT o_orderpriority, 'n_custs', n_custs FROM d
ORDER BY o_orderpriority, metric"""

  /** Twin of RelationalQueries.orderPercentiles: tie-free total order
    * makes PERCENT_RANK/CUME_DIST exact rational functions of row_number
    * on both engines. */
  def orderPercentiles(mod: Int = 97): String = s"""
WITH r AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         PERCENT_RANK() OVER (PARTITION BY o_orderpriority
           ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), o_orderkey)
           AS pr,
         CUME_DIST() OVER (PARTITION BY o_orderpriority
           ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), o_orderkey)
           AS cd
  FROM orders
)
SELECT o_orderkey, o_orderpriority, cents,
       ROUND(pr, 6) AS pct_rank, ROUND(cd, 6) AS cume
FROM r WHERE o_orderkey % $mod = 0 ORDER BY o_orderkey"""

  /** Twin for `layout_dpp_join`: the same tier dimension as a VALUES
    * table, joined and filtered on the non-partition attribute — the
    * digest must equal the Spark side's runtime-pruned read. */
  def dppJoin: String =
    roundtripDigestSql("""
JOIN (VALUES ('1-URGENT', 'expedite'), ('2-HIGH', 'expedite'),
             ('3-MEDIUM', 'standard'), ('4-NOT SPECIFIED', 'standard'),
             ('5-LOW', 'deferred')) AS tiers(priority, tier)
  ON o_orderpriority = priority
WHERE tier = 'expedite'""")

  /** Twin for `source_schema_evolution`: batch 2 (odd doc_ids) carried the
    * new `lang` column, batch 1 did not — the CASE reproduces the
    * mergeSchema null-fill the Spark scan must perform. */
  def schemaEvolution: String = """
WITH t AS (
  SELECT doc_id, source, n_chars,
         CASE WHEN doc_id % 2 = 1 THEN lang END AS lang
  FROM documents
)
SELECT source,
       COUNT(*) AS n,
       CAST(SUM(CAST(doc_id AS HUGEINT)) AS BIGINT) AS id_sum,
       CAST(SUM(CAST(n_chars AS HUGEINT)) AS BIGINT) AS char_sum,
       COUNT(lang) AS n_lang,
       MIN(lang) AS lang_min,
       MAX(lang) AS lang_max
FROM t GROUP BY 1 ORDER BY 1"""

  /** Twin for `layout_compaction_exec`: the full-table digest straight from
    * the source parquet — equality proves the small-file staging + binned
    * rewrite lost and altered nothing (text length folds every byte of the
    * payload into the hash). */
  def compactionExecDigest: String = """
SELECT source,
       COUNT(*) AS n,
       CAST(SUM(CAST(doc_id AS HUGEINT)) AS BIGINT) AS id_sum,
       CAST(SUM(CAST(n_chars AS HUGEINT)) AS BIGINT) AS char_sum,
       CAST(SUM(CAST(LENGTH(text) AS HUGEINT)) AS BIGINT) AS text_chars,
       MIN(lang) AS lang_min,
       MAX(lang) AS lang_max
FROM documents GROUP BY 1 ORDER BY 1"""

  /** Twin of Physical.zorderKeys: identical min/max integer quantization
    * to 256 buckets per dimension and the identical explicit Morton
    * bit-interleave sum (>>, &, and power-of-two multipliers — exact
    * integer arithmetic on both engines). */
  def zorderKeys(mod: Long = 7): String = {
    val interleave = (0 until 8).map(i =>
      s"((bx >> $i) & 1) * ${1L << (2 * i)} + ((by >> $i) & 1) * ${1L << (2 * i + 1)}")
      .mkString(" + ")
    s"""
WITH b AS (
  SELECT o_orderkey, o_custkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
m AS (
  SELECT MIN(cents) AS minc, MAX(cents) AS maxc,
         MIN(o_custkey) AS mink, MAX(o_custkey) AS maxk
  FROM b
),
k AS (
  SELECT o_orderkey,
         (cents - minc) * 256 // (maxc - minc + 1) AS bx,
         (o_custkey - mink) * 256 // (maxk - mink + 1) AS by
  FROM b, m
)
SELECT o_orderkey, bx, by,
       CAST($interleave AS BIGINT) AS zkey
FROM k WHERE o_orderkey % $mod = 0 ORDER BY o_orderkey"""
  }

  private def roundtripDigestSql(where: String): String = s"""
SELECT o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_orderkey AS HUGEINT)) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(o_custkey AS HUGEINT)) AS BIGINT) AS cust_sum,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS HUGEINT)) AS BIGINT) AS cents_sum,
       CAST(SUM(CAST(LENGTH(o_orderstatus) AS HUGEINT)) AS BIGINT) AS status_chars,
       MIN(STRFTIME(o_orderdate, '%Y-%m-%d')) AS d_min,
       MAX(STRFTIME(o_orderdate, '%Y-%m-%d')) AS d_max
FROM orders $where GROUP BY 1 ORDER BY 1"""

  /** Digest twin for `source_csv_roundtrip` / `source_json_roundtrip`: the
    * text-safe projection (longs + strings only — doubles are reduced to
    * cents *before* serialization, see FormatRoundtrip scaladoc) digested
    * from the source parquet. */
  def formatRoundtripText: String = """
WITH t AS (
  SELECT o_orderkey, o_orderstatus, o_orderpriority,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
         STRFTIME(o_orderdate, '%Y-%m-%d') AS order_day
  FROM orders
)
SELECT o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_orderkey AS HUGEINT)) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(cents AS HUGEINT)) AS BIGINT) AS cents_sum,
       CAST(SUM(CAST(LENGTH(o_orderstatus) AS HUGEINT)) AS BIGINT) AS status_chars,
       MIN(order_day) AS d_min,
       MAX(order_day) AS d_max
FROM t GROUP BY 1 ORDER BY 1"""
}
