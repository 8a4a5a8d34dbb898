package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Feature-engineering pipeline primitives (SURVEY §2.9).
  *
  * Everything random is *derived*, never drawn: randomness comes from
  * md5 of a row key, so results are reproducible under any
  * partitioning, executor count, or retry — the SURVEY §7.3
  * "seeded randomness at scale" rule. (At 100 TB you'd swap md5 for
  * xxhash64; md5 keeps the DuckDB oracle expressible.)
  */
object PipelineOps {

  /** Hex digit `i` (1-based SQL position) of md5(keyExpr) as an
    * integer 0–15 — the deterministic random source. Identical text
    * runs on both engines (Spark `instr` ≡ DuckDB `strpos` argument
    * order; both 1-based). */
  def hexDigitSql(keyExpr: String, i: String): String =
    s"(instr('0123456789abcdef', substr(md5($keyExpr), $i, 1)) - 1)"

  def hexDigit(keyExpr: String, i: Int): Column = expr(hexDigitSql(keyExpr, i.toString))

  /** Deterministic stratum-free split: first hex digit of the keyed
    * hash under `ratio16` → 'train' (12 → 75 %), else 'val'. The
    * distributed replacement for `train_test_split(random_state=42)`
    * (eval/cropharvest_eval.py:282-284) — no global shuffle, no
    * state, stable under retries. */
  def hashSplitSql(keyExpr: String, ratio16: Int): String =
    s"(CASE WHEN ${hexDigitSql(keyExpr, "1")} < $ratio16 THEN 'train' ELSE 'val' END)"

  def hashSplit(keyExpr: String, ratio16: Int): Column = expr(hashSplitSql(keyExpr, ratio16))
}
