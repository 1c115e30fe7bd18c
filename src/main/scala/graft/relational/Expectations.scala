package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Data-contract audit — a declarative constraint suite over the fact
  * tables (the Deequ / Great-Expectations shape): completeness,
  * value-domain, range, key-uniqueness and referential-integrity checks,
  * each emitted as one audit row `(constraint, checked, violations,
  * passed)`. This is the gate a production pipeline runs BEFORE letting a
  * batch into the lake — downstream dedup/mix/training queries assume
  * these invariants, so the audit is the contract that makes the
  * assumption checkable (and the fixture genuinely violates one
  * constraint — `(l_orderkey, l_linenumber)` is not unique — so both
  * verdict branches are exercised end-to-end, not just the happy path).
  *
  * Scale shape: the seven single-row constraints on lineitem fold into
  * ONE conditional-aggregate scan (each check is a `sum(when(ok,0,1))`
  * running map-side-partial in the same hash aggregate); key uniqueness
  * rides the same pass as a two-level count-distinct; the two
  * referential checks are LEFT ANTI joins that carry only the 8-byte key
  * column (at 100 TB the orders/customer key sides broadcast or
  * shuffle-partition by key — never the wide rows). The per-constraint
  * rows then come from `stack` over the one-row result joined with the
  * one-row FK counts — broadcast-sized, no second scan of anything.
  * All counts BIGINT ⇒ engine-exact.
  */
object Expectations {

  private def viol(ok: Column): Column = sum(when(ok, 0L).otherwise(1L))

  /** The audit itself. Constraints (alphabetical, the output order):
    *   fk_lineitem_orders    — every l_orderkey resolves in orders
    *   fk_orders_customer    — every o_custkey resolves in customer
    *   li_discount_range     — l_discount ∈ [0, 0.1]
    *   li_extendedprice_pos  — l_extendedprice > 0
    *   li_linestatus_domain  — l_linestatus ∈ {O, F}
    *   li_orderkey_not_null  — l_orderkey IS NOT NULL
    *   li_pk_unique          — (l_orderkey, l_linenumber) unique
    *   li_quantity_range     — l_quantity ∈ [1, 50]
    *   li_returnflag_domain  — l_returnflag ∈ {A, N, R}
    *   li_shipdate_not_null  — l_shipdate IS NOT NULL
    * NULL fails every range/domain check (a null quantity is a
    * violation, not a skip) — `when(ok, 0).otherwise(1)` routes SQL
    * three-valued logic's UNKNOWN to the violation branch in both
    * engines. Output: (constraint, checked, violations, passed).
    */
  def expectations(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val ord = Tables.load(spark, dir, "orders")
    val cust = Tables.load(spark, dir, "customer")

    val one = li.agg(
      count(lit(1)).as("n"),
      viol(col("l_orderkey").isNotNull).as("v_oknn"),
      viol(col("l_shipdate").isNotNull).as("v_sdnn"),
      viol(col("l_quantity").between(1.0, 50.0)).as("v_qty"),
      viol(col("l_extendedprice") > 0.0).as("v_price"),
      viol(col("l_discount").between(0.0, 0.1)).as("v_disc"),
      viol(col("l_returnflag").isin("A", "N", "R")).as("v_rf"),
      viol(col("l_linestatus").isin("O", "F")).as("v_ls"),
      // NULL-safe composite: countDistinct over the bare column list
      // drops any row where EITHER component is NULL (multi-arg
      // count-distinct semantics), silently over-counting duplicates
      // exactly when a key is dirty — the scenario the audit exists
      // for. A struct with a NULL field is itself non-NULL, so the
      // struct form counts it as a distinct key value, matching the
      // oracle's ROW-valued count(DISTINCT (a, b)).
      (count(lit(1)) -
        countDistinct(struct(col("l_orderkey"), col("l_linenumber"))))
        .as("v_pk"))

    val fkLi = li.select(col("l_orderkey"))
      .join(ord.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("v_fk_li"))
    val fkOrd = ord.select(col("o_custkey"))
      .join(cust.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("v_fk_ord"))
    val nOrd = ord.agg(count(lit(1)).as("n_ord"))

    one.crossJoin(broadcast(fkLi)).crossJoin(broadcast(fkOrd))
      .crossJoin(broadcast(nOrd))
      .select(expr(
        """stack(10,
           'fk_lineitem_orders',   n,     v_fk_li,
           'fk_orders_customer',   n_ord, v_fk_ord,
           'li_discount_range',    n,     v_disc,
           'li_extendedprice_pos', n,     v_price,
           'li_linestatus_domain', n,     v_ls,
           'li_orderkey_not_null', n,     v_oknn,
           'li_pk_unique',         n,     v_pk,
           'li_quantity_range',    n,     v_qty,
           'li_returnflag_domain', n,     v_rf,
           'li_shipdate_not_null', n,     v_sdnn
          ) as (constraint, checked, violations)"""))
      .withColumn("passed", col("violations") === 0L)
      .orderBy("constraint")
  }

  val expectationsSql: String =
    """WITH agg AS (
         SELECT count(*) AS n,
           sum(CASE WHEN l_orderkey IS NOT NULL THEN 0 ELSE 1 END) AS v_oknn,
           sum(CASE WHEN l_shipdate IS NOT NULL THEN 0 ELSE 1 END) AS v_sdnn,
           sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END) AS v_qty,
           sum(CASE WHEN l_extendedprice > 0 THEN 0 ELSE 1 END) AS v_price,
           sum(CASE WHEN l_discount BETWEEN 0 AND 0.1 THEN 0 ELSE 1 END) AS v_disc,
           sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END) AS v_rf,
           sum(CASE WHEN l_linestatus IN ('O','F') THEN 0 ELSE 1 END) AS v_ls,
           count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS v_pk
         FROM lineitem),
       fk1 AS (SELECT count(*) AS v_fk_li FROM lineitem l
               LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
               WHERE o.o_orderkey IS NULL),
       fk2 AS (SELECT count(*) AS v_fk_ord FROM orders o
               LEFT JOIN customer c ON o.o_custkey = c.c_custkey
               WHERE c.c_custkey IS NULL),
       no AS (SELECT count(*) AS n_ord FROM orders),
       rows AS (
         SELECT 'fk_lineitem_orders' AS "constraint", n AS checked,
                v_fk_li AS violations FROM agg, fk1
         UNION ALL SELECT 'fk_orders_customer', n_ord, v_fk_ord FROM no, fk2
         UNION ALL SELECT 'li_discount_range', n, v_disc FROM agg
         UNION ALL SELECT 'li_extendedprice_pos', n, v_price FROM agg
         UNION ALL SELECT 'li_linestatus_domain', n, v_ls FROM agg
         UNION ALL SELECT 'li_orderkey_not_null', n, v_oknn FROM agg
         UNION ALL SELECT 'li_pk_unique', n, v_pk FROM agg
         UNION ALL SELECT 'li_quantity_range', n, v_qty FROM agg
         UNION ALL SELECT 'li_returnflag_domain', n, v_rf FROM agg
         UNION ALL SELECT 'li_shipdate_not_null', n, v_sdnn FROM agg)
       SELECT "constraint", CAST(checked AS BIGINT) AS checked,
              CAST(violations AS BIGINT) AS violations,
              violations = 0 AS passed
       FROM rows ORDER BY "constraint""""
}
