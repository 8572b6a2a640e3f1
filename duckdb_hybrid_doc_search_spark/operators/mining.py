"""Pattern-mining / data-management operators: market-basket association
pairs, CDC MERGE upsert, and vocabulary-based spelling suggestion.

These extend the engine's pipeline surface with the mining/maintenance
queries a corpus team runs next to the doc-search core (ref has no
counterpart — this is the beyond-reference LLM-pipeline family, same
register+oracle contract as everything else).

Scale notes (100 TB bar):
- Basket pairs: the pair space is generated per order via a self-join
  co-partitioned on the order key; TPC-H baskets hold ≤ 7 distinct parts,
  so the blowup is ≤ C(7,2) = 21 pairs per order — linear in orders, never
  |parts|². Support filtering happens in the pair aggregate, before the
  (vocab-sized) item-count join.
- MERGE upsert is one full-outer join on the key plus a hash aggregate —
  the canonical distributed MERGE shape (Delta/Iceberg do the same join
  under the hood). No driver-side state; the CDC batch is derived
  in-plan and stays distributed.
- Spell suggest broadcasts the (tiny) misspelled-query side into a
  nested-loop join against the term vocabulary, with a length-band
  predicate so each vocab row evaluates levenshtein against ≤ |queries|
  candidates. Vocabulary is corpus-bounded (≈10⁸ terms at 100 TB), and
  the join is embarrassingly parallel over vocab partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import dd_tokenize, tokenize

MIN_SUPPORT = 2          # pair must co-occur in >= 2 orders
BASKET_TOP = 50          # report top-N pairs by lift
LIFT_ROUND = 6
# Pair fan-out is quadratic in basket size; orders with more than this
# many distinct parts are excluded from PAIR GENERATION (not from the
# item/order support counts) so one pathological mega-basket in a skewed
# corpus cannot detonate the pair stage (VERDICT r4 #6). TPC-H baskets
# hold <= 7 parts, so the cap is inert on the test corpora — the oracle
# applies the identical cap, keeping the gate meaningful either way.
BASKET_CAP = 64

UPD_MOD = 3              # o_orderkey % 10 == 3 -> CDC update
DEL_MOD = 7              # o_orderkey % 10 == 7 -> CDC delete
INS_MOD = 5              # o_orderkey % 10 == 5 -> CDC insert (shifted key)
UPD_FACTOR = 1.1         # updated rows get totalprice * 1.1

SUGGEST_NQ = 8           # number of derived misspelled probe terms
SUGGEST_MINLEN = 5       # only mutate terms long enough to stay unique
SUGGEST_MAXDIST = 2      # edit-distance candidate radius


# --- basket_part_pairs ------------------------------------------------------


def basket_part_pairs(lineitem: DataFrame) -> DataFrame:
    """Market-basket association: part pairs that co-occur in orders,
    scored by lift = N * supp(a,b) / (supp(a) * supp(b)).

    Plan shape (r15): ONE groupBy(orderkey) folds lineitem straight into
    sorted per-order basket arrays (collect_set == distinct + collect_list
    — the pre-r15 plan paid a separate distinct exchange first), and that
    single aggregate feeds all three consumers via ReuseExchange: the
    order count is a one-row count of the baskets (== countDistinct
    orderkey), per-item supports explode the arrays (== the distinct item
    table), and pairs are generated MAP-SIDE from each array (no
    self-join, no second shuffle of the item table) -> pair hash
    aggregate -> two joins against the per-item support table -> scalar
    N broadcast. Baskets larger than BASKET_CAP are excluded from pair
    generation (documented skew guard; support counts still include
    them). No persist() (the r4 ADVICE storage-leak finding) is needed.
    """
    baskets_all = lineitem.groupBy(
        F.col("l_orderkey").alias("okey")
    ).agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
    n_orders = baskets_all.select(
        F.count(F.lit(1)).cast("double").alias("n_orders")
    )
    item_cnt = (
        baskets_all.select(F.explode("parts").alias("pkey"))
        .groupBy("pkey").agg(F.count(F.lit(1)).alias("cnt"))
    )

    baskets = baskets_all.where(F.size("parts").between(2, BASKET_CAP))
    # all (a, b) with a < b from the sorted array: element i pairs with
    # every later element (slice is 1-based, so "after i" starts at i+2)
    pair_structs = F.expr(
        "flatten(transform(parts, (x, i) -> "
        "transform(slice(parts, i + 2, size(parts) - i - 1), "
        "y -> struct(x AS part_a, y AS part_b))))"
    )
    pairs = (
        baskets.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.part_a").alias("part_a"),
                 F.col("p.part_b").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .where(F.col("pair_cnt") >= MIN_SUPPORT)
    )
    scored = (
        pairs
        .join(item_cnt.withColumnRenamed("pkey", "part_a")
              .withColumnRenamed("cnt", "cnt_a"), "part_a")
        .join(item_cnt.withColumnRenamed("pkey", "part_b")
              .withColumnRenamed("cnt", "cnt_b"), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a", "part_b", "pair_cnt", "cnt_a", "cnt_b",
            F.round(
                F.col("pair_cnt") * F.col("n_orders")
                / (F.col("cnt_a") * F.col("cnt_b")),
                LIFT_ROUND,
            ).alias("lift"),
        )
    )
    return (
        scored.orderBy(F.desc("lift"), F.asc("part_a"), F.asc("part_b"))
        .limit(BASKET_TOP)
    )


def dd_basket_part_pairs_sql() -> str:
    return f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
),
n AS (SELECT count(DISTINCT okey)::DOUBLE AS n_orders FROM items),
item_cnt AS (SELECT pkey, count(*)::BIGINT AS cnt FROM items GROUP BY pkey),
capped AS (
  SELECT okey FROM items GROUP BY okey
  HAVING count(*) BETWEEN 2 AND {BASKET_CAP}
),
pairs AS (
  SELECT a.pkey AS part_a, b.pkey AS part_b, count(*)::BIGINT AS pair_cnt
  FROM items a JOIN items b ON a.okey = b.okey AND a.pkey < b.pkey
  WHERE a.okey IN (SELECT okey FROM capped)
  GROUP BY a.pkey, b.pkey
  HAVING count(*) >= {MIN_SUPPORT}
)
SELECT part_a, part_b, pair_cnt, ca.cnt AS cnt_a, cb.cnt AS cnt_b,
       round(pair_cnt * n.n_orders / (ca.cnt * cb.cnt), {LIFT_ROUND}) AS lift
FROM pairs
JOIN item_cnt ca ON ca.pkey = part_a
JOIN item_cnt cb ON cb.pkey = part_b
CROSS JOIN n
ORDER BY lift DESC, part_a ASC, part_b ASC
LIMIT {BASKET_TOP}
""".strip()


# --- orders_merge_upsert ----------------------------------------------------


def orders_merge_upsert(orders: DataFrame) -> DataFrame:
    """Distributed MERGE (upsert + delete) of a CDC batch into the orders
    snapshot, reporting action counts and the post-merge checksum.

    The CDC batch is derived in-plan from the snapshot itself so the
    query is deterministic and oracle-checkable:
      - key % 10 == UPD_MOD (3): update (totalprice * 1.1, status 'U')
      - key % 10 == DEL_MOD (7): delete
      - key % 10 == INS_MOD (5): insert as a new key (old key + max_key)
    MERGE = one full-outer join snapshot vs batch on the key + a CASE
    per column — the same physical shape Delta Lake/Iceberg MERGE
    compiles to. Single summary row out; everything before it is
    distributed.
    """
    snap = orders.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    max_key = snap.agg(F.max("key").alias("max_key"))
    mod = F.col("key") % 10
    upd = snap.where(mod == UPD_MOD).select(
        "key",
        F.round(F.col("price") * UPD_FACTOR, 2).alias("new_price"),
        F.lit("U").alias("new_status"),
        F.lit("update").alias("op"),
    )
    dele = snap.where(mod == DEL_MOD).select(
        "key", F.lit(None).cast("double").alias("new_price"),
        F.lit(None).cast("string").alias("new_status"),
        F.lit("delete").alias("op"),
    )
    ins = (
        snap.where(mod == INS_MOD)
        .crossJoin(F.broadcast(max_key))
        .select(
            (F.col("key") + F.col("max_key")).alias("key"),
            F.col("price").alias("new_price"),
            F.lit("I").alias("new_status"),
            F.lit("insert").alias("op"),
        )
    )
    cdc = upd.unionByName(dele).unionByName(ins)

    merged = snap.join(cdc, "key", "full_outer").select(
        "key",
        F.col("op"),
        F.when(F.col("op") == "delete", F.lit(None).cast("double"))
        .when(F.col("op").isNotNull(), F.col("new_price"))
        .otherwise(F.col("price"))
        .alias("m_price"),
        F.col("price").isNotNull().alias("existed"),
    )
    return merged.agg(
        F.sum(F.when(F.col("existed"), 1).otherwise(0))
        .cast("long").alias("n_before"),
        F.sum(F.when(F.col("op") == "insert", 1).otherwise(0))
        .cast("long").alias("n_inserted"),
        F.sum(F.when(F.col("op") == "update", 1).otherwise(0))
        .cast("long").alias("n_updated"),
        F.sum(F.when(F.col("op") == "delete", 1).otherwise(0))
        .cast("long").alias("n_deleted"),
        F.sum(F.when(F.col("m_price").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_after"),
        F.round(F.sum("m_price"), 2).alias("total_price_after"),
    )


def dd_orders_merge_upsert_sql() -> str:
    return f"""
WITH snap AS (
  SELECT o_orderkey AS key, o_totalprice AS price, o_orderstatus AS status
  FROM orders
),
mk AS (SELECT max(key) AS max_key FROM snap),
cdc AS (
  SELECT key, round(price * {UPD_FACTOR}, 2) AS new_price, 'update' AS op
  FROM snap WHERE key % 10 = {UPD_MOD}
  UNION ALL
  SELECT key, NULL::DOUBLE, 'delete' FROM snap WHERE key % 10 = {DEL_MOD}
  UNION ALL
  SELECT key + mk.max_key, price, 'insert'
  FROM snap CROSS JOIN mk WHERE key % 10 = {INS_MOD}
),
merged AS (
  SELECT coalesce(s.key, c.key) AS key, c.op,
         CASE WHEN c.op = 'delete' THEN NULL
              WHEN c.op IS NOT NULL THEN c.new_price
              ELSE s.price END AS m_price,
         s.key IS NOT NULL AS existed
  FROM snap s FULL OUTER JOIN cdc c ON s.key = c.key
)
SELECT sum(CASE WHEN existed THEN 1 ELSE 0 END)::BIGINT AS n_before,
       sum(CASE WHEN op = 'insert' THEN 1 ELSE 0 END)::BIGINT AS n_inserted,
       sum(CASE WHEN op = 'update' THEN 1 ELSE 0 END)::BIGINT AS n_updated,
       sum(CASE WHEN op = 'delete' THEN 1 ELSE 0 END)::BIGINT AS n_deleted,
       sum(CASE WHEN m_price IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_after,
       round(sum(m_price), 2) AS total_price_after
FROM merged
""".strip()


# --- search_spell_suggest ---------------------------------------------------


def spell_suggest(docs: DataFrame) -> DataFrame:
    """Spelling suggestion from the corpus vocabulary: derive SUGGEST_NQ
    misspelled probes (top frequent terms with the 2nd char dropped),
    then pick each probe's best correction — minimum edit distance,
    frequency desc, term asc — within distance <= SUGGEST_MAXDIST.

    The probe side is SUGGEST_NQ rows -> broadcast nested-loop join
    against the vocabulary with a length-band prefilter (abs(len diff)
    <= SUGGEST_MAXDIST) so most vocab rows skip the levenshtein
    entirely. The final pick is a per-probe row_number over at most
    |vocab in band| candidates.
    """
    vocab = (
        docs.select(F.explode(tokenize(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probes = (
        vocab.where(F.length("term") >= SUGGEST_MINLEN)
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(SUGGEST_NQ)
        .select(
            F.concat(F.substring("term", 1, 1),
                     F.expr("substring(term, 3)")).alias("misspelled")
        )
        .distinct()
    )
    # length-band prefilter in the join condition; the levenshtein is
    # projected ONCE after the join and distance-filtered there (the r4
    # ADVICE duplicate-expression finding — the join-predicate variant
    # evaluated it twice per surviving row)
    cand = (
        vocab.join(
            F.broadcast(probes),
            on=F.abs(F.length("term") - F.length("misspelled"))
            <= SUGGEST_MAXDIST,
        )
        .select(
            "misspelled", "term", "cnt",
            F.levenshtein("term", "misspelled").alias("dist"),
        )
        .where(F.col("dist") <= SUGGEST_MAXDIST)
    )
    w = Window.partitionBy("misspelled").orderBy(
        F.asc("dist"), F.desc("cnt"), F.asc("term")
    )
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select("misspelled", F.col("term").alias("suggestion"),
                "dist", "cnt")
        .orderBy("misspelled")
    )


def dd_spell_suggest_sql(table: str = "documents") -> str:
    toks = dd_tokenize("text")
    return f"""
WITH vocab AS (
  SELECT term, count(*)::BIGINT AS cnt
  FROM (SELECT unnest({toks}) AS term FROM {table})
  GROUP BY term
),
probes AS (
  SELECT DISTINCT misspelled FROM (
    SELECT substr(term, 1, 1) || substr(term, 3) AS misspelled
    FROM vocab WHERE length(term) >= {SUGGEST_MINLEN}
    ORDER BY cnt DESC, term ASC LIMIT {SUGGEST_NQ}
  )
),
cand AS (
  SELECT p.misspelled, v.term, v.cnt,
         levenshtein(v.term, p.misspelled) AS dist
  FROM vocab v JOIN probes p
    ON abs(length(v.term) - length(p.misspelled)) <= {SUGGEST_MAXDIST}
   AND levenshtein(v.term, p.misspelled) <= {SUGGEST_MAXDIST}
)
SELECT misspelled, term AS suggestion, dist, cnt FROM (
  SELECT *, row_number() OVER (PARTITION BY misspelled
              ORDER BY dist ASC, cnt DESC, term ASC) AS rnk
  FROM cand
) WHERE rnk = 1
ORDER BY misspelled
""".strip()


# --- orders_incremental_agg_merge -------------------------------------------

INC_CUTOFF = "1997-01-01"   # old/delta split date for the maintenance demo
INC_AVG_ROUND = 6
_DEC = "decimal(30,8)"


def incremental_agg_merge(orders: DataFrame) -> DataFrame:
    """Incremental aggregate maintenance: per-status stats computed as
    ALGEBRAIC PARTIALS over an 'old' slice (< INC_CUTOFF) and a 'delta'
    slice (>= INC_CUTOFF), then merged — count by sum, decimal sums by
    exact addition, min/max by min/max, avg derived at the end from the
    merged sum/count. The result is bit-identical to aggregating the
    full table directly (the oracle), which is the correctness property
    incremental view maintenance relies on: at 100 TB you re-aggregate
    only the new partition and merge partials, never rescan history.
    """
    us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast(_DEC)).alias("sum_dec"),
            F.min(us).alias("first_us"),
            F.max(us).alias("last_us"),
        )

    cond = F.col("o_orderdate") < F.lit(INC_CUTOFF)
    merged = (
        partial(orders.where(cond))
        .unionByName(partial(orders.where(~cond)))
        .groupBy("o_orderstatus")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_dec").alias("sum_dec"),
            F.min("first_us").alias("first_us"),
            F.max("last_us").alias("last_us"),
        )
    )
    return (
        merged.select(
            "o_orderstatus",
            "n",
            F.round(F.col("sum_dec"), 2).cast("double")
            .alias("total_price"),
            "first_us",
            "last_us",
        )
        .withColumn(
            "avg_price",
            F.round(F.col("total_price") / F.col("n"), INC_AVG_ROUND),
        )
        .orderBy("o_orderstatus")
    )


def dd_incremental_agg_merge_sql() -> str:
    return f"""
SELECT o_orderstatus, n, total_price, first_us, last_us,
       round(total_price / n, {INC_AVG_ROUND}) AS avg_price
FROM (
  SELECT o_orderstatus, count(*)::BIGINT AS n,
         round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2)::DOUBLE
           AS total_price,
         min(epoch_us(o_orderdate)) AS first_us,
         max(epoch_us(o_orderdate)) AS last_us
  FROM orders GROUP BY o_orderstatus
)
ORDER BY o_orderstatus
""".strip()


# --- corpus_schema_profile ---------------------------------------------------

PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")
PROFILE_STRLEN = 32


def schema_profile(docs: DataFrame) -> DataFrame:
    """ANALYZE-style column profile of the documents table: per column
    the null count, distinct count, and (string-rendered, truncated)
    min/max — the stats layer every ingest pipeline materializes before
    trusting a drop.

    ONE pass: all per-column aggregates compute in a single hash
    aggregate (4 x |cols| expressions, map-side partials), then the
    1-row result unpivots to a row per column via stack() —
    driver-independent of table size. countDistinct over several
    columns in one aggregate expands to Expand+partial-distinct plans;
    at extreme widths switch to approx_count_distinct per column.
    """
    aggs = []
    for c in PROFILE_COLS:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long").alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__dist"),
            F.substring(F.min(F.col(c)).cast("string"), 1, PROFILE_STRLEN)
            .alias(f"{c}__min"),
            F.substring(F.max(F.col(c)).cast("string"), 1, PROFILE_STRLEN)
            .alias(f"{c}__max"),
        ]
    one = docs.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__dist, {c}__min, {c}__max"
        for c in PROFILE_COLS
    )
    return (
        one.select(
            F.expr(
                f"stack({len(PROFILE_COLS)}, {stack_args}) AS "
                "(column_name, n_nulls, n_distinct, min_val, max_val)"
            )
        )
        .orderBy("column_name")
    )


def dd_schema_profile_sql(table: str = "documents") -> str:
    parts = [
        f"""
SELECT '{c}' AS column_name,
       sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
       count(DISTINCT {c})::BIGINT AS n_distinct,
       substr(min({c})::VARCHAR, 1, {PROFILE_STRLEN}) AS min_val,
       substr(max({c})::VARCHAR, 1, {PROFILE_STRLEN}) AS max_val
FROM {table}
""".strip()
        for c in PROFILE_COLS
    ]
    return "\nUNION ALL\n".join(parts) + "\nORDER BY column_name"
