"""SFT / post-training data operators — the supervised-fine-tuning and
eval stage of an LLM training pipeline: validating chat-transcript
structure before training, accounting for which tokens actually
receive loss, scoring sampled generations, normalizing RL advantages,
and planning epoch budgets.

New family in round 8 (no reference counterpart — the reference
(Niobe96/Oracle_vector_search) stops at retrieval; these are the
"operations a large-scale training-data pipeline would need" the brief
asks for alongside SURVEY §2).  All queries are deterministic and
fully oracle-checked:

* sft_turn_alternation_audit — role-alternation validation over
                               event-derived conversations (the
                               standard pre-SFT transcript lint:
                               starts-with-user, no adjacent
                               same-role turns, longest run)
* sft_loss_mask_accounting   — trainable-token accounting: of all
                               tokens a packed transcript feeds the
                               model, how many are assistant-content
                               (loss-bearing) vs user-content and
                               chat-template overhead
* pass_at_k_per_task         — the unbiased pass@k estimator
                               (Chen et al. 2021, "Evaluating Large
                               Language Models Trained on Code",
                               eq. 1): per task with n samples and c
                               correct, pass@k = 1 − C(n−c,k)/C(n,k)
* grpo_group_advantage       — group-relative advantage normalization
                               (Shao et al. 2024) over exact integer
                               moments
* streaming_pass_at_k_stats  — eval-on-arrival: foreachBatch (n, c)
                               sufficient-statistics upsert finalized
                               to pass@k
* epoch_capped_token_allocation — data-constrained recipe
                               (Muennighoff et al. 2022): waterfilled
                               token budget under per-domain
                               repetition caps
* bleu2_pair_eval            — BLEU-2 generation eval (Papineni et
                               al. 2002): clipped n-gram precision
                               over candidate/reference pairs, exact
                               integer counts, IEEE-exact geometric
                               mean

Conversations and tasks derive from the fixture tables themselves
(events sessionized at 30 minutes; documents split on a
content-derived boundary), so every number is reproducible from the
parquet alone — no rand(), no external annotations.  Shared kernels
live in operators/sft.py and are scale-probed by
tests/test_sft_scale.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from oracle_vector_search_spark.io import load_table
from oracle_vector_search_spark.operators.topk import bounded_global_order
from oracle_vector_search_spark.operators.sft import (
    group_advantage,
    turn_alternation_stats,
)
from oracle_vector_search_spark.queries import register

# Role map for event-derived transcripts: demand-side event types are
# "user" turns, fulfilment-side types are "assistant" turns.
_ROLE_SQL = (
    "CASE WHEN event_type IN ('purchase', 'signup') "
    "THEN 'assistant' ELSE 'user' END"
)


@register(
    "sft_turn_alternation_audit",
    f"""
WITH e AS (
  SELECT user_id, event_id,
         epoch_ns(ts) // 1000 AS ts_us,
         epoch_ns(ts) // 1000000000 AS ts_s,
         {_ROLE_SQL} AS role
  FROM events
), flagged AS (
  SELECT user_id, event_id, ts_us, role,
         CASE WHEN lag(ts_s) OVER w IS NULL
                   OR ts_s - lag(ts_s) OVER w > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), sess AS (
  SELECT user_id, event_id, ts_us, role,
         sum(new_session) OVER (PARTITION BY user_id
                                ORDER BY ts_us, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), turns AS (
  SELECT user_id, session_id, role,
         row_number() OVER w AS turn_idx,
         CASE WHEN role = lag(role) OVER w THEN 1 ELSE 0 END AS same_adj
  FROM sess
  WINDOW w AS (PARTITION BY user_id, session_id ORDER BY ts_us, event_id)
), runs AS (
  SELECT user_id, session_id, role,
         turn_idx - sum(same_adj) OVER (
           PARTITION BY user_id, session_id ORDER BY turn_idx
           ROWS UNBOUNDED PRECEDING) AS run_id
  FROM turns
), run_lengths AS (
  -- one row per same-role run: a run of length L contributes L-1
  -- alternation violations, and run_id = 1 is the opening run
  SELECT user_id, session_id, run_id, role,
         CAST(count(*) AS BIGINT) AS run_len
  FROM runs GROUP BY user_id, session_id, run_id, role
), conv AS (
  SELECT user_id, session_id,
         CAST(sum(run_len) AS BIGINT) AS n_turns,
         min(CASE WHEN run_id = 1 THEN role END) AS first_role,
         CAST(sum(run_len - 1) AS BIGINT) AS violations,
         CAST(max(run_len) AS BIGINT) AS max_run
  FROM run_lengths GROUP BY user_id, session_id
)
SELECT first_role,
       CAST(count(*) AS BIGINT) AS conversations,
       CAST(sum(CASE WHEN violations = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS strict_alternating,
       CAST(sum(violations) AS BIGINT) AS adjacent_violations,
       CAST(max(max_run) AS BIGINT) AS max_same_role_run,
       CAST(1000000 * sum(n_turns) // count(*) AS BIGINT)
         AS avg_turns_micro
FROM conv
GROUP BY first_role
ORDER BY first_role
""",
)
def sft_turn_alternation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-transcript structure lint, the validation pass every SFT
    pipeline runs before training: sessionize events into conversations
    (30-min gap, the repo-standard ``sessionize`` operator), map event
    types to chat roles, and per conversation measure (a) whether it
    opens with a user turn, (b) adjacent same-role turns (alternation
    violations — transcripts that need merge-or-split repair), and
    (c) the longest same-role run.  Output is grouped by opening role.

    100 TB shape: ONE shuffle total — see
    operators/sft.py:turn_alternation_stats (the kernel, shared with
    the scale probe in tests/test_sft_scale.py): sessionize partitions
    by user_id; the turn/run windows cluster on (user_id, session_id)
    and the rollups on supersets of that, so every downstream stage is
    satisfied by the existing hash partitioning — no joins, no corpus
    re-scan."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.expr(_ROLE_SQL).alias("role"),
    )
    return turn_alternation_stats(ev, gap_seconds=1800)


# Chat-template cost model: 4 tokens of scaffolding per turn (role
# header + separators) and 2 per conversation (BOS/EOS).
_TURN_OVERHEAD = 4
_CONV_OVERHEAD = 2


@register(
    "sft_loss_mask_accounting",
    f"""
WITH d AS (
  SELECT doc_id, lang,
         CAST(length(string_split(text, ' ')) AS BIGINT) AS tokens,
         CASE WHEN n_chars % 7 = 0 THEN 1 ELSE 0 END AS boundary
  FROM documents
), flagged AS (
  SELECT doc_id, lang, tokens,
         CASE WHEN lag(doc_id) OVER w IS NULL OR boundary = 1
              THEN 1 ELSE 0 END AS new_conv
  FROM d
  WINDOW w AS (PARTITION BY lang ORDER BY doc_id)
), convs AS (
  SELECT doc_id, lang, tokens,
         sum(new_conv) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS conv_id
  FROM flagged
), turns AS (
  SELECT lang, conv_id, tokens,
         row_number() OVER (PARTITION BY lang, conv_id
                            ORDER BY doc_id) AS turn_idx
  FROM convs
), per_conv AS (
  SELECT lang, conv_id,
         CAST(count(*) AS BIGINT) AS n_turns,
         CAST(sum(tokens) AS BIGINT) AS content_tokens,
         CAST(sum(CASE WHEN turn_idx % 2 = 0 THEN tokens ELSE 0 END)
              AS BIGINT) AS assistant_tokens
  FROM turns GROUP BY lang, conv_id
)
SELECT n_turns,
       CAST(count(*) AS BIGINT) AS conversations,
       CAST(sum(content_tokens) AS BIGINT) AS content_tokens,
       CAST(sum(assistant_tokens) AS BIGINT) AS trainable_tokens,
       CAST(sum({_TURN_OVERHEAD} * n_turns + {_CONV_OVERHEAD})
            AS BIGINT) AS template_tokens,
       CAST(1000000 * sum(assistant_tokens)
            // (sum(content_tokens)
                + sum({_TURN_OVERHEAD} * n_turns + {_CONV_OVERHEAD}))
            AS BIGINT) AS trainable_frac_micro
FROM per_conv
GROUP BY n_turns
ORDER BY n_turns
""",
)
def sft_loss_mask_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trainable-token accounting for SFT: documents are grouped into
    conversations (boundaries where n_chars % 7 == 0 — a deterministic
    content-derived split, same conditional-cumsum operator shape as
    sessionization), turns alternate user/assistant by position, and
    only assistant-content tokens carry loss.  Adds the chat-template
    scaffolding cost (4 tokens/turn + 2/conversation) that inflates
    sequence length without ever being trainable.  Output: per
    conversation length, the token budget split into content vs
    trainable vs template, and the trainable fraction in exact
    micro-units — the number that decides what an SFT epoch actually
    costs per learned token.

    100 TB shape: one scan projects token counts (scan-stage), the
    conversation assembly is two windows over one shuffle on lang, and
    the output is O(distinct conversation lengths).  Integer arithmetic
    end-to-end — bit-identical cross-engine."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("bigint").alias("tokens"),
        F.when(F.col("n_chars") % 7 == 0, 1).otherwise(0).alias("boundary"),
    )
    w = Window.partitionBy("lang").orderBy("doc_id")
    flagged = d.withColumn(
        "new_conv",
        F.when(
            F.lag("doc_id").over(w).isNull() | (F.col("boundary") == 1), 1
        ).otherwise(0),
    )
    convs = flagged.withColumn(
        "conv_id",
        F.sum("new_conv").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    wt = Window.partitionBy("lang", "conv_id").orderBy("doc_id")
    turns = convs.select(
        "lang",
        "conv_id",
        "tokens",
        F.row_number().over(wt).alias("turn_idx"),
    )
    per_conv = turns.groupBy("lang", "conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum("tokens").alias("content_tokens"),
        F.sum(
            F.when(F.col("turn_idx") % 2 == 0, F.col("tokens")).otherwise(0)
        ).alias("assistant_tokens"),
    )
    return (
        per_conv.groupBy("n_turns")
        .agg(
            F.count("*").alias("conversations"),
            F.sum("content_tokens").alias("content_tokens"),
            F.sum("assistant_tokens").alias("trainable_tokens"),
            F.sum(
                F.lit(_TURN_OVERHEAD) * F.col("n_turns")
                + F.lit(_CONV_OVERHEAD)
            ).cast("bigint").alias("template_tokens"),
        )
        .select(
            "n_turns",
            "conversations",
            "content_tokens",
            "trainable_tokens",
            "template_tokens",
            F.expr(
                "CAST(1000000 * trainable_tokens div "
                "(content_tokens + template_tokens) AS BIGINT)"
            ).alias("trainable_frac_micro"),
        )
        .orderBy("n_turns")
    )


@register(
    "grpo_group_advantage",
    """
WITH samples AS (
  SELECT event_id, event_id % 64 AS task_id,
         CAST(round(value * 100, 0) AS BIGINT) AS reward_cents
  FROM events
), stats AS (
  SELECT event_id, task_id, reward_cents,
         CAST(count(*) OVER w AS BIGINT) AS n,
         CAST(sum(reward_cents) OVER w AS BIGINT) AS s1,
         CAST(sum(reward_cents * reward_cents) OVER w AS BIGINT) AS s2
  FROM samples
  WINDOW w AS (PARTITION BY task_id)
)
SELECT task_id, event_id, reward_cents, n,
       round(CASE WHEN n * s2 - s1 * s1 = 0 THEN 0.0
             ELSE CAST(reward_cents * n - s1 AS DOUBLE)
                  / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) END, 6) + 0.0
         AS advantage
FROM stats
ORDER BY task_id, event_id
""",
)
def grpo_group_advantage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-relative advantage normalization (the GRPO data-prep step,
    Shao et al. 2024, "DeepSeekMath"): per prompt group, each sampled
    response's advantage is its reward standardized against the group,
    (r − μ)/σ with the population σ.  Algebraically restated over exact
    integer moments: adv = (r·n − Σr) / √(n·Σr² − (Σr)²) — numerator
    and radicand are exact BIGINTs from cents-scaled rewards, and IEEE
    sqrt/divide are correctly rounded, so the doubles are bit-identical
    cross-engine.  Degenerate groups (σ = 0) get advantage 0, the GRPO
    convention.

    100 TB shape: ONE shuffle on task_id; the three group moments are
    unbounded windows riding that partitioning and the advantage is a
    scalar projection — no joins, no second pass.  The cents-scaled
    moments stay in BIGINT up to ~10⁹ samples/group; beyond that the
    same expressions lift to DECIMAL(38,0) unchanged.  Kernel shared
    with the scale probe: operators/sft.py:group_advantage."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        (F.col("event_id") % 64).alias("task_id"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias(
            "reward_cents"
        ),
    )
    return group_advantage(ev, "task_id", "event_id", "reward_cents")


def _falling_ratio_sql(k: int) -> str:
    """``C(n-c,k)/C(n,k)`` as the falling-factorial ratio, every factor
    cast to DOUBLE *before* multiplying (no BIGINT overflow at any n)
    and the expression tree written identically on both engines so the
    IEEE-754 evaluation order — hence the bits — match exactly."""
    num = " * ".join(f"CAST(n - c - {i} AS DOUBLE)" for i in range(k))
    den = " * ".join(f"CAST(n - {i} AS DOUBLE)" for i in range(k))
    return f"({num}) / ({den})"


_PASS_K = (1, 5, 10)
_MIN_SAMPLES = 10
# 64 buckets keeps n >= _MIN_SAMPLES even at the smallest fixture
# (sf0.001: ~15 samples/task), so every tier produces a full task table.
_N_TASKS = 64


@register(
    "pass_at_k_per_task",
    f"""
WITH samples AS (
  SELECT event_id % {_N_TASKS} AS task_id,
         CASE WHEN event_type IN ('purchase', 'signup')
              THEN 1 ELSE 0 END AS correct
  FROM events
), per_task AS (
  SELECT task_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(correct) AS BIGINT) AS c
  FROM samples GROUP BY task_id
)
SELECT task_id, n, c,
       round(1.0 - {_falling_ratio_sql(1)}, 6) AS pass_at_1,
       round(1.0 - {_falling_ratio_sql(5)}, 6) AS pass_at_5,
       round(1.0 - {_falling_ratio_sql(10)}, 6) AS pass_at_10
FROM per_task
WHERE n >= {_MIN_SAMPLES}
ORDER BY task_id
""",
)
def pass_at_k_per_task(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased pass@k (Chen et al. 2021, eq. 1) per evaluation task:
    events are the sampled generations ({_N_TASKS} task buckets by
    event_id), a sample "passes" when its type is fulfilment-side, and
    pass@k = 1 − C(n−c,k)/C(n,k) computed as the falling-factorial
    ratio — when n−c < k the factor chain crosses zero, so the estimate
    degrades to exactly 1.0 with no special-casing.  Reported per task
    for k ∈ {_PASS_K} (no cross-task averaging: macro-averages of
    floats would reintroduce aggregation-order nondeterminism; the
    per-task values come from a fixed-shape expression tree and are
    bit-identical cross-engine).

    100 TB shape: ONE count-only shuffle on task_id (partial aggregation
    map-side); the pass@k arithmetic is a scalar projection over
    O(tasks) rows.  No floats ever aggregate."""
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("event_id") % _N_TASKS).alias("task_id"),
        F.when(F.col("event_type").isin("purchase", "signup"), 1)
        .otherwise(0)
        .alias("correct"),
    )
    per_task = ev.groupBy("task_id").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("correct").cast("bigint").alias("c"),
    )
    cols = [
        F.expr(f"round(1.0 - {_falling_ratio_sql(k)}, 6)").alias(
            f"pass_at_{k}"
        )
        for k in _PASS_K
    ]
    return (
        per_task.filter(F.col("n") >= _MIN_SAMPLES)
        .select("task_id", "n", "c", *cols)
        .orderBy("task_id")
    )


_PASS_SQL_ORACLE = f"""
WITH samples AS (
  SELECT event_id % {_N_TASKS} AS task_id,
         CASE WHEN event_type IN ('purchase', 'signup')
              THEN 1 ELSE 0 END AS correct
  FROM events
), per_task AS (
  SELECT task_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(correct) AS BIGINT) AS c
  FROM samples GROUP BY task_id
)
SELECT task_id, n, c,
       round(1.0 - {_falling_ratio_sql(1)}, 6) AS pass_at_1,
       round(1.0 - {_falling_ratio_sql(5)}, 6) AS pass_at_5,
       round(1.0 - {_falling_ratio_sql(10)}, 6) AS pass_at_10
FROM per_task
WHERE n >= {_MIN_SAMPLES}
ORDER BY task_id
"""


@register("streaming_pass_at_k_stats", _PASS_SQL_ORACLE)
def streaming_pass_at_k_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-on-arrival: the STREAMING twin of ``pass_at_k_per_task``.
    Sampled generations arrive in micro-batches and a foreachBatch
    upsert maintains the per-task (n, c) sufficient-statistics table —
    the pattern every training-run eval dashboard needs (results trickle
    in per rollout worker; pass@k must be current without rescanning
    history).  (n, c) are sums, hence order- and batching-independent:
    the drained state equals the batch closed form under any file
    split, so the batch estimator IS the oracle.

    100 TB shape: per-batch partial aggregation is map-side and
    O(tasks); state stays tasks-sized at rest; finalization is a scalar
    projection (see streaming/ops.py:pass_at_k_stats_stream)."""
    from oracle_vector_search_spark.streaming import ops

    return ops.pass_at_k_stats_stream(spark, sf_dir)


# --- epoch-capped token allocation (data-constrained scaling recipe) ---
# Budget = 3/2 x corpus tokens; per-domain cap = 2 epochs; uniform
# target share waterfilled: domains whose cap fits under the current
# even split cap out, their budget redistributes to the rest.  The
# capped set grows monotonically, so |domains| rounds always converge;
# _WF_ROUNDS = 5 covers the 5-lang fixture exactly.
_WF_ROUNDS = 5
_WF_EPOCH_CAP = 2


def _wf_round_sql(prev: str) -> str:
    """One waterfilling round in SQL: a domain caps when its cap fits
    under the current uncapped even share, cap * U <= R (exact
    integers; R = budget minus already-capped mass, U = #uncapped)."""
    return f"""
  SELECT lang, ta, cap,
         capped OR (
           cap * (count(*) OVER () -
                  sum(CASE WHEN capped THEN 1 ELSE 0 END) OVER ())
           <= ((3 * sum(ta) OVER ()) // 2 -
               sum(CASE WHEN capped THEN cap ELSE 0 END) OVER ())
         ) AS capped
  FROM {prev}"""


_WF_ORACLE = (
    """
WITH base AS (
  SELECT lang,
         CAST(sum(length(string_split(text, ' '))) AS BIGINT) AS ta
  FROM documents GROUP BY lang
), r0 AS (
  SELECT lang, ta, """
    + str(_WF_EPOCH_CAP)
    + """ * ta AS cap, FALSE AS capped FROM base
)"""
    + "".join(
        f", r{i + 1} AS ({_wf_round_sql(f'r{i}')}\n)"
        for i in range(_WF_ROUNDS)
    )
    + f"""
, fin AS (
  SELECT lang, ta, cap, capped,
         CAST((3 * sum(ta) OVER ()) // 2 -
              sum(CASE WHEN capped THEN cap ELSE 0 END) OVER ()
              AS BIGINT) AS r_left,
         CAST(count(*) OVER () -
              sum(CASE WHEN capped THEN 1 ELSE 0 END) OVER ()
              AS BIGINT) AS u,
         CAST(sum(CASE WHEN capped THEN 0 ELSE 1 END)
              OVER (ORDER BY lang ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS rn
  FROM r{_WF_ROUNDS}
), alloc AS (
  SELECT lang, ta, cap, capped,
         CASE WHEN capped THEN cap
              ELSE r_left // greatest(u, 1)
                   + CASE WHEN rn <= r_left % greatest(u, 1)
                          THEN 1 ELSE 0 END
         END AS allocated
  FROM fin
)
SELECT lang,
       ta AS tokens_avail,
       cap AS cap_tokens,
       CAST(allocated AS BIGINT) AS allocated_tokens,
       CAST(1000000 * allocated // ta AS BIGINT) AS epochs_micro,
       CAST(capped AS INTEGER) AS capped
FROM alloc
ORDER BY lang
"""
)


@register("epoch_capped_token_allocation", _WF_ORACLE)
def epoch_capped_token_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Data-constrained training recipe (Muennighoff et al. 2022,
    "Scaling Data-Constrained Language Models" — how many epochs each
    domain can repeat): a token budget of 3/2 x the corpus is
    waterfilled across language domains under a uniform target share
    with a 2-epoch repetition cap per domain.  A domain whose cap fits
    under the current even split caps out (cap * U <= R, exact
    integers); its unused share redistributes to the survivors, and
    the loop repeats — the capped set grows monotonically, so
    |domains| rounds converge; the remainder of the final even split
    goes largest-remainder-style to the first uncapped domains in lang
    order.  Output: available/cap/allocated tokens and exact
    micro-unit epochs per domain.

    100 TB shape: ONE corpus-sized count shuffle produces the
    domain-token table; every waterfilling round is window arithmetic
    over that domains-sized table (5 rows here; thousands at worst) —
    planning math, never a second corpus pass."""
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", F.size(F.split("text", " ")).cast("bigint").alias("tok")
    )
    t = docs.groupBy("lang").agg(F.sum("tok").alias("ta"))
    # bounded_global_order: one row per LANG (domains-sized); the
    # budget scalar comes from a grouping-free aggregate broadcast.
    # The anchored spec is rebuilt from WHICHEVER frame it is applied
    # over (ADVICE r10: deriving it once from `t` worked only because
    # `lang` happened to survive every select — a fragile coupling).
    tot = t.agg(F.sum("ta").alias("tot_ta"))
    cur = t.crossJoin(F.broadcast(tot)).select(
        "lang",
        "ta",
        F.expr("(3 * tot_ta) div 2").alias("budget"),
        (F.lit(_WF_EPOCH_CAP) * F.col("ta")).alias("cap"),
        F.lit(False).alias("capped"),
    )
    budget = F.col("budget")
    for _ in range(_WF_ROUNDS):
        wall = bounded_global_order(
            cur, bound="one row per lang domain", max_rows=10_000
        )
        r_left = budget - F.sum(
            F.when(F.col("capped"), F.col("cap")).otherwise(0)
        ).over(wall)
        u = F.count("*").over(wall) - F.sum(
            F.when(F.col("capped"), 1).otherwise(0)
        ).over(wall)
        cur = cur.select(
            "lang",
            "ta",
            "budget",
            "cap",
            (F.col("capped") | (F.col("cap") * u <= r_left)).alias(
                "capped"
            ),
        )
    wall = bounded_global_order(
        cur, bound="one row per lang domain", max_rows=10_000
    )
    worder = bounded_global_order(
        cur, F.asc("lang"), bound="one row per lang domain", max_rows=10_000
    ).rowsBetween(
        Window.unboundedPreceding, 0
    )
    fin = cur.select(
        "lang",
        "ta",
        "cap",
        "capped",
        (
            budget
            - F.sum(
                F.when(F.col("capped"), F.col("cap")).otherwise(0)
            ).over(wall)
        ).cast("bigint").alias("r_left"),
        (
            F.count("*").over(wall)
            - F.sum(F.when(F.col("capped"), 1).otherwise(0)).over(wall)
        ).cast("bigint").alias("u"),
        F.sum(F.when(F.col("capped"), 0).otherwise(1))
        .over(worder)
        .cast("bigint")
        .alias("rn"),
    )
    alloc = fin.select(
        "lang",
        "ta",
        "cap",
        "capped",
        F.when(F.col("capped"), F.col("cap"))
        .otherwise(
            F.expr("r_left div greatest(u, 1)")
            + F.when(
                F.col("rn") <= F.expr("r_left % greatest(u, 1)"), 1
            ).otherwise(0)
        )
        .alias("allocated"),
    )
    return alloc.select(
        F.col("lang"),
        F.col("ta").alias("tokens_avail"),
        F.col("cap").alias("cap_tokens"),
        F.col("allocated").cast("bigint").alias("allocated_tokens"),
        F.expr("CAST(1000000 * allocated div ta AS BIGINT)").alias(
            "epochs_micro"
        ),
        F.col("capped").cast("int").alias("capped"),
    ).orderBy("lang")


@register(
    "bleu2_pair_eval",
    """
WITH d AS (
  SELECT lang, doc_id, text,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM documents
), paired AS (
  SELECT lang, doc_id, text,
         CAST((rn - 1) // 2 AS BIGINT) AS pair_id,
         rn % 2 AS is_cand
  FROM d
), complete AS (
  SELECT lang, pair_id FROM paired
  GROUP BY lang, pair_id HAVING count(*) = 2
), p AS (
  SELECT paired.* FROM paired
  JOIN complete USING (lang, pair_id)
), tok AS (
  SELECT lang, pair_id, is_cand,
         unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM p
), uni AS (
  SELECT lang, pair_id, w,
         CAST(sum(CASE WHEN is_cand = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS cc,
         CAST(sum(CASE WHEN is_cand = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS cr
  FROM tok GROUP BY lang, pair_id, w
), big AS (
  SELECT a.lang, a.pair_id, a.is_cand, a.w || ' ' || b.w AS w
  FROM tok a JOIN tok b
    ON a.lang = b.lang AND a.pair_id = b.pair_id
   AND a.is_cand = b.is_cand AND b.i = a.i + 1
), bi AS (
  SELECT lang, pair_id, w,
         CAST(sum(CASE WHEN is_cand = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS cc,
         CAST(sum(CASE WHEN is_cand = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS cr
  FROM big GROUP BY lang, pair_id, w
), lens AS (
  SELECT lang, pair_id,
         CAST(sum(CASE WHEN is_cand = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS len_cand,
         CAST(sum(CASE WHEN is_cand = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS len_ref
  FROM tok GROUP BY lang, pair_id
), clips AS (
  SELECT u.lang, u.pair_id,
         CAST(sum(least(u.cc, u.cr)) AS BIGINT) AS clip1
  FROM uni u GROUP BY u.lang, u.pair_id
), clips2 AS (
  SELECT b.lang, b.pair_id,
         CAST(sum(least(b.cc, b.cr)) AS BIGINT) AS clip2
  FROM bi b GROUP BY b.lang, b.pair_id
)
SELECT l.lang, l.pair_id, l.len_cand, l.len_ref,
       c1.clip1, coalesce(c2.clip2, 0) AS clip2,
       round(CAST(c1.clip1 AS DOUBLE) / l.len_cand, 6) AS p1,
       round(CAST(coalesce(c2.clip2, 0) AS DOUBLE)
             / greatest(l.len_cand - 1, 1), 6) AS p2,
       round(sqrt((CAST(c1.clip1 AS DOUBLE) / l.len_cand)
                  * (CAST(coalesce(c2.clip2, 0) AS DOUBLE)
                     / greatest(l.len_cand - 1, 1))), 6) AS bleu2,
       CASE WHEN l.len_cand < l.len_ref THEN 1 ELSE 0 END
         AS brevity_penalized
FROM lens l
JOIN clips c1 ON c1.lang = l.lang AND c1.pair_id = l.pair_id
LEFT JOIN clips2 c2 ON c2.lang = l.lang AND c2.pair_id = l.pair_id
ORDER BY l.lang, l.pair_id
""",
)
def bleu2_pair_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU-2 generation eval (Papineni et al. 2002) over
    candidate/reference pairs: consecutive documents within a language
    pair up (rank 2k-1 vs 2k — every doc participates exactly once),
    modified n-gram precision clips each candidate n-gram's count at
    its reference count (p_n = sum min(c_cand, c_ref) / cand n-grams),
    and the score is the 2-gram geometric mean sqrt(p1*p2) — sqrt and
    divide are IEEE correctly-rounded over exact integer counts, so
    the doubles are bit-identical cross-engine.  The brevity case
    (len_cand < len_ref) is emitted as an integer FLAG rather than the
    exp(1-r/c) factor: exp is not correctly-rounded and would break
    cross-engine exactness.

    100 TB shape: pairing is one window over a lang shuffle; the
    clipped-count join is keyed (lang, pair_id, n-gram) — pair-local,
    never corpus-wide; bigrams come from a scan-stage array expression
    (no self-join on the Spark side).  Output is O(pairs)."""
    # OPTIMIZATION r16 (guide §2.3/§2.4): the old shape consumed the
    # lang-window subtree SIX ways (the pair-completeness aggregation +
    # join, then `p` replayed for lens, clip1 and clip2 — three
    # tokenize passes, each one re-running the window AND the
    # completeness agg). Three structural collapses, identical rows:
    #   * completeness: rn is dense 1..n within lang, so pair
    #     (rn-1) div 2 has 2 members for every row EXCEPT the last row
    #     of an odd-sized language — count(*) OVER the same lang
    #     partition rides the row_number exchange, replacing the
    #     count==2 aggregation + join outright;
    #   * lens folds into the unigram clip aggregation: len_cand =
    #     Σ_w cc and len_ref = Σ_w cr by definition;
    #   * unigrams and bigrams explode ONCE, tagged n=1/n=2, and one
    #     (lang, pair_id, n, w) count + one (lang, pair_id) conditional
    #     rollup produce clip1/clip2/len_cand/len_ref together.
    # Net: ONE tokenize pass over the corpus and 3 exchanges
    # (lang window, pair spread, final order) instead of 7.
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    wall = Window.partitionBy("lang")
    paired = (
        docs.select(
            "lang",
            "text",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wall).alias("nl"),
        )
        # drop the lone last row of an odd-sized language — exactly the
        # rows the old count==2 completeness join removed
        .filter(~((F.col("rn") == F.col("nl")) & (F.col("nl") % 2 == 1)))
        .select(
            "lang",
            F.expr("CAST((rn - 1) div 2 AS BIGINT)").alias("pair_id"),
            (F.col("rn") % 2).alias("is_cand"),
            F.split("text", " ").alias("a"),
        )
        # spread on the PAIR key: everything below the lang window is
        # lang-partitioned, and hash(lang) clustering SATISFIES both
        # downstream group-bys, so without this exchange Spark runs the
        # explode + both aggregations |langs|-wide — a parallelism
        # collapse at any scale (measured: the 2-exchange variant was
        # ~15% SLOWER at sf0.1 than the old shape despite 1/3 the
        # tokenize work). Partitioning by (lang, pair_id) colocates
        # each pair's grams, so BOTH aggregations stay exchange-free
        # (pair-local, the docstring's declared shape) while the heavy
        # explode spreads |pairs|-wide. Shuffles the token arrays once
        # — fewer bytes than any one of the old three gram shuffles.
        .repartition("lang", "pair_id")
    )
    grams = paired.select(
        "lang",
        "pair_id",
        "is_cand",
        F.explode(
            # unigrams tagged n=1 ∪ bigrams tagged n=2, one expression.
            # slice(a, 1, size(a)-1) is [] for single-token texts (the
            # old CASE guard); the lambda index i is 0-based within the
            # slice, so the bigram partner is element_at(a, i + 2).
            F.expr(
                "concat("
                " transform(a, x -> named_struct('n', 1, 'w', x)),"
                " transform(slice(a, 1, size(a) - 1),"
                "  (x, i) -> named_struct('n', 2, 'w',"
                "   concat(x, ' ', element_at(a, i + 2)))))"
            )
        ).alias("g"),
    ).select("lang", "pair_id", "is_cand", "g.n", "g.w")
    counts = grams.groupBy("lang", "pair_id", "n", "w").agg(
        F.sum(F.when(F.col("is_cand") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("cc"),
        F.sum(F.when(F.col("is_cand") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("cr"),
    )
    is1 = F.col("n") == 1
    is2 = F.col("n") == 2
    out = counts.groupBy("lang", "pair_id").agg(
        F.sum(F.when(is1, F.col("cc"))).cast("bigint").alias("len_cand"),
        F.sum(F.when(is1, F.col("cr"))).cast("bigint").alias("len_ref"),
        F.sum(F.when(is1, F.least("cc", "cr")))
        .cast("bigint")
        .alias("clip1"),
        # pairs whose texts are all single-token have NO n=2 rows —
        # the old LEFT join's coalesce-to-0 case
        F.coalesce(
            F.sum(F.when(is2, F.least("cc", "cr"))), F.lit(0)
        )
        .cast("bigint")
        .alias("clip2"),
    )
    p1 = F.col("clip1").cast("double") / F.col("len_cand")
    p2 = F.col("clip2").cast("double") / F.greatest(
        F.col("len_cand") - 1, F.lit(1)
    )
    return out.select(
        "lang",
        "pair_id",
        "len_cand",
        "len_ref",
        "clip1",
        "clip2",
        F.round(p1, 6).alias("p1"),
        F.round(p2, 6).alias("p2"),
        F.round(F.sqrt(p1 * p2), 6).alias("bleu2"),
        F.when(F.col("len_cand") < F.col("len_ref"), 1)
        .otherwise(0)
        .alias("brevity_penalized"),
    ).orderBy("lang", "pair_id")
