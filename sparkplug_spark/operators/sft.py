"""SFT / preference-data construction: the post-pretraining lane.

A pipeline that feeds instruction tuning and preference optimization
needs three relational primitives the pretraining family doesn't cover:

- :func:`parse_dialogue` — turn raw role-tagged transcripts into typed
  (turn, role, content) rows with structural-validity flags (role
  alternation, leading-role, empty turns): the gate before packing chat
  templates, where a single malformed transcript corrupts a whole
  training block.
- :func:`dialogue_stats` — per-transcript structure report (turn
  counts per role, alternation, length balance) for corpus-level
  filtering.
- :func:`preference_pairs` — (chosen, rejected) construction from
  scored candidate responses, the DPO/RLHF dataset shape; all-pairs
  with a margin gate or deterministic best-vs-worst per prompt.

Everything is plain relational (split / explode / window / self-join by
prompt): no Python in the row path, shuffles keyed by transcript/prompt
id — the same bounded-fan-out shape as sessionization.  Deterministic
ties everywhere (smallest id wins), so every output value-hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import materialize_release
from ..partitioning import spread

__all__ = [
    "parse_dialogue",
    "render_chat",
    "dialogue_stats",
    "preference_pairs",
    "pack_transcripts",
]

#: A turn line is ``<role>: <content>``; transcripts separate turns with
#: newlines.  The role set is closed (a line with an unknown prefix is
#: CONTENT of the previous turn — transcripts embed colons freely).
DIALOGUE_ROLES = ("system", "user", "assistant")


def parse_dialogue(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Parse ``role: content`` transcripts into one row per turn:
    ``(id_col, turn, role, content, n_chars)``, turns numbered from 1 in
    document order.  A physical line that does not start a known role
    continues the current turn (joined back with a newline); leading
    lines before any role marker are attributed to turn 0 with role
    NULL — kept visible so validity checks can reject the transcript
    instead of silently swallowing preamble.

    One narrow split/explode + a running ``max``-window turn assignment
    keyed by the transcript id: the only shuffle moves (id, line) rows,
    grouped back per transcript — sessionization's shape on text."""
    from pyspark.sql import Window

    role_pat = f"^({'|'.join(DIALOGUE_ROLES)}): "
    lines = (
        spread(df)
        .select(
            id_col,
            F.posexplode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
            ).alias("__ln", "__line"),
        )
        .select(
            id_col,
            "__ln",
            "__line",
            F.regexp_extract("__line", role_pat, 1).alias("__role_raw"),
        )
        .withColumn("__starts", F.col("__role_raw") != "")
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("__ln")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    turns = lines.select(
        id_col,
        "__ln",
        "__line",
        "__role_raw",
        F.sum(F.when(F.col("__starts"), 1).otherwise(0)).over(w).alias("turn"),
    )
    body = F.when(
        F.col("__role_raw") != "",
        F.expr(f"substring(__line, length(__role_raw) + 3)"),
    ).otherwise(F.col("__line"))
    per_turn = (
        turns.select(
            id_col,
            "turn",
            "__ln",
            F.when(F.col("__role_raw") != "", F.col("__role_raw")).alias(
                "__role"
            ),
            body.alias("__body"),
        )
        .groupBy(id_col, "turn")
        .agg(
            F.min("__role").alias("role"),  # only the first line carries it
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("__ln").alias("l"),
                                F.col("__body").alias("b"),
                            )
                        )
                    ),
                    lambda s: s["b"],
                ),
                "\n",
            ).alias("content"),
        )
    )
    # drop an EMPTY preamble (turn 0 from text that starts with a role
    # marker); keep a non-empty one so validators see it
    return per_turn.where(
        (F.col("turn") > 0) | (F.length(F.trim("content")) > 0)
    ).select(
        id_col,
        F.col("turn").cast("long").alias("turn"),
        "role",
        "content",
        F.length("content").cast("long").alias("n_chars"),
    )


def dialogue_stats(
    turns: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-transcript structure report over :func:`parse_dialogue` rows:
    ``(id_col, n_turns, n_user, n_assistant, n_system, has_preamble,
    starts_with_user, alternates_ok, n_empty_turns, total_chars)``.

    ``alternates_ok``: after an optional leading system turn, roles must
    strictly alternate user/assistant starting at user — the structural
    contract chat templates assume.  One grouped aggregation; the
    alternation test folds each turn's expected role into a boolean
    min."""
    expected = F.when(
        (F.col("turn") % 2) == F.col("__parity"), F.lit("user")
    ).otherwise(F.lit("assistant"))
    # parity of the first non-system body turn decides which role "even"
    # turns must carry; computed per transcript from min body turn
    from pyspark.sql import Window

    body = turns.where((F.col("turn") > 0) & (F.col("role") != "system"))
    w = Window.partitionBy(id_col)
    body = body.withColumn("__first", F.min("turn").over(w)).withColumn(
        "__parity", F.col("__first") % 2
    )
    alt = body.groupBy(id_col).agg(
        F.min(
            (F.col("role") == expected)
            & F.col("role").isin("user", "assistant")
        ).alias("alternates_ok"),
        F.min(F.when(F.col("turn") == F.col("__first"), F.col("role"))).alias(
            "__first_role"
        ),
    )
    base = turns.groupBy(id_col).agg(
        F.count(F.when(F.col("turn") > 0, 1)).alias("n_turns"),
        F.count(F.when(F.col("role") == "user", 1)).alias("n_user"),
        F.count(F.when(F.col("role") == "assistant", 1)).alias(
            "n_assistant"
        ),
        F.count(F.when(F.col("role") == "system", 1)).alias("n_system"),
        F.max(F.col("turn") == 0).alias("has_preamble"),
        F.count(
            F.when(
                (F.col("turn") > 0) & (F.length(F.trim("content")) == 0), 1
            )
        ).alias("n_empty_turns"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    return (
        base.join(alt, id_col, "left")
        .select(
            id_col,
            "n_turns",
            "n_user",
            "n_assistant",
            "n_system",
            F.coalesce("has_preamble", F.lit(False)).alias("has_preamble"),
            F.coalesce(F.col("__first_role") == "user", F.lit(False)).alias(
                "starts_with_user"
            ),
            F.coalesce("alternates_ok", F.lit(False)).alias("alternates_ok"),
            "n_empty_turns",
            "total_chars",
        )
    )


def pack_transcripts(
    turns: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    turn_overhead: int = 4,
    mask_roles: tuple[str, ...] = ("assistant",),
    num_groups: int = 64,
) -> DataFrame:
    """SFT-aware block packing with loss-mask offsets — the chat-template
    sibling of :func:`..cleaning.build_training_blocks` (E90): pack WHOLE
    transcripts (never split — a truncated dialogue trains on answers
    without their questions) into blocks of ~``budget`` tokens, and emit
    one row per turn with the integer token span it occupies in its block
    plus the loss mask:

    ``(pack_group, shard_id, id_col, turn, role, start_tok, end_tok,
    n_tokens, mask)``

    where ``n_tokens = turn_overhead + whitespace tokens of content``
    (the overhead models the chat template's per-turn markers),
    ``[start_tok, end_tok)`` is the turn's span under the block's
    concatenation order, and ``mask`` is 1 for roles in ``mask_roles``
    (trainable — assistant turns by default) else 0.

    Packing rides :func:`..cleaning.pack_token_budget`'s deterministic
    md5 order at TRANSCRIPT granularity: transcripts hash into
    ``num_groups`` independent pack groups, pack greedily in md5 order
    (``shard_id = cum_tokens_before // budget``; an over-budget
    transcript occupies its shard alone), and the same engine-exact
    arithmetic yields the offsets — every value hashes.

    Scale shape: one groupBy on the transcript id (per-transcript
    totals), one window shuffle on pack_group for the packing, one join
    of turns to their transcript's bin, one window on (pack_group,
    shard_id) for offsets.  Only (id, counts) tuples move beyond the
    turns themselves; 100 TB of transcripts pack through ``num_groups``
    independent orderings, never a global one."""
    from pyspark.sql import Window

    from .cleaning import pack_token_budget

    if turn_overhead < 0:
        raise ValueError("turn_overhead must be >= 0")
    tok = F.size(
        F.filter(
            F.split(F.coalesce(F.col("content"), F.lit("")), "[ \t\n]+"),
            lambda t: t != "",
        )
    ).cast("long") + int(turn_overhead)
    # per_turn fans out (the totals chain AND the offsets join): persist
    # once, release after the result materializes — the
    # fan-out-intermediates invariant
    per_turn = (
        spread(turns)
        .select(
            F.col(id_col),
            "turn",
            "role",
            tok.alias("n_tokens"),
        )
        .persist()
    )
    totals = per_turn.groupBy(id_col).agg(
        F.sum("n_tokens").cast("long").alias("__t_tokens")
    )
    packed = pack_token_budget(
        totals, budget, weight_col="__t_tokens", id_col=id_col,
        num_groups=num_groups, order_hash_col="__oh",
    ).select(id_col, "pack_group", "shard_id", "__oh")
    joined = per_turn.join(packed, id_col)
    w = (
        Window.partitionBy("pack_group", "shard_id")
        .orderBy(F.col("__oh"), F.col(id_col).cast("string"), F.col("turn"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    mask = (
        F.when(F.col("role").isin(*mask_roles), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        if mask_roles
        else F.lit(0).cast("int")
    )
    out = joined.select(
        "pack_group",
        "shard_id",
        id_col,
        "turn",
        "role",
        start.alias("start_tok"),
        (start + F.col("n_tokens")).cast("long").alias("end_tok"),
        "n_tokens",
        mask.alias("mask"),
    )
    return materialize_release(out, per_turn)


def render_chat(
    turns: DataFrame,
    id_col: str = "doc_id",
    role_open: str = "<|",
    role_close: str = "|>",
    turn_sep: str = "\n",
) -> DataFrame:
    """Render :func:`parse_dialogue` turns into one training string per
    transcript — the template step between parsing and the JSONL/shard
    sink: each turn becomes ``<|role|>\\ncontent`` (a NULL-role preamble
    renders as ``<|context|>``), turns join with ``turn_sep`` in turn
    order.  Returns ``(id_col, n_turns, n_chars, text)``.

    The marker syntax is a deliberately GENERIC delimiter scheme (the
    three knobs cover the common public template shapes); rendering is
    pure deterministic string assembly — one id-keyed groupBy, the same
    ordered-struct reassembly as every document rebuild in the repo, so
    the output value-hashes."""
    piece = F.concat(
        F.lit(role_open),
        F.coalesce(F.col("role"), F.lit("context")),
        F.lit(role_close),
        F.lit("\n"),
        F.col("content"),
    )
    return (
        spread(turns)
        .select(
            F.col(id_col),
            F.struct(F.col("turn").alias("t"), piece.alias("s")).alias("__p"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("__p")), lambda x: x["s"]
                ),
                turn_sep,
            ).alias("text"),
        )
        .select(
            id_col,
            "n_turns",
            F.length("text").cast("long").alias("n_chars"),
            "text",
        )
    )


def preference_pairs(
    df: DataFrame,
    prompt_col: str = "prompt_id",
    response_col: str = "response_id",
    score_col: str = "score",
    min_margin: int = 1,
    mode: str = "all_pairs",
) -> DataFrame:
    """Build (chosen, rejected) preference rows from scored candidates —
    the DPO/RLHF dataset construction step.

    ``mode='all_pairs'``: every ordered pair within a prompt whose score
    margin is ``>= min_margin`` (margin reported); at k candidates per
    prompt this is <= k(k-1)/2 rows — explicit and bounded, the caller
    caps k upstream (`sample_per_key`).  ``mode='best_worst'``: exactly
    one row per prompt with >= 2 candidates and a positive margin —
    argmax vs argmin with deterministic ties (smallest response id wins
    both, via the struct-min/max trick: one aggregate, no rank window).

    Scores must be integers (engine-exact margins — quantize upstream);
    NULL scores/ids drop; ``best_worst`` additionally needs a NUMERIC
    response id (the argmax tie-break negates it).  Shuffles key on the
    prompt id only."""
    if mode not in ("all_pairs", "best_worst"):
        raise ValueError("mode must be 'all_pairs' or 'best_worst'")
    if min_margin < 1:
        raise ValueError("min_margin must be >= 1")
    base = (
        spread(df)
        .select(
            F.col(prompt_col).alias("prompt_id"),
            F.col(response_col).alias("response_id"),
            F.col(score_col).cast("long").alias("score"),
        )
        .where(
            F.col("prompt_id").isNotNull()
            & F.col("response_id").isNotNull()
            & F.col("score").isNotNull()
        )
    )
    if mode == "best_worst":
        agg = base.groupBy("prompt_id").agg(
            F.count(F.lit(1)).alias("__n"),
            F.max(
                F.struct(F.col("score"), (-F.col("response_id")).alias("nid"))
            ).alias("__best"),
            F.min(
                F.struct(F.col("score"), F.col("response_id").alias("id"))
            ).alias("__worst"),
        )
        return (
            agg.where(F.col("__n") >= 2)
            .select(
                "prompt_id",
                (-F.col("__best.nid")).alias("chosen_id"),
                F.col("__worst.id").alias("rejected_id"),
                (F.col("__best.score") - F.col("__worst.score"))
                .cast("long")
                .alias("margin"),
            )
            .where(F.col("margin") >= int(min_margin))
        )
    # both self-join arms alias ONE frame: persist it, or the caller's
    # upstream chain executes twice per action and races a lazy cache
    # (the ED-Join class of bug — see CLAUDE.md's self-join invariant)
    base = base.persist()
    a, b = base.alias("a"), base.alias("b")
    out = a.join(
        b,
        (F.col("a.prompt_id") == F.col("b.prompt_id"))
        & (F.col("a.response_id") != F.col("b.response_id"))
        & (F.col("a.score") >= F.col("b.score") + int(min_margin)),
    ).select(
        F.col("a.prompt_id").alias("prompt_id"),
        F.col("a.response_id").alias("chosen_id"),
        F.col("b.response_id").alias("rejected_id"),
        (F.col("a.score") - F.col("b.score")).cast("long").alias("margin"),
    )
    return materialize_release(out, base)
