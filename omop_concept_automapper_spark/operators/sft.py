"""SFT pair assembly: (context, response) training pairs from ordered
conversation turns.

The transcripts table (BASELINE.json input_hint: conv_id, turn_idx, role,
text, ...) is the raw material for supervised fine-tuning; the standard
extraction takes every turn of a target role and pairs it with a rendered
window of the preceding turns.  This is ONE conversation-keyed shuffle:
the rows-frame window collects at most ``k`` prior turns per row, so
per-key state is bounded by the conversation's own length, and the
conversation key is the same range-partition key the whole pipeline
shuffles on — at 10^12 turns the sort is the per-partition sort Spark
already does for any window, never a global one.

Determinism: the frame order is the window's total order (pass a unique
tie column — turn_idx or an event id); ``collect_list`` over an ORDER BY
window emits rows in frame order in Spark, matching DuckDB's windowed
``string_agg`` — the gate pins this engine agreement exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def context_response_pairs(
    turns: DataFrame,
    conv_col: str,
    order_cols: list[str],
    role_col: str,
    text_col: str,
    response_role: str,
    k: int = 3,
    sep: str = " | ",
) -> DataFrame:
    """One row per ``response_role`` turn that has at least one prior
    turn: (conv, order cols, context, response, n_context_turns).

    ``context`` renders each of the up-to-``k`` preceding turns as
    ``role: text`` joined by ``sep`` (every role participates in context,
    including prior response-role turns — multi-turn conversations keep
    their own history).  ``order_cols`` must be a total order within a
    conversation or the pair content is nondeterministic.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    rendered = F.concat_ws(": ", F.col(role_col), F.col(text_col))
    w = (
        Window.partitionBy(conv_col)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(-k, -1)
    )
    out = turns.select(
        conv_col,
        *order_cols,
        role_col,
        F.col(text_col).alias("response"),
        F.array_join(F.collect_list(rendered).over(w), sep).alias(
            "context"
        ),
        F.count(F.lit(1)).over(w).cast("int").alias("n_context_turns"),
    )
    return (
        out.where(
            (F.col(role_col) == response_role)
            & (F.col("n_context_turns") >= 1)
        )
        .drop(role_col)
    )
