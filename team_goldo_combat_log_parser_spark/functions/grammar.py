"""Combat-log grammar: detokenize + field split + typed extraction.

Two execution paths, bit-identical outputs:

* ``detokenize_lines`` — the only mandatory Python hop: ISO-8859-1 byte
  tokens -> line string, as an Arrow-vectorized pandas UDF (one bulk
  buffer decode per batch, not per-row Python).
* ``parse_lines`` — everything after detokenization is **native Spark SQL**
  (split / substring / regexp_extract / contains), so the whole parse stage
  sits inside WholeStageCodegen and Catalyst can prune/push down freely.
  A pandas-UDF grok alternative (``parse_lines_pandas``) exists for A/B
  benchmarking; the native path is the default (it benches faster and keeps
  the JVM pipeline unbroken).

Field semantics mirror the reference's csv split on ']' with
skipinitialspace (reference main.py:116-118) and its quirky slicing:
names keep their trailing space after "split('{',1)[0]" (main.py:154-156),
amounts take the leading digits of the first token (main.py:156-162),
threat is the text between the first '<' and '>' (main.py:257-261).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..constants import (
    ABSORB,
    DAMAGE,
    DEATH,
    DEFLECT,
    DODGE,
    ENTER_COMBAT,
    FORCE_ARMOR,
    HEAL,
    LEAVE_COMBAT,
    MISS,
    NO_DAMAGE,
    PARRY,
    PLAYER_TAG,
    RESIST,
    REVIVE,
    SHIELD,
)

# ------------------------------------------------------------------ detokenize


@F.pandas_udf(T.StringType())
def _detok_udf(tokens: pd.Series) -> pd.Series:
    """array<int> byte tokens -> str via one bulk latin-1 decode per batch.

    Concatenates all token arrays of the Arrow batch into a single uint8
    buffer, decodes once, then slices per row — no per-row Python decode.
    """
    arrays = tokens.to_numpy()
    if len(arrays) == 0:
        return pd.Series([], dtype=object)
    lens = np.fromiter((len(a) for a in arrays), dtype=np.int64, count=len(arrays))
    if lens.sum() == 0:
        return pd.Series([""] * len(arrays))
    # one concatenate + one dtype cast for the whole batch (no per-row work)
    flat = np.concatenate(arrays).astype(np.uint8)
    blob = flat.tobytes().decode("iso-8859-1")
    offs = np.zeros(len(arrays) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    return pd.Series([blob[offs[i]:offs[i + 1]] for i in range(len(arrays))])


def detokenize_lines(df: DataFrame, tokens_col: str = "tokens",
                     native: bool = False) -> DataFrame:
    """Add a ``line`` column decoded from the byte-token array.

    Two bit-identical implementations:
    * Arrow pandas UDF (default): fastest per core (one bulk buffer decode
      per batch), but rows cross the JVM<->Python boundary.
    * ``native=True``: pure JVM — ``chr()`` per token + ``array_join``
      (latin-1 codepoints 0-255 == unicode codepoints 0-255, so chr is
      exact). ~30% slower per core but keeps the whole pipeline inside
      the JVM: no Python workers, no Arrow transfer — the path to prefer
      when the Python-worker fleet, not the CPU, is the bottleneck.
    """
    if native:
        return df.withColumn(
            "line",
            F.array_join(F.transform(tokens_col, lambda c: F.chr(c)), ""))
    return df.withColumn("line", _detok_udf(F.col(tokens_col)))


@F.pandas_udf(T.ArrayType(T.IntegerType()))
def retokenize_udf(lines: pd.Series) -> pd.Series:
    """Inverse of detokenize — used by the per-row token-equality invariant."""
    return lines.map(lambda s: list(s.encode("iso-8859-1")))


# ------------------------------------------------------- native field parsing


def _pre_brace(col: Column) -> Column:
    """x.split('{', 1)[0] — keeps the trailing space, like the reference."""
    return F.split(col, "\\{", 2).getItem(0)


def split_fields(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Split a raw line into the six csv fields.

    Mirrors csv.reader(delimiter=']', skipinitialspace=True): split on every
    ']', take the first six parts, strip leading spaces from parts 1..5.
    Two single projections (not chained withColumn): one computes the split
    array once, the next derives all six fields — O(1) plan analysis and no
    repeated split() work per field.
    """
    out = df.select("*", F.split(F.col(line_col), "\\]").alias("_parts"))
    names = ["time_raw", "src_raw", "tgt_raw", "skill_raw", "effect_raw", "amount_raw"]
    cols = []
    for i, n in enumerate(names):
        # F.get (not getItem): a malformed line with <6 fields must yield
        # null, not an ANSI ArrayIndexOutOfBounds that kills the job.
        c = F.get(F.col("_parts"), i)
        if i > 0:
            c = F.ltrim(c)  # skipinitialspace strips spaces after the delimiter
        # downstream substring predicates want deterministic non-null input:
        # a missing field matches nothing (the reference would just crash)
        cols.append(F.coalesce(c, F.lit("")).alias(n))
    return out.select("*", *cols).drop("_parts")


def with_typed_columns(df: DataFrame) -> DataFrame:
    """Derive every typed/flag column the downstream plan consumes.

    All expressions are JVM-side; substring-containment semantics match the
    reference dispatch exactly (main.py:315-327).
    """
    amount = F.col("amount_raw")
    effect = F.col("effect_raw")
    first_tok = F.regexp_extract(amount, r"^\((\S+)", 1)
    # one projection for everything: chained withColumn would re-analyze a
    # growing plan per column (quadratic driver time on 25+ columns)
    return df.select(
        "*",
        # --- names (reference slicing quirks preserved)
        F.expr("substring(time_raw, 2)").alias("time_str"),
        _pre_brace(F.expr("substring(src_raw, 2)")).alias("src_name"),
        F.expr("substring(src_raw, 3)").alias("src_player"),
        _pre_brace(F.expr("substring(tgt_raw, 2)")).alias("tgt_name"),
        _pre_brace(F.expr("substring(skill_raw, 2)")).alias("skill"),
        # --- typed ids (J2): numeric ids inside the braces — spell id from
        # the skill field, verb/effect ids from the two braced groups of
        # the effect field ("ApplyEffect {vid}: Damage {eid}")
        F.regexp_extract(F.col("skill_raw"), r"\{(\d+)\}", 1)
        .try_cast("long").alias("spell_id"),
        F.regexp_extract(effect, r"^[^{]*\{(\d+)\}", 1)
        .try_cast("long").alias("verb_id"),
        F.regexp_extract(effect, r":[^{]*\{(\d+)\}", 1)
        .try_cast("long").alias("effect_id"),
        # --- amount grammar
        F.regexp_extract(first_tok, r"^(\d+)", 1).try_cast("long").alias("amount"),
        first_tok.rlike(r"^\d+\*").alias("crit"),
        F.regexp_extract(amount, r"^\(\S+\s+(\S+)", 1).alias("dmg_type"),
        F.regexp_extract(amount, r"^\([^(]*\((\d+)", 1).try_cast("long")
        .alias("absorbed"),
        F.regexp_extract(amount, r"<([^>]*)>", 1).try_cast("long").alias("threat"),
        amount.contains("<").alias("has_threat"),
        # --- effect flags
        effect.contains(ENTER_COMBAT).alias("is_enter"),
        effect.contains(LEAVE_COMBAT).alias("is_leave"),
        effect.contains(DEATH).alias("is_death"),
        effect.contains(DAMAGE).alias("is_damage"),
        effect.contains(HEAL).alias("is_heal_eff"),
        effect.contains(FORCE_ARMOR).alias("is_fa"),
        # verb flags (sink fan-out S7) — computed here so the persisted
        # projection can drop the raw effect string entirely
        effect.contains("Event {").alias("is_event_verb"),
        effect.contains("ApplyEffect {").alias("is_apply_verb"),
        effect.contains("RemoveEffect {").alias("is_remove_verb"),
        # --- mitigation flags (amount field)
        amount.contains(MISS).alias("m_miss"),
        amount.contains(ABSORB).alias("m_absorb"),
        amount.contains(RESIST).alias("m_resist"),
        (amount.contains(DODGE) | amount.contains(PARRY)
         | amount.contains(DEFLECT)).alias("m_dodge"),
        amount.contains(DODGE).alias("m_dodge_single"),
        amount.contains(SHIELD).alias("m_shield"),
        amount.contains(NO_DAMAGE).alias("m_immune"),
        # --- misc predicates
        F.col("skill_raw").contains(REVIVE).alias("skill_has_revive"),
        F.col("tgt_raw").contains(PLAYER_TAG).alias("tgt_has_at"),
    )


def with_identity_columns(df: DataFrame) -> DataFrame:
    """log_id / line_no from doc_id; log date from the source filename
    (reference main.py:112: filename.split('_', 2)[1])."""
    return df.select(
        "*",
        F.substring_index("doc_id", ":", 1).alias("log_id"),
        F.substring_index("doc_id", ":", -1).cast("long").alias("line_no"),
        F.split(F.col("source"), "_").getItem(1).alias("log_date"),
    )


def with_timestamp(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "ts",
        F.to_timestamp(F.concat_ws(" ", F.col("log_date"), F.col("time_str")),
                       "yyyy-MM-dd HH:mm:ss.SSS"),
    )


def parse_lines(df: DataFrame, native_detok: bool = False) -> DataFrame:
    """token table (+line) -> fully typed event DataFrame (native path)."""
    out = df
    if "line" not in out.columns:
        out = detokenize_lines(out, native=native_detok)
    out = with_identity_columns(out)
    out = split_fields(out)
    out = with_typed_columns(out)
    out = with_timestamp(out)
    return out.drop("tokens", "n_tok")


# -------------------------------------------------- pandas grok path (A/B alt)

_PARSE_OUT_SCHEMA = T.StructType([
    T.StructField("time_raw", T.StringType()),
    T.StructField("src_raw", T.StringType()),
    T.StructField("tgt_raw", T.StringType()),
    T.StructField("skill_raw", T.StringType()),
    T.StructField("effect_raw", T.StringType()),
    T.StructField("amount_raw", T.StringType()),
])


@F.pandas_udf(_PARSE_OUT_SCHEMA)
def _grok_udf(lines: pd.Series) -> pd.DataFrame:
    parts = lines.str.split("]", n=5, expand=True).reindex(columns=range(6))
    # csv semantics: a 7th ']' would truncate the amount field
    amt = parts[5].str.split("]", n=1).str[0]
    pdf = pd.DataFrame({
        "time_raw": parts[0],
        "src_raw": parts[1].str.lstrip(" "),
        "tgt_raw": parts[2].str.lstrip(" "),
        "skill_raw": parts[3].str.lstrip(" "),
        "effect_raw": parts[4].str.lstrip(" "),
        "amount_raw": amt.str.lstrip(" "),
    })
    return pdf


def parse_lines_pandas(df: DataFrame) -> DataFrame:
    """Alternative: field split inside a pandas UDF (benchmark comparator)."""
    out = df
    if "line" not in out.columns:
        out = detokenize_lines(out)
    out = with_identity_columns(out)
    out = out.withColumn("_f", _grok_udf(F.col("line"))).select("*", "_f.*").drop("_f")
    out = with_typed_columns(out)
    out = with_timestamp(out)
    return out.drop("tokens", "n_tok")
