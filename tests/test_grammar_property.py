"""Property/fuzz tests for the amount grammar and tokenizer.

Hypothesis drives the pure-Python invariants (tokenize round trip,
leading-digits equivalence with the reference's int()-retry idiom); a
seeded fuzz corpus checks the Spark-side extraction against the oracle's
field parsing in a single batched job.
"""

import random

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from team_goldo_combat_log_parser_spark.functions import grammar
from team_goldo_combat_log_parser_spark.golden import oracle
from team_goldo_combat_log_parser_spark.sources import datagen as dg

latin1_text = st.text(
    alphabet=st.characters(codec="iso-8859-1",
                           exclude_characters="\n\r"),
    min_size=0, max_size=80)


@given(latin1_text)
@settings(max_examples=300, deadline=None)
def test_tokenize_roundtrip(s):
    assert dg.detokenize(dg.tokenize(s)) == s


def _reference_amount_int(amount: str) -> int | None:
    """The reference idiom (main.py:156-162): first token, int() with one
    [:-1] retry — returns None where the reference would crash."""
    toks = amount[1:].split(None, 1)
    if not toks:
        return None
    t = toks[0]
    try:
        return int(t)
    except ValueError:
        try:
            return int(t[:-1])
        except ValueError:
            return None


@given(st.integers(min_value=0, max_value=10**9),
       st.sampled_from(["", "*", ")", "*)"]))
@settings(max_examples=200, deadline=None)
def test_first_int_matches_reference_idiom(n, suffix):
    amount = f"({n}{suffix} rest)"
    ref = _reference_amount_int(amount)
    got = oracle.first_int(amount)
    if ref is not None:
        assert got == ref


def _fuzz_lines(n=400, seed=99):
    rng = random.Random(seed)
    lines = []
    for i in range(n):
        kind = rng.random()
        if kind < 0.3:
            amt = dg.amt_hit(rng.randrange(0, 10**6),
                             rng.choice(list(dg.DMG_TYPE_IDS)),
                             crit=rng.random() < 0.5,
                             threat=rng.randrange(-10**7, 10**7))
        elif kind < 0.5:
            amt = dg.amt_mitigated(rng.choice(list(dg.MITIGATION_NAMES)),
                                   threat=rng.randrange(0, 100))
        elif kind < 0.7:
            amt = dg.amt_hit(rng.randrange(0, 10**5), "kinetic",
                             threat=rng.randrange(0, 10**5),
                             shield=rng.random() < 0.5,
                             absorbed=rng.randrange(0, 10**5))
        elif kind < 0.8:
            amt = dg.amt_truncated(rng.randrange(0, 100))
        elif kind < 0.9:
            amt = dg.amt_plain()
        else:
            amt = f"({rng.randrange(0, 100)})"
        src = rng.choice(["@Lör'dan", "@Bénny:companion {123}",
                          "Böss {999}:1234", ""])
        lines.append(dg.mk_line("12:34:56.789", src, "@Tärget",
                                "Skíll {42}", dg.APPLY_DAMAGE, amt))
    return lines


def test_spark_extraction_matches_oracle_fields(spark):
    lines = _fuzz_lines()
    log = ("combat_2012-03-04_fuzz.txt", lines)
    df = grammar.parse_lines(dg.token_df(spark, [log]))
    rows = {r["line_no"]: r for r in df.collect()}
    for i, line in enumerate(lines):
        fields = oracle.split_line(line)
        r = rows[i]
        assert r["time_raw"] == fields[0]
        assert r["src_raw"] == fields[1]
        assert r["amount_raw"] == fields[5]
        assert r["amount"] == oracle.first_int(fields[5]) or (
            r["amount"] is None and oracle.first_int(fields[5]) == 0)
        if "<" in fields[5]:
            want = int(fields[5][fields[5].index("<") + 1:fields[5].index(">")])
            assert r["threat"] == want
        # name slicing quirks
        assert r["src_name"] == fields[1][1:].split("{", 1)[0]
        assert r["src_player"] == fields[1][2:]
