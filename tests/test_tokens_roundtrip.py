"""Per-row token-array equality invariant (BASELINE.json input_hint):
retokenize(detokenize(tokens)) == tokens, through the real Arrow path,
over a corpus including non-ASCII ISO-8859-1 player names."""

from team_goldo_combat_log_parser_spark.plans.pipeline import token_equality_violations
from team_goldo_combat_log_parser_spark.sources import datagen as dg


def test_roundtrip_fixtures_and_synth(spark):
    logs = [("combat_2012-06-06_20_33_20_fx.txt",
             [dg.enter_combat_line("21:00:00.000", dg.PLAYER),
              *dg.fixture_lines().values(),
              dg.exit_combat_line("23:00:00.000", dg.PLAYER)])]
    logs += dg.synth_corpus(dg.GenConfig(n_logs=2, fights_per_log=2,
                                         rows_per_fight=50))
    df = dg.token_df(spark, logs)
    assert token_equality_violations(df) == 0


def test_roundtrip_sample_file(spark):
    # the reference's real log: ISO-8859-1 with Latin-1 player names
    log = dg.sample_file_log()
    df = dg.token_df(spark, [log])
    assert token_equality_violations(df) == 0


def test_latin1_names_survive(spark):
    line = dg.mk_line("10:00:00.000", "@Bél´tran", "@Bél´tran",
                      "Chargé {123}", "ApplyEffect {836045448945477}: "
                      "Heal {836045448945500}", "(100) <1>")
    toks = dg.tokenize(line)
    assert dg.detokenize(toks) == line
    df = dg.token_df(spark, [("combat_2012-01-01_x.txt", [line])])
    assert token_equality_violations(df) == 0


def test_native_detok_bit_identical(spark):
    """The pure-JVM chr/array_join detok must equal the Arrow pandas UDF
    byte-for-byte, including >=128 latin-1 bytes and empty lines."""
    from pyspark.sql import functions as F

    from team_goldo_combat_log_parser_spark.functions.grammar import (
        detokenize_lines)

    log = dg.sample_file_log()
    logs = [log, ("combat_2012-01-01_e.txt", ["", "[]] ]", "@Bél´tran \xff"])]
    df = dg.token_df(spark, logs)
    a = detokenize_lines(df).select("doc_id", "line")
    b = detokenize_lines(df, native=True).select(
        "doc_id", F.col("line").alias("line_n"))
    diff = a.join(b, "doc_id").filter(F.col("line") != F.col("line_n"))
    assert diff.count() == 0
