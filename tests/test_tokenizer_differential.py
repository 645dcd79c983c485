"""Differential fuzz of the Spark-vs-DuckDB tokenizer equivalence.

~20 registry oracles rest on `functions.text.tokens` (Spark: Java-regex
split on \\s+ after lower+trim) producing EXACTLY the token lists that
`queries._DUCK_TOKS` (DuckDB: RE2 string_split_regex) produces, and the
shingle oracles additionally on `word_shingles` == `queries._DUCK_SHINGLES`.
The registry queries exercise that equivalence only on the harness corpus
(plain ASCII, single spaces); this fuzz sweeps the whole input class the
oracle contract covers — printable ASCII with every whitespace kind both
regex engines define identically (space, \\t, \\n, \\r, \\f, \\v),
leading/trailing runs, empty and whitespace-only strings — in ONE Spark
job + ONE DuckDB query per test, so hypothesis-scale coverage costs two
queries, not hundreds.
"""

from __future__ import annotations

import random
import string

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from peskas_malawi_data_pipeline_spark.functions import text as T
from peskas_malawi_data_pipeline_spark.queries import _DUCK_SHINGLES, _DUCK_TOKS

_WS = [" ", "\t", "\n", "\r", "\f", "\x0b"]
_WORD_CHARS = string.ascii_letters + string.digits
_PUNCT = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"


def _fuzz_strings(seed: int, n: int = 300) -> list[str | None]:
    rng = random.Random(seed)
    # None pins the NULL-document behavior on BOTH engines (previously
    # untested): tokens are NULL in Spark (split of NULL) and NULL in
    # DuckDB (string_split_regex of NULL); shingles/n-grams are [] on
    # both (Spark's explicit otherwise-empty branch; DuckDB's
    # list_distinct over the empty-slice transform) — so every consumer
    # that explodes or intersects sees identical zero rows cross-engine.
    out = [None, "", " ", "  \t ", "\n\n", "a", " a ", "a  b", "\ta\vb\f"]
    for _ in range(n):
        parts = []
        for _ in range(rng.randint(1, 12)):
            kind = rng.random()
            if kind < 0.55:
                parts.append("".join(rng.choice(_WORD_CHARS)
                                     for _ in range(rng.randint(1, 8))))
            elif kind < 0.75:
                parts.append("".join(rng.choice(_PUNCT)
                                     for _ in range(rng.randint(1, 3))))
            else:
                parts.append("".join(rng.choice(_WS)
                                     for _ in range(rng.randint(1, 4))))
        # random junction: sometimes no separator, sometimes ws runs
        s = ""
        for p in parts:
            s += p + (rng.choice(_WS) * rng.randint(0, 3))
        out.append(s)
    return out


@pytest.mark.parametrize("seed", [7, 4242])
def test_tokens_match_duckdb_on_whitespace_fuzz(spark, seed):
    strs = _fuzz_strings(seed)
    df = spark.createDataFrame([Row(i=i, text=s) for i, s in enumerate(strs)],
                               "i int, text string")
    got = {r.i: r.toks for r in
           df.select("i", T.tokens(F.col("text")).alias("toks")).collect()}

    con = duckdb.connect()
    con.register("docs", __import__("pandas").DataFrame(
        {"i": range(len(strs)), "text": strs}))
    want = {i: t for i, t in con.sql(
        f"SELECT i, {_DUCK_TOKS} AS t FROM docs").fetchall()}

    assert set(got) == set(want)
    for i in got:
        # token LISTS must match exactly (order carries n-gram structure)
        assert got[i] == want[i], (i, repr(strs[i]), got[i], want[i])


@pytest.mark.parametrize("seed", [11])
def test_word_shingles_match_duckdb_on_whitespace_fuzz(spark, seed):
    strs = [s for s in _fuzz_strings(seed, n=150)]
    df = spark.createDataFrame([Row(i=i, text=s) for i, s in enumerate(strs)],
                               "i int, text string")
    got = {r.i: r.sh for r in
           df.select("i", T.word_shingles(F.col("text"), 3).alias("sh"))
           .collect()}

    con = duckdb.connect()
    con.register("docs", __import__("pandas").DataFrame(
        {"i": range(len(strs)), "text": strs}))
    want = {i: s for i, s in con.sql(
        f"""WITH toks AS (SELECT i, {_DUCK_TOKS} AS t FROM docs)
            SELECT i, {_DUCK_SHINGLES} AS s FROM toks""").fetchall()}

    assert set(got) == set(want)
    for i in got:
        # shingles are a SET (every consumer explodes or intersects them;
        # DuckDB's list_distinct does not preserve first-occurrence order,
        # Spark's array_distinct does) — compare order-insensitively, but
        # still require distinctness on both sides
        assert len(got[i]) == len(set(got[i])), (i, got[i])
        assert sorted(got[i]) == sorted(want[i]), \
            (i, repr(strs[i]), got[i], want[i])


@pytest.mark.parametrize("seed", [23])
def test_strip_markup_matches_duckdb_on_fuzz(spark, seed):
    """Cross-engine totality of the markup stripper: tag patterns,
    entities (incl. double-encoded), angle-bracket junk, and whitespace
    runs produce the SAME cleaned string from the Spark regexp chain and
    the oracle's regexp_replace+replace chain."""
    rng = random.Random(seed)
    pieces = ["<b>", "</b>", "<img src='x'>", "<", ">", "<<", ">>",
              "&amp;", "&lt;", "&gt;", "&quot;", "&#39;", "&nbsp;",
              "&amp;lt;", "&bogus;", "word", "a.b", "1", ""] + _WS
    strs: list[str | None] = [None, "", "<>", "<a", "a>"]
    for _ in range(200):
        strs.append("".join(rng.choice(pieces)
                            for _ in range(rng.randint(0, 15))))

    df = spark.createDataFrame([Row(i=i, text=s) for i, s in enumerate(strs)],
                               "i int, text string")
    got = {r.i: r.c for r in
           df.select("i", T.strip_markup(F.col("text")).alias("c")).collect()}

    con = duckdb.connect()
    con.register("docs", __import__("pandas").DataFrame(
        {"i": range(len(strs)), "text": strs}))
    sql = f"""
      SELECT i, trim(regexp_replace(
        replace(replace(replace(replace(replace(replace(
          regexp_replace(text, '{T.MARKUP_TAG_RE}', ' ', 'g'),
          '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
          '&nbsp;', ' '), '&amp;', '&'),
        '[\\s\\v]+', ' ', 'g')) AS c FROM docs"""
    want = {i: c for i, c in con.sql(sql).fetchall()}
    assert set(got) == set(want)
    for i in got:
        assert got[i] == want[i], (i, repr(strs[i]), got[i], want[i])


@pytest.mark.parametrize("seed", [31])
def test_gopher_struct_matches_duckdb_on_fuzz(spark, seed):
    """Cross-engine totality of the Gopher signals: the integer ppm/micro
    arithmetic, '#'/'...' symbol counting, alphabetic-word and stop-hit
    counts agree with the oracle's DuckDB formulation on whitespace/symbol
    fuzz (incl. NULL/empty/whitespace-only documents)."""
    rng = random.Random(seed)
    pieces = (["the", "of", "with", "#", "##", "...", "....", "x" * 30,
               "名", "a1"] + list(_WS))
    strs: list[str | None] = [None, "", " ", "# # #", "... ..."]
    for _ in range(200):
        strs.append(" ".join(rng.choice(pieces)
                             for _ in range(rng.randint(0, 25))))

    df = spark.createDataFrame([Row(i=i, text=s) for i, s in enumerate(strs)],
                               "i int, text string")
    got = {r.i: (r.g["n_words"], r.g["mean_word_len_u"],
                 r.g["symbol_word_ppm"], r.g["alpha_word_ppm"],
                 r.g["n_stop_hits"])
           for r in df.select(
               "i", F.explode(F.array(T.gopher_struct(F.col("text"))))
               .alias("g")).collect()}

    stop_list = ", ".join(f"'{w}'" for w in T.GOPHER_STOPWORDS)
    con = duckdb.connect()
    con.register("docs", __import__("pandas").DataFrame(
        {"i": range(len(strs)), "text": strs}))
    sql = f"""
      WITH toks AS (SELECT i, text, {_DUCK_TOKS} AS t FROM docs),
      feat AS (SELECT i,
        CAST(len(t) AS BIGINT) AS n_words,
        CAST(coalesce(list_sum(list_transform(t, x -> length(x))), 0)
             AS BIGINT) AS char_sum,
        CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]')))
             AS BIGINT) AS n_alpha,
        CAST(len(list_filter(t, x -> list_contains([{stop_list}], x)))
             AS BIGINT) AS n_stop,
        CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
          + CAST((length(text) - length(replace(text, '...', ''))) // 3
                 AS BIGINT) AS symbols
       FROM toks)
      SELECT i, n_words,
        CASE WHEN n_words > 0 THEN char_sum * 1000000 // n_words
             WHEN n_words = 0 THEN 0 END AS mwl,
        CASE WHEN n_words > 0 THEN symbols * 1000000 // n_words
             WHEN n_words = 0 THEN 0 END AS sym,
        CASE WHEN n_words > 0 THEN n_alpha * 1000000 // n_words
             WHEN n_words = 0 THEN 0 END AS alpha,
        n_stop
      FROM feat"""
    want = {i: (n, m, s, a, h)
            for i, n, m, s, a, h in con.sql(sql).fetchall()}
    assert set(got) == set(want)
    for i in got:
        assert got[i] == want[i], (i, repr(strs[i]), got[i], want[i])
