"""Differential pin of the PII regex chain: Spark (Java regex) vs DuckDB
(RE2) must agree byte-for-byte on redaction output and per-class counts.

The patterns (functions.text.PII_*) deliberately use the engine-portable
regex subset — character classes, bounded quantifiers, \\b — no
lookaround, no backreferences; this test sweeps crafted edge strings plus
a seeded generative mix in ONE Spark job + ONE DuckDB query.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from peskas_malawi_data_pipeline_spark.functions import text as T

_EDGES = [
    "contact me at john.doe+spam@example.co.uk today",
    "server at 192.168.0.1 and 10.0.0.255, not 1234.5.6.7",
    "call +265 99 123 4567 or (212) 555-0199 now",
    "mixed: a@b.io 8.8.8.8 +1 650 555 0000 end",
    "no pii here at all",
    "edge a@b.c x@y.museum 999.999.999.999",     # 1-char TLD never matches
    "digits 1234567890123 and code 12-34",       # long run yes, short no
    "a@b.c.d.ee trailing dot host a@b.example. end",
    "ip inside word x192.168.0.1y and 1.2.3.4.5 chained",
    "(+44) 20 7946 0958 and ++99 1234567",
    "email@[1.2.3.4] bracket host, under_score@ex-ample.org",
    "",
    " ",
    None,
]


def _gen(seed: int, n: int = 150) -> list:
    rng = random.Random(seed)
    frags = ["word", "x1", "@", ".", "-", " ", "+", "(", ")", "99",
             "1234567", "example", "com", "a@b.cd", "10.0.0.1", "...",
             "@@", "1.2", "555 "]
    return [
        "".join(rng.choice(frags) for _ in range(rng.randint(1, 14)))
        for _ in range(n)
    ]


@pytest.mark.parametrize("seed", [5, 97])
def test_pii_redaction_matches_duckdb(spark, seed):
    strs = _EDGES + _gen(seed)
    df = spark.createDataFrame(
        [Row(i=i, t=s) for i, s in enumerate(strs)], "i int, t string")
    counts = T.pii_counts(F.col("t"))
    got = {r.i: (r.red, r.ne, r.ni, r.np) for r in df.select(
        "i", T.redact_pii(F.col("t")).alias("red"),
        counts["n_emails"].alias("ne"), counts["n_ips"].alias("ni"),
        counts["n_phones"].alias("np")).collect()}

    con = duckdb.connect()
    con.register("d", __import__("pandas").DataFrame(
        {"i": range(len(strs)), "t": strs}))
    want = {i: (red, ne, ni, np) for i, red, ne, ni, np in con.sql(f"""
        SELECT i,
               regexp_replace(regexp_replace(regexp_replace(t,
                   '{T.PII_EMAIL}', '<EMAIL>', 'g'),
                   '{T.PII_IP}', '<IP>', 'g'),
                   '{T.PII_PHONE}', '<PHONE>', 'g'),
               len(regexp_extract_all(t, '{T.PII_EMAIL}')),
               len(regexp_extract_all(t, '{T.PII_IP}')),
               len(regexp_extract_all(t, '{T.PII_PHONE}'))
        FROM d""").fetchall()}

    assert set(got) == set(want)
    for i in got:
        assert got[i] == want[i], (i, repr(strs[i]), got[i], want[i])


def test_pii_redaction_semantics(spark):
    """Direct semantic pins independent of the oracle: replacement order
    (emails before IPs before phones), over-redaction stance, NULL pass."""
    rows = [Row(i=0, t="user123@ex.com 10.0.0.1 +12 345 6789"),
            Row(i=1, t=None)]
    df = spark.createDataFrame(rows, "i int, t string")
    out = {r.i: r.red for r in
           df.select("i", T.redact_pii(F.col("t")).alias("red")).collect()}
    assert out[0] == "<EMAIL> <IP> <PHONE>"
    assert out[1] is None
