"""PII detection/redaction: pattern hits, masking order, NULL handling,
engine parity with DuckDB's RE2 on the shared regex subset, and the
zero-shuffle plan pin."""
import duckdb
import pytest
from pyspark.sql import functions as F

from sleeper_spark.functions import text as pii

ROWS = [
    (1, "mail me at alice.smith+spam@example.co.uk or bob@x.io today"),
    (2, "server 10.0.255.3 then 192.168.1.1, not 1234.5.6.7 though"),
    (3, "call 25-989-741-2988 or 123-456-789-0123 x9"),
    (4, "clean text with no identifiers at all"),
    (5, None),
    (6, "mixed: a@b.com via 8.8.8.8 at 33-123-456-7890"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "id long, t string")


def test_counts_per_kind(spark, docs):
    got = {r.id: (r.n_email, r.n_ipv4, r.n_phone, r.n_pii)
           for r in pii.pii_counts(docs, "t").collect()}
    assert got[1] == (2, 0, 0, 2)
    # 1234.5.6.7: \b before '1234' matches at the '4.5.6.7' boundary?
    # no — \d{1,3} anchored by \b cannot start mid-number, so only the
    # two real addresses count
    assert got[2] == (0, 2, 0, 2)
    assert got[3] == (0, 0, 2, 2)
    assert got[4] == (0, 0, 0, 0)
    assert got[5] == (None, None, None, None)  # NULL text counts NULL
    assert got[6] == (1, 1, 1, 3)


def test_redact_masks_and_order(spark, docs):
    got = {r.id: r.red for r in
           pii.pii_redact(docs, "t", out_col="red").collect()}
    assert got[1] == "mail me at [EMAIL] or [EMAIL] today"
    assert got[2] == "server [IPV4] then [IPV4], not 1234.5.6.7 though"
    assert got[3] == "call [PHONE] or [PHONE] x9"
    assert got[4] == ROWS[3][1]
    assert got[5] is None
    assert got[6] == "mixed: [EMAIL] via [IPV4] at [PHONE]"


def test_redact_in_place_default(spark, docs):
    out = pii.pii_redact(docs, "t")
    assert out.columns == ["id", "t"]
    assert out.where(F.col("t").contains("@")).count() == 0


def test_duckdb_parity_on_shared_subset(spark, docs):
    """The pattern set must behave identically under Java regex and
    RE2 — the property the registry oracles rely on."""
    con = duckdb.connect()
    for _, t in ROWS:
        if t is None:
            continue
        red = t
        for pat, mask in pii.PII_KIND_PATTERNS.values():
            red = con.execute(
                "SELECT regexp_replace(?, ?, ?, 'g')",
                [red, pat, mask]).fetchone()[0]
        spark_red = pii.pii_redact(
            spark.createDataFrame([(t,)], "t string"), "t") \
            .first().t
    # compare the LAST row both ways plus a sweep over all rows
        assert red == spark_red, t


def test_no_shuffle_in_plan(spark, docs):
    explained = pii.pii_counts(
        pii.pii_redact(docs, "t", out_col="r"), "t") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in explained
