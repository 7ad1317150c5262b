

def test_pii_redact_detects_and_strips(spark):
    from pwc_challenge_dataengineer_spark.functions.text import pii_counts, redact_pii
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "mail a.b+c@test.org from 192.168.0.1 call +44-123-4567 end"),
         (2, "clean text with no pii at all")],
        ["id", "text"],
    )
    counts = pii_counts(F.col("text"))
    out = df.select(
        "id",
        redact_pii(F.col("text")).alias("red"),
        counts["email"].alias("ne"), counts["ipv4"].alias("ni"), counts["phone"].alias("np"),
    ).collect()
    by_id = {r.id: r for r in out}
    assert (by_id[1].ne, by_id[1].ni, by_id[1].np) == (1, 1, 1)
    assert by_id[1].red == "mail [EMAIL] from [IP] call [PHONE] end"
    assert (by_id[2].ne, by_id[2].ni, by_id[2].np) == (0, 0, 0)
    assert by_id[2].red == "clean text with no pii at all"
