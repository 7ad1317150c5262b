"""Streaming cross-batch MinHash dedup: documents arriving over micro-batches
must dedupe against everything ingested before them, with only first-seen
representatives landing in the signature store."""

from __future__ import annotations

from pwc_challenge_dataengineer_spark.sources.versioned_store import VersionedTable
from pwc_challenge_dataengineer_spark.streaming.dedup_stream import (
    start_streaming_dedup,
)

_BASE_A = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
_BASE_B = "one two three four five six seven eight nine ten eleven twelve"


def test_streaming_minhash_dedup_cross_batch(spark, tmp_path):
    # batch 0: two originals; batch 1: near-copy of doc 1 + new original;
    # batch 2: near-copy of doc 1 again, near-copy of doc 4, and a
    # within-batch near-dup pair (6, 7)
    batches = [
        [(1, _BASE_A + " end1"), (2, "totally different words sharing nothing "
                                     "with any other document here at all")],
        [(3, _BASE_A + " end3"), (4, _BASE_B + " tail4")],
        [(5, _BASE_A + " end5"), (6, _BASE_B + " tail6"), (7, _BASE_B + " tail7")],
    ]
    src = str(tmp_path / "docs_src")
    for b in batches:
        spark.createDataFrame(b, "doc_id BIGINT, text STRING").coalesce(
            1
        ).write.mode("append").parquet(src)

    store = VersionedTable(spark, str(tmp_path / "sig_store"))
    out = str(tmp_path / "verdicts")
    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = start_streaming_dedup(
        stream, store, out, checkpoint=str(tmp_path / "ckpt"), threshold=0.5
    )
    q.awaitTermination(240)

    verdicts = {
        r["doc_id"]: (r["is_duplicate"], r["duplicate_of"])
        for r in spark.read.parquet(out).collect()
    }
    assert verdicts[1] == (False, None)
    assert verdicts[2] == (False, None)
    assert verdicts[4] == (False, None)
    assert verdicts[3] == (True, 1), verdicts  # cross-batch vs store
    assert verdicts[5] == (True, 1), verdicts  # two batches later, still doc 1
    assert verdicts[6] == (True, 4), verdicts  # cross-batch vs store
    # 7 collapses within its own batch; its representative is 6 (single-link,
    # one round — is_duplicate is the contract, the chain tip resolves via 6)
    assert verdicts[7][0] is True and verdicts[7][1] in (4, 6)

    # only first-seen representatives accumulated signatures
    assert {r["doc_id"] for r in store.read().collect()} == {1, 2, 4}
