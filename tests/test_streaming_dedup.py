"""Streaming dedup: online exact + MinHash-LSH near-dup over Spark's state
store. Pins (a) cross-micro-batch and cross-RESTART duplicate detection —
the state-carry contract, (b) streaming MinHash signatures bit-identical to
the batch ``minhash_signatures`` (same hash family, same band pack), and
(c) the candidate→verdict reduction used in foreachBatch."""

import os

import pandas as pd

from ezmsg_sigproc_spark.operators.dedup import minhash_signatures
from ezmsg_sigproc_spark.streaming.dedup_stream import (
    _band_pack,
    _minhash_rows,
    reduce_candidates,
    streaming_exact_dedup,
    streaming_minhash_dedup,
)

SCHEMA = "doc_id string, text string"


def _run(spark, op, src, sink, ckpt):
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1).parquet(str(src / "*"))
    q = (op(stream)
         .writeStream.format("parquet")
         .option("path", str(sink))
         .option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(180)


def _write(spark, src, name, rows):
    spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]),
                          SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        str(src / name))


def test_streaming_exact_dedup_across_batches_and_restart(spark, tmp_path):
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    os.makedirs(src)
    _write(spark, src, "b1", [("d1", "the quick brown fox"),
                              ("d2", "unrelated document"),
                              ("d3", "the quick brown fox")])  # same-batch dup
    _run(spark, streaming_exact_dedup, src, sink, ckpt)
    # restart with new data: d4 duplicates d1's content SEEN IN THE PRIOR JOB
    _write(spark, src, "b2", [("d4", "the quick brown fox"),
                              ("d5", "novel text here")])
    _run(spark, streaming_exact_dedup, src, sink, ckpt)

    got = spark.read.parquet(str(sink)).toPandas().set_index("id")
    assert not got.loc["d1", "is_dup"] and got.loc["d1", "dup_of"] == ""
    assert not got.loc["d2", "is_dup"]
    assert got.loc["d3", "is_dup"] and got.loc["d3", "dup_of"] == "d1"
    # cross-restart: state survived the checkpoint
    assert got.loc["d4", "is_dup"] and got.loc["d4", "dup_of"] == "d1"
    assert not got.loc["d5", "is_dup"]


def test_streaming_minhash_signature_parity_with_batch(spark):
    texts = ["the quick brown fox jumps over the lazy dog",
             "pack my box with five dozen liquor jugs",
             "sphinx of black quartz judge my vow"]
    pdf = pd.DataFrame({"doc_id": [f"d{i}" for i in range(len(texts))],
                        "text": texts})
    batch = (minhash_signatures(
        spark.createDataFrame(pdf, SCHEMA), "doc_id", "text", k=5, n_hashes=8)
        .toPandas().set_index("id"))
    stream_sigs = _minhash_rows(pdf["text"], k=5, n_hashes=8)
    for i, sig in enumerate(stream_sigs):
        row = batch.loc[f"d{i}"]
        assert sig == [int(row[f"m{j}"]) for j in range(8)], f"doc d{i}"
    # band pack parity is pure arithmetic on the (already equal) signature;
    # check injectivity shape on the first doc
    packs = [_band_pack(stream_sigs[0], b, 2) for b in range(4)]
    assert len(set(packs)) == len(packs)


def test_streaming_minhash_near_dup_candidates_and_reduction(spark, tmp_path):
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    os.makedirs(src)
    base = ("large scale web crawl corpora need near duplicate removal "
            "before language model training to avoid memorization")
    near = base.replace("memorization", "memorisation")  # tiny edit
    _write(spark, src, "b1", [("d1", base),
                              ("d2", "completely different content here about gardening tools")])
    _run(spark, streaming_minhash_dedup, src, sink, ckpt)
    # later micro-batch (separate job = restart as well): near-dup arrives
    _write(spark, src, "b2", [("d3", near),
                              ("d4", "another unrelated snippet on astronomy and telescopes")])
    _run(spark, streaming_minhash_dedup, src, sink, ckpt)

    cands = spark.read.parquet(str(sink)).toPandas()
    verdict = reduce_candidates(cands, threshold=0.5).set_index("id")
    assert "d3" in verdict.index, f"near-dup not caught: {cands}"
    assert verdict.loc["d3", "dup_of"] == "d1"
    assert verdict.loc["d3", "is_dup"]
    # unrelated docs never become candidates
    assert "d2" not in verdict.index and "d4" not in verdict.index


def test_reduce_candidates_empty_and_threshold():
    empty = reduce_candidates(pd.DataFrame(
        columns=["id", "band_id", "first_id", "jaccard_est"]))
    assert list(empty.columns) == ["id", "dup_of", "jaccard_est", "is_dup"]
    pdf = pd.DataFrame({"id": ["x", "x"], "band_id": [0, 1],
                        "first_id": ["a", "b"], "jaccard_est": [0.25, 0.75]})
    v = reduce_candidates(pdf, threshold=0.5).set_index("id")
    assert v.loc["x", "dup_of"] == "b" and v.loc["x", "is_dup"]
    v2 = reduce_candidates(pdf, threshold=0.9).set_index("id")
    assert not v2.loc["x", "is_dup"]
