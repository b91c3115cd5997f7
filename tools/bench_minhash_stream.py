"""A/B: streaming MinHash-LSH near-dup — stateful bucket op (one Python
invocation per band bucket per batch) vs the foreachBatch JVM join mode
(`streaming_minhash_join`, no Python stage). Same deterministic corpus, same
session shape, one availableNow drain each; reports docs/s end-to-end and
cross-checks that both modes emit the same number of candidate rows (exact
row parity is pytest-pinned in tests/test_streaming_dedup.py).

Usage: SPARK_GRAFT_CPUS=32 python tools/bench_minhash_stream.py \
         [--docs 120000] [--files 8] [--modes stateful,join]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

WORDS = ("stream corpus dedup shingle signature band bucket spark arrow "
         "window rollup filter spectrum wavelet gorilla lineage tier salt "
         "probe joint verdict ingest batch state store join hash slice "
         "claim table novel candidate").split()


def make_corpus(spark, path: str, n_docs: int, n_files: int,
                corpus: str = "templated"):
    """Deterministic pages, ~17 words per doc, every 8th doc a near-dup of
    its block-start doc (same body + one extra word). Two shapes:

    - ``templated``: words from a 30-word vocabulary — tiny shingle space,
      so band signatures collide heavily (boilerplate-like corpus, FEW hot
      buckets: the friendly case for the stateful op's per-group dispatch).
    - ``diverse``: words are 8-hex-char hashes — essentially unique
      shingles per doc, so buckets ≈ docs × bands (the realistic web-crawl
      case, where per-group Python dispatch is the ceiling).
    """
    base_id = (F.col("id") - F.pmod(F.col("id"), F.lit(8)))
    key = F.when(F.pmod(F.col("id"), 8) == 7, base_id).otherwise(F.col("id"))
    if corpus == "diverse":
        def word(key_expr):
            return F.format_string(
                "%08x", F.pmod(F.xxhash64(key_expr), F.lit(1 << 32)))
    else:
        words_arr = F.array(*[F.lit(w) for w in WORDS])

        def word(key_expr):
            return F.element_at(
                words_arr,
                (F.pmod(F.xxhash64(key_expr), F.lit(len(WORDS)))
                 + F.lit(1)).cast("int"))
    body = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(1), F.lit(17)),
        lambda i: word(key * F.lit(131) + i.cast("long"))))
    text = F.when(
        F.pmod(F.col("id"), 8) == 7,
        F.concat(body, F.lit(" "), word(F.col("id")))
    ).otherwise(body)
    (spark.range(n_docs)
     .select(F.format_string("d%09d", F.col("id")).alias("doc_id"),
             text.alias("text"))
     .repartition(n_files)
     .write.mode("overwrite").parquet(path))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=120_000)
    ap.add_argument("--files", type=int, default=8)
    ap.add_argument("--max-files-per-trigger", type=int, default=2)
    ap.add_argument("--modes", default="stateful,join")
    ap.add_argument("--corpus", choices=("templated", "diverse"),
                    default="templated")
    args = ap.parse_args()

    from ezmsg_sigproc_spark.session import get_spark
    from ezmsg_sigproc_spark.streaming.dedup_stream import (
        streaming_minhash_dedup, streaming_minhash_join)

    spark = get_spark(app_name="bench_minhash_stream")
    work = tempfile.mkdtemp(prefix="mh_stream_")
    out = {"docs": args.docs, "files": args.files, "corpus": args.corpus,
           "cpus": os.environ.get("SPARK_GRAFT_CPUS", "")}
    try:
        src = os.path.join(work, "src")
        make_corpus(spark, src, args.docs, args.files, corpus=args.corpus)

        def source():
            return (spark.readStream
                    .schema("doc_id string, text string")
                    .option("maxFilesPerTrigger", args.max_files_per_trigger)
                    .parquet(src))

        for mode in args.modes.split(","):
            spark.sparkContext.setJobDescription(f"minhash-stream:{mode}")
            root = os.path.join(work, mode)
            t0 = time.monotonic()
            if mode == "stateful":
                q = (streaming_minhash_dedup(source())
                     .writeStream.format("parquet")
                     .option("path", os.path.join(root, "cands"))
                     .option("checkpointLocation", os.path.join(root, "ck"))
                     .trigger(availableNow=True).start())
            elif mode == "join":
                q = (streaming_minhash_join(
                        source(), os.path.join(root, "cands"),
                        os.path.join(root, "state"))
                     .option("checkpointLocation", os.path.join(root, "ck"))
                     .trigger(availableNow=True).start())
            else:
                raise SystemExit(f"unknown mode {mode}")
            ok = q.awaitTermination(3600)
            wall = round(time.monotonic() - t0, 1)
            if not ok:
                raise SystemExit(f"{mode} failed to drain in 3600 s")
            n_cand = spark.read.parquet(os.path.join(root, "cands")).count()
            out[mode] = {"wall_s": wall,
                         "docs_per_sec": round(args.docs / wall, 1),
                         "candidate_rows": n_cand}
            spark.sparkContext.setJobDescription(None)
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
