"""Streaming deduplication via ``applyInPandasWithState``.

Batch dedup (operators/dedup.py) answers "which of these 10^12 documents
duplicate each other"; a TRAINING-DATA INGEST pipeline also needs the online
form — "is this arriving document a duplicate of anything seen so far" —
without re-scanning the corpus per micro-batch. Both operators here keep
O(1) state per key in Spark's checkpointed state store (RocksDB-backed on a
real cluster), so the working set scales with DISTINCT content, not stream
length, and survives restarts exactly like the reference's carried operator
state (the same contract streaming_ewma pins for scalers).

Two tiers, mirroring the batch module:

- :func:`streaming_exact_dedup` — content-hash identity. State key =
  sha2(normalized text); value = (first doc_id, count). The first arrival
  is emitted ``is_dup=false``, every later arrival ``is_dup=true`` with
  ``dup_of`` pointing at the first. Chunk/micro-batch split never changes
  the outcome (same-batch and cross-batch duplicates take the same path).

- :func:`streaming_minhash_dedup` — near-duplicate candidates by MinHash
  LSH banding, the SAME hash family and band packing as the batch
  ``minhash_signatures``/``minhash_lsh_candidates`` (md5 32-bit hex slices
  → bigint; per-band injective 2×32-bit affine pack), pinned by a
  streaming-vs-batch parity test. State key = (band_id, band_sig) bucket;
  value = the bucket's FIRST doc id + its full 8-hash signature, so a hit
  emits ``jaccard_est`` (fraction of agreeing minhashes — the standard
  MinHash Jaccard estimator) that callers threshold. One candidate row per
  matching band; reduce to a per-doc verdict with
  :func:`reduce_candidates` inside ``foreachBatch`` (all of one doc's band
  hits surface in the same trigger, so the reduction is per-batch local
  and needs no second stateful stage).

Scale notes (100 TB ingest): the exact state carries ~50 B per distinct
document; the LSH state ~90 B per distinct band bucket (buckets ≈ docs ×
bands). Both shard by Spark's state-store partitioning on the group key —
content hashes and band signatures are uniform by construction, so no salt
is needed (contrast the hot-URL rollup path). Set
``spark.sql.streaming.stateStore.providerClass`` to RocksDB and a
watermark/TTL policy appropriate to the corpus retention window when the
distinct set outgrows executor memory.

Throughput ceiling, measured (see jobs/stream_ingest_job.py and
BASELINE.md): every applyInPandasWithState op pays one PYTHON function
invocation per GROUP per batch — ~6k docs/s at local[32] on 900k distinct
content hashes, and the state-store provider is irrelevant to it. When
per-dup attribution is not required, prefer the JVM ``dropDuplicates`` /
``dropDuplicatesWithinWatermark`` path (ingest job ``--dedup-mode drop``,
measured 7.6× end-to-end); run the LSH near-dup as the BATCH operator on
periodic snapshots when bucket counts reach ingest scale.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_exact_dedup(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ttl_seconds: float | None = None,
    event_ts_col: str | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Online exact dedup: one output row per input doc with ``is_dup`` and
    ``dup_of`` (empty string for originals). State per distinct content hash
    = (first_id, n_seen).

    ``ttl_seconds`` + ``event_ts_col``: optional retention window — a
    content hash whose last arrival is older than the stream's EVENT-TIME
    watermark by more than the TTL is evicted from the state store, so the
    working set tracks the active corpus window instead of growing forever;
    a re-arrival after eviction is a new original (the standard windowed-
    dedup trade-off). Event-time (not processing-time) timeouts on purpose:
    retention windows are about CORPUS time, they replay deterministically
    from a checkpoint, and — mechanically — a processing-time timeout keeps
    scheduling wake-up batches forever, so `Trigger.AvailableNow` backfill
    jobs would never terminate (measured: the query idles at 'Writing
    offsets to log' indefinitely)."""
    use_ttl = ttl_seconds is not None
    if use_ttl:
        if event_ts_col is None:
            raise ValueError("ttl_seconds requires event_ts_col (event-time TTL)")
        stream = stream.withColumn(
            event_ts_col, F.col(event_ts_col).cast("timestamp")
        ).withWatermark(event_ts_col, watermark_delay)
        keyed = stream.select(
            F.col(id_col).cast("string").alias("id"),
            F.sha2(F.col(text_col), 256).alias("content_h"),
            F.col(event_ts_col).alias("evt"),
        )
    else:
        keyed = stream.select(
            F.col(id_col).cast("string").alias("id"),
            F.sha2(F.col(text_col), 256).alias("content_h"),
        )
    ttl_ms = int((ttl_seconds or 0) * 1000)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if use_ttl and state.hasTimedOut:
            state.remove()
            return
        # None (not string truthiness) marks an unclaimed bucket, tied to
        # state.exists: an empty-string doc id is a legal claimant (ADVICE
        # r6 — `if not first_id` let ''-id documents through undeduplicated)
        first_id, n_seen = state.get if state.exists else (None, 0)
        max_evt_ms = 0
        # concatenate the group's Arrow chunks BEFORE sorting: a group can
        # arrive split across chunks, and a per-chunk sort would make the
        # "smallest id wins" tie-break depend on the Arrow batch size
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                "id", kind="mergesort").reset_index(drop=True)
            ids = pdf["id"].tolist()
            if use_ttl:
                max_evt_ms = int(pdf["evt"].max().value // 1_000_000)
            dup_of, is_dup = [], []
            for i in ids:
                if first_id is None:
                    first_id = i
                    dup_of.append("")
                    is_dup.append(False)
                elif i == first_id:
                    dup_of.append("")
                    is_dup.append(False)
                else:
                    dup_of.append(first_id)
                    is_dup.append(True)
            n_seen += len(ids)
            yield pd.DataFrame({
                "id": ids,
                "content_h": pdf["content_h"],
                "is_dup": is_dup,
                "dup_of": dup_of,
            })
        if not chunks:
            return  # no data, no timeout: leave state and deadline untouched
        state.update((str(first_id), int(n_seen)))
        if use_ttl:
            # evict once the watermark passes last-seen event time + TTL;
            # Spark requires the timestamp to sit beyond the current
            # watermark, so late stragglers clamp forward by 1 ms
            state.setTimeoutTimestamp(
                max(max_evt_ms + ttl_ms, state.getCurrentWatermarkMs() + 1))

    return keyed.groupBy("content_h").applyInPandasWithState(
        fn,
        outputStructType="id string, content_h string, is_dup boolean, dup_of string",
        stateStructType="first_id string, n_seen long",
        outputMode="append",
        timeoutConf=(GroupStateTimeout.EventTimeTimeout
                     if use_ttl else GroupStateTimeout.NoTimeout),
    )


def _minhash_rows(texts: pd.Series, k: int, n_hashes: int) -> list[list[int] | None]:
    """Per-row MinHash signatures, bit-identical to the batch
    ``minhash_signatures`` (operators/dedup.py:66): distinct character
    k-shingles, hash family = 8-hex-char slices of md5(shingle) and
    md5('#'+shingle) read as integers, min per slice. ``None`` for rows
    shorter than ``k`` (the batch path filters those out).

    REFERENCE implementation — the production streaming path computes the
    same family with JVM column expressions (see
    :func:`streaming_minhash_dedup`); the parity tests pin this Python
    formulation against both the batch operator and the streaming output."""
    out: list[list[int] | None] = []
    for t in texts:
        t = t if isinstance(t, str) else ""
        if len(t) < k:
            out.append(None)
            continue
        mins = [None] * n_hashes
        for s in {t[i: i + k] for i in range(len(t) - k + 1)}:
            h1 = hashlib.md5(s.encode()).hexdigest()
            h2 = hashlib.md5(("#" + s).encode()).hexdigest()
            for j in range(n_hashes):
                src = h1 if j < 4 else h2
                v = int(src[(j % 4) * 8: (j % 4) * 8 + 8], 16)
                if mins[j] is None or v < mins[j]:
                    mins[j] = v
        out.append(mins)
    return out


def _band_pack(sig: list[int], b: int, rows_per_band: int) -> int:
    """Injective per-band pack, identical to the batch ``band_sig``:
    (first − 2³¹)·2³² + second for 2-row bands, else the single hash."""
    first = sig[b * rows_per_band]
    if rows_per_band == 1:
        return first
    return (first - 2147483648) * 4294967296 + sig[b * rows_per_band + 1]


def streaming_minhash_dedup(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_hashes: int = 8,
    bands: int = 4,
    ttl_seconds: float | None = None,
    event_ts_col: str | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Online near-dup candidates: emits one row per (arriving doc, matching
    band bucket) with the bucket's first-seen doc and the signature-agreement
    Jaccard estimate. Docs that match no seen bucket emit nothing (callers
    treat absence as "novel" per batch — see :func:`reduce_candidates`).
    ``ttl_seconds`` + ``event_ts_col``: optional per-bucket retention window
    (same event-time eviction semantics and rationale as
    :func:`streaming_exact_dedup`).

    The signature is computed STATELESSLY per row with JVM column
    expressions (md5/substring/array_min higher-order functions — no Python
    before the stateful stage); the only stateful exchange carries
    (band_id, band_sig, id, signature) ≈ 90 B per band row.
    """
    rows_per_band = n_hashes // bands
    if rows_per_band > 2:
        raise ValueError("band packing supports at most 2 32-bit rows per band")
    use_ttl = ttl_seconds is not None
    if use_ttl and event_ts_col is None:
        raise ValueError("ttl_seconds requires event_ts_col (event-time TTL)")
    ttl_ms = int((ttl_seconds or 0) * 1000)

    # Band rows are pure COLUMN EXPRESSIONS (VERDICT r6: the old path ran
    # hashlib.md5 twice per shingle per doc inside mapInPandas — a Python
    # ceiling that bound ingest-rate near-dup before the stateful stage
    # did). Same hash family as the batch minhash_signatures (md5 hex
    # slices → bigint, per-band affine pack; parity pytest-pinned); the
    # batch module's explode+groupBy(min) shape is NOT available here — a
    # streaming aggregate cannot feed applyInPandasWithState — so the min
    # runs per ROW over the shingle array with higher-order functions:
    # stateless, streaming-compatible, entirely JVM. Python now enters only
    # at the stateful bucket stage.
    t = F.col(text_col)
    shingles = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.length(t) - F.lit(k - 1)),
        lambda i: F.substring(t, i, k)))
    h1 = F.transform(shingles, F.md5)
    h2 = F.transform(shingles, lambda s: F.md5(F.concat(F.lit("#"), s)))
    m_cols = [
        F.conv(F.array_min(F.transform(
            h1 if j < 4 else h2, lambda x: x.substr((j % 4) * 8 + 1, 8))),
            16, 10).cast("long").alias(f"m{j}")
        for j in range(n_hashes)
    ]

    def band_sig(b: int):
        first = F.col(f"m{b * rows_per_band}")
        if rows_per_band == 1:
            return first
        return (first - F.lit(2147483648)) * F.lit(4294967296) + F.col(
            f"m{b * rows_per_band + 1}")

    cols = [F.col(id_col).cast("string").alias("id")]
    if use_ttl:
        stream = stream.withColumn(
            event_ts_col, F.col(event_ts_col).cast("timestamp"))
        cols.append(F.col(event_ts_col).alias("evt"))
    sig_rows = (stream
                .filter(F.length(t) >= k)  # the batch path's short-row filter
                .select(*cols, *m_cols))
    band_rows = sig_rows.select(
        "id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_id"), band_sig(b).alias("band_sig"))
            for b in range(bands)
        ])).alias("band"),
        F.array(*[F.col(f"m{j}") for j in range(n_hashes)]).alias("sig"),
        *(["evt"] if use_ttl else []),
    ).select("id", "band.band_id", "band.band_sig", "sig",
             *(["evt"] if use_ttl else []))
    if use_ttl:
        band_rows = band_rows.withWatermark("evt", watermark_delay)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if use_ttl and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            st = state.get
            first_id, first_sig = st[0], list(st[1:])
        else:
            # None sentinel (not string truthiness): '' is a legal doc id
            first_id, first_sig = None, None
        max_evt_ms = 0
        # concat-then-sort for the same chunk-split determinism reason as
        # streaming_exact_dedup
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                "id", kind="mergesort").reset_index(drop=True)
            if use_ttl:
                max_evt_ms = int(pdf["evt"].max().value // 1_000_000)
            out_id, out_first, out_j = [], [], []
            for i, sig in zip(pdf["id"], pdf["sig"]):
                sig = list(sig)
                if first_id is None:
                    first_id, first_sig = i, sig
                    continue
                if i == first_id:
                    continue
                agree = sum(a == b for a, b in zip(sig, first_sig))
                out_id.append(i)
                out_first.append(first_id)
                out_j.append(agree / float(len(first_sig)))
            yield pd.DataFrame({
                "id": out_id,
                "band_id": [key[0]] * len(out_id),
                "first_id": out_first,
                "jaccard_est": out_j,
            })
        if not chunks:
            return  # no data, no timeout: leave state and deadline untouched
        if first_id is not None:
            state.update((str(first_id), *[int(x) for x in first_sig]))
            if use_ttl:
                state.setTimeoutTimestamp(
                    max(max_evt_ms + ttl_ms,
                        state.getCurrentWatermarkMs() + 1))

    state_schema = "first_id string, " + ", ".join(
        f"s{j} long" for j in range(n_hashes))
    return band_rows.groupBy("band_id", "band_sig").applyInPandasWithState(
        fn,
        outputStructType=("id string, band_id int, first_id string, "
                          "jaccard_est double"),
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(GroupStateTimeout.EventTimeTimeout
                     if use_ttl else GroupStateTimeout.NoTimeout),
    )


def reduce_candidates(pdf: pd.DataFrame, threshold: float = 0.5) -> pd.DataFrame:
    """Per-batch reduction of candidate rows to one verdict per doc: the
    best (highest jaccard_est) seen first-doc, dup iff it clears
    ``threshold``. Use inside ``foreachBatch`` — one doc's band hits all
    land in the same trigger, so this needs no second stateful stage."""
    if pdf.empty:
        return pd.DataFrame(columns=["id", "dup_of", "jaccard_est", "is_dup"])
    best = (pdf.sort_values(["jaccard_est", "first_id"],
                            ascending=[False, True], kind="mergesort")
            .groupby("id", as_index=False).first())
    best = best[["id", "first_id", "jaccard_est"]].rename(
        columns={"first_id": "dup_of"})
    best["is_dup"] = best["jaccard_est"] >= threshold
    return best
