"""Training-data pipeline ops: dedup, similarity, text analysis, multimodal."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ezmsg_sigproc_spark.functions.textops import (
    fingerprint,
    lang_id,
    quality_score,
    whitespace_token_count,
    word_token_count,
)
from ezmsg_sigproc_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash16,
)
from ezmsg_sigproc_spark.operators.multimodal import decode_media_meta
from ezmsg_sigproc_spark.operators.similarity import cosine_topk, cosine_topk_lsh


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away home"
    rows = [
        (0, base, "en"),
        (1, base, "en"),                      # exact dup of 0
        (2, base.replace("lazy", "sleepy"), "en"),  # near dup
        (3, "der hund und die katze sind nicht der gleiche tier ist das", "de"),
        (4, "le chat et le chien sont les animaux des maisons", "fr"),
        (5, "completely different content about spacecraft telemetry systems", "en"),
        (6, "", "en"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))


def test_exact_dedup(docs):
    out = exact_dedup_groups(docs).collect()
    assert len(out) == 1
    assert out[0]["n_docs"] == 2 and out[0]["keep_id"] == 0


def test_minhash_finds_near_dups(docs):
    pairs = minhash_lsh_candidates(docs, k=5, n_hashes=8, bands=4).toPandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    assert (0, 1) in got  # exact dups always collide
    # near dup (0,2) collides with high probability given 4 bands of 2
    assert (0, 5) not in got and (0, 3) not in got


def test_jaccard_values(docs, spark):
    cand = spark.createDataFrame(pd.DataFrame({"id_a": [0, 0], "id_b": [1, 5]}))
    out = ngram_jaccard_pairs(docs, cand, k=5).toPandas().set_index("id_b")
    assert out.loc[1, "jaccard"] == pytest.approx(1.0)
    # zero-overlap pairs are absent (sparse representation: jaccard 0)
    assert 5 not in out.index or out.loc[5, "jaccard"] < 0.1


def test_simhash_close_for_near_dups(docs):
    sim = {r["id"]: r["simhash"] for r in simhash16(docs).collect()}
    assert sim[0] == sim[1]
    ham_near = bin(sim[0] ^ sim[2]).count("1")
    ham_far = bin(sim[0] ^ sim[5]).count("1")
    assert ham_near < ham_far


def test_textops(docs, spark):
    out = docs.select(
        "doc_id", "lang",
        lang_id(F.col("text")).alias("pred"),
        whitespace_token_count(F.col("text")).alias("ws"),
        word_token_count(F.col("text")).alias("bpe"),
        quality_score(F.col("text")).alias("q"),
        fingerprint(F.col("text")).alias("fp"),
    ).toPandas().set_index("doc_id")
    assert out.loc[0, "pred"] == "en"
    assert out.loc[3, "pred"] == "de"
    assert out.loc[4, "pred"] == "fr"
    assert out.loc[6, "pred"] == "und"
    assert out.loc[0, "ws"] == 14
    assert out.loc[6, "ws"] == 0
    assert out.loc[0, "fp"] == out.loc[1, "fp"]
    assert 0.0 <= out.loc[0, "q"] <= 1.0


def test_cosine_topk_exact(spark):
    vecs = np.eye(4).tolist() + [[0.9, 0.1, 0.0, 0.0]]
    pdf = pd.DataFrame({"vec_id": range(5), "embedding": vecs})
    df = spark.createDataFrame(pdf)
    probes = df.filter(F.col("vec_id") == 0)
    out = cosine_topk(df, probes, k=2).toPandas().sort_values("rank")
    assert out.iloc[0]["neighbor_id"] == 4  # closest to e0
    assert out.iloc[0]["cos_sim"] == pytest.approx(0.9 / np.hypot(0.9, 0.1))


def test_lsh_topk_is_subset_of_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    probes = emb.filter(F.col("vec_id") < 3)
    exact = cosine_topk(emb, probes, k=5).toPandas()
    approx = cosine_topk_lsh(emb, probes, k=5, n_planes=4).toPandas()
    # every LSH result is a genuine (probe, neighbor, sim) tuple from the
    # exact scoring (sims must agree where pairs coincide)
    m = approx.merge(exact, on=["probe_id", "neighbor_id"], suffixes=("_a", "_e"))
    if len(m):
        np.testing.assert_allclose(m["cos_sim_a"], m["cos_sim_e"], rtol=1e-9)


def test_multimodal_decode_plumbing(spark):
    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [b"abc", b"defghij"]})
    df = spark.createDataFrame(pdf)
    out = decode_media_meta(df, binary_col="payload", keep_cols=("doc_id",)).toPandas()
    assert list(out.columns) == ["doc_id", "width", "height", "format", "n_bytes"]
    assert out["n_bytes"].tolist() == [3, 7]
    assert out["width"].between(1, 64).all()
    assert set(out["format"]) <= {"png", "jpeg", "webp", "gif"}
    # deterministic
    out2 = decode_media_meta(df, binary_col="payload", keep_cols=("doc_id",)).toPandas()
    pd.testing.assert_frame_equal(out, out2)


def test_ivf_recall_against_exact(spark, sf_dir):
    from ezmsg_sigproc_spark.operators.similarity import cosine_topk_ivf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    probes = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, probes, k=5).toPandas()
    ivf = cosine_topk_ivf(emb, probes, k=5, n_cells=8, n_probe_cells=3).toPandas()
    ex = set(map(tuple, exact[["probe_id", "neighbor_id"]].to_numpy()))
    iv = set(map(tuple, ivf[["probe_id", "neighbor_id"]].to_numpy()))
    recall = len(ex & iv) / len(ex)
    assert recall >= 0.5, recall  # labeled clusters in the fixture favor IVF
    # scored sims agree exactly where pairs coincide
    m = ivf.merge(exact, on=["probe_id", "neighbor_id"], suffixes=("_i", "_e"))
    np.testing.assert_allclose(m["cos_sim_i"], m["cos_sim_e"], rtol=1e-9)


def test_as_array_and_materialize(spark):
    """§2.4 AsArray/Materialize analogs: cast changes the column dtype and
    nothing else; materialize returns an equal, cached frame."""
    import pandas as pd

    from ezmsg_sigproc_spark.operators.select import as_array, materialize

    df = spark.createDataFrame(pd.DataFrame(
        {"key": ["a", "b"], "value": [1, 2]}))
    cast = as_array(df, "value", "double")
    assert dict(cast.dtypes)["value"] == "double"
    assert [r.value for r in cast.orderBy("key").collect()] == [1.0, 2.0]

    mat = materialize(cast)
    assert mat.is_cached
    assert mat.exceptAll(cast).count() == 0 and cast.exceptAll(mat).count() == 0
    mat.unpersist()
