"""Driver-contract smoke: entry() runs and returns rows; every oracle key has
a query; a sample of queries returns stable schemas at sf0.001."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod


def test_oracle_keys_subset_of_queries():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    # the driver's correctness sweep covers at most 50 registered queries;
    # suites keep the registry inside that cap with full operator coverage
    assert 40 <= len(qs) <= 50  # 50 registered in round 2 — exactly the cap
    # EVERY registered query carries an oracle (SQL twin, inline numpy
    # fixture, or bound check) — no rows-only entries remain
    assert set(oracles) == set(qs)


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert {"user_id", "bin_m", "n", "min", "max", "mean"} <= set(df.columns)


def test_queries_have_unique_column_names(spark, sf_dir):
    # duplicated output names would break the driver's schema/value compare
    for name, fn in list(entry_mod.queries().items()):
        if name in ("dedup_minhash_lsh", "dedup_ngram_jaccard"):
            continue  # exercised in verify harness; heavy
        df = fn(spark, sf_dir)
        assert len(df.columns) == len(set(df.columns)), name
