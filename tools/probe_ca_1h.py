"""Phase probe for the ca_store_write 1h derivation (guide §1.4).

Times, in one warm JVM, the pieces of write_tier("1h", rollup_next(read_tier("1m"))):
  a. Spark scan of the 720-file 1m tier (noop-equivalent agg count)
  b. rollup_next aggregation over that scan (noop sink)
  c. the full write_tier call (shuffle + mapInArrow bucket writer)
plus a pyarrow-threaded read of the same 720 files for an I/O floor reference.
Diagnostic only — bench.py is frozen and unaffected.
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ezmsg_sigproc_spark import entry_queries
from ezmsg_sigproc_spark.plans.rollup_tiers import (
    RollupStore, rollup_base, rollup_next)
from ezmsg_sigproc_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    spark = get_spark()
    ev = entry_queries._events(spark, SF_DIR).select(
        F.col("user_id").cast("string").alias("url"), "ts", "value")
    root = tempfile.mkdtemp(prefix="probe_ca_")
    try:
        store = RollupStore(spark, root)
        t0 = time.monotonic()
        store.write_tier("1m", rollup_base(ev, 60), resume=False)
        t_w1m = time.monotonic() - t0
        print(f"w1m total        : {t_w1m:.3f}  phases={store.last_write_phases['1m']}")

        tier_dir = os.path.join(root, "tier=1m")
        nfiles = sum(len(fs) for _, _, fs in os.walk(tier_dir))
        print(f"1m tier files    : {nfiles}")

        for rep in range(3):
            # a. bare scan cost
            t0 = time.monotonic()
            store.read_tier("1m").write.format("noop").mode("overwrite").save()
            t_scan = time.monotonic() - t0
            # b. scan + rollup_next agg
            t0 = time.monotonic()
            rollup_next(store.read_tier("1m").drop("ts_bucket"), 60) \
                .write.format("noop").mode("overwrite").save()
            t_agg = time.monotonic() - t0
            # c. full write_tier (fresh store root each rep for the 1h tier)
            sub = tempfile.mkdtemp(prefix="probe_ca1h_")
            try:
                st2 = RollupStore(spark, sub)
                # reuse the SAME 1m tier dir by symlinking it in
                os.rmdir(sub)
                os.makedirs(sub)
                os.symlink(tier_dir, os.path.join(sub, "tier=1m"))
                t0 = time.monotonic()
                st2.write_tier(
                    "1h", rollup_next(st2.read_tier("1m").drop("ts_bucket"), 60),
                    resume=False)
                t_w1h = time.monotonic() - t0
                ph = st2.last_write_phases["1h"]
            finally:
                shutil.rmtree(sub, ignore_errors=True)
            print(f"rep{rep}: scan={t_scan:.3f}  scan+agg={t_agg:.3f}  "
                  f"w1h={t_w1h:.3f}  phases={ph}")

        # pyarrow floor: threaded read of the same files
        import pyarrow.dataset as ds
        for rep in range(2):
            t0 = time.monotonic()
            tbl = ds.dataset(tier_dir, format="parquet", partitioning="hive").to_table()
            t_pa = time.monotonic() - t0
            print(f"pyarrow read     : {t_pa:.3f}  rows={tbl.num_rows}")
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
