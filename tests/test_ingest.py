"""Ingest + partitioned-storage tests: typed casts, dedup, directory pruning."""

import pytest
from pyspark.sql import functions as F

import hbase_gis_spark as hgs
from hbase_gis_spark.sources.ingest import (
    bulk_points,
    read_geo_table,
    write_geo_table,
)


@pytest.fixture(scope="module")
def stored(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("geo") / "points")
    df = bulk_points(spark, 5000, -74.05, -73.85, 40.60, 40.90)
    write_geo_table(df, path, prefix_len=4)
    return read_geo_table(spark, path)


def test_roundtrip_count(stored):
    assert stored.count() == 5000


def test_partition_pruning_in_plan(stored):
    wkt = (
        "POLYGON ((-73.99 40.72, -73.97 40.76, -73.93 40.74, "
        "-73.95 40.70, -73.99 40.72))"
    )
    q = hgs.within(
        stored, wkt, geohash_col="geohash", partition_prefix_col="gh_prefix"
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the partition filter must reach the scan node (directory pruning)
    assert "PartitionFilters" in plan
    assert "gh_prefix" in plan.split("PartitionFilters", 1)[1][:400]
    # and the pushed data filter on lon/lat must reach parquet
    assert "PushedFilters: [" in plan
    # correctness: pruned path == full scan path
    full = {r.id for r in hgs.within(stored, wkt).collect()}
    pruned = {r.id for r in q.collect()}
    assert pruned == full and len(full) > 0


def test_pruned_scan_reads_fewer_files(stored, spark):
    """Directory pruning must reduce the scan's file count: collect the
    'number of files read' metric from the executed scan node."""
    wkt = (
        "POLYGON ((-73.99 40.72, -73.97 40.76, -73.93 40.74, "
        "-73.95 40.70, -73.99 40.72))"
    )

    def files_read(df):
        df.collect()
        node = df._jdf.queryExecution().executedPlan()
        # walk to the leaf scan node
        while node.children().size() > 0:
            node = node.children().head()
        return node.metrics().apply("numFiles").value()

    total = files_read(stored.select("id"))
    pruned = files_read(
        hgs.within(
            stored, wkt, geohash_col="geohash",
            partition_prefix_col="gh_prefix", exact=False,
        ).select("id")
    )
    assert 0 < pruned < total


def test_taxi_cast_failures_yield_null(spark, tmp_path):
    p = tmp_path / "pts.tsv"
    p.write_text(
        "X\tY\tID\tNAME\tADDRESS\tCITY\tURL\tPHONE\tTYPE\tZIP\n"
        "-73.9\t40.7\t1\tn\ta\tc\tu\tp\tt\tz\n"
        "oops\t40.7\t2\tn\ta\tc\tu\tp\tt\tz\n"
    )
    from hbase_gis_spark.sources.ingest import ingest_points_tsv

    df = ingest_points_tsv(spark, str(p))
    rows = {r.id: (r.lon, r.geohash) for r in df.collect()}
    assert rows["2"][0] is None and rows["2"][1] is None
    assert rows["1"][1] is not None


def test_ingest_dedup_first_vs_last(spark, tmp_path):
    """Same coordinates → same geohash rowkey. dedup='first' replays
    the reference test loader (drop later duplicates); dedup='last'
    replays HBase's native Put upsert (later write wins). The two must
    diverge on a crafted duplicate-key file and both keep one row."""
    p = tmp_path / "dups.tsv"
    p.write_text(
        "X\tY\tID\tNAME\tADDRESS\tCITY\tURL\tPHONE\tTYPE\tZIP\n"
        "-73.9\t40.7\tearly\tn\ta\tc\tu\tp\tt\tz\n"
        "-73.9\t40.7\tlate\tn\ta\tc\tu\tp\tt\tz\n"
        "-73.5\t40.1\tonly\tn\ta\tc\tu\tp\tt\tz\n"
    )
    from hbase_gis_spark.sources.ingest import ingest_points_tsv

    first = {r.id for r in ingest_points_tsv(spark, str(p)).collect()}
    last = {
        r.id
        for r in ingest_points_tsv(spark, str(p), dedup="last").collect()
    }
    both = {
        r.id for r in ingest_points_tsv(spark, str(p), dedup=None).collect()
    }
    assert first == {"early", "only"}
    assert last == {"late", "only"}
    assert both == {"early", "late", "only"}
    with pytest.raises(ValueError):
        ingest_points_tsv(spark, str(p), dedup="bogus")
