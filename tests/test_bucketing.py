"""Plan contracts for bucketed co-located joins (operators/bucketing.py).

Bucketing must never change RESULTS (the oracle covers that); these tests
pin what it changes: the PLAN.  A join of two tables bucketed+sorted on
the join key must run with zero Exchange and zero Sort on either side,
and an equality filter on the bucket key must prune the scan to one
bucket — the guarantees that make the layout worth paying for at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_bigtable_spark.operators.bucketing import (
    bucketed_table,
    write_bucketed_table,
)
from datafusion_bigtable_spark.queries import load


@pytest.fixture()
def pair(spark, sf_dir, tmp_path):
    write_bucketed_table(
        load(spark, str(sf_dir), "customer").select("c_custkey", "c_mktsegment"),
        "t_bucket_cust",
        str(tmp_path / "cust"),
        ["c_custkey"],
        8,
        sort_cols=["c_custkey"],
    )
    write_bucketed_table(
        load(spark, str(sf_dir), "orders").select("o_custkey", "o_totalprice"),
        "t_bucket_ord",
        str(tmp_path / "ord"),
        ["o_custkey"],
        8,
        sort_cols=["o_custkey"],
    )
    yield bucketed_table(spark, "t_bucket_cust"), bucketed_table(spark, "t_bucket_ord")
    spark.sql("DROP TABLE IF EXISTS t_bucket_cust")
    spark.sql("DROP TABLE IF EXISTS t_bucket_ord")


def _executed_plan(df) -> str:
    # pin the FINAL AQE plan: collect first, then read executedPlan
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange_and_no_sort(spark, pair):
    cust, ords = pair
    # force the merge-join path: a broadcast would also be exchange-free
    # but would not prove co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # let the scan report the sortBy order (sound here: one file per
    # bucket, guaranteed by write_bucketed_table's pre-write repartition)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        joined = ords.join(cust, ords.o_custkey == cust.c_custkey)
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan, plan[:800]
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:1200]}"
        assert "Sort" not in plan.replace("SortMergeJoin", ""), (
            f"sorted buckets still re-sort:\n{plan[:1200]}"
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")


def test_bucketed_join_is_exchange_free_at_default_settings(spark, pair):
    # default posture (no legacy ordering flag): the shuffle is still
    # gone — the residual Sort is partition-local
    cust, ords = pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _executed_plan(ords.join(cust, ords.o_custkey == cust.c_custkey))
        assert "SortMergeJoin" in plan and "Exchange" not in plan, plan[:1200]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain_join(spark, sf_dir, pair):
    cust, ords = pair
    plain = (
        load(spark, str(sf_dir), "orders")
        .join(load(spark, str(sf_dir), "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    bucketed = (
        ords.join(cust, ords.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))


def test_bucket_pruning_on_key_equality(spark, pair):
    cust, _ = pair
    # the default planner DROPS the bucket layout when no join/aggregate
    # consumes it (autoBucketedScan) — keep it for the filter so the
    # equality prunes the scan to one bucket
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        key = cust.select(F.min("c_custkey")).first()[0]
        plan = _executed_plan(cust.filter(F.col("c_custkey") == int(key)))
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan[:1200]
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")


def test_path_read_does_not_get_the_bucket_guarantee(spark, pair, tmp_path):
    # documented sharp edge: reading the same bytes by PATH loses the
    # bucket spec — the catalog read is the contract
    cust, _ = pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        by_path = spark.read.parquet(str(tmp_path / "cust"))
        joined = by_path.join(cust, by_path.c_custkey == cust.c_custkey)
        assert "Exchange" in _executed_plan(joined)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_on_key_has_no_exchange(spark, pair):
    # the layout's second dividend: groupBy on the bucket key aggregates
    # partial+final in one stage — the bucketed scan already satisfies
    # hashpartitioning(key)
    _, ords = pair
    agg = ords.groupBy("o_custkey").agg(F.count("*").alias("n"))
    plan = _executed_plan(agg)
    assert "HashAggregate" in plan, plan[:800]
    assert "Exchange" not in plan, f"bucketed groupBy still shuffles:\n{plan[:1200]}"


def test_agg_query_reuses_shared_family_and_stays_exchange_free(spark, sf_dir):
    """VERDICT r14 #7: bucketed_agg_order_stats now rides the SHARED
    custkey family instead of re-paying a private bucketed write per
    invocation.  Pins: (a) the plan is still zero-Exchange, (b) a second
    run rewrites NO fixture files (write-once), (c) the retired private
    family ('dbs_bucket_aggord_*' catalog entries, '/tmp/dbs_bucketagg_*'
    dirs) is swept."""
    import glob
    import os

    from datafusion_bigtable_spark import queries as q

    # plant a retired-family leftover the migrated query must clean up
    os.makedirs("/tmp/dbs_bucketagg_leftover", exist_ok=True)
    df = q.REGISTRY["bucketed_agg_order_stats"].fn(spark, str(sf_dir))
    plan = _executed_plan(df).split("== Initial Plan ==")[0]
    assert "HashAggregate" in plan, plan[:800]
    assert "Exchange" not in plan, f"bucketed groupBy still shuffles:\n{plan[:1200]}"
    assert not glob.glob("/tmp/dbs_bucketagg_*"), "retired family dirs not swept"
    # write-once: the second run touches no fixture file
    [ordtbl] = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("dbs_bucketfix_orders_")
        and "o_custkey"
        in {c.name for c in spark.catalog.listColumns(t.name)}
    ]
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {ordtbl}")
        .filter(F.col("col_name") == "Location")
        .first()["data_type"]
    ).replace("file:", "")
    before = {f: os.path.getmtime(os.path.join(loc, f)) for f in os.listdir(loc)}
    q.REGISTRY["bucketed_agg_order_stats"].fn(spark, str(sf_dir)).collect()
    after = {f: os.path.getmtime(os.path.join(loc, f)) for f in os.listdir(loc)}
    assert before == after, "second run rewrote the shared fixture"


def test_describe_failure_is_loud_and_still_drops_table(spark):
    """VERDICT r14 #8: a DESCRIBE failure inside the stale-family sweep
    must not silently skip disk reclaim — the sweep still drops the
    catalog entry but WARNS with the table name so the leaked directory
    is attributable."""
    import pytest as _pytest

    from datafusion_bigtable_spark.operators.bucketing import (
        drop_stale_family_tables,
    )

    spark.sql(
        "CREATE TABLE dbs_descfail_aaaabbbbcccc (x BIGINT) USING PARQUET "
        "LOCATION '/tmp/dbs_descfail_loc'"
    )
    real_sql = spark.sql

    def failing_sql(stmt, *a, **kw):
        if stmt.startswith("DESCRIBE TABLE EXTENDED dbs_descfail_"):
            raise RuntimeError("injected DESCRIBE failure")
        return real_sql(stmt, *a, **kw)

    try:
        spark.sql = failing_sql
        with _pytest.warns(RuntimeWarning, match="dbs_descfail_aaaabbbbcccc"):
            drop_stale_family_tables(spark, "dbs_descfail_", keep="")
    finally:
        spark.sql = real_sql
    names = {t.name for t in spark.catalog.listTables()}
    assert "dbs_descfail_aaaabbbbcccc" not in names, "table not dropped"


def test_fixture_tags_route_through_frozen_tag_helper(spark, sf_dir):
    """ADVICE r14 #5: both bucketed_fixture hashes derive from the shared
    tagging module.  Byte-pin the 12-hex content tag exactly as the old
    hand-rolled idiom produced it, so the refactor can never re-key a
    fixture on disk."""
    import hashlib
    import os

    from datafusion_bigtable_spark.tagging import tag_of

    src = os.path.abspath(os.path.join(str(sf_dir), "customer.parquet"))
    st = os.stat(src)
    legacy = hashlib.md5(
        f"bfix1|{src}|{st.st_mtime_ns}|{st.st_size}|c_custkey|16".encode()
    ).hexdigest()[:12]
    assert tag_of("bfix1", src, st.st_mtime_ns, st.st_size, "c_custkey", 16) == legacy
    legacy_fam = hashlib.md5(f"{src}|customer|c_custkey".encode()).hexdigest()[:8]
    assert tag_of(src, "customer", "c_custkey", n=8) == legacy_fam


def test_bucketed_fixture_write_once_then_reuse(spark, sf_dir):
    """The fixture loader pays the bucketed write ONCE per content: the
    second call must return the registered table without rewriting."""
    import os

    from datafusion_bigtable_spark.operators.bucketing import bucketed_fixture

    df1 = bucketed_fixture(spark, str(sf_dir), "customer", ["c_custkey"])
    [(tbl,)] = [
        (t.name,)
        for t in spark.catalog.listTables()
        if t.name.startswith("dbs_bucketfix_customer_")
    ]
    # capture backing files + mtimes, call again, nothing moved
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}")
        .filter(F.col("col_name") == "Location")
        .first()["data_type"]
    ).replace("file:", "")
    before = {f: os.path.getmtime(os.path.join(loc, f)) for f in os.listdir(loc)}
    df2 = bucketed_fixture(spark, str(sf_dir), "customer", ["c_custkey"])
    after = {f: os.path.getmtime(os.path.join(loc, f)) for f in os.listdir(loc)}
    assert before == after, "second call rewrote the bucketed fixture"
    assert df1.count() == df2.count() == load(spark, str(sf_dir), "customer").count()


def test_q13_bucketed_fixture_join_and_first_agg_are_exchange_free(spark, sf_dir):
    """VERDICT r13 #5 done-criterion: an EXISTING multi-join registry
    query's plan loses its join Exchanges via the opt-in bucketed
    fixture loader.  q13's left join (customer⋈orders on custkey) and
    its per-customer aggregation must both run without an Exchange on
    custkey — the only shuffle left is the tiny c_count histogram."""
    from datafusion_bigtable_spark import queries as q

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = q.REGISTRY["tpch_q13_customer_distribution"].fn(spark, str(sf_dir))
        plan = _executed_plan(df)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    # AQE's toString prints the pre-optimization "Initial Plan" section
    # too — pin the FINAL plan only
    plan = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" in plan, plan[:1200]
    assert "Exchange hashpartitioning(c_custkey" not in plan, plan[:2000]
    assert "Exchange hashpartitioning(o_custkey" not in plan, plan[:2000]
    # exactly one shuffle survives: the final histogram on c_count
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1 and "Exchange hashpartitioning(c_count" in plan, plan[:2000]


def test_q13_values_identical_to_plain_load(spark, sf_dir):
    """Layout must never change values: the opted-in q13 equals the plain
    parquet-load implementation row for row."""
    from datafusion_bigtable_spark import queries as q

    bucketed = q.REGISTRY["tpch_q13_customer_distribution"].fn(spark, str(sf_dir))
    c = load(spark, str(sf_dir), "customer")
    o = load(spark, str(sf_dir), "orders").filter(F.col("o_orderpriority") != "5-LOW")
    plain = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))


def test_q18_bucketed_fixture_runs_with_zero_shuffle_exchanges(spark, sf_dir):
    """Second bucketed-fixture consumer, on the orderkey layout: q18's
    lineitem⋈orders join is exchange-free, the broadcast customer join
    preserves that partitioning, and o_orderkey ∈ grouping keys lets the
    aggregation reuse it — ZERO shuffle Exchanges end-to-end (the only
    exchange is the broadcast of customer)."""
    from datafusion_bigtable_spark import queries as q

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = q.REGISTRY["tpch_q18_large_orders"].fn(spark, str(sf_dir))
        plan = _executed_plan(df).split("== Initial Plan ==")[0]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" in plan, plan[:1200]
    assert "Exchange hashpartitioning" not in plan, plan[:2000]


def test_two_layouts_of_same_table_coexist(spark, sf_dir):
    """orders bucketed on custkey (q13's layout) and on orderkey (q18's)
    are independent fixtures: materializing one must not evict the
    other from the catalog (the r13 sweep bug, scoped per (table, key))."""
    from datafusion_bigtable_spark.operators.bucketing import bucketed_fixture

    import hashlib

    bucketed_fixture(spark, str(sf_dir), "orders", ["o_custkey"])
    bucketed_fixture(spark, str(sf_dir), "orders", ["o_orderkey"])
    bucketed_fixture(spark, str(sf_dir), "orders", ["o_custkey"])  # reuse, no evict
    fams = {
        t.name.rsplit("_", 1)[0]
        for t in spark.catalog.listTables()
        if t.name.startswith("dbs_bucketfix_orders_")
    }

    def fam(cols):
        import os

        src = os.path.abspath(os.path.join(str(sf_dir), "orders.parquet"))
        return hashlib.md5(f"{src}|orders|{'|'.join(cols)}".encode()).hexdigest()[:8]

    assert fams == {
        f"dbs_bucketfix_orders_{fam(['o_custkey'])}",
        f"dbs_bucketfix_orders_{fam(['o_orderkey'])}",
    }, fams


def test_fixture_reregisters_from_surviving_files_in_fresh_session(spark, sf_dir):
    """Cross-session reuse: when the content-addressed directory survives
    but the (session-scoped) catalog entry does not, the loader must
    re-REGISTER over the existing files — no rewrite — and the re-read
    table keeps the bucket guarantee.  A directory without the _SUCCESS
    commit marker is a crashed write and is rebuilt instead."""
    import os

    from datafusion_bigtable_spark.operators.bucketing import bucketed_fixture

    bucketed_fixture(spark, str(sf_dir), "customer", ["c_custkey"])
    [tbl] = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("dbs_bucketfix_customer_")
    ]
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}")
        .filter(F.col("col_name") == "Location")
        .first()["data_type"]
    ).replace("file:", "")
    # simulate the fresh session: drop the catalog entry, keep the files
    spark.sql(f"DROP TABLE {tbl}")
    before = {f: os.path.getmtime(os.path.join(loc, f)) for f in os.listdir(loc)}
    t = bucketed_fixture(spark, str(sf_dir), "customer", ["c_custkey"])
    after = {f: os.path.getmtime(os.path.join(loc, f)) for f in os.listdir(loc)}
    assert before == after, "re-registration rewrote surviving files"
    # the re-registered table still joins exchange-free (bucket spec kept)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a, b = t.alias("a"), t.alias("b")
        j = a.join(b, F.col("a.c_custkey") == F.col("b.c_custkey"))
        plan = _executed_plan(j).split("== Initial Plan ==")[0]
        assert "Exchange" not in plan, plan[:1200]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    # crashed-write shape: no _SUCCESS -> rebuilt, registered, correct count
    spark.sql(f"DROP TABLE {tbl}")
    os.remove(os.path.join(loc, "_SUCCESS"))
    t2 = bucketed_fixture(spark, str(sf_dir), "customer", ["c_custkey"])
    assert t2.count() == load(spark, str(sf_dir), "customer").count()


def test_stale_family_sweep_reclaims_disk_and_spares_other_families(spark, sf_dir):
    """Review r14 #3/#5: the family sweep must (a) never evict a family
    whose name merely shares a string prefix, and (b) reclaim the stale
    entry's /tmp backing directory, not just its catalog slot."""
    import os
    import shutil

    from datafusion_bigtable_spark.operators.bucketing import (
        bucketed_fixture,
        drop_stale_family_tables,
        write_bucketed_table,
    )

    live = bucketed_fixture(spark, str(sf_dir), "customer", ["c_custkey"])
    [name] = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("dbs_bucketfix_customer_")
    ]
    prefix = name.rsplit("_", 1)[0] + "_"
    # (a) a longer table name sharing the prefix is NOT swept (tag-shape
    # mismatch): register a fake sibling whose suffix is not 12-hex
    fake_other = prefix + "deadbeef4242_extra"
    os.makedirs("/tmp/dbs_bucketfix_other_family", exist_ok=True)
    spark.sql(
        f"CREATE TABLE {fake_other} (x BIGINT) USING PARQUET "
        f"LOCATION '/tmp/dbs_bucketfix_other_family'"
    )
    # (b) a true stale family member (12-hex tag) IS swept, disk included
    stale_dir = "/tmp/dbs_bucketfix_stale_member"
    shutil.rmtree(stale_dir, ignore_errors=True)
    write_bucketed_table(
        live.limit(10), prefix + "aaaabbbbcccc", stale_dir, ["c_custkey"], 2
    )
    assert os.path.isdir(stale_dir)
    try:
        drop_stale_family_tables(spark, prefix, name)
        names = {t.name for t in spark.catalog.listTables()}
        assert name in names, "live member swept"
        assert fake_other in names, "prefix-sharing other family swept"
        assert prefix + "aaaabbbbcccc" not in names, "stale member survived"
        assert not os.path.isdir(stale_dir), "stale backing dir not reclaimed"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {fake_other}")
        shutil.rmtree("/tmp/dbs_bucketfix_other_family", ignore_errors=True)


def test_suggest_bucket_count_sizes_off_largest_family_member(tmp_path):
    """The count is a property of the join family: sized off the largest
    member, power of two, floored for small fixtures."""
    from datafusion_bigtable_spark.operators.bucketing import suggest_bucket_count

    small = tmp_path / "small.parquet"
    big = tmp_path / "big.parquet"
    small.write_bytes(b"x" * 1000)
    big.write_bytes(b"x" * 10_000_000)
    # tiny family: floor wins
    assert suggest_bucket_count([str(small)], minimum=16) == 16
    # 10 MB at 1 MB target -> ceil=10 -> next power of two = 16
    assert (
        suggest_bucket_count(
            [str(small), str(big)], target_bucket_bytes=1_000_000, minimum=4
        )
        == 16
    )
    # directory form: sums files recursively
    d = tmp_path / "dir.parquet"
    d.mkdir()
    (d / "part-0").write_bytes(b"x" * 3_000_000)
    (d / "part-1").write_bytes(b"x" * 3_000_000)
    assert (
        suggest_bucket_count([str(d)], target_bucket_bytes=1_000_000, minimum=4) == 8
    )
    # power-of-two families sized at different times agree
    assert suggest_bucket_count([str(big)], target_bucket_bytes=700_000, minimum=4) == 16


def test_layouts_of_same_table_across_scale_factors_coexist(spark):
    """Review r14-2 #1: the family identity includes the SOURCE PATH, so
    the same (table, key) at two scale factors is two families — loading
    one must not rmtree the other's /tmp backing or drop its catalog
    entry (the write-once-per-generation contract across sf dirs)."""
    import glob

    from datafusion_bigtable_spark.operators.bucketing import bucketed_fixture

    a = bucketed_fixture(spark, "/root/testdata/sf0.001", "customer", ["c_custkey"])
    n_a = a.count()
    dirs_a = set(glob.glob("/tmp/dbs_bucketfix_sf0.001_customer_c_custkey_*"))
    assert dirs_a
    b = bucketed_fixture(spark, "/root/testdata/sf0.01", "customer", ["c_custkey"])
    assert set(glob.glob("/tmp/dbs_bucketfix_sf0.001_customer_c_custkey_*")) == dirs_a, (
        "sf0.01 load reclaimed the sf0.001 layout as stale"
    )
    assert b.count() != n_a
    # and the sf0.001 fixture still reads (catalog entry or re-register)
    a2 = bucketed_fixture(spark, "/root/testdata/sf0.001", "customer", ["c_custkey"])
    assert a2.count() == n_a


def test_q10_bucketed_fixture_leaves_only_the_agg_exchange(spark, sf_dir):
    """Third consumer: q10 shares q18's orderkey layouts, its customer
    and nation sides are broadcast (explicit hints — they survive the
    disabled threshold), so the only shuffle left is the final
    custkey-group aggregation.  The threshold is disabled so the l⋈o
    side cannot be auto-broadcast at test scale — without it the pin
    passes even on plain loads (review r14-3 #1)."""
    from datafusion_bigtable_spark import queries as q

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = q.REGISTRY["tpch_q10_returned_items"].fn(spark, str(sf_dir))
        plan = _executed_plan(df).split("== Initial Plan ==")[0]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" in plan, plan[:1200]
    assert "Exchange hashpartitioning(l_orderkey" not in plan, plan[:2000]
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan[:2000]
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]


def test_q22_bucketed_fixture_anti_join_is_exchange_free(spark, sf_dir):
    """Fourth consumer: q22's NOT-EXISTS anti-join reads q13's custkey
    layouts, so the only shuffle left is the tiny mktsegment aggregate
    — the shape that keeps decontamination-style scans shuffle-free
    when the right side outgrows broadcast."""
    from datafusion_bigtable_spark import queries as q

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = q.REGISTRY["tpch_q22_idle_rich_customers"].fn(spark, str(sf_dir))
        plan = _executed_plan(df).split("== Initial Plan ==")[0]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    # at test SFs every rich customer has orders, so AQE may collapse
    # the whole query to EmptyRelation (0 exchanges) — the pin is that
    # NO custkey shuffle exists and at most the mktsegment agg shuffles
    assert "Exchange hashpartitioning(c_custkey" not in plan, plan[:2000]
    assert "Exchange hashpartitioning(o_custkey" not in plan, plan[:2000]
    assert plan.count("Exchange hashpartitioning") <= 1, plan[:2000]


def test_q21_bucketed_fixture_leaves_only_the_name_rollup_exchange(spark, sf_dir):
    """Fifth consumer: q21's decorrelated plan keys every join and its
    per-order aggregation on orderkey — the shared layouts run l1⋈o,
    the order-stats l⋈o + groupBy(l_orderkey), and the join-back all
    co-located, leaving only the tiny s_name rollup shuffle."""
    from datafusion_bigtable_spark import queries as q

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = q.REGISTRY["tpch_q21_waiting_suppliers"].fn(spark, str(sf_dir))
        plan = _executed_plan(df).split("== Initial Plan ==")[0]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "Exchange hashpartitioning(l_orderkey" not in plan, plan[:2000]
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan[:2000]
    assert "Exchange hashpartitioning(ok" not in plan, plan[:2000]
    assert plan.count("Exchange hashpartitioning") <= 1, plan[:2000]


def test_q4_bucketed_fixture_semi_join_is_exchange_free(spark, sf_dir):
    """Sixth consumer: q4's EXISTS semi-join keys on orderkey — the
    shared layouts run it co-located; only the priority rollup can
    shuffle."""
    from datafusion_bigtable_spark import queries as q

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = q.REGISTRY["tpch_q4_order_priority"].fn(spark, str(sf_dir))
        plan = _executed_plan(df).split("== Initial Plan ==")[0]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan[:2000]
    assert "Exchange hashpartitioning(l_orderkey" not in plan, plan[:2000]
    assert plan.count("Exchange hashpartitioning") <= 1, plan[:2000]
