"""bench.py contract: every timed key must resolve to a callable and
the output schema fields the round driver reads must stay present."""


def test_bench_keys_resolve():
    import bench as B
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    queries.update(B._extra_queries())
    missing = [n for n in B.HEADLINE + B.NEW_QUERIES if n not in queries]
    assert not missing, f"bench keys with no callable: {missing}"
    assert len(set(B.HEADLINE)) == len(B.HEADLINE)
    assert len(set(B.NEW_QUERIES)) == len(B.NEW_QUERIES)
    assert not set(B.HEADLINE) & set(B.NEW_QUERIES)


def test_bench_calibration_functions_exist():
    import bench as B

    assert callable(B._calibration_run)
    assert callable(B._parallel_calibration_run)
