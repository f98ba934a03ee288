

def test_kcore_matches_networkx_free_reference(spark):
    """k_core survivors equal an exhaustive pure-python peel on a graph
    with a planted 4-clique + pendant chain (the chain must fully peel,
    the clique must survive)."""
    from deepcell_data_engineering_spark.functions.graph import k_core

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # 4-clique
             (4, 5), (5, 6), (6, 7),                          # pendant chain
             (8, 9)]                                          # isolated edge
    df = spark.createDataFrame(edges, "u long, v long")
    got = sorted(map(tuple, k_core(df, k=3, max_peels=10).collect()))

    es = {tuple(sorted(e)) for e in edges}
    while True:
        deg = {}
        for u, v in es:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, d in deg.items() if d >= 3}
        nes = {(u, v) for u, v in es if u in keep and v in keep}
        if nes == es:
            break
        es = nes
    assert got == sorted(es)
    assert got == [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]


def test_kcore_converged_graph_is_fixed_point(spark):
    from deepcell_data_engineering_spark.functions.graph import k_core

    edges = [(1, 2), (1, 3), (2, 3)]  # triangle: a 2-core
    df = spark.createDataFrame(edges, "u long, v long")
    assert sorted(map(tuple, k_core(df, k=2, max_peels=1).collect())) == sorted(
        map(tuple, k_core(df, k=2, max_peels=6).collect())
    )
