

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


def test_label_propagation_matches_pure_python(spark):
    """Fixed-round min-label propagation equals an exhaustive pure-
    python simulation: a clique collapses in one round, a long chain
    only spreads the min r hops per r rounds (NOT fully merged — the
    bounded-budget property that distinguishes it from CC)."""
    from deepcell_data_engineering_spark.functions.graph import (
        label_propagation,
    )

    edges = [(1, 2), (1, 3), (2, 3),              # triangle
             (10, 11), (11, 12), (12, 13), (13, 14)]  # 5-chain
    df = spark.createDataFrame(edges, "u long, v long")

    def simulate(rounds):
        nodes = {n for e in edges for n in e}
        lbl = {n: n for n in nodes}
        adj = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        for _ in range(rounds):
            lbl = {
                n: min([lbl[n]] + [lbl[m] for m in adj[n]]) for n in nodes
            }
        return sorted(lbl.items())

    for rounds in (1, 2, 3):
        got = sorted(
            map(tuple, label_propagation(df, rounds=rounds).collect())
        )
        assert got == simulate(rounds), rounds
    # after 2 rounds the chain is NOT fully merged (node 14 still > 10)
    two = dict(simulate(2))
    assert two[14] == 12 and two[10] == 10
