"""Reference-API compatibility layer (vector_search_spark/compat.py):
a reference user's calls must work unchanged — mirrors the reference's
own unit-test behaviors (py/test_pq.py validation/round-trip/ranges,
py/test_hnsw.py self-retrieval/sorted/topK-caps)."""

from __future__ import annotations

import math

import pytest

from vector_search_spark.compat import BruteForce, HNSWIndex, ProductQuantizer


@pytest.fixture(scope="module", autouse=True)
def _session(spark):
    # compat classes grab the active session internally
    return spark


def test_bruteforce_run_search_shape_and_order():
    data = [[float(i), float(i)] for i in range(20)]
    bf = BruteForce(data)
    res = bf.RunSearch([[5.0, 5.0], [19.0, 19.0]], topk=3)
    assert len(res) == 2 and all(len(r) == 3 for r in res)
    assert res[0][0] == (0.0, 5)            # self is nearest
    assert res[1][0] == (0.0, 19)
    for r in res:
        dists = [d for d, _ in r]
        assert dists == sorted(dists)        # ascending tuples
    assert bf.L2Sqr([0.0, 0.0], [3.0, 4.0]) == 25.0


def test_pq_ctor_validation_and_untrained_errors():
    with pytest.raises(ValueError, match="must be divisible"):
        ProductQuantizer(M=3, K=4, D=8)
    pq = ProductQuantizer(M=2, K=2, D=4)
    with pytest.raises(ValueError, match="trained before encoding"):
        pq.Encode([0.0] * 4)
    with pytest.raises(ValueError, match="trained before decoding"):
        pq.Decode([0, 0])
    with pytest.raises(ValueError, match="trained before accessing"):
        pq.GetCodebooks()
    with pytest.raises(ValueError, match="cannot be empty"):
        pq.TrainPQ([])
    with pytest.raises(ValueError, match="dimension 4"):
        pq.TrainPQ([[1.0, 2.0]])


def test_pq_train_encode_decode_contracts():
    import numpy as np

    rng = np.random.default_rng(7)
    data = [[float(x) for x in row] for row in rng.standard_normal((64, 8))]
    pq = ProductQuantizer(M=4, K=4, D=8, seed=42)
    pq.TrainPQ(data)
    assert pq.trained
    code = pq.Encode(data[0])
    assert len(code) == 4 and all(0 <= c < 4 for c in code)
    rec = pq.Decode(code)
    assert len(rec) == 8
    # ADC identity: ADC(q, code) == L2Sqr(q, Decode(code))
    q = data[1]
    adc = pq.ComputeAsymmetricDistance(q, code)
    l2 = sum((a - b) ** 2 for a, b in zip(q, rec))
    assert math.isclose(adc, l2, rel_tol=1e-12)
    # SDC: symmetric, zero on identical codes
    c2 = pq.Encode(data[1])
    assert pq.ComputeSymmetricDistance(code, code) == 0.0
    assert math.isclose(
        pq.ComputeSymmetricDistance(code, c2),
        pq.ComputeSymmetricDistance(c2, code),
        rel_tol=1e-12,
    )


def test_pq_codebook_roundtrip_and_shape_validation():
    pq = ProductQuantizer(M=2, K=2, D=4)
    cbs = [
        [[0.0, 0.0], [1.0, 1.0]],
        [[2.0, 2.0], [3.0, 3.0]],
    ]
    pq.SetCodebooks(cbs)
    assert pq.trained and pq.GetCodebooks() == cbs
    # a fresh instance restored from the export behaves identically
    pq2 = ProductQuantizer(M=2, K=2, D=4)
    pq2.SetCodebooks(pq.GetCodebooks())
    assert pq2.Encode([0.9, 1.1, 2.9, 3.1]) == pq.Encode([0.9, 1.1, 2.9, 3.1])
    with pytest.raises(ValueError, match="Expected 2 codebooks"):
        pq2.SetCodebooks(cbs[:1])
    with pytest.raises(ValueError, match="centroids in codebook 0"):
        pq2.SetCodebooks([cbs[0][:1], cbs[1]])
    with pytest.raises(ValueError, match="dimension 2"):
        pq2.SetCodebooks([[[0.0], [1.0]], cbs[1]])


@pytest.mark.slow
def test_hnsw_insert_search_self_retrieval():
    import numpy as np

    rng = np.random.default_rng(11)
    pts = rng.standard_normal((60, 8))
    idx = HNSWIndex(M=8, ef_construction=32)
    for p in pts:
        idx.Insert([float(x) for x in p])
    res = idx.KNNSearch([float(x) for x in pts[17]], topK=5)
    assert len(res) == 5
    assert res[0] == (0.0, 17)              # self-nearest
    dists = [d for d, _ in res]
    assert dists == sorted(dists)
    # topK caps at dataset size
    assert len(idx.KNNSearch([0.0] * 8, topK=500)) == 60
    # empty index returns empty
    assert HNSWIndex(M=4, ef_construction=8).KNNSearch([0.0] * 8, 3) == []


@pytest.mark.slow
def test_hnsw_with_trained_compression():
    import numpy as np

    rng = np.random.default_rng(3)
    pts = rng.standard_normal((48, 8))
    pq = ProductQuantizer(M=4, K=8, D=8)
    pq.TrainPQ([[float(x) for x in p] for p in pts])
    idx = HNSWIndex(M=8, ef_construction=32, compression=pq)
    for p in pts:
        idx.Insert([float(x) for x in p])
    res = idx.KNNSearch([float(x) for x in pts[0]], topK=3)
    assert len(res) == 3
    # stored vectors are quantized: best distance equals the
    # query-to-its-own-code ADC distance (reference stores codes too)
    code = pq.Encode([float(x) for x in pts[0]])
    adc = pq.ComputeAsymmetricDistance([float(x) for x in pts[0]], code)
    assert math.isclose(res[0][0], adc, rel_tol=1e-9, abs_tol=1e-12)


def test_graph_api_matches_reference_semantics():
    from vector_search_spark.compat import Graph

    g = Graph()
    assert g.GetHeight() == 0 and g.IsLayerEmpty(0)
    g.InitLevels(2)                      # layers 0..2 now exist
    assert g.GetHeight() == 3
    assert g.IsLayerEmpty(1)             # initialized but empty
    g.AddEdge(1, 5, 7)
    g.AddEdge(1, 5, 7)                   # set semantics: no dup
    g.AddEdge(1, 5, 9)
    assert g.LayerNodeCnt(1) == 1
    assert g.LayerNodeAdjCnt(1, 5) == 2
    assert g.GetNeighbors(1, 5) == {7, 9}
    assert g.GetNeighbors(1, 99) == set()
    assert set(g.GetLayerNodes(1)) == {5}
    g.RemoveEdge(1, 5, 7)
    assert g.GetNeighbors(1, 5) == {9}
    g.RemoveEdge(1, 5, 123)              # absent edge: silent no-op
    assert g.LayerNodeCnt(0) == 0


def test_graph_bridges_to_edge_dataframe(spark):
    from vector_search_spark.compat import Graph

    g = Graph()
    g.InitLevels(1)
    g.AddEdge(0, 1, 2)
    g.AddEdge(1, 2, 3)
    df = g.to_edges_df(spark)
    assert sorted(map(tuple, df.collect())) == [(0, 1, 2), (1, 2, 3)]
    g2 = Graph.from_edges_df(df)
    assert g2.GetNeighbors(0, 1) == {2} and g2.GetNeighbors(1, 2) == {3}
    assert g2.GetHeight() == 2


def test_item_closure_paths():
    from vector_search_spark.compat import Item

    search = Item(lambda q, node: float(node) + q[0], q=[10.0])
    assert search.DistToNode(5) == 15.0
    insert = Item(lambda idx, node: float(idx * node), q=None, idx_q=3)
    assert insert.DistToNode(4) == 12.0
