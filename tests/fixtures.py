"""Shared literal graph fixtures from the reference's own tests
(FIXTURES.md §3)."""

# iprcom PageRank graph (/root/reference/examples/simple/igraph_pagerank.c:52-66)
IPRCOM_EDGES = [(0, 1), (1, 2), (2, 0), (3, 2), (0, 2)]
IPRCOM_N = 4
IPRCOM_GOLDEN_2DP = [0.37, 0.20, 0.39, 0.04]

# Zachary karate club (/root/reference/examples/simple/
# igraph_community_label_propagation.c:30-49; igraph_famous("zachary"))
ZACHARY_EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 10),
    (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21), (0, 31), (1, 2),
    (1, 3), (1, 7), (1, 13), (1, 17), (1, 19), (1, 21), (1, 30), (2, 3),
    (2, 7), (2, 8), (2, 9), (2, 13), (2, 27), (2, 28), (2, 32), (3, 7),
    (3, 12), (3, 13), (4, 6), (4, 10), (5, 6), (5, 10), (5, 16), (6, 16),
    (8, 30), (8, 32), (8, 33), (9, 33), (13, 33), (14, 32), (14, 33),
    (15, 32), (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
    (22, 32), (22, 33), (23, 25), (23, 27), (23, 29), (23, 32), (23, 33),
    (24, 25), (24, 27), (24, 31), (25, 31), (26, 29), (26, 33), (27, 33),
    (28, 31), (28, 33), (29, 32), (29, 33), (30, 32), (30, 33), (31, 32),
    (31, 33), (32, 33),
]
ZACHARY_N = 34
ZACHARY_TRIANGLES = 45

# LPA star fixture (/root/reference/examples/simple/
# igraph_community_label_propagation.c:67-83)
LPA_STAR_EDGES = [
    (0, 1, 5.0), (0, 2, 1.0), (0, 3, 1.0), (0, 4, 1.0), (0, 5, 1.0),
    (2, 3, 1.0), (2, 4, 1.0), (3, 4, 1.0), (3, 5, 1.0), (4, 5, 1.0),
]
LPA_STAR_INITIAL = [0, 0, 1, 1, 1, 1]
LPA_STAR_FIXED = [3, 4, 5]

# k-core fixture (/root/reference/interfaces/python/igraph/test/
# decomposition.py:37-46)
KCORE_EDGES = [
    (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (2, 4), (2, 5),
    (3, 6), (3, 7), (1, 7), (7, 8), (1, 9), (1, 10), (9, 10),
]
KCORE_N = 11
KCORE_EXPECTED = [3, 3, 3, 3, 1, 1, 1, 2, 1, 2, 2]

# WCC fixture: two triangles + isolated vertex (FIXTURES.md §3.3)
WCC_EDGES = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]
WCC_N = 7
WCC_EXPECTED = [0, 0, 0, 1, 1, 1, 2]

# SCC fixture: two 2-cycles joined one way (FIXTURES.md §3.3)
SCC_EDGES = [(0, 1), (1, 0), (2, 3), (3, 2), (1, 2)]
SCC_N = 4
SCC_EXPECTED = [0, 0, 1, 1]
