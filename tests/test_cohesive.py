"""cohesive_blocks / minimum_size_separators vs the reference's own
example outputs (/root/reference/examples/simple/cohesive_blocks.out)."""

import pytest

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.cohesive import (
    cohesive_blocks,
    minimum_size_separators,
)

MOODY_WHITE = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5),
    (1, 2), (1, 3), (1, 4), (1, 6),
    (2, 3), (2, 5), (2, 6),
    (3, 4), (3, 5), (3, 6),
    (4, 5), (4, 6), (4, 20),
    (5, 6),
    (6, 7), (6, 10), (6, 13), (6, 18),
    (7, 8), (7, 10), (7, 13),
    (8, 9),
    (9, 11), (9, 12),
    (10, 11), (10, 13),
    (11, 15),
    (12, 15),
    (13, 14),
    (14, 15),
    (16, 17), (16, 18), (16, 19),
    (17, 19), (17, 20),
    (18, 19), (18, 21), (18, 22),
    (19, 20),
    (20, 21), (20, 22),
    (21, 22),
]

TRICKY = [
    (0, 1), (0, 4), (0, 5), (1, 2), (1, 4), (1, 5), (1, 6),
    (2, 3), (2, 5), (2, 6), (2, 7), (3, 6), (3, 7), (4, 5),
    (5, 6), (6, 7),
]

SCIENCE_CAMP = [
    (0, 1), (0, 2), (0, 3),
    (1, 2), (1, 3), (1, 16), (1, 17),
    (2, 3),
    (3, 17),
    (4, 5), (4, 6), (4, 7), (4, 8),
    (5, 6), (5, 7),
    (6, 7), (6, 8),
    (7, 8), (7, 16),
    (8, 9), (8, 10),
    (9, 11), (9, 12), (9, 13), (9, 14),
    (10, 11), (10, 12), (10, 13),
    (11, 14),
    (12, 13), (12, 14), (12, 15),
    (15, 16), (15, 17),
    (16, 17),
]

ZACHARY = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8),
    (0, 10), (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21),
    (0, 31), (1, 2), (1, 3), (1, 7), (1, 13), (1, 17), (1, 19),
    (1, 21), (1, 30), (2, 3), (2, 7), (2, 27), (2, 28), (2, 32),
    (2, 9), (2, 8), (2, 13), (3, 7), (3, 12), (3, 13), (4, 6),
    (4, 10), (5, 6), (5, 10), (5, 16), (6, 16), (8, 30), (8, 32),
    (8, 33), (9, 33), (13, 33), (14, 32), (14, 33), (15, 32),
    (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
    (22, 32), (22, 33), (23, 25), (23, 27), (23, 32), (23, 33),
    (23, 29), (24, 25), (24, 27), (24, 31), (25, 31), (26, 29),
    (26, 33), (27, 33), (28, 31), (28, 33), (29, 32), (29, 33),
    (30, 32), (30, 33), (31, 32), (31, 33), (32, 33),
]

# expected (blocks, cohesion, parent) per the reference .out
EXPECTED = {
    "moody_white": (
        23, MOODY_WHITE,
        [
            set(range(23)),
            {0, 1, 2, 3, 4, 5, 6, 16, 17, 18, 19, 20, 21, 22},
            {6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
            {0, 1, 2, 3, 4, 5, 6},
            {6, 7, 10, 13},
        ],
        [1, 2, 2, 5, 3],
        [-1, 0, 0, 1, 2],
    ),
    "tricky": (
        8, TRICKY,
        [
            set(range(8)),
            {0, 1, 4, 5},
            {2, 3, 6, 7},
            {1, 2, 5, 6},
        ],
        [2, 3, 3, 3],
        [-1, 0, 0, 0],
    ),
    "science_camp": (
        18, SCIENCE_CAMP,
        [
            set(range(18)),
            {0, 1, 2, 3},
            {4, 5, 6, 7, 8},
            {9, 10, 11, 12, 13, 14},
        ],
        [2, 3, 3, 3],
        [-1, 0, 0, 0],
    ),
    "zachary": (
        34, ZACHARY,
        [
            set(range(34)),
            {0, 1, 2, 3, 7, 8, 9, 12, 13, 14, 15, 17, 18, 19, 20, 21, 22,
             23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33},
            {0, 4, 5, 6, 10, 16},
            {0, 1, 2, 3, 7},
            {0, 1, 2, 8, 30, 32, 33},
            {0, 4, 5, 6, 10},
            {0, 1, 2, 3, 13},
            {2, 23, 24, 25, 27, 28, 29, 31, 32, 33},
        ],
        [1, 2, 2, 4, 3, 3, 4, 3],
        [-1, 0, 0, 1, 1, 2, 1, 1],
    ),
}


def _g(spark, n, edges):
    df = spark.createDataFrame(
        [(int(a), int(b), 1.0) for a, b in edges],
        "src long, dst long, weight double",
    )
    return LinkGraph(df, directed=False, n=n)


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_cohesive_blocks_reference_fixtures(spark, name):
    n, edges, want_blocks, want_coh, want_parent = EXPECTED[name]
    b, info = cohesive_blocks(_g(spark, n, edges))
    members = {}
    for r in b.collect():
        members.setdefault(r["block_id"], set()).add(r["id"])
    inf = {r["block_id"]: (r["cohesion"], r["parent"]) for r in info.collect()}

    got = sorted(
        (tuple(sorted(members[i])), inf[i][0]) for i in members
    )
    want = sorted(
        (tuple(sorted(bl)), c) for bl, c in zip(want_blocks, want_coh)
    )
    assert got == want

    # parent structure: compare (child set, parent set) pairs
    got_pc = sorted(
        (
            tuple(sorted(members[i])),
            tuple(sorted(members[inf[i][1]])) if inf[i][1] >= 0 else None,
        )
        for i in members
    )
    want_pc = sorted(
        (
            tuple(sorted(bl)),
            tuple(sorted(want_blocks[p])) if p >= 0 else None,
        )
        for bl, p in zip(want_blocks, want_parent)
    )
    assert got_pc == want_pc


def test_minimum_size_separators_small(spark):
    # path a-b-c: the only minimum separator is {b}
    g = _g(spark, 3, [(0, 1), (1, 2)])
    seps = minimum_size_separators(g)
    rows = seps.collect()
    got = {}
    for r in rows:
        got.setdefault(r["sep_id"], set()).add(r["id"])
    assert sorted(got.values(), key=sorted) == [{1}]

    # 4-cycle: separators are the two diagonals
    g = _g(spark, 4, [(0, 1), (1, 2), (2, 3), (3, 0)])
    rows = minimum_size_separators(g).collect()
    got = {}
    for r in rows:
        got.setdefault(r["sep_id"], set()).add(r["id"])
    assert sorted(got.values(), key=sorted) == [{0, 2}, {1, 3}]


def test_directed_rejected(spark):
    df = spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, weight double")
    with pytest.raises(ValueError, match="undirected"):
        cohesive_blocks(LinkGraph(df, directed=True))
