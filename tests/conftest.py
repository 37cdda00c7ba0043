import pytest

from grappolo_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="grappolo-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    yield s
    s.stop()


def union_find(edges, vertices=None):
    """Pure-python CC oracle: v -> min id in component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for u, v in edges:
        union(u, v)
    for v in vertices or []:
        find(v)
    return {v: find(v) for v in parent}


def numpy_pagerank(edges, vertices, alpha=0.85, iters=20):
    """Pure-numpy PR oracle matching grappolo_spark.operators.pagerank."""
    import numpy as np

    vs = sorted(vertices)
    idx = {v: i for i, v in enumerate(vs)}
    n = len(vs)
    wout = np.zeros(n)
    for u, v, w in edges:
        wout[idx[u]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for u, v, w in edges:
            contrib[idx[v]] += r[idx[u]] * w / wout[idx[u]]
        dangling = r[wout == 0].sum()
        r = (1 - alpha) / n + alpha * (contrib + dangling / n)
    return {v: r[idx[v]] for v in vs}
