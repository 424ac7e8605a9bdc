import pytest

from graph_data_science_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="gds-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def ids(letters: str) -> dict[str, int]:
    """GDL fixtures map node letters to dense ids in declaration order."""
    return {c: i for i, c in enumerate(letters)}


def edges_from(letters: str, spec: str, weights=None):
    """Parse 'b->c, c->b, ...' into (src, dst[, w]) tuples with dense ids."""
    m = ids(letters)
    out = []
    for i, part in enumerate([p.strip() for p in spec.split(",") if p.strip()]):
        a, b = part.split("->")
        e = (m[a.strip()], m[b.strip()])
        if weights is not None:
            e = (*e, weights[i])
        out.append(e)
    return out
