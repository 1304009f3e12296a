import pyarrow as pa

from stacksearch_ray.functions.grouping import (
    cube_sets,
    grouping_sets,
    rollup_sets,
)


def test_set_generators():
    assert cube_sets(["a", "b"]) == [("a", "b"), ("a",), ("b",), ()]
    assert rollup_sets(["a", "b"]) == [("a", "b"), ("a",), ()]


def test_grouping_sets_cube(ray_session):
    import ray.data as rd
    from ray.data.aggregate import Sum

    t = pa.table({
        "a": pa.array(["x", "x", "y"], pa.string()),
        "b": pa.array(["p", "q", "p"], pa.string()),
        "v": pa.array([1, 2, 4], pa.int64()),
    })
    finest = (rd.from_arrow(t).groupby(["a", "b"])
              .aggregate(Sum("v", alias_name="v")).materialize())
    out = (grouping_sets(finest, ["a", "b"], ["v"], cube_sets(["a", "b"]))
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    rows = {(r.a, r.b): r.v for r in out.itertuples()}
    assert rows == {("x", "p"): 1, ("x", "q"): 2, ("y", "p"): 4,
                    ("x", "ALL"): 3, ("y", "ALL"): 4,
                    ("ALL", "p"): 5, ("ALL", "q"): 2, ("ALL", "ALL"): 7}
