"""Data-quality expectation checks: violation counts per rule, one
aggregate pass, exact uniqueness accounting."""
import pandas as pd

from hiselspark.operators.expectations import (check_expectations,
                                               in_range, in_set,
                                               matches, not_null)


def test_expectations_counts(spark):
    pdf = pd.DataFrame({
        "id": [1, 2, 2, 3, 4],                     # dup key: 2 rows
        "v": [5.0, None, 80.0, -3.0, 10.0],        # null, high, low
        "kind": ["a", "b", "zz", "a", None],       # zz out of set
        "blob": ['{"x":1}', "nope", None, "{}", '{"y":2}'],
    })
    out = (check_expectations(
        spark.createDataFrame(pdf),
        [not_null("v"), in_range("v", 0.0, 50.0),
         in_set("kind", ["a", "b"]), matches("blob", r"^\{.*\}$")],
        unique_cols=["id"])
        .toPandas().set_index("rule"))
    assert (out["n_rows"] == 5).all()
    assert out.loc["not_null(v)", "violations"] == 1
    # range: 80 high, -3 low; the NULL is not a range violation
    assert out.loc["in_range(v,0.0,50.0)", "violations"] == 2
    assert out.loc["in_set(kind)", "violations"] == 1      # NULL exempt
    assert out.loc["matches(blob)", "violations"] == 1     # only "nope"
    assert out.loc["unique(id)", "violations"] == 2        # both copies
    assert not out.loc["unique(id)", "pass"]
    assert out["pass"].sum() == 0  # every rule has a violation here


def test_expectations_all_pass(spark):
    pdf = pd.DataFrame({"id": [1, 2, 3], "v": [1.0, 2.0, 3.0]})
    out = (check_expectations(
        spark.createDataFrame(pdf),
        [not_null("v"), in_range("v", 0.0, 10.0)],
        unique_cols=["id"]).toPandas())
    assert out["pass"].all()
    assert (out["violations"] == 0).all()


def test_profile_table_metrics(spark):
    from hiselspark.operators.profile import profile_table
    pdf = pd.DataFrame({
        "a": [1, 2, None, 4],
        "s": ["x", None, None, "z"],
        "arr": [[1], [2], [3], [4]],
    })
    out = (profile_table(spark.createDataFrame(pdf))
           .toPandas().set_index("column"))
    assert (out["n_rows"] == 4).all()
    assert out.loc["a", "n_null"] == 1
    assert out.loc["s", "n_null"] == 2
    assert out.loc["a", "min_repr"] == "1.0"   # pandas float col
    assert out.loc["s", "max_repr"] == "z"
    assert out.loc["arr", "min_repr"] is None  # unordered type
    # approx distinct within HLL tolerance of exact
    assert abs(out.loc["s", "n_distinct_approx"] - 2) <= 1


def test_table_diff_counts(spark):
    from hiselspark.operators.profile import table_diff
    old = pd.DataFrame({"k": [1, 2, 3, 4],
                        "v": [10, 20, None, 40]})
    new = pd.DataFrame({"k": [2, 3, 4, 5],
                        "v": [20, None, 41, 50]})
    out = (table_diff(spark.createDataFrame(old),
                      spark.createDataFrame(new), ["k"])
           .toPandas().iloc[0])
    assert out["n_added"] == 1       # k=5
    assert out["n_removed"] == 1     # k=1
    assert out["n_changed"] == 1     # k=4 (40 -> 41)
    assert out["n_unchanged"] == 2   # k=2; k=3 (NULL == NULL null-safe)
