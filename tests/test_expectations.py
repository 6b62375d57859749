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
