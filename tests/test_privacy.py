"""Privacy / release-governance audits (ops/privacy.py)."""

from __future__ import annotations

import pytest

from bubbles_spark.ops import privacy


@pytest.fixture(scope="module")
def tbl(spark):
    rows = [
        # (zip, age_band, diagnosis): group A has 3 rows / 2 values,
        # group B has 1 row (k<2 violation, homogeneous)
        ("94107", "30-39", "flu"),
        ("94107", "30-39", "flu"),
        ("94107", "30-39", "cold"),
        ("10001", "40-49", "flu"),
        (None, "40-49", None),  # null quasi forms its own group
    ]
    return spark.createDataFrame(rows, "zip string, age string, dx string")


def test_k_anonymity_report(tbl):
    row = privacy.k_anonymity_report(tbl, ["zip", "age"], k=2).first()
    assert row.asDict() == {
        "n_rows": 5, "n_groups": 3, "min_group_size": 1,
        "violating_groups": 2, "violating_rows": 2, "k_anonymous": False,
    }
    with pytest.raises(ValueError, match="k must be"):
        privacy.k_anonymity_report(tbl, ["zip"], k=0)


def test_suppress_small_groups_makes_k_anonymous(tbl):
    kept = privacy.suppress_small_groups(tbl, ["zip", "age"], k=2)
    assert kept.count() == 3
    assert privacy.k_anonymity_report(
        kept, ["zip", "age"], k=2
    ).first()["k_anonymous"] is True


def test_l_diversity_report(tbl):
    row = privacy.l_diversity_report(tbl, ["zip", "age"], "dx", l=2).first()
    # the all-null-dx group contributes no sensitive values -> it
    # simply has no diversity row; groups = 2 (94107: 2 values OK,
    # 10001: 1 value violating)
    assert row.asDict() == {
        "n_groups": 2, "min_diversity": 1,
        "violating_groups": 1, "l_diverse": False,
    }


def test_reports_on_empty_input(spark):
    e = spark.createDataFrame([], "zip string, age string, dx string")
    k = privacy.k_anonymity_report(e, ["zip"], k=3).first()
    assert k["n_rows"] == 0 and k["k_anonymous"] is True
    d = privacy.l_diversity_report(e, ["zip"], "dx", l=2).first()
    assert d["n_groups"] == 0 and d["l_diverse"] is True


def test_pseudonymize_deterministic_joinable_null_safe(spark):
    import pytest as _pytest

    from bubbles_spark.ops import privacy

    df = spark.createDataFrame(
        [(1, "alice"), (2, "alice"), (3, None)], "id long, name string"
    )
    got = {r["id"]: r["name"] for r in privacy.pseudonymize(
        df, ["name"], salt="s1"
    ).collect()}
    assert got[1] == got[2] and len(got[1]) == 16   # joinable tokens
    assert got[1] != "alice" and got[3] is None
    other = {r["id"]: r["name"] for r in privacy.pseudonymize(
        df, ["name"], salt="s2"
    ).collect()}
    assert other[1] != got[1]                        # salt rotation breaks linkage
    with _pytest.raises(ValueError, match="cols"):
        privacy.pseudonymize(df, [], salt="s")
