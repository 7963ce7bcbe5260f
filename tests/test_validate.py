"""Dead-letter validate gate: rule semantics vs hand answers."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from fluent_plugin_geoip_ray.stages.validate import (
    in_range,
    in_set,
    matches,
    not_equal,
    not_null,
    split_quarantine,
    validate,
)


def _tbl():
    return pa.table({
        "id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "v": pa.array([5.0, -1.0, 200.0, None, 50.0]),
        "kind": pa.array(["click", "click", "error", "view", "bogus"]),
    })


def test_validate_first_failing_rule_wins_and_nulls_reject():
    ds = validate(rd.from_arrow(_tbl()), [
        in_range("v", 0, 100),
        in_set("kind", {"click", "view", "error"}),
        not_equal("kind", "error"),
    ])
    out = ds.to_pandas().set_index("id")
    assert out.loc[0, "reject_reason"] is None
    assert out.loc[1, "reject_reason"] == "v_in_range"       # -1 below lo
    assert out.loc[2, "reject_reason"] == "v_in_range"       # 200 above hi
    assert out.loc[3, "reject_reason"] == "v_in_range"       # NULL rejects
    assert out.loc[4, "reject_reason"] == "kind_in_set"      # first failure
    # row 2 fails not_equal too, but in_range came first
    two_rules = validate(rd.from_arrow(_tbl()),
                         [not_equal("kind", "error"),
                          in_range("v", 0, 100)]).to_pandas().set_index("id")
    assert two_rules.loc[2, "reject_reason"] == "kind_not_equal"


def test_validate_matches_and_not_null():
    t = pa.table({"id": pa.array([0, 1, 2], pa.int64()),
                  "s": pa.array(["abc123", "nope", None])})
    out = validate(rd.from_arrow(t), [
        not_null("s"), matches("s", r"^[a-z]+\d+$"),
    ]).to_pandas().set_index("id")
    assert out.loc[0, "reject_reason"] is None
    assert out.loc[1, "reject_reason"] == "s_matches"
    assert out.loc[2, "reject_reason"] == "s_not_null"


def test_split_quarantine_partitions_rows():
    validated = validate(rd.from_arrow(_tbl()),
                         [in_range("v", 0, 100)]).materialize()
    good, bad = split_quarantine(validated)
    g, b = good.to_pandas(), bad.to_pandas()
    assert sorted(g["id"]) == [0, 4]
    assert set(g.columns) == {"id", "v", "kind"}
    assert (b["reject_reason"] == "v_in_range").all()
    assert len(g) + len(b) == 5


def test_validate_duplicate_rule_names_raise():
    with pytest.raises(ValueError, match="duplicate"):
        validate(rd.from_arrow(_tbl()),
                 [in_range("v", 0, 1), in_range("v", 2, 3)])
