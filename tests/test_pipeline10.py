"""Round-10 tooling pins: atomic sf10 staging + calib-share discount."""

from __future__ import annotations

from tools.stage_sf10 import discount_by_calib_share


def test_discount_by_calib_share_scales_selection_biased_buckets():
    """Bucket accuracies measured on the calib+test union are scaled by
    (0.5 + 0.5 * calib_row_share): test.csv rows also selected the
    staged checkpoint, so their face-value accuracy is optimistic
    (round-9 advice, medium). Pure-calib buckets keep full value,
    pure-selection buckets count at half, and the raw value + share
    stay recorded for audit."""
    union = {
        "family": "gru",
        "n": 30,
        "per_bucket_predicted": {
            "3": {"n": 10, "bucket_accuracy": 0.8, "mean_pred_log2": 3.1},
            "5": {"n": 10, "bucket_accuracy": 0.6, "mean_pred_log2": 5.0},
            "6": {"n": 10, "bucket_accuracy": 0.4, "mean_pred_log2": 6.2},
        },
        "per_bucket": {"3": {"n": 10, "bucket_accuracy": 0.8, "mean_pred_log2": 3.1}},
    }
    calib_only = {
        "per_bucket_predicted": {
            "3": {"n": 10, "bucket_accuracy": 0.8},  # all rows from the carve
            "5": {"n": 5, "bucket_accuracy": 0.6},  # half carve, half selection
            # bucket 6 absent: measured purely on selection rows
        },
        "per_bucket": {},
    }
    out = discount_by_calib_share(union, calib_only)
    t = out["per_bucket_predicted"]
    assert t["3"]["bucket_accuracy"] == 0.8  # share 1.0 -> face value
    assert t["5"]["bucket_accuracy"] == round(0.6 * 0.75, 3)  # share 0.5
    assert t["6"]["bucket_accuracy"] == round(0.4 * 0.5, 3)  # share 0.0
    for b in ("3", "5", "6"):
        assert "bucket_accuracy_undiscounted" in t[b]
        assert "calib_row_share" in t[b]
    assert "discount" in out
    # metrics outside the bucket tables pass through untouched
    assert out["n"] == 30 and out["family"] == "gru"

    # no calib carve at all: every bucket is selection-only -> half
    out2 = discount_by_calib_share(union, None)
    assert out2["per_bucket_predicted"]["3"]["bucket_accuracy"] == 0.4
