"""Encoding cache: content-addressed reuse of Spark plan encodings."""

import numpy as np
import pytest

from deep_query_optimization_spark.estimator.enc_cache import (
    EncodingCache,
    from_env,
    schema_signature,
)


def test_miss_then_hit_and_roundtrip(tmp_path):
    calls = []

    def enc(sql):
        calls.append(sql)
        return (np.array([1, 2]), np.ones((2, 3)))

    c = EncodingCache(tmp_path / "c.pkl", "sig1")
    wrapped = c.wrap("vec", enc)
    a = wrapped("SELECT 1")
    b = wrapped("SELECT 1")
    assert calls == ["SELECT 1"]  # second call served from cache
    assert a is b
    c.save()

    c2 = EncodingCache(tmp_path / "c.pkl", "sig1")
    got = c2.wrap("vec", enc)("SELECT 1")
    assert calls == ["SELECT 1"]  # disk hit, encoder not called
    np.testing.assert_array_equal(got[0], a[0])
    np.testing.assert_array_equal(got[1], a[1])


def test_kind_separates_namespaces(tmp_path):
    c = EncodingCache(tmp_path / "c.pkl", "s")
    c.wrap("vec", lambda s: "v")("Q")
    assert c.wrap("tree", lambda s: "t")("Q") == "t"  # no cross-kind hit


def test_signature_mismatch_drops_cache(tmp_path):
    c = EncodingCache(tmp_path / "c.pkl", "old")
    c.wrap("vec", lambda s: 1)("Q")
    c.save()
    c2 = EncodingCache(tmp_path / "c.pkl", "new")
    assert c2.data == {}  # stale stats must never leak into features


def test_corrupt_cache_is_a_miss(tmp_path):
    p = tmp_path / "c.pkl"
    p.write_bytes(b"not a pickle")
    c = EncodingCache(p, "s")
    assert c.data == {}
    assert c.wrap("vec", lambda s: 42)("Q") == 42


def test_save_noop_when_clean(tmp_path):
    c = EncodingCache(tmp_path / "c.pkl", "s")
    c.save()
    assert not (tmp_path / "c.pkl").exists()  # nothing to write


def test_schema_signature_changes_with_schema_and_width(tmp_path):
    s = tmp_path / "schema.json"
    s.write_text("{}")
    a = schema_signature(s, 50)
    s.write_text('{"x": 1}')
    assert schema_signature(s, 50) != a
    assert schema_signature(s, 60) != schema_signature(s, 50)


def test_from_env(tmp_path, monkeypatch):
    monkeypatch.delenv("DQO_ENC_CACHE", raising=False)
    assert from_env(tmp_path / "schema.json", 10) is None
    monkeypatch.setenv("DQO_ENC_CACHE", str(tmp_path / "c.pkl"))
    c = from_env(tmp_path / "schema.json", 10)
    assert isinstance(c, EncodingCache)
