"""Multimodal binary-column plumbing tests: schema, Arrow batch shape,
deterministic decode/features, and the clearly-marked stub boundary."""

import numpy as np
import pytest

from flatnav_spark import multimodal as mm


@pytest.fixture(scope="module")
def assets(spark):
    return mm.synth_assets(spark, 30)


def test_asset_schema(assets):
    assert dict(assets.dtypes) == {
        "asset_id": "bigint", "kind": "string", "data": "binary",
        "meta": "map<string,string>",
    }
    assert assets.count() == 30


def test_decode_shapes(spark, assets):
    rows = {r.asset_id: r for r in mm.decode_images(assets).collect()}
    assert len(rows) == 30
    for i, r in rows.items():
        assert r.width == 8 + (i % 5) and r.height == 8 + (i % 7)
        assert r.channels == 3
        assert r.n_bytes == r.width * r.height * 3
        assert len(r.payload_sha) == 64


def test_decode_deterministic(spark, assets):
    a = sorted((r.asset_id, r.payload_sha) for r in mm.decode_images(assets).collect())
    b = sorted((r.asset_id, r.payload_sha) for r in mm.decode_images(assets).collect())
    assert a == b


def test_features_normalized(spark, assets):
    for r in mm.extract_features(assets).collect():
        v = np.array(r.features)
        assert v.shape == (mm.FEATURE_DIM,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9


def test_resize_roundtrip(spark, assets):
    small = mm.resize_stub(assets, 4, 4)
    decoded = {r.asset_id: r for r in mm.decode_images(small).collect()}
    assert all(r.width == 4 and r.height == 4 for r in decoded.values())


def test_real_format_is_stubbed():
    with pytest.raises(NotImplementedError, match="stubbed"):
        mm._decode_one(b"\x89PNG\r\n\x1a\n" + b"0" * 32)
