"""Multimodal column plumbing: schema, Arrow batches, frame sampling."""

import pytest

from datayours_spark.functions.multimodal import (
    FEATURE_DIM,
    RealDecoderUnavailable,
    extract_features,
    frame_sample_plan,
    resize_metadata,
)


@pytest.fixture()
def assets(spark):
    rows = [
        (1, "image", bytearray(b"png-payload-1"), 800, 600, None, "png"),
        (2, "image", bytearray(b"png-payload-2"), 100, 50, None, "png"),
        (3, "video", bytearray(b"mp4-payload"), 1920, 1080, 2500, "h264"),
    ]
    return spark.createDataFrame(
        rows,
        "asset_id bigint, kind string, data binary, width int, height int, "
        "duration_ms int, codec string",
    )


class TestFeatures:
    def test_deterministic_fake_features(self, assets):
        out = {r["asset_id"]: r["feature"] for r in extract_features(assets).collect()}
        assert len(out) == 3
        assert all(len(v) == FEATURE_DIM for v in out.values())
        again = {r["asset_id"]: r["feature"] for r in extract_features(assets).collect()}
        assert out == again  # md5-derived → stable across runs

    def test_real_decoder_stubbed(self, assets):
        with pytest.raises(RealDecoderUnavailable):
            extract_features(assets, real=True)

    def test_injected_decoder_exercises_real_path(self, assets):
        """A decoder callable plugs into the SAME mapInPandas plumbing the
        real media library would — here a fake 'library' that derives
        features from payload length and kind, proving the payload bytes
        and kind reach the decoder intact through the Arrow batches."""
        out = {
            r["asset_id"]: r["feature"]
            for r in extract_features(
                assets, real=True, decoder=_length_kind_decoder
            ).collect()
        }
        assert out[1][:2] == [float(len(b"png-payload-1")), 1.0]
        assert out[2][:2] == [float(len(b"png-payload-2")), 1.0]
        assert out[3][:2] == [float(len(b"mp4-payload")), 2.0]
        assert all(len(v) == FEATURE_DIM for v in out.values())


def _length_kind_decoder(payload: bytes, kind: str) -> list[float]:
    """Stands in for a real decode+embed library; must be top-level so the
    mapInPandas closure pickles."""
    head = [float(len(payload)), 1.0 if kind == "image" else 2.0]
    return head + [0.0] * (FEATURE_DIM - 2)


class TestResize:
    def test_aspect_preserved_downscale(self, assets):
        out = {r["asset_id"]: (r["new_width"], r["new_height"])
               for r in resize_metadata(assets, 400).collect()}
        assert out[1] == (400, 300)
        assert out[2] == (100, 50)  # already smaller → untouched


class TestFrameSample:
    def test_explode_plan(self, assets):
        frames = frame_sample_plan(assets, every_ms=1000).collect()
        assert [(r["asset_id"], r["frame_ms"]) for r in frames] == [
            (3, 0),
            (3, 1000),
            (3, 2000),
        ]
