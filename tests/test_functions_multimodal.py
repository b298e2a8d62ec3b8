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
        from datayours_spark.functions.multimodal import default_real_decoder

        if default_real_decoder() is not None:
            pytest.skip("a real decoder (Pillow) is importable here")
        with pytest.raises(RealDecoderUnavailable):
            extract_features(assets, real=True)

    def test_pillow_default_decodes_real_images(self, spark):
        """Skipped where Pillow is absent (this container): with Pillow
        importable, real=True uses it as the default decoder end-to-end
        through the same Arrow plumbing."""
        pytest.importorskip("PIL")
        import io as _io

        from PIL import Image

        from datayours_spark.functions.multimodal import pillow_decoder

        def png_bytes(color):
            buf = _io.BytesIO()
            Image.new("RGB", (32, 16), color).save(buf, format="PNG")
            return buf.getvalue()

        rows = [
            (1, "image", bytearray(png_bytes((255, 0, 0))), 32, 16, None, "png"),
            (2, "image", bytearray(png_bytes((0, 0, 255))), 32, 16, None, "png"),
        ]
        assets = spark.createDataFrame(
            rows,
            "asset_id bigint, kind string, data binary, width int, "
            "height int, duration_ms int, codec string",
        )
        out = {
            r["asset_id"]: r["feature"]
            for r in extract_features(assets, real=True).collect()
        }
        assert all(len(v) == FEATURE_DIM for v in out.values())
        # a solid-red and a solid-blue image must embed differently, with
        # the red channel mean dominating for asset 1 and blue for asset 2
        assert out[1][0] > 0.9 and out[1][2] < 0.1
        assert out[2][0] < 0.1 and out[2][2] > 0.9

    def test_pillow_decoder_refuses_non_images(self):
        pytest.importorskip("PIL")
        from datayours_spark.functions.multimodal import pillow_decoder

        with pytest.raises(RealDecoderUnavailable, match="images only"):
            pillow_decoder(b"mp4-bytes", "video")

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


class TestMixedCorpusDefaultDecoder:
    def test_real_true_mixed_kinds_fails_upfront(self, assets, monkeypatch):
        """Round-3 ADVICE: when the opportunistic default decoder (Pillow)
        would be picked but the corpus mixes kinds, extract_features must
        raise driver-side BEFORE the job, not mid-mapInPandas on
        executors.  Simulated decoder: Pillow is absent here."""
        from datayours_spark.functions import multimodal as mm

        monkeypatch.setattr(
            mm, "default_real_decoder", lambda: mm.pillow_decoder
        )
        with pytest.raises(RealDecoderUnavailable, match="images only"):
            mm.extract_features(assets, real=True)

    def test_real_true_all_images_uses_default(self, spark, monkeypatch):
        """All-image corpora may use the opportunistic default; the check
        must not reject them."""
        from datayours_spark.functions import multimodal as mm

        calls = []

        def fake_decoder(payload, kind):
            calls.append(kind)
            return [float(len(payload))] * mm.FEATURE_DIM

        monkeypatch.setattr(mm, "default_real_decoder", lambda: fake_decoder)
        imgs = spark.createDataFrame(
            [(1, "image", bytearray(b"abc"))],
            "asset_id bigint, kind string, data binary",
        )
        out = mm.extract_features(imgs, real=True).collect()
        assert out[0]["feature"] == [3.0] * mm.FEATURE_DIM


class TestAudioSegments:
    def test_overlap_tail_and_guards(self, spark):
        from datayours_spark.functions.multimodal import audio_segment_plan

        rows = [
            (1, "audio", bytearray(b"wav"), 0, 0, 2300, "pcm"),   # tail clip
            (2, "audio", bytearray(b"wav"), 0, 0, None, "pcm"),   # null dur
            (3, "audio", bytearray(b"wav"), 0, 0, 0, "pcm"),      # zero dur
            (4, "video", bytearray(b"mp4"), 0, 0, 9000, "h264"),  # wrong kind
        ]
        assets = spark.createDataFrame(
            rows,
            "asset_id bigint, kind string, data binary, width int, "
            "height int, duration_ms int, codec string",
        )
        segs = audio_segment_plan(assets, window_ms=1000, stride_ms=500)
        got = [
            (r.asset_id, r.segment_no, r.start_ms, r.end_ms, r.segment_ms)
            for r in sorted(segs.collect(), key=lambda r: (r.asset_id, r.segment_no))
        ]
        # asset 1 (2300 ms): starts 0,500,...,2000; last two clip at 2300
        assert got == [
            (1, 0, 0, 1000, 1000),
            (1, 1, 500, 1500, 1000),
            (1, 2, 1000, 2000, 1000),
            (1, 3, 1500, 2300, 800),
            (1, 4, 2000, 2300, 300),
        ]
