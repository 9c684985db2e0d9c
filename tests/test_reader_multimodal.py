import datetime as dt

import numpy as np
import pytest

from eoreader_spark import codecs, datagen
from eoreader_spark.operators import multimodal
from eoreader_spark.sources import reader


def test_constellation_detection(spark):
    names = [
        ("S2A_MSIL2A_20240116T105309_N0510_R051_T31TCJ", "S2"),
        ("S2B_MSIL1C_20200114T065229_N0208_R020_T40REQ", "S2"),
        ("S1A_IW_GRDH_1SDV_20191215T060906", "S1"),
        ("LC08_L1TP_200030_20201220_20210310_02_T1", "L8"),
        ("DS_PHR1A_201006181052297_FR1_PX_E001N43_0612_03143", "PLD"),
        # round 2 split the coarse 'S3' class into OLCI/SLSTR (reference has
        # separate constellations for the two instruments)
        ("S3B_SL_1_RBT____20191115T233722_20191115T234022", "S3_SLSTR"),
        ("random_garbage_file", None),
    ]
    df = spark.createDataFrame([(n,) for n, _ in names], "product_name string")
    got = {r.product_name: r.constellation for r in reader.detect(df).collect()}
    for n, want in names:
        assert got[n] == want, n


def test_acq_datetime(spark):
    df = spark.createDataFrame(
        [("S2A_MSIL2A_20240116T105309_N0510",)], "product_name string"
    )
    r = df.select(reader.acq_datetime("product_name").alias("dt")).first()
    assert r.dt == dt.datetime(2024, 1, 16, 10, 53, 9)


def test_dispatch_joins_band_map(spark):
    bm = datagen.gen_band_map(spark)
    df = spark.createDataFrame(
        [("S2A_MSIL2A_20240116T105309_N0510",), ("S1A_IW_GRDH_1SDV_20191215T060906",)],
        "product_name string",
    )
    out = reader.dispatch(df, bm).collect()
    s2 = [r for r in out if r.constellation == "S2"]
    assert {r.band_name for r in s2} == {"RED", "GREEN", "NIR"}


@pytest.fixture(scope="module")
def media(spark):
    img = codecs.make_image(5, 64, 64)
    rows = [
        ("m1", "image", codecs.encode(img, "png"), "png", 64, 64, 0, 0),
        ("m2", "image", codecs.encode(img, "raw8"), "raw8", 64, 64, 0, 0),
        ("a1", "audio", b"\x01\x02\x03fakewav", "wav", 0, 0, 16000, 0),
        ("v1", "video", b"\x09\x08fakemp4", "mp4", 0, 0, 0, 30),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_image_features_real(spark, media):
    out = {r.media_id: np.asarray(r.features) for r in multimodal.image_features(media).collect()}
    assert set(out) == {"m1", "m2"}
    assert out["m1"].shape == (3 * 8 * 8,)
    assert np.allclose(out["m1"], out["m2"])  # png and raw8 encode the same image


def test_audio_stub_raises_without_fake(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|libsndfile"):
        multimodal.audio_features(media).collect()


def test_audio_fake_deterministic(spark, media):
    a1 = {r.media_id: tuple(r.features) for r in multimodal.audio_features(media, fake=True).collect()}
    a2 = {r.media_id: tuple(r.features) for r in multimodal.audio_features(media.repartition(5), fake=True).collect()}
    assert a1 == a2 and set(a1) == {"a1"}


def test_video_non_mjpeg_raises(spark, media):
    # garbage 'mp4' bytes: the sample-table walk raises the named container
    # error (round 7 moved the fourcc gate after track discovery)
    with pytest.raises(Exception, match="ffmpeg|mjpeg|no video track|corrupt"):
        multimodal.video_frame_sample(media, every_n=10).collect()


def test_video_mjpeg_real_decode(spark):
    """REAL Motion-JPEG: demux + per-frame baseline-JPEG decode through the
    distributed path matches a single-process numpy replay bit-for-bit."""
    from eoreader_spark.sources import jpegc

    n_frames, every_n, resize = 9, 4, 4
    frames = [codecs.make_image(300 + i, 64, 32, planes=3) for i in range(n_frames)]
    payload = multimodal.encode_mjpeg(frames, quality=90)
    rows = [("vid0", "video", payload, "mjpeg", 32, 64, 0, n_frames)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)

    got = {
        (r.media_id, r.frame_idx): np.asarray(r.features, dtype=np.float32)
        for r in multimodal.video_frame_sample(media, every_n=every_n, resize=resize).collect()
    }
    assert set(got) == {("vid0", 0), ("vid0", 4), ("vid0", 8)}
    parts = multimodal.split_mjpeg(payload)
    assert len(parts) == n_frames
    for fi in range(0, n_frames, every_n):
        luma = jpegc.decode_jfif(parts[fi])[0].astype(np.float32)
        bh, bw = 64 // resize, 32 // resize
        want = luma.reshape(resize, bh, resize, bw).mean(axis=(1, 3)).ravel()
        assert np.array_equal(got[("vid0", fi)], want.astype(np.float32))


def test_split_mjpeg_rejects_garbage():
    with pytest.raises(ValueError, match="SOI"):
        multimodal.split_mjpeg(b"\x00\x01\x02")
    one = multimodal.encode_mjpeg([codecs.make_image(7, 16, 16, planes=1)])
    with pytest.raises(ValueError, match="truncated"):
        multimodal.split_mjpeg(one[:-2])  # EOI chopped off
    # regression (ADVICE r5): stream cut so the LAST byte is a lone 0xFF
    # inside scan data must raise ValueError, not IndexError
    cut = one.rfind(b"\xff", 0, len(one) - 2)
    with pytest.raises(ValueError, match="truncated"):
        multimodal.split_mjpeg(one[: cut + 1])


def test_audio_wav_real_decode(spark):
    """PCM WAV audio decodes for REAL (stdlib wave): a synthesized sine's
    per-band RMS through the Spark path matches numpy on the same samples."""
    sr = 8000
    t = np.arange(sr) / sr
    sig = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float64)
    data = multimodal.encode_wav(sig, sr)
    # round-trip sanity
    back, got_sr = multimodal.decode_wav(data)
    assert got_sr == sr and len(back) == sr
    assert np.allclose(back, sig, atol=1.0 / 32767)
    rows = [("aud0", "audio", bytearray(data), "wav", 0, 0, sr, 0)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.audio_features(media, n_mels=16).collect()  # NO fake flag
    assert len(out) == 1
    frames = back[: sr // 16 * 16].reshape(16, -1)
    want = np.sqrt((frames.astype(np.float64) ** 2).mean(axis=1))
    assert np.allclose(np.asarray(out[0].features), want, atol=1e-5)


def test_audio_non_wav_still_guarded(spark):
    rows = [("aud1", "audio", bytearray(b"ID3fakemp3payload"), "mp3", 0, 0, 8000, 0)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    import pytest as _pytest

    with _pytest.raises(Exception, match="NotImplementedError|libsndfile"):
        multimodal.audio_features(media).collect()


def test_gen_media_audio_stats_exact(spark):
    """gen_media WAV payloads + audio_stats: REAL stdlib decode reconstructs
    the generator's int16 samples bit-for-bit (integer stats vs closed form)."""
    media = datagen.gen_media(spark, 8)
    got = {r.media_id: r for r in multimodal.audio_stats(media).collect()}
    assert set(got) == {f"med{i:08d}" for i in range(1, 8, 2)}
    for i in range(1, 8, 2):
        j = np.arange(2048, dtype=np.int64)
        k = ((i * 7919 + j * 31) % 4001) - 2000
        r = got[f"med{i:08d}"]
        assert (r.n_samples, r.s_sum, r.s_min, r.s_max, r.ss_sum) == (
            2048, int(k.sum()), int(k.min()), int(k.max()), int((k * k).sum())
        )


def test_gen_media_image_feats_exact(spark):
    """image_features over gen_media images: block means are exact in float32
    (power-of-two block counts by construction) and equal numpy's on the
    closed-form pixels — array_equal, not allclose."""
    media = datagen.gen_media(spark, 8)
    got = {
        r.media_id: np.asarray(r.features, dtype=np.float64)
        for r in multimodal.image_features(media, resize=8).collect()
    }
    assert set(got) == {f"med{i:08d}" for i in range(0, 8, 2)}
    for i in range(0, 8, 2):
        m = i // 2
        h = 32 if m % 2 == 0 else 64
        w = 64 if m % 3 == 0 else 32
        img = codecs.make_image(i, h, w, planes=3).astype(np.float64)
        want = img.reshape(3, 8, h // 8, 8, w // 8).mean(axis=(2, 4)).ravel()
        assert np.array_equal(got[f"med{i:08d}"], want)


# ------------------------------------------------- round-4: real containers
def test_mp3_frame_walk():
    b = multimodal.encode_mp3_frames(38, 128, 0)
    info = multimodal.parse_mp3(b)
    assert info["n_units"] == 38 and info["sample_rate"] == 44100
    assert info["duration_ms"] == 38 * 1152 * 1000 // 44100
    assert info["bitrate_kbps"] == 128
    # ID3v2 tag skipped (syncsafe size)
    id3 = b"ID3" + bytes([4, 0, 0]) + bytes([0, 0, 0, 10]) + b"\x00" * 10
    assert multimodal.parse_mp3(id3 + b)["n_units"] == 38
    # VBR: mixed bitrates -> bitrate_kbps None, duration still exact
    vbr = multimodal.encode_mp3_frames(5, 128) + multimodal.encode_mp3_frames(5, 192)
    vi = multimodal.parse_mp3(vbr)
    assert vi["bitrate_kbps"] is None and vi["n_units"] == 10
    # channels come from the mode bits (3 = single_channel), not a hardcode
    assert info["channels"] == 2
    mono = multimodal.parse_mp3(multimodal.encode_mp3_frames(4, 128, mode=3))
    assert mono["channels"] == 1
    for m in (1, 2):  # joint stereo / dual channel are 2-channel
        assert multimodal.parse_mp3(
            multimodal.encode_mp3_frames(2, 128, mode=m)
        )["channels"] == 2


def test_flac_streaminfo():
    b = multimodal.encode_flac_streaminfo(123456, 48000, 2, 24)
    info = multimodal.parse_flac(b)
    assert info["n_units"] == 123456 and info["sample_rate"] == 48000
    assert info["channels"] == 2 and info["bits_per_sample"] == 24
    with pytest.raises(ValueError, match="not a FLAC"):
        multimodal.parse_flac(b"nope")


def test_mp4_box_walk():
    b = multimodal.encode_mp4_skeleton(90500, 1000, 2)
    info = multimodal.parse_mp4(b)
    assert info["duration_ms"] == 90500 and info["n_tracks"] == 2
    with pytest.raises(ValueError, match="no moov"):
        multimodal.parse_mp4(b[:16])


def test_audio_container_info_dispatch(spark):
    """One distributed pass over mixed containers — no stub anywhere on the
    metadata path."""
    rows = [
        ("a", multimodal.encode_mp3_frames(10, 128)),
        ("b", multimodal.encode_flac_streaminfo(48000, 48000)),
        ("c", multimodal.encode_wav(np.zeros(16000), 16000)),
        ("d", multimodal.encode_mp4_skeleton(5000, 1000, 1)),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in rows], "media_id string, bytes binary"
    )
    got = {r.media_id: r for r in multimodal.audio_container_info(df).collect()}
    assert got["a"].container == "mp3" and got["a"].n_units == 10
    assert got["b"].container == "flac" and got["b"].duration_ms == 1000
    assert got["c"].container == "wav" and got["c"].duration_ms == 1000
    assert got["d"].container == "mp4" and got["d"].duration_ms == 5000


class TestMp4Mjpeg:
    """Round 6: MJPEG inside a REAL ISO BMFF container — mux with full
    sample tables, demux by walking them (stsd/stsz/stsc/stco)."""

    def _frames(self, n=6, h=32, w=32):
        return [codecs.make_image(500 + i, h, w, planes=3) for i in range(n)]

    def test_mux_demux_matches_elementary_stream(self):
        frames = self._frames()
        mp4 = multimodal.encode_mp4_mjpeg(frames, quality=90)
        es = multimodal.encode_mjpeg(frames, quality=90)
        assert multimodal.split_mp4_mjpeg(mp4) == multimodal.split_mjpeg(es)

    def test_parse_mp4_reads_the_muxed_file(self):
        mp4 = multimodal.encode_mp4_mjpeg(self._frames(10), fps=25, timescale=600)
        info = multimodal.parse_mp4(mp4)
        assert info["n_tracks"] == 1
        assert info["duration_ms"] == 10 * (600 // 25) * 1000 // 600

    def test_multi_chunk_stsc_runs(self):
        """Demux honors stsc chunk runs: rebuild the one-chunk container
        into two chunks (3+3 samples) with a 2-run stsc and 2-entry stco."""
        frames = self._frames(6)
        from eoreader_spark.sources import jpegc

        samples = [jpegc.encode_jfif(f, quality=90) for f in frames]
        one = multimodal.encode_mp4_mjpeg(frames, quality=90)
        # locate moov and rewrite stsc/stco inside it
        moov_at = one.index(b"moov") - 4
        head = bytearray(one[:moov_at])
        # two mdat-like chunks: chunk1 = samples 0-2 at old offset, chunk2
        # appended after moov
        chunk2 = b"".join(samples[3:])
        stsc_new = multimodal._full(
            b"stsc", 0, 0,
            (2).to_bytes(4, "big")
            + (1).to_bytes(4, "big") + (3).to_bytes(4, "big") + (1).to_bytes(4, "big")
            + (2).to_bytes(4, "big") + (3).to_bytes(4, "big") + (1).to_bytes(4, "big"),
        )
        off1 = one.index(b"mdat") + 4  # mdat body starts after the fourcc
        off2 = len(one) + 16  # moov grows by 16 (stsc +12, stco +4) below
        stco_new = multimodal._full(
            b"stco", 0, 0,
            (2).to_bytes(4, "big")
            + off1.to_bytes(4, "big") + off2.to_bytes(4, "big"),
        )
        moov = one[moov_at:]
        old_stsc = moov.index(b"stsc") - 4
        old_stsc_end = old_stsc + int.from_bytes(moov[old_stsc : old_stsc + 4], "big")
        old_stco = moov.index(b"stco") - 4
        old_stco_end = old_stco + int.from_bytes(moov[old_stco : old_stco + 4], "big")
        new_moov = bytearray(
            moov[:old_stsc] + stsc_new + moov[old_stsc_end:old_stco]
            + stco_new + moov[old_stco_end:]
        )
        # fix up ancestor box sizes (moov/trak/mdia/minf/stbl chain): sizes
        # unchanged here because stsc/stco byte lengths grew by 12+4
        grow = (len(stsc_new) - (old_stsc_end - old_stsc)) + (
            len(stco_new) - (old_stco_end - old_stco)
        )
        assert grow == 16  # keep in sync with off2 above
        for sig in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
            at = new_moov.index(sig) - 4
            sz = int.from_bytes(new_moov[at : at + 4], "big")
            new_moov[at : at + 4] = (sz + grow).to_bytes(4, "big")
        data = bytes(head) + bytes(new_moov) + chunk2
        assert multimodal.split_mp4_mjpeg(data) == samples

    def test_inter_coded_raises_named(self):
        mp4 = bytearray(multimodal.encode_mp4_mjpeg(self._frames(2)))
        i = mp4.index(b"jpeg", mp4.index(b"stsd"))
        mp4[i : i + 4] = b"avc1"
        with pytest.raises(NotImplementedError, match="avc1.*ffmpeg"):
            multimodal.split_mp4_mjpeg(bytes(mp4))

    def test_no_video_track_raises(self):
        skel = multimodal.encode_mp4_skeleton(1000)
        with pytest.raises(ValueError, match="no video track"):
            multimodal.split_mp4_mjpeg(skel)

    def test_distributed_mp4_equals_mjpeg_features(self, spark):
        frames = self._frames(8, h=64, w=32)
        rows = [
            ("es", "video", multimodal.encode_mjpeg(frames, quality=90),
             "mjpeg", 32, 64, 0, 8),
            ("mp4", "video", multimodal.encode_mp4_mjpeg(frames, quality=90),
             "mp4", 32, 64, 0, 8),
        ]
        media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
        got = {}
        for r in multimodal.video_frame_sample(media, every_n=3, resize=4).collect():
            got.setdefault(r.media_id, {})[r.frame_idx] = tuple(r.features)
        assert got["es"] == got["mp4"]
        assert set(got["es"]) == {0, 3, 6}


def test_video_h264_real_decode(spark):
    """REAL intra H.264 (round 7): 'avc1' MP4 demux + the engine's own
    CAVLC/I_16x16 decoder through the distributed path matches a
    single-process replay bit-for-bit, and the decoded luma hits the
    BASELINE PSNR>=40dB invariant against the source frames."""
    from eoreader_spark.sources import avcc

    n_frames, every_n, resize = 5, 2, 4
    frames = [codecs.make_image(900 + i, 32, 64, planes=1)[0] for i in range(n_frames)]
    payload = multimodal.encode_mp4_h264(frames, qp=8)
    rows = [("avc0", "video", payload, "mp4", 64, 32, 0, n_frames)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)

    got = {
        (r.media_id, r.frame_idx): np.asarray(r.features, dtype=np.float32)
        for r in multimodal.video_frame_sample(media, every_n=every_n, resize=resize).collect()
    }
    assert set(got) == {("avc0", 0), ("avc0", 2), ("avc0", 4)}
    parts = multimodal.split_mp4_avc1(payload)
    assert len(parts) == n_frames
    for fi in range(0, n_frames, every_n):
        luma = avcc.decode_h264(parts[fi])[0]
        assert codecs.psnr(frames[fi], luma) >= 40.0
        lf = luma.astype(np.float32)
        bh, bw = 32 // resize, 64 // resize
        want = lf.reshape(resize, bh, resize, bw).mean(axis=(1, 3)).ravel()
        assert np.array_equal(got[("avc0", fi)], want.astype(np.float32))


def test_mp4_unsupported_codec_still_raises_named(spark):
    """hvc1 and friends still raise with the codec named (the subset
    boundary moved to avc1, it didn't disappear)."""
    frames = [codecs.make_image(1, 32, 32, planes=1)[0]]
    payload = bytearray(multimodal.encode_mp4_h264(frames, qp=10))
    i = payload.find(b"avc1")
    payload[i : i + 4] = b"hvc1"
    rows = [("h265", "video", bytes(payload), "mp4", 32, 32, 0, 1)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="hvc1"):
        multimodal.video_frame_sample(media).collect()
