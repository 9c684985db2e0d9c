"""FLAC subset codec (sources/flacc.py): lossless round-trips, wire-format
conformance details (CRCs, UTF-8 frame numbers, Rice coding), and the
distributed audio path decoding FLAC for real.

The reference (sertit/eoreader) has no audio surface; this covers the
engine's training-data multimodal family (builder brief: compressed audio
sample decode)."""

import numpy as np
import pytest

from eoreader_spark.operators import multimodal
from eoreader_spark.sources import flacc


def _sine(n: int, amp: int = 12000, step: float = 0.01) -> np.ndarray:
    return np.round(amp * np.sin(np.arange(n) * step)).astype(np.int64)


class TestRoundTrip:
    @pytest.mark.parametrize(
        "name,sig",
        [
            ("ramp", np.arange(5000) % 3000 - 1500),
            ("sine", _sine(10000)),
            ("const", np.full(4196, 123, dtype=np.int64)),
            ("tiny", np.array([5, -3], dtype=np.int64)),
            ("empty", np.array([], dtype=np.int64)),
            ("extremes", np.array([-32768, 32767, 0, -1, 1], dtype=np.int64)),
            ("single-block-exact", _sine(4096)),
        ],
    )
    def test_lossless(self, name, sig):
        back, sr = flacc.decode_flac(flacc.encode_flac(sig, 16000))
        assert sr == 16000
        assert np.array_equal(back, sig)

    def test_noise_uses_verbatim_but_stays_lossless(self):
        rng = np.random.default_rng(7)
        sig = rng.integers(-32768, 32768, 3000)
        data = flacc.encode_flac(sig, 44100)
        back, _ = flacc.decode_flac(data)
        assert np.array_equal(back, sig)

    def test_smooth_signal_actually_compresses(self):
        sig = _sine(16384, step=0.003)
        data = flacc.encode_flac(sig, 44100)
        assert len(data) < sig.size * 2 * 0.5  # beats raw PCM by >2x

    def test_range_check(self):
        with pytest.raises(ValueError, match="16-bit range"):
            flacc.encode_flac(np.array([40000]), 16000)


class TestWireFormat:
    def test_crc_detects_corruption(self):
        data = bytearray(flacc.encode_flac(_sine(1000), 16000))
        data[-10] ^= 0x40  # flip a bit in the last frame's entropy data
        with pytest.raises(ValueError, match="CRC|MD5"):
            flacc.decode_flac(bytes(data))

    def test_md5_guard(self):
        data = flacc.encode_flac(_sine(500), 16000)
        sig, _ = flacc.decode_flac(data, verify_md5=True)
        assert len(sig) == 500

    def test_parse_flac_reads_streaminfo(self):
        info = multimodal.parse_flac(flacc.encode_flac(_sine(4800), 48000))
        assert info["sample_rate"] == 48000
        assert info["n_units"] == 4800
        assert info["duration_ms"] == 100

    def test_utf8_frame_numbers(self):
        # >128 frames forces multi-byte UTF-8 frame numbers (blocksize 256)
        sig = (np.arange(256 * 130) % 251).astype(np.int64)
        data = flacc.encode_flac(sig, 16000, blocksize=256)
        back, _ = flacc.decode_flac(data)
        assert np.array_equal(back, sig)

    def test_not_flac_raises(self):
        with pytest.raises(ValueError, match="not a FLAC"):
            flacc.decode_flac(b"RIFFxxxx")


class TestSparkPath:
    def test_audio_stats_decodes_flac_and_wav_equal(self, spark):
        """The same samples through WAV and FLAC payloads produce identical
        integer stats via the distributed audio_stats path."""
        j = np.arange(2048, dtype=np.int64)
        pcm = ((5 * 7919 + j * 31) % 4001) - 2000
        wav = multimodal.encode_wav(pcm.astype(np.float64) / 32768.0, 16000)
        flac = flacc.encode_flac(pcm, 16000)
        rows = [
            ("w0", "audio", wav, "wav", 0, 0, 16000, 2048),
            ("f0", "audio", flac, "flac", 0, 0, 16000, 2048),
        ]
        media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
        out = {r.media_id: (r.n_samples, r.s_sum, r.s_min, r.s_max, r.ss_sum)
               for r in multimodal.audio_stats(media).collect()}
        assert out["w0"] == out["f0"]
        assert out["f0"][0] == 2048
        assert out["f0"][1] == int(pcm.sum())
