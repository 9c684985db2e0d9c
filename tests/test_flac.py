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

    def test_total_samples_zero_means_unknown(self):
        """Regression (ADVICE r5): RFC 9639 defines STREAMINFO total == 0 as
        UNKNOWN length — decode must walk frames to EOF, not return empty."""
        sig = _sine(5000)
        data = bytearray(flacc.encode_flac(sig, 16000))
        # STREAMINFO payload starts at byte 8; total lives in si[13] low
        # nibble (bits 32-35) + si[14:18]
        data[8 + 13] &= 0xF0
        data[8 + 14 : 8 + 18] = b"\x00\x00\x00\x00"
        back, sr = flacc.decode_flac(bytes(data), verify_md5=True)
        assert sr == 16000
        assert np.array_equal(back, sig)


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


class TestLpcStereo:
    """Round-5 subset expansion: LPC subframes, stereo assignments,
    wasted-bits decode."""

    def test_lpc_mono_lossless(self):
        sig = _sine(10000) + (np.arange(10000) % 17)
        back, sr = flacc.decode_flac(flacc.encode_flac(sig, 16000, lpc_order=8))
        assert sr == 16000
        assert np.array_equal(back, sig)

    def test_lpc_subframe_actually_emitted(self):
        # type byte of the first subframe must be LPC (0b1xxxxx), not FIXED
        sig = _sine(4096)
        data = flacc.encode_flac(sig, 16000, lpc_order=6)
        # find first frame: fLaC + 4-byte block hdr + 34 STREAMINFO
        fr = 4 + 4 + 34
        assert data[fr] == 0xFF and (data[fr + 1] & 0xFC) == 0xF8
        # frame hdr: 4 fixed bytes + utf8(0)=1 byte + crc8 = 6 bytes
        sub0 = data[fr + 6]
        stype = (sub0 >> 1) & 0x3F
        assert stype & 0b100000, f"expected LPC subframe, got type {stype:#08b}"
        assert (stype & 0x1F) + 1 == 6

    @pytest.mark.parametrize(
        "mode", ["auto", "independent", "left-side", "right-side", "mid-side"]
    )
    def test_stereo_lossless_all_modes(self, mode):
        rng = np.random.default_rng(3)
        l = _sine(8000) + rng.integers(-50, 50, 8000)
        r = (l * 0.7).astype(np.int64) + rng.integers(-30, 30, 8000)
        st = np.stack([l, r])
        back, sr = flacc.decode_flac(flacc.encode_flac(st, 22050, stereo_mode=mode))
        assert back.shape == (2, 8000)
        assert np.array_equal(back, st)

    def test_stereo_auto_picks_cheapest(self):
        rng = np.random.default_rng(3)
        l = _sine(8000) + rng.integers(-50, 50, 8000)
        r = (l * 0.7).astype(np.int64) + rng.integers(-30, 30, 8000)
        st = np.stack([l, r])
        sizes = {
            m: len(flacc.encode_flac(st, 22050, stereo_mode=m))
            for m in ("auto", "independent", "left-side", "right-side", "mid-side")
        }
        assert sizes["auto"] == min(sizes.values())

    def test_stereo_extremes_and_correlated_side_width(self):
        # side = l - r needs bps+1 bits at the rails
        ex = np.array([[-32768, 32767, 0, 100], [32767, -32768, -1, -100]],
                      dtype=np.int64)
        back, _ = flacc.decode_flac(flacc.encode_flac(ex, 8000))
        assert np.array_equal(back, ex)

    def test_stereo_lpc_lossless(self):
        rng = np.random.default_rng(11)
        l = _sine(6000, step=0.02) + rng.integers(-9, 9, 6000)
        st = np.stack([l, -l // 2])
        back, _ = flacc.decode_flac(flacc.encode_flac(st, 22050, lpc_order=4))
        assert np.array_equal(back, st)

    def test_wasted_bits_decode(self):
        """Hand-build a one-frame mono stream whose VERBATIM subframe uses
        3 wasted bits; the decoder must shift samples back up."""
        sig = (np.array([5, -3, 7, 0, -8, 2, 1, -1], dtype=np.int64)) << 3
        n, bps, w = len(sig), 16, 3
        hdr = bytearray([0xFF, 0xF8, (6 << 4) | 0, (0 << 4) | (0b100 << 1)])
        hdr += flacc._utf8_number(0) + bytes([n - 1])
        hdr.append(flacc._crc8(bytes(hdr)))
        bw = flacc._BitWriter()
        bw.write(0, 1)                    # pad
        bw.write(0b000001, 6)             # VERBATIM
        bw.write(1, 1)                    # wasted flag
        bw.write(1, w - 1 + 1)            # unary(w-1): two 0s then a 1
        for s in sig >> w:
            bw.write(int(s), bps - w)
        bw.align()
        body = bytes(hdr) + bw.getvalue()
        frame = body + flacc._crc16(body).to_bytes(2, "big")
        si = bytearray(34)
        si[0:2] = si[2:4] = n.to_bytes(2, "big")
        si[10] = (8000 >> 12) & 0xFF
        si[11] = (8000 >> 4) & 0xFF
        si[12] = ((8000 & 0xF) << 4) | (0 << 1) | ((bps - 1) >> 4)
        si[13] = ((bps - 1) & 0x0F) << 4
        si[14:18] = n.to_bytes(4, "big")
        import hashlib

        si[18:34] = hashlib.md5(sig.astype("<i2").tobytes()).digest()
        data = b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + bytes(si) + frame
        back, sr = flacc.decode_flac(data)
        assert sr == 8000
        assert np.array_equal(back, sig)

    def test_three_channels_rejected(self):
        with pytest.raises(ValueError, match=r"\(2, n\)"):
            flacc.encode_flac(np.zeros((3, 100), dtype=np.int64), 8000)
