"""From-scratch H.264 intra baseline codec (sources/avcc.py): VLC table
structure, CAVLC block-codec roundtrips across nC contexts, EBSP escaping,
full encode/decode rate-distortion (the BASELINE.json PSNR>=40dB invariant),
cropping/chroma handling, and the named-error subset contract."""

from __future__ import annotations

import numpy as np
import pytest

from eoreader_spark import codecs
from eoreader_spark.sources import avcc


class TestTables:
    @pytest.mark.parametrize(
        "name,table",
        [("ct0", avcc._CT0), ("ct1", avcc._CT1), ("ct2", avcc._CT2),
         ("ct_cdc", avcc._CT_CHROMA_DC)],
    )
    def test_coeff_token_tables_prefix_free_and_complete(self, name, table):
        codes = list(table.values())
        assert len(set(codes)) == len(codes), f"{name}: duplicate codes"
        for a in codes:
            for b in codes:
                if a is not b:
                    assert not b.startswith(a), f"{name}: {a} prefixes {b}"
        # arity: every (tc, t1) with t1 <= min(tc, 3) present
        max_tc = 4 if name == "ct_cdc" else 16
        want = {(tc, t1) for tc in range(max_tc + 1) for t1 in range(min(tc, 3) + 1)}
        assert set(table) == want

    def test_total_zeros_and_run_tables_prefix_free(self):
        for tc, codes in {**avcc._TZ4, **{100 + k: v for k, v in avcc._TZ_CDC.items()}}.items():
            assert len(set(codes)) == len(codes), tc
            for a in codes:
                for b in codes:
                    if a is not b:
                        assert not b.startswith(a), (tc, a, b)
        for zl, codes in avcc._RUN_BEFORE.items():
            for a in codes:
                for b in codes:
                    if a is not b:
                        assert not b.startswith(a), (zl, a, b)
        # total_zeros arity: tc in 1..15 has 17-tc codes (tz 0..16-tc)
        for tc in range(1, 16):
            assert len(avcc._TZ4[tc]) == 17 - tc

    def test_exp_golomb_roundtrip(self):
        w = avcc._BitWriter()
        vals = list(range(40)) + [255, 1023, 70000]
        svals = [0, 1, -1, 7, -7, 300, -300]
        for v in vals:
            w.ue(v)
        for v in svals:
            w.se(v)
        r = avcc._BitReader(w.rbsp())
        assert [r.ue() for _ in vals] == vals
        assert [r.se() for _ in svals] == svals

    def test_ebsp_escaping_roundtrip(self):
        rng = np.random.RandomState(5)
        for _ in range(200):
            raw = bytes(rng.randint(0, 4, size=rng.randint(1, 40)).astype(np.uint8))
            ebsp = avcc._ebsp(raw)
            assert b"\x00\x00\x00" not in ebsp
            assert b"\x00\x00\x01" not in ebsp
            assert b"\x00\x00\x02" not in ebsp
            assert avcc._rbsp(ebsp) == raw


class TestCavlcBlocks:
    @pytest.mark.parametrize("nC", [-1, 0, 1, 2, 3, 5, 8, 16])
    def test_block_roundtrip_all_contexts(self, nC):
        rng = np.random.RandomState(nC + 10)
        max_coeff = 4 if nC == -1 else 15
        for trial in range(300):
            n_nz = rng.randint(0, max_coeff + 1)
            coeffs = [0] * max_coeff
            for pos in rng.choice(max_coeff, size=n_nz, replace=False):
                mag = int(rng.choice([1, 1, 1, 2, 3, 9, 40, 700]))
                coeffs[pos] = mag if rng.rand() < 0.5 else -mag
            w = avcc._BitWriter()
            avcc._write_block(w, coeffs, nC, max_coeff)
            w.u(0, 8)  # padding so reads never run off the end
            got, tc = avcc._read_block(avcc._BitReader(w.rbsp()), nC, max_coeff)
            assert got == coeffs, (nC, trial, coeffs, got)
            assert tc == sum(1 for c in coeffs if c)

    def test_dc16_roundtrip(self):
        rng = np.random.RandomState(3)
        for trial in range(200):
            coeffs = [int(c) for c in rng.randint(-5, 6, 16) * (rng.rand(16) < 0.4)]
            w = avcc._BitWriter()
            avcc._write_block(w, coeffs, 0, 16)
            w.u(0, 8)
            got, _ = avcc._read_block(avcc._BitReader(w.rbsp()), 0, 16)
            assert got == coeffs


class TestRoundTrip:
    def test_rate_distortion_ladder(self):
        img = codecs.make_image(3, 48, 64, planes=1)[0]
        prev_bytes, prev_psnr = None, None
        for qp in (4, 12, 20):
            data = avcc.encode_h264([img], qp=qp)
            out = avcc.decode_h264(data)[0]
            p = codecs.psnr(img, out)
            assert p >= 40.0, (qp, p)  # BASELINE.json pixel invariant
            if prev_bytes is not None:
                assert len(data) < prev_bytes and p < prev_psnr
            prev_bytes, prev_psnr = len(data), p

    def test_multi_frame_crop_and_chroma(self):
        imgs = [codecs.make_image(s, 30, 44, planes=3) for s in (1, 2, 9)]
        outs = avcc.decode_h264_yuv(avcc.encode_h264(imgs, qp=8))
        assert len(outs) == 3
        for im, (y, cb, cr) in zip(imgs, outs):
            assert y.shape == (30, 44) and cb.shape == (15, 22)
            assert codecs.psnr(im[0], y) >= 45.0
            p = im[1].astype(np.uint16)
            sub = ((p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2]
                    + p[1::2, 1::2] + 2) >> 2).astype(np.uint8)
            assert codecs.psnr(sub, cb) >= 45.0

    def test_decode_deterministic(self):
        img = codecs.make_image(7, 32, 32, planes=1)[0]
        data = avcc.encode_h264([img], qp=16)
        a = avcc.decode_h264(data)[0]
        b = avcc.decode_h264(data)[0]
        assert np.array_equal(a, b)

    def test_smooth_content_compresses_hard(self):
        yy, xx = np.mgrid[0:64, 0:96]
        sm = ((yy * 2 + xx) % 256).astype(np.uint8)
        data = avcc.encode_h264([sm], qp=24)
        assert len(data) < sm.size // 10  # >10:1 on gradients
        assert codecs.psnr(sm, avcc.decode_h264(data)[0]) >= 40.0

    def test_flat_chroma_grayscale_input(self):
        img = codecs.make_image(4, 32, 48, planes=1)[0]
        y, cb, cr = avcc.decode_h264_yuv(avcc.encode_h264([img], qp=6))[0]
        assert np.all(np.abs(cb.astype(int) - 128) <= 1)


class TestSubsetContract:
    def test_cabac_pps_raises_named(self):
        img = codecs.make_image(1, 16, 16, planes=1)[0]
        data = bytearray(avcc.encode_h264([img], qp=10))
        # flip entropy_coding_mode in the PPS: locate the PPS NAL
        nals = data.split(b"\x00\x00\x00\x01")
        pps = bytearray(nals[2])
        # rbsp: ue(0) ue(0) u(1)=0... bits '1' '1' '0' -> set bit 2 of byte 1
        pps[1] |= 0b00100000
        nals[2] = bytes(pps)
        bad = b"\x00\x00\x00\x01".join(bytes(n) for n in nals)
        with pytest.raises(NotImplementedError, match="CABAC"):
            avcc.decode_h264(bad)

    def test_bad_inputs_raise_named(self):
        with pytest.raises(ValueError, match="no frames"):
            avcc.encode_h264([])
        with pytest.raises(ValueError, match="even"):
            avcc.encode_h264([np.zeros((15, 16), np.uint8)])
        with pytest.raises(ValueError, match="QP"):
            avcc.encode_h264([np.zeros((16, 16), np.uint8)], qp=99)
        with pytest.raises(ValueError, match="start code"):
            avcc.decode_h264(b"\xff" * 40)

    def test_truncation_and_bitflips_raise_named_or_decode(self):
        """The corrupt-input contract, locally (the fuzz lane also sweeps
        this format): mutations either decode to something or raise a
        NAMED error — never a bare IndexError/struct.error."""
        img = codecs.make_image(2, 32, 32, planes=1)[0]
        data = avcc.encode_h264([img], qp=12)
        rng = np.random.RandomState(11)
        for i in range(60):
            if i % 2 == 0:
                b = data[: rng.randint(1, len(data))]
            else:
                m = bytearray(data)
                for _ in range(rng.randint(1, 4)):
                    m[rng.randint(0, len(m))] = rng.randint(0, 256)
                b = bytes(m)
            try:
                avcc.decode_h264(b)
            except (ValueError, NotImplementedError, KeyError):
                pass
